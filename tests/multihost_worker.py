"""Worker for the 2-process jax.distributed smoke test (run via subprocess).

Each process gets 2 virtual CPU devices (XLA_FLAGS set by the parent), joins
the coordinator, and proves the multi-host path end to end: process count,
global device count, a cross-process allgather, and a psum over a
process-spanning mesh. Results land in a JSON file the parent asserts on.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <out.json>
"""

import json
import sys


def main() -> None:
    coordinator, num_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    import jax

    # the ambient axon TPU plugin wins over JAX_PLATFORMS env; config wins over both
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from climate_tpu.parallel.multihost import initialize_multihost

    assert initialize_multihost(coordinator, num_procs, pid) is True

    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }

    # cross-process collective #1: allgather of each process's id
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.array([pid], dtype=np.int32))
    result["allgather"] = np.asarray(gathered).ravel().tolist()

    # cross-process collective #2: global-mesh reduction over all devices
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = jax.device_count()
    local = np.arange(jax.process_index() * jax.local_device_count() * 4,
                      (jax.process_index() + 1) * jax.local_device_count() * 4,
                      dtype=np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (n * 4,)
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    result["global_sum"] = float(total)
    result["expected_sum"] = float(np.arange(n * 4, dtype=np.float32).sum())

    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
