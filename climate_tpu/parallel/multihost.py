"""Multi-host initialization (DCN between hosts, ICI within each slice).

The single-controller design needs no user-level communication code (SURVEY.md
2.7: the "backend" is the mesh + sharding annotations; XLA emits collectives).
This helper wires jax.distributed for multi-host pods; on a single host it is
a no-op, so the same entry point serves both.
"""

from __future__ import annotations

import os

import jax

from ..utils.logging import get_logger

log = get_logger(__name__)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when a multi-host environment is detected.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > TPU pod auto-detection (no args,
    jax.distributed reads the metadata service). Returns True if distributed
    mode was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    if coordinator_address is None and num_processes is None:
        return False  # single host — nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} global devices"
    )
    return True
