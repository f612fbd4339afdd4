"""Training-path benchmark: per-step dispatch vs fused-epoch lax.scan.

Measures the flagship training step both ways on identical synthetic
device-resident data — decides trainer.fuse_epoch's default honestly and
quantifies dispatch overhead on this host (axon tunnel latency is material).

  python tools/train_bench.py [n_steps_per_epoch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climate_tpu.models import AttUNetConvLSTM
from climate_tpu.parallel.mesh import create_mesh, replicate
from climate_tpu.train.state import build_optimizer, create_train_state
from climate_tpu.train.trainer import StepFunctions, pad_batch

BATCH = 64
SEQ = 6


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 127  # final-pipeline epoch size
    mesh = create_mesh()
    model = AttUNetConvLSTM(n_output_channels=2, base=16)
    tx = build_optimizer(5e-4)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((BATCH, SEQ, 48, 72, 7), jnp.float32)

    fns = StepFunctions.build(model, tx, mesh, seq_len=SEQ,
                              has_batch_stats=False)
    data_x = replicate(mesh, jax.random.normal(jax.random.PRNGKey(1), (8109, 48, 72, 7)))
    data_y = replicate(mesh, jax.random.normal(jax.random.PRNGKey(2), (8109, 48, 72, 2)))
    host = np.random.default_rng(0)

    def batches():
        idx = host.integers(0, 8109, size=n_steps * BATCH)
        return idx.reshape(n_steps, BATCH)

    # --- per-step dispatch ---
    state = replicate(mesh, create_train_state(model, rng, example, tx))
    idxs = batches()
    for i in range(3):  # warmup/compile
        idx, mask = pad_batch(idxs[i % n_steps], BATCH)
        state, loss = fns.train_step(state, data_x, data_y, jnp.asarray(idx), jnp.asarray(mask), rng)
    _ = float(loss)  # host-visible sync (axon block_until_ready is unreliable)
    t0 = time.perf_counter()
    for i in range(n_steps):
        idx, mask = pad_batch(idxs[i], BATCH)
        state, loss = fns.train_step(state, data_x, data_y, jnp.asarray(idx), jnp.asarray(mask), rng)
    _ = float(loss)  # forces completion of the full dependency chain
    per_step = time.perf_counter() - t0
    print(f"per-step: {n_steps} steps in {per_step:.3f}s -> {n_steps * BATCH / per_step:.0f} samples/s")

    # --- fused epoch ---
    state = replicate(mesh, create_train_state(model, rng, example, tx))
    idx_mat = jnp.asarray(batches().astype(np.int32))
    mask_mat = jnp.ones((n_steps, BATCH), jnp.float32)
    state, (losses, gnorms) = fns.train_epoch(state, data_x, data_y, idx_mat, mask_mat, rng)  # compile
    _ = float(losses[-1])
    t0 = time.perf_counter()
    state, (losses, gnorms) = fns.train_epoch(state, data_x, data_y, idx_mat, mask_mat, rng)
    _ = float(losses[-1])  # host-visible sync
    fused = time.perf_counter() - t0
    print(f"fused:    {n_steps} steps in {fused:.3f}s -> {n_steps * BATCH / fused:.0f} samples/s")
    print(f"fused speedup over per-step: {per_step / fused:.2f}x")


if __name__ == "__main__":
    main()
