"""bf16 flagship compile probe on the real TPU (round-2 VERDICT item 1).

Round 1's bf16 flagship compile hung >45 min with the fused-epoch scan.
This probe isolates the axis: per-step jit first (much smaller program),
then the fused epoch, each under its own wall-clock budget, printing one
JSON line per stage so partial progress survives a timeout.

  python tools/bf16_probe.py [--stage step|epoch|both] [--seq 6] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both", choices=["step", "epoch", "both"])
    ap.add_argument("--seq", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=8, help="scan length for the epoch stage")
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    # Deferral hook: a running queue's probe invocation can't be edited
    # (bash holds the script by fd), so a marker file postpones the long
    # fused-epoch compile until higher-priority TPU jobs have run.
    if args.stage == "epoch" and (
        os.path.exists("/tmp/skip_bf16_epoch_probe")
        or os.path.exists("/tmp/skip_bf16_epoch_probe2")
    ):
        print('{"stage": "epoch", "skipped": "deferred via /tmp/skip_bf16_epoch_probe*"}')
        return

    import jax

    cache = os.path.expanduser("~/.cache/climate_tpu/xla")
    if jax.devices()[0].platform == "tpu":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from climate_tpu.models import get_model
    from climate_tpu.parallel.mesh import create_mesh, replicate
    from climate_tpu.train.state import build_optimizer, create_train_state
    from climate_tpu.train.trainer import StepFunctions, pad_batch

    cfg = {
        "model": {"type": "unet_convlstm_attention", "base_channels": 16},
        "data": {"input_vars": list("abcde"), "output_vars": ["y", "z"],
                 "seasonal_embeddings": True},
        "training": {"precision": args.precision},
    }
    model = get_model(cfg)
    mesh = create_mesh(None)
    tx = build_optimizer(5e-4)
    n = 256
    x_all = replicate(mesh, jnp.asarray(np.random.default_rng(0).normal(
        size=(n, 48, 72, 7)).astype(np.float32)))
    y_all = replicate(mesh, jnp.asarray(np.random.default_rng(1).normal(
        size=(n, 2, 48, 72)).astype(np.float32).transpose(0, 2, 3, 1)))
    x_ex = jnp.zeros((args.batch, args.seq, 48, 72, 7), jnp.float32)
    state = replicate(mesh, create_train_state(model, jax.random.PRNGKey(0), x_ex, tx))
    fns = StepFunctions.build(model, tx, mesh, seq_len=args.seq, has_batch_stats=False)
    rng = jax.random.PRNGKey(2)

    def report(d):
        print(json.dumps(d), flush=True)

    if args.stage in ("step", "both"):
        idx, mask = pad_batch(np.arange(args.batch), args.batch)
        idx, mask = jnp.asarray(idx), jnp.asarray(mask)
        t0 = time.perf_counter()
        state, loss = fns.train_step(state, x_all, y_all, idx, mask, rng)
        loss = float(loss)  # host pull = true sync
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        steps = 20
        for _ in range(steps):
            state, loss = fns.train_step(state, x_all, y_all, idx, mask, rng)
        loss = float(loss)
        dt = time.perf_counter() - t0
        report({"stage": "step", "precision": args.precision, "compile_s": round(compile_s, 1),
                "loss": loss, "samples_per_sec": round(args.batch * steps / dt, 1)})

    if args.stage in ("epoch", "both"):
        batches = [np.arange(i, i + args.batch) % n for i in range(0, args.n_batches * args.batch, args.batch)]
        padded = [pad_batch(b.astype(np.int32), args.batch) for b in batches]
        idx_mat = jnp.asarray(np.stack([p[0] for p in padded]))
        mask_mat = jnp.asarray(np.stack([p[1] for p in padded]))
        t0 = time.perf_counter()
        state, (losses, gnorms) = fns.train_epoch(state, x_all, y_all, idx_mat, mask_mat, rng)
        losses = np.asarray(losses)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, (losses, gnorms) = fns.train_epoch(state, x_all, y_all, idx_mat, mask_mat, rng)
        losses = np.asarray(losses)
        dt = time.perf_counter() - t0
        report({"stage": "epoch", "precision": args.precision, "compile_s": round(compile_s, 1),
                "loss": float(losses[-1]),
                "samples_per_sec": round(args.batch * args.n_batches / dt, 1)})


if __name__ == "__main__":
    main()
