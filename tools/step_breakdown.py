"""Flagship step-time breakdown + MFU accounting (round-2 VERDICT item 6).

Times the full jitted train step and its stages as separately-jitted
programs (gather, encoder, ConvLSTM scan, decoder, full fwd, fwd+bwd+adam),
plus XLA's own FLOP estimate via compile().cost_analysis(), and reports
achieved FLOPs/s vs the chip peak. Stage programs re-pay their own
dispatch/boundary costs, so stage times overlap and won't sum exactly to the
full step — the ranking is what matters.

  python tools/step_breakdown.py [--seq 6] [--batch 64] [--precision fp32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peaks (per chip): bf16 197 TFLOP/s; fp32 conv/matmul run through the
# same MXU with fp32 accumulation at roughly half rate. MFU here is reported
# against the bf16 peak (the honest "speed of light" for the part).
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e11}


def timed(fn, *args, iters=20):
    import numpy as np

    # sync via a host pull of ONE element (axon block_until_ready can ack
    # early; pulling the full output would time the tunnel transfer, not the
    # kernel — a (64,6,48,72,7) gather output is 33 MB)
    def sync(out):
        x = (out if isinstance(out, tuple) else (out,))[0]
        np.asarray(x.ravel()[-1:])

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--precision", default="fp32")
    ap.add_argument("--split-lstm", action="store_true",
                    help="measure with the cuDNN-style ConvLSTM recurrence split")
    args = ap.parse_args()

    import jax

    if jax.devices()[0].platform == "tpu":
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/climate_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from climate_tpu.data.dataset import gather_windows
    from climate_tpu.models import get_model
    from climate_tpu.models.convlstm import ConvLSTM
    from climate_tpu.models.layers import ConvBlock, Down
    from climate_tpu.parallel.mesh import create_mesh, replicate
    from climate_tpu.train.state import build_optimizer, create_train_state
    from climate_tpu.train.trainer import StepFunctions, pad_batch

    platform = jax.devices()[0].platform
    cfg = {
        "model": {"type": "unet_convlstm_attention", "base_channels": 16,
                  "split_lstm_conv": args.split_lstm},
        "data": {"input_vars": list("abcde"), "output_vars": ["y", "z"],
                 "seasonal_embeddings": True},
        "training": {"precision": args.precision},
    }
    model = get_model(cfg)
    mesh = create_mesh(None)
    tx = build_optimizer(5e-4)
    b, t = args.batch, args.seq
    n = 512
    rng0 = np.random.default_rng(0)
    x_all = replicate(mesh, jnp.asarray(rng0.normal(size=(n, 48, 72, 7)).astype(np.float32)))
    y_all = replicate(mesh, jnp.asarray(rng0.normal(size=(n, 48, 72, 2)).astype(np.float32)))
    x_ex = jnp.zeros((b, t, 48, 72, 7), jnp.float32)
    state = replicate(mesh, create_train_state(model, jax.random.PRNGKey(0), x_ex, tx))
    fns = StepFunctions.build(model, tx, mesh, seq_len=t, has_batch_stats=False)
    rng = jax.random.PRNGKey(1)
    idx, mask = pad_batch(np.arange(b), b)
    idx, mask = jnp.asarray(idx), jnp.asarray(mask)

    report = {"platform": platform, "precision": args.precision, "batch": b, "seq": t,
              "split_lstm": args.split_lstm}

    # --- full train step (no donation, so it can repeat on the same state) ---
    def _full(state, idx, mask):
        from climate_tpu.train.trainer import masked_mse
        import optax as _optax

        def loss_fn(params):
            x = gather_windows(x_all, idx, t)
            pred = model.apply({"params": params}, x)
            return masked_mse(pred, jnp.take(y_all, idx, axis=0), mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = _optax.apply_updates(state.params, updates)
        return loss, new_params

    full = jax.jit(_full)
    lowered = full.lower(state, idx, mask)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else (cost or {})
    step_flops = float(cost.get("flops", 0.0))

    report["step_time_s"] = timed(lambda s, i, m: full(s, i, m)[0], state, idx, mask)
    report["samples_per_sec"] = round(b / report["step_time_s"], 1)
    report["xla_flops_per_step"] = step_flops
    peak = PEAK_FLOPS.get(platform, 1e12)
    report["achieved_tflops"] = round(step_flops / report["step_time_s"] / 1e12, 2)
    report["mfu_vs_bf16_peak"] = round(step_flops / report["step_time_s"] / peak, 4)

    # --- stages ---
    variables = {"params": state.params}
    params = state.params

    gather_fn = jax.jit(lambda i: gather_windows(x_all, i, t))
    report["stage_gather_s"] = timed(gather_fn, idx)

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    xw = gather_fn(idx)
    report["stage_forward_s"] = timed(fwd, variables, xw)

    # encoder-only / lstm-only probes (fresh modules, same shapes/dtype)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    enc = [ConvBlock(16, dtype=dtype), Down(32, dtype=dtype), Down(64, dtype=dtype), Down(128, dtype=dtype)]
    xf = xw.reshape(b * t, 48, 72, 7)
    enc_vars = []
    x_probe = xf
    for mmod in enc:
        v = jax.jit(mmod.init)(jax.random.PRNGKey(0), x_probe)
        enc_vars.append(v)
        x_probe = jax.jit(mmod.apply)(v, x_probe)

    def enc_fwd(x):
        for mmod, v in zip(enc, enc_vars):
            x = mmod.apply(v, x)
        return x

    enc_jit = jax.jit(enc_fwd)
    report["stage_encoder_s"] = timed(enc_jit, xf)

    lstm = ConvLSTM(c_hid=64, dtype=dtype)
    lstm_in = jnp.asarray(rng0.normal(size=(t, b, 6, 9, 128)).astype(np.float32))
    lstm_v = jax.jit(lstm.init)(jax.random.PRNGKey(0), lstm_in)
    lstm_jit = jax.jit(lstm.apply)
    report["stage_convlstm_s"] = timed(lstm_jit, lstm_v, lstm_in)

    for k, v in report.items():
        if isinstance(v, float) and k.endswith("_s"):
            report[k] = round(v, 5)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
