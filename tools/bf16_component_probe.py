"""Isolate WHICH subgraph hangs the bf16 flagship compile on TPU.

Stages (each timed, each prints a JSON line immediately, cheapest first):
  1. convlstm_fwd      — bf16 ConvLSTM scan forward only
  2. convlstm_grad     — + gradient through the scan
  3. encoder_grad      — bf16 UNet encoder (B*T conv batch) fwd+bwd
  4. model_fwd         — full flagship forward
  5. model_grad        — full flagship fwd+bwd

Run under `timeout`; whatever stage never prints is the culprit.
  python tools/bf16_component_probe.py [--seq 6] [--batch 64] [--stages 1,2,3,4,5]
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
    ap.add_argument("--seq", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stages", default="1,2,3,4,5")
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()
    stages = {int(s) for s in args.stages.split(",")}

    import jax

    if jax.devices()[0].platform == "tpu":
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/climate_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from climate_tpu.models import AttUNetConvLSTM
    from climate_tpu.models.convlstm import ConvLSTM
    from climate_tpu.models.layers import ConvBlock, Down

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    b, t = args.batch, args.seq
    rng = jax.random.PRNGKey(0)
    r0 = np.random.default_rng(0)

    def run(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        print(json.dumps({"stage": name, "precision": args.precision,
                          "compile_s": round(compile_s, 1),
                          "exec_s": round((time.perf_counter() - t0) / 5, 4)}), flush=True)

    if stages & {1, 2}:
        lstm = ConvLSTM(c_hid=64, dtype=dtype)
        lstm_in = jnp.asarray(r0.normal(size=(t, b, 6, 9, 128)).astype(np.float32))
        lv = jax.jit(lstm.init)(rng, lstm_in)
        if 1 in stages:
            run("convlstm_fwd", jax.jit(lambda v, x: lstm.apply(v, x)), lv, lstm_in)
        if 2 in stages:
            run("convlstm_grad", jax.jit(jax.grad(
                lambda v, x: jnp.mean(lstm.apply(v, x).astype(jnp.float32) ** 2))), lv, lstm_in)

    if 3 in stages:
        mods = [ConvBlock(16, dtype=dtype), Down(32, dtype=dtype), Down(64, dtype=dtype), Down(128, dtype=dtype)]
        xf = jnp.asarray(r0.normal(size=(b * t, 48, 72, 7)).astype(np.float32))
        vs, xp = [], xf
        for m in mods:
            v = jax.jit(m.init)(rng, xp)
            vs.append(v)
            xp = jax.jit(m.apply)(v, xp)

        def enc_loss(vlist, x):
            for m, v in zip(mods, vlist):
                x = m.apply(v, x)
            return jnp.mean(x.astype(jnp.float32) ** 2)

        run("encoder_grad", jax.jit(jax.grad(enc_loss)), vs, xf)

    if stages & {4, 5}:
        model = AttUNetConvLSTM(n_output_channels=2, base=16, dtype=dtype)
        x = jnp.asarray(r0.normal(size=(b, t, 48, 72, 7)).astype(np.float32))
        mv = jax.jit(model.init)(rng, x)
        if 4 in stages:
            run("model_fwd", jax.jit(lambda v, xx: model.apply(v, xx)), mv, x)
        if 5 in stages:
            run("model_grad", jax.jit(jax.grad(
                lambda v, xx: jnp.mean(model.apply(v, xx).astype(jnp.float32) ** 2))), mv, x)


if __name__ == "__main__":
    main()
