"""Kernel microbenchmarks on the local accelerator: Pallas vs XLA.

Honest-reporting harness (SURVEY.md build stage 7): measures the flash
attention kernel against the XLA einsum path at the production shape
(216 tokens, 4 heads, d=32) and the CNNTransformer batch sizes; whichever
wins should be the dispatch default. Run on the real chip:
  python tools/kernel_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, warmup=3, iters=50):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    from climate_tpu.ops.attention import _xla_attention
    from climate_tpu.ops.flash_attention import flash_attention

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({jax.devices()[0]})")

    for b, n, h, d, dtype in [
        (64, 216, 4, 32, jnp.float32),
        (64, 216, 4, 32, jnp.bfloat16),
        (256, 216, 4, 32, jnp.bfloat16),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (b, n, h, d), dtype=dtype) for kk in ks)
        xla = jax.jit(_xla_attention)
        pal = jax.jit(flash_attention)
        t_xla = timeit(xla, q, k, v)
        t_pal = timeit(pal, q, k, v)
        import numpy as np

        diff = float(
            np.max(
                np.abs(
                    np.asarray(xla(q, k, v), dtype=np.float32)
                    - np.asarray(pal(q, k, v), dtype=np.float32)
                )
            )
        )
        print(
            f"attention b={b} n={n} h={h} d={d} {dtype.__name__}: "
            f"xla {t_xla:.1f}us  pallas {t_pal:.1f}us  "
            f"speedup {t_xla / t_pal:.2f}x  maxdiff {diff:.2e}"
        )


if __name__ == "__main__":
    sys.exit(main())
