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
    import numpy as np

    # host pull (np.asarray) = reliable sync; axon's block_until_ready can
    # ack before completion (NOTES_ROUND2.md), inflating kernel speedups
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., -1:])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., -1:])
    return (time.perf_counter() - t0) / iters * 1e6  # us


def bench_window_gather():
    """Pallas scalar-prefetch row-DMA gather vs XLA take+mask at production
    shapes (final pipeline: N=7029 train frames, batch 64, seq 6/12, C=7/9)."""
    import numpy as np

    from climate_tpu.data.dataset import gather_windows
    from climate_tpu.ops.window_gather import gather_windows_pallas, supported

    platform = jax.devices()[0].platform
    for n, b, t, c in [(7029, 64, 6, 7), (7029, 64, 12, 7), (7029, 64, 6, 9)]:
        data = jax.random.normal(jax.random.PRNGKey(0), (n, 48, 72, c))
        idx = jax.random.randint(jax.random.PRNGKey(1), (b,), 0, n, jnp.int32)
        # gather_windows defaults to XLA everywhere (the kernel is opt-in via
        # CLIMATE_TPU_WINDOW_GATHER=pallas); measure both paths directly.
        xla = jax.jit(lambda d, i: gather_windows(d, i, t))
        t_xla = timeit(xla, data, idx)
        line = f"window_gather N={n} B={b} T={t} C={c}: xla {t_xla:.1f}us"
        if supported(data.shape, platform):
            pal = lambda d, i: gather_windows_pallas(d, i, t)
            t_pal = timeit(pal, data, idx)
            diff = float(np.max(np.abs(np.asarray(xla(data, idx)) - np.asarray(pal(data, idx)))))
            line += f"  pallas {t_pal:.1f}us  speedup {t_xla / t_pal:.2f}x  maxdiff {diff:.1e}"
        else:
            line += "  (pallas unsupported on this platform/shape)"
        print(line, flush=True)


def main():
    from climate_tpu.ops.attention import _xla_attention
    from climate_tpu.ops.flash_attention import flash_attention

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({jax.devices()[0]})")
    bench_window_gather()

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
