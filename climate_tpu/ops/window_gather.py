"""Pallas sliding-window gather: the input stage of every sequence-model step.

`gather_windows` (data/dataset.py) assembles each training batch inside jit:
(N, H, W, C) dataset resident in HBM + (B,) target indices -> (B, T, H, W, C)
windows with zero left-padding. XLA lowers the index arithmetic + `jnp.take`
+ mask-multiply to a generic gather; this kernel instead streams exactly the
B*T needed rows HBM->VMEM with scalar-prefetched row indices driving the
block index_map — Pallas double-buffers the row DMAs across grid steps, and
the pad-mask multiply fuses into the same pass (no separate mask kernel).

Row layout: one window frame = H*W*C contiguous fp32 values. The production
channel counts make rows lane-aligned (48*72*7 = 189*128, 48*72*9 = 243*128);
`supported()` gates dispatch to those shapes and the XLA path remains the
fallback (and the CPU/test path). Gradients never flow into the dataset
(only params are differentiated), so no custom VJP is needed.

Measured on one v5e (tools/parity/kernel_bench_r2.txt): 1.67x over the XLA
gather at the seq12 production shape (B=64 T=12) as a STANDALONE program,
slower at seq6. In-situ, inside the full fused training step, the kernel is
~7% slower even at seq12 (2174 vs 2341 samples/s over a full e50 run) — XLA
fuses its gather with the surrounding step while a pallas_call is a fusion
barrier. The dataset-level dispatch therefore defaults to XLA at every
seq_len; set CLIMATE_TPU_WINDOW_GATHER=pallas to force the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(data_shape: tuple[int, ...], platform: str) -> bool:
    """Kernel eligibility: TPU + lane-aligned rows."""
    if platform != "tpu" or len(data_shape) != 4:
        return False
    n, h, w, c = data_shape
    return (h * w * c) % 128 == 0


def _gather_kernel(safe_ref, valid_ref, row_ref, out_ref):
    # row_ref block = the (1, HWC) frame selected by the index_map for this
    # grid step; zero-fill left-padding via the prefetched validity scalar.
    i = pl.program_id(0)
    out_ref[:] = row_ref[:] * valid_ref[i]


@functools.partial(jax.jit, static_argnames=("seq_len",))
def gather_windows_pallas(data: jax.Array, idx: jax.Array, seq_len: int) -> jax.Array:
    """(N, H, W, C) + (B,) target indices -> (B, T, H, W, C), zero left-pad.

    Semantics identical to data/dataset.py::gather_windows (window covers
    [idx-T+1, ..., idx]; entries before t=0 are zeros, reference
    main_final.py:123-145).
    """
    n, h, w, c = data.shape
    b = idx.shape[0]
    hwc = h * w * c
    if hwc % 128 != 0:  # clear error instead of an opaque Mosaic failure
        raise ValueError(
            f"gather_windows_pallas needs lane-aligned rows (H*W*C % 128 == 0); "
            f"got H*W*C = {h}*{w}*{c} = {hwc} (see supported())"
        )
    # Mosaic requires the block's last two dims divisible by (8, 128) or equal
    # to the array dims; view each frame row as (HWC/128, 128) so the (1,
    # sublanes, 128) block covers whole array dims exactly.
    sublanes = hwc // 128
    flat = data.reshape(n, sublanes, 128)

    offsets = jnp.arange(seq_len, dtype=idx.dtype) - (seq_len - 1)  # [-T+1 .. 0]
    widx = (idx[:, None] + offsets[None, :]).reshape(-1)  # (B*T,)
    safe = jnp.maximum(widx, 0).astype(jnp.int32)
    valid = (widx >= 0).astype(data.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * seq_len,),
        in_specs=[
            pl.BlockSpec((1, sublanes, 128), lambda i, safe, valid: (safe[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sublanes, 128), lambda i, safe, valid: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * seq_len, sublanes, 128), data.dtype),
    )(safe, valid, flat)
    return out.reshape(b, seq_len, h, w, c)
