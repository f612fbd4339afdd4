"""Pallas TPU kernel: fused ConvLSTM gate update.

One VMEM pass computing i,f,o,g activations + cell/hidden updates
(reference math: src/convlstm.py:12-18), fusing 3 sigmoids, 2 tanhs and 2
FMAs that XLA would otherwise schedule as a fusion cluster anyway — kept as
the opt-in path (CLIMATE_TPU_LSTM_GATES=pallas) and benchmarked honestly in
tools/kernel_bench.py.

Layout: gates (..., 4C) with torch chunk order i|f|o|g, c (..., C). The
kernel flattens leading dims to rows and tiles rows; the channel dim stays in
lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gates_kernel(g_ref, c_ref, h_out_ref, c_out_ref, *, c_chan: int):
    g = g_ref[:]  # (rows, 4C)
    c = c_ref[:]  # (rows, C)
    i = jax.nn.sigmoid(g[:, 0 * c_chan : 1 * c_chan])
    f = jax.nn.sigmoid(g[:, 1 * c_chan : 2 * c_chan])
    o = jax.nn.sigmoid(g[:, 2 * c_chan : 3 * c_chan])
    gg = jnp.tanh(g[:, 3 * c_chan : 4 * c_chan])
    c_next = f * c + i * gg
    h_out_ref[:] = o * jnp.tanh(c_next)
    c_out_ref[:] = c_next


def fused_gates(gates, c):
    """gates (..., 4C), c (..., C) -> (h', c'), both (..., C)."""
    import functools

    c_chan = c.shape[-1]
    lead = gates.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    g2 = gates.reshape(rows, 4 * c_chan)
    c2 = c.reshape(rows, c_chan)

    block_rows = min(rows, 512)
    grid = (pl.cdiv(rows, block_rows),)
    interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(_gates_kernel, c_chan=c_chan)
    h2, c_next2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 4 * c_chan), lambda r: (r, 0)),
            pl.BlockSpec((block_rows, c_chan), lambda r: (r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c_chan), lambda r: (r, 0)),
            pl.BlockSpec((block_rows, c_chan), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c_chan), c.dtype),
            jax.ShapeDtypeStruct((rows, c_chan), c.dtype),
        ],
        interpret=interpret,
    )(g2, c2)
    return h2.reshape(*lead, c_chan), c_next2.reshape(*lead, c_chan)
