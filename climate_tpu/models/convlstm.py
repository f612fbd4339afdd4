"""ConvLSTM as a compiled lax.scan recurrence.

The reference runs a Python `for t` loop over time (src/convlstm.py:27-35) —
unrolled, sequential, uncompiled. Here the recurrence is `nn.scan` (lax.scan
under jit): one compiled step reused across T, zero Python dispatch. Gate
math routes through climate_tpu.ops.convlstm_gates (fusable / Pallas).

Cell parity with src/convlstm.py:5-19: one Conv(c_in + c_hid -> 4*c_hid),
gate order i, f, o, g; zero-initialized (h, c).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.convlstm_cell import convlstm_gates
from .layers import Conv


class ConvLSTMCell(nn.Module):
    c_hid: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        # carry: (h, c) each (B, H, W, c_hid); x: (B, H, W, c_in)
        h, c = carry
        k = self.kernel_size
        gates = Conv(4 * self.c_hid, (k, k), padding=k // 2, dtype=self.dtype)(
            jnp.concatenate([x, h], axis=-1)
        )
        h_next, c_next = convlstm_gates(gates, c)
        return (h_next, c_next), h_next


class ConvLSTM(nn.Module):
    """Scan the cell over a (T, B, H, W, C) sequence; returns all hidden
    states stacked (T, B, H, W, c_hid), like src/convlstm.py:21-35."""

    c_hid: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_seq):
        t, b, h, w, _ = x_seq.shape
        init = (
            jnp.zeros((b, h, w, self.c_hid), dtype=x_seq.dtype),
            jnp.zeros((b, h, w, self.c_hid), dtype=x_seq.dtype),
        )
        scan = nn.scan(
            ConvLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, hs = scan(self.c_hid, self.kernel_size, dtype=self.dtype, name="cell")(init, x_seq)
        return hs
