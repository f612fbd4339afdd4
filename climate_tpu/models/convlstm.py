"""ConvLSTM as a compiled lax.scan recurrence.

The reference runs a Python `for t` loop over time (src/convlstm.py:27-35) —
unrolled, sequential, uncompiled. Here the recurrence is `lax.scan`: one
compiled step reused across T, zero Python dispatch. Gate math routes through
climate_tpu.ops.convlstm_gates (fusable / Pallas).

Cell parity with src/convlstm.py:5-19: one Conv(c_in + c_hid -> 4*c_hid),
gate order i, f, o, g; zero-initialized (h, c).

`split_input_conv=True` applies the cuDNN-style recurrence split: a conv over
channel-concat is a sum of convs, so the input half of the gate conv
(c_in -> 4*c_hid) is hoisted out of the scan and batched over all T frames
(one big MXU conv), leaving only the small recurrent half (c_hid -> 4*c_hid)
sequential. The parameter is still the reference's single fused kernel
(identical tree path cell/Conv_0, shape, and init), sliced at apply time —
checkpoints are interchangeable between the two modes; outputs agree to
float rounding (summation order differs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convlstm_cell import convlstm_gates
from .layers import Conv, TORCH_KERNEL_INIT


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


class _GateConvParams(nn.Module):
    """Declares the fused gate-conv params with the same names, shapes, and
    initializers as the scanned cell's `Conv` (nn.Conv: HWIO kernel,
    torch-default kernel init, zero bias) so both ConvLSTM modes share one
    checkpoint format."""

    c_in: int
    c_hid: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel", TORCH_KERNEL_INIT, (k, k, self.c_in + self.c_hid, 4 * self.c_hid)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (4 * self.c_hid,))
        return kernel, bias


class _CellParams(nn.Module):
    c_in: int
    c_hid: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        return _GateConvParams(self.c_in, self.c_hid, self.kernel_size, name="Conv_0")()


class ConvLSTM(nn.Module):
    """Scan the cell over a (T, B, H, W, C) sequence; returns all hidden
    states stacked (T, B, H, W, c_hid), like src/convlstm.py:21-35.

    Recurrence dispatch: `fused_recurrence=True` (or env
    CLIMATE_TPU_CONVLSTM=fused) routes the sequential half through the
    whole-T Pallas kernel (ops/convlstm_fused.py) — state and recurrent
    weights stay VMEM-resident across months. Env =scan forces the lax.scan
    path. Either way the checkpoint format is the scanned cell's."""

    c_hid: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    split_input_conv: bool = False
    fused_recurrence: bool = False

    def _use_fused(self, h: int, w: int) -> bool:
        import os

        from ..ops import convlstm_fused

        env = os.environ.get("CLIMATE_TPU_CONVLSTM", "")
        if env == "scan":
            return False
        want = self.fused_recurrence or env == "fused"
        return (
            want
            and self.kernel_size == 3
            and convlstm_fused.supported(0, h, w, self.c_hid, jax.default_backend())
        )

    @nn.compact
    def __call__(self, x_seq):
        t, b, h, w, c_in = x_seq.shape
        if self._use_fused(h, w):
            return self._split_forward(x_seq, fused=True)
        if self.split_input_conv:
            return self._split_forward(x_seq)
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

    def _split_forward(self, x_seq, fused: bool = False):
        t, b, h, w, c_in = x_seq.shape
        k = self.kernel_size
        kernel, bias = _CellParams(c_in, self.c_hid, k, name="cell")()
        kx = kernel[:, :, :c_in, :].astype(self.dtype)
        kh = kernel[:, :, c_in:, :].astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        pad = [(k // 2, k // 2)] * 2

        # input contributions for ALL frames in one batched conv (T folds
        # into the conv batch — MXU-sized instead of T tiny convs)
        xg = jax.lax.conv_general_dilated(
            x_seq.reshape(t * b, h, w, c_in).astype(self.dtype), kx, (1, 1), pad,
            dimension_numbers=dn,
        )
        xg = (xg + bias.astype(self.dtype)).reshape(t, b, h, w, 4 * self.c_hid)

        if fused:
            from ..ops.convlstm_fused import convlstm_recurrence

            return convlstm_recurrence(xg, kh).astype(x_seq.dtype)

        def step(carry, xg_t):
            h_prev, c_prev = carry
            gates = xg_t + jax.lax.conv_general_dilated(
                h_prev.astype(self.dtype), kh, (1, 1), pad, dimension_numbers=dn
            )
            h_next, c_next = convlstm_gates(gates, c_prev)
            return (h_next, c_next), h_next

        init = (
            jnp.zeros((b, h, w, self.c_hid), dtype=x_seq.dtype),
            jnp.zeros((b, h, w, self.c_hid), dtype=x_seq.dtype),
        )
        _, hs = jax.lax.scan(step, init, xg)
        return hs
