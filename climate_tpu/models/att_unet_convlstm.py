"""AttUNetConvLSTM — the flagship: per-frame attention-UNet encoder, ConvLSTM
temporal bottleneck, decoder over the last LSTM state + time-mean skips.

Structural parity with src/unet_convlstm_attention.py:27-103, redesigned for
the MXU: the per-frame encoder folds T into the batch axis (one big conv batch
instead of the reference's Python `for t` loop, :71-81), and the ConvLSTM is a
lax.scan (vs the second Python loop, convlstm.py:27-35).

Param note: the reference defines `post_conv` but never calls it
(src/unet_convlstm_attention.py:46-49 vs forward :60-103) — 36,928 dead
params. We drop it deliberately (SURVEY.md 2.6.3): 917,040 live params vs the
reference's 953,968 total / 917,040 live.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .convlstm import ConvLSTM
from .layers import Conv, ConvBlock, Down, Up


class AttUNetConvLSTM(nn.Module):
    n_output_channels: int = 2
    base: int = 16
    dtype: jnp.dtype = jnp.float32
    # cuDNN-style recurrence split (see convlstm.py): same params/checkpoints,
    # input half of the gate conv batched over T outside the scan
    split_lstm_conv: bool = False
    # whole-T fused Pallas recurrence (ops/convlstm_fused.py); same checkpoints
    fused_lstm: bool = False

    @nn.compact
    def __call__(self, x_seq, train: bool = False):
        # x_seq: (B, T, H, W, C_in)
        b, t, h, w, cin = x_seq.shape
        c = self.base

        enc1 = ConvBlock(c, dtype=self.dtype)
        enc2 = Down(c * 2, dtype=self.dtype)
        enc3 = Down(c * 4, dtype=self.dtype)
        enc4 = Down(c * 8, dtype=self.dtype)

        # Encode all frames as one (B*T) conv batch — MXU-friendly.
        xf = x_seq.reshape(b * t, h, w, cin)
        s1 = enc1(xf)        # (B*T, H,   W,   c)
        s2 = enc2(s1)        # (B*T, H/2, W/2, 2c)
        s3 = enc3(s2)        # (B*T, H/4, W/4, 4c)
        s4 = enc4(s3)        # (B*T, H/8, W/8, 8c)

        # Temporal bottleneck: scan ConvLSTM over T (c_hid = base*4,
        # src/unet_convlstm_attention.py:44).
        lstm_in = s4.reshape(b, t, *s4.shape[1:]).transpose(1, 0, 2, 3, 4)
        hs = ConvLSTM(
            c_hid=c * 4, dtype=self.dtype, split_input_conv=self.split_lstm_conv,
            fused_recurrence=self.fused_lstm,
        )(lstm_in)  # (T, B, H/8, W/8, 4c)
        bottleneck = hs[-1]

        # Time-mean skip connections (src/unet_convlstm_attention.py:91-93).
        def tmean(s):
            return s.reshape(b, t, *s.shape[1:]).mean(axis=1)

        d3 = Up(c * 4, dtype=self.dtype)(bottleneck, tmean(s3))
        d2 = Up(c * 2, dtype=self.dtype)(d3, tmean(s2))
        d1 = Up(c, dtype=self.dtype)(d2, tmean(s1))
        return Conv(self.n_output_channels, (1, 1), dtype=self.dtype)(d1)
