"""Attention U-Net, depth 4 (structural parity with src/unet.py:72-109).

Encoder 16->32->64->128 over 48x72 -> 6x9, ConvBlock bottleneck, ConvTranspose
ups with skip concats, 1x1 head. 790,130 params at base=16 (the reference's
own docstring says ~645k — stale, src/unet.py:75; the true torch count is
790,130, matched here).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, ConvBlock, Down, Up


class UNet(nn.Module):
    n_output_channels: int = 2
    base: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, 48, 72, C_in)
        c = self.base
        s1 = ConvBlock(c, dtype=self.dtype)(x)         # (B, 48, 72, 16)
        s2 = Down(c * 2, dtype=self.dtype)(s1)          # (B, 24, 36, 32)
        s3 = Down(c * 4, dtype=self.dtype)(s2)          # (B, 12, 18, 64)
        s4 = Down(c * 8, dtype=self.dtype)(s3)          # (B,  6,  9, 128)

        y = ConvBlock(c * 8, dtype=self.dtype)(s4)      # bottleneck

        y = Up(c * 4, dtype=self.dtype)(y, s3)
        y = Up(c * 2, dtype=self.dtype)(y, s2)
        y = Up(c, dtype=self.dtype)(y, s1)
        return Conv(self.n_output_channels, (1, 1), dtype=self.dtype)(y)
