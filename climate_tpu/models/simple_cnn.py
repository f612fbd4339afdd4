"""SimpleCNN: single-frame residual CNN baseline.

Structural parity with src/models.py:76-123: initial conv->BN->ReLU to
init_dim, `depth` ResidualBlocks doubling channels except the last
(64->128->256->512->512 as shipped), spatial Dropout2d, then a 2-layer head
(3x3 conv -> BN -> ReLU -> 1x1 conv). 10,730,626 params at the shipped config
(verified in tests/test_models.py). NHWC; BatchNorm running stats in the
'batch_stats' collection.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, ResidualBlock


class SimpleCNN(nn.Module):
    n_output_channels: int
    kernel_size: int = 3
    init_dim: int = 64
    depth: int = 4
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C_in)
        k = self.kernel_size
        x = Conv(self.init_dim, (k, k), padding=k // 2, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)

        dim = self.init_dim
        for i in range(self.depth):
            out_dim = dim * 2 if i < self.depth - 1 else dim
            x = ResidualBlock(out_dim, kernel_size=k, dtype=self.dtype)(x, train=train)
            if i < self.depth - 1:
                dim *= 2

        # Dropout2d: drop whole channels per sample (broadcast over H, W)
        x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2), deterministic=not train)(x)

        x = Conv(dim // 2, (k, k), padding=k // 2, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        return Conv(self.n_output_channels, (1, 1), dtype=self.dtype)(x)
