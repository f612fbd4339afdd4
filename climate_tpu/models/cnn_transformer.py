"""CNNTransformer: strided-conv encoder -> 216-token transformer -> deconv.

Structural parity with src/cnn_transformer.py:4-54: two stride-2 3x3 convs
(48x72 -> 12x18), learned positional embedding (randn init), `depth` post-LN
encoder layers (d_model=embed_dim, ReLU FF), two ConvTranspose(2,2) ups and a
1x1 head. 675,490 params at the shipped config. The token self-attention runs
through climate_tpu.ops.attention (Pallas flash kernel on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, ConvTranspose, TransformerEncoderLayer


class CNNTransformer(nn.Module):
    n_output_channels: int
    embed_dim: int = 128
    depth: int = 4
    n_heads: int = 4
    mlp_dim: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C_in) with H=48, W=72
        b, h0, w0, _ = x.shape
        x = Conv(self.embed_dim // 2, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv(self.embed_dim, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype)(x)
        x = nn.relu(x)  # (B, H/4, W/4, D)

        bh, bw = x.shape[1], x.shape[2]
        tokens = x.reshape(b, bh * bw, self.embed_dim)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=1.0),  # torch.randn parity
            (1, bh * bw, self.embed_dim),
        )
        tokens = tokens + pos.astype(self.dtype)

        for _ in range(self.depth):
            tokens = TransformerEncoderLayer(
                self.embed_dim, self.n_heads, self.mlp_dim, self.dropout, dtype=self.dtype
            )(tokens, deterministic=not train)

        x = tokens.reshape(b, bh, bw, self.embed_dim)
        x = ConvTranspose(self.embed_dim // 2, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = ConvTranspose(self.embed_dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
        x = nn.relu(x)
        return Conv(self.n_output_channels, (1, 1), dtype=self.dtype)(x)
