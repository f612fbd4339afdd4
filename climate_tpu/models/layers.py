"""Shared Flax building blocks (NHWC layout — the TPU-native choice).

Structural parity targets (reference, PyTorch NCHW):
- SEBlock / SpatialGate / ConvBlock / Down / Up: src/unet.py:6-69
- ResidualBlock: src/models.py:44-73
- torch-style MHA + post-LN transformer layer: src/cnn_transformer.py:25-32
  (nn.TransformerEncoderLayer defaults: post-LN, ReLU feed-forward)

All convs use flax defaults (NHWC, HWIO kernels). Param counts match the
reference exactly per block (verified in tests/test_models.py).
"""

from __future__ import annotations


import functools

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention

# torch-default initialization for parity of training dynamics with the
# reference: torch Conv2d/Linear use kaiming_uniform(a=sqrt(5)), i.e.
# U(-1/sqrt(fan_in), +1/sqrt(fan_in)) = variance_scaling(1/3, fan_in, uniform).
# (torch also draws biases from the same bound; we keep flax's zero biases —
# a negligible, documented divergence.)
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
Conv = functools.partial(nn.Conv, kernel_init=TORCH_KERNEL_INIT)
ConvTranspose = functools.partial(nn.ConvTranspose, kernel_init=TORCH_KERNEL_INIT)
Dense = functools.partial(nn.Dense, kernel_init=TORCH_KERNEL_INIT)


class SEBlock(nn.Module):
    """Channel squeeze-and-excitation, ratio 8 (src/unet.py:6-17)."""

    features: int
    ratio: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(self.features // self.ratio, (1, 1), use_bias=False, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class SpatialGate(nn.Module):
    """CBAM-style spatial gate: 7x7 conv over [mean, max] channel pools
    (src/unet.py:19-29)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mxx = jnp.max(x, axis=-1, keepdims=True)
        gate = Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype)(
            jnp.concatenate([avg, mxx], axis=-1)
        )
        return x * nn.sigmoid(gate)


class ConvBlock(nn.Module):
    """2x (3x3 conv bias=False + GroupNorm(8) + SiLU) + SE + SpatialGate
    (src/unet.py:32-49)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.silu(x)
        x = SEBlock(self.features, dtype=self.dtype)(x)
        x = SpatialGate(dtype=self.dtype)(x)
        return x


class Down(nn.Module):
    """MaxPool(2) then ConvBlock (src/unet.py:51-58)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return ConvBlock(self.features, dtype=self.dtype)(x)


class Up(nn.Module):
    """ConvTranspose(2, stride 2) + skip concat + ConvBlock (src/unet.py:60-69)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = ConvTranspose(self.features, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(self.features, dtype=self.dtype)(x)


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + projection skip + ReLU (src/models.py:44-73).

    BatchNorm uses torch conventions: eps 1e-5, running-stat momentum 0.1
    (flax momentum = 1 - torch momentum = 0.9); running stats live in the
    'batch_stats' collection (flax mutable collections — SURVEY.md stage 5).
    """

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )
        identity = x
        y = Conv(self.features, (k, k), padding=k // 2, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = Conv(self.features, (k, k), padding=k // 2, dtype=self.dtype)(y)
        y = norm()(y)
        if x.shape[-1] != self.features:
            identity = Conv(self.features, (1, 1), dtype=self.dtype)(identity)
            identity = norm()(identity)
        return nn.relu(y + identity)


class MultiHeadSelfAttention(nn.Module):
    """torch-style MHA: packed in-proj + out-proj, both with bias.

    Kept as our own module (rather than flax's) so the score computation can
    dispatch to the Pallas flash-attention kernel (climate_tpu.ops.attention).
    """

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, d = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * d, kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d // h)
        k = k.reshape(b, n, h, d // h)
        v = v.reshape(b, n, h, d // h)
        attn = dot_product_attention(q, k, v)
        if self.dropout > 0.0 and not deterministic:
            # torch MHA applies dropout to attention *weights*; our fused path
            # computes attention in one op, so dropout lands on its output —
            # an intentional, documented divergence (regularization-equivalent).
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        attn = attn.reshape(b, n, d)
        return Dense(d, dtype=self.dtype, name="out_proj")(attn)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer matching nn.TransformerEncoderLayer defaults
    (d_model, nhead, dim_feedforward, ReLU, norm_first=False)."""

    d_model: int
    n_heads: int
    mlp_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        a = MultiHeadSelfAttention(self.n_heads, dropout=self.dropout, dtype=self.dtype)(
            x, deterministic=deterministic
        )
        a = nn.Dropout(self.dropout, deterministic=deterministic)(a)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + a)

        f = Dense(self.mlp_dim, dtype=self.dtype)(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout, deterministic=deterministic)(f)
        f = Dense(self.d_model, dtype=self.dtype)(f)
        f = nn.Dropout(self.dropout, deterministic=deterministic)(f)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + f)
