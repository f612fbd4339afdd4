"""Spatial self-attention op with a Pallas TPU flash-attention path.

The workload (reference: src/cnn_transformer.py:25-32) is full self-attention
over 216 tokens (12x18 spatial grid), 4 heads, head_dim 32. That is tiny by
flash-attention standards — the whole score matrix fits in VMEM — so the
Pallas kernel's win is fusion (QK^T -> softmax -> PV in one kernel, no HBM
round-trips for the 216x216 scores), not tiling. Both paths are numerically
equivalent (tests/test_ops.py); dispatch is automatic with an env override.

Set CLIMATE_TPU_ATTN=xla|pallas to force a path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v):
    """Reference path: einsum attention, fp32 softmax accumulation."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _pallas_supported(q) -> bool:
    # Measured on TPU v5e (tools/kernel_bench.py): at the production shape
    # (b=64, n=216, h=4, d=32) XLA's fused einsum wins — 21us vs 86us — the
    # workload is far below the size where kernel fusion pays. Honest default
    # is therefore XLA (SURVEY.md stage 7: "keep whichever wins"); the Pallas
    # kernel stays as the opt-in path and the building block for larger grids.
    if os.environ.get("CLIMATE_TPU_ATTN") != "pallas":
        return False
    b, n, h, d = q.shape
    # single-block kernel: whole (padded) score matrix must sit in VMEM
    return n <= 1024 and d <= 128


def dot_product_attention(q, k, v):
    """Multi-head self-attention. q/k/v: (B, N, H, Dh) -> (B, N, H, Dh)."""
    if _pallas_supported(q):
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)
