"""Pallas TPU flash-attention kernel for the 216-token spatial attention.

Design (see /opt/skills/guides/pallas_guide.md): one grid step per (batch x
head); Q/K/V blocks live wholly in VMEM (padded N<=1024, head_dim<=128), the
QK^T -> masked softmax -> PV chain runs fused on MXU+VPU with fp32 score
accumulation and never spills the NxN score matrix to HBM. At this size a
single block per head is optimal — tiling would only add grid overhead.

Backward pass: custom VJP that recomputes probabilities with XLA ops (the
score matrix is ~256x256; rematerialization is cheaper than saving it).
Replaces the reference's torch.nn.TransformerEncoder attention
(src/cnn_transformer.py:25-32) on the compute path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_actual: int, scale: float):
    q = q_ref[0]  # (N_pad, D_pad); leading block dim is 1 (one batch*head)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N_pad, N_pad) fp32
    n_pad = scores.shape[-1]
    if n_actual < n_pad:  # mask padded keys (compile-time constant pattern)
        key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(key_ids < n_actual, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v):
    b, n, h, d = q.shape
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)
    scale = 1.0 / (d ** 0.5)

    def to_blocks(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qb, kb, vb = to_blocks(q), to_blocks(k), to_blocks(v)

    kernel = functools.partial(_attn_kernel, n_actual=n, scale=scale)
    # Mosaic targets TPU; on CPU (tests / virtual meshes) run interpreted.
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)) for _ in range(3)
        ],
        out_specs=pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)
    out = out[:, :n, :d].reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@jax.custom_vjp
def flash_attention(q, k, v):
    return _flash_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", probs, g32).astype(v.dtype)
    dprobs = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", dscores, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhqk,bqhd->bkhd", dscores, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)
