"""Device-resident dataset: the whole (normalized) split lives in HBM.

The reference materializes the dask graph into host-RAM torch tensors and
feeds them through DataLoader workers + per-batch host->device copies
(main_baseline.py:46-72, main_final.py:46-154). At this scale (largest split:
8109 x 7 x 48 x 72 fp32 ~ 0.8 GB) the TPU-native answer is to push the whole
split to HBM once and assemble batches *inside jit* by index gather — per
step the host sends only a (B,) int32 index vector.

Sliding windows (main_final.py:97-154) become a (B, T) gather with zero
left-padding expressed as a mask: window index idx-T+1+i, entries < 0 read
row 0 and are zeroed — exactly the reference's pad_tensor_template semantics.

Layout is NHWC (TPU-native); the ETL's (time, C, y, x) is transposed once at
load. Windows never see member/SSP boundaries fixed here: like the reference
(SURVEY.md 2.6.4), windows may cross concatenated-member boundaries; a future
boundary-mask flag can fix that behind config.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DeviceDataset:
    """One split resident on device. inputs: (N, H, W, C_in); outputs:
    (N, H, W, C_out)."""

    inputs: jax.Array
    outputs: jax.Array

    @property
    def n(self) -> int:
        return self.inputs.shape[0]

    @classmethod
    def from_host(cls, inputs_tchw: np.ndarray, outputs_tchw: np.ndarray, sharding=None,
                  input_dtype=np.float32):
        """(time, C, y, x) host arrays -> NHWC device arrays.

        inputs are stored at `input_dtype`; outputs always stay fp32 (loss /
        metric targets). Storing inputs in bf16 when the model computes in
        bf16 is mathematically identical to fp32 storage — the model's first
        conv casts fp32 inputs to bf16 anyway (flax promote_dtype), so the
        same cast just moves before the per-step window gather, halving its
        HBM read/write traffic (the gather is the bandwidth-shaped stage:
        tools/parity/step_breakdown_bf16.json).
        """
        x = np.ascontiguousarray(np.moveaxis(inputs_tchw, 1, -1), dtype=np.float32)
        y = np.ascontiguousarray(np.moveaxis(outputs_tchw, 1, -1), dtype=np.float32)
        if np.isnan(x).any() or np.isnan(y).any():
            # reference raises for baseline (main_baseline.py:65-66) and warns
            # for final (main_final.py:88-90); we warn — NaNs may be a chosen
            # masking option (mask_tas_below).
            import warnings

            warnings.warn("NaN values detected in dataset tensors")
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jnp.asarray
        xin = put(x)
        if input_dtype is not None and jnp.dtype(input_dtype) != jnp.float32:
            xin = xin.astype(input_dtype)
        return cls(inputs=xin, outputs=put(y))


def gather_frames(data: jax.Array, idx: jax.Array) -> jax.Array:
    """Single-frame batch: data (N, H, W, C), idx (B,) -> (B, H, W, C)."""
    return jnp.take(data, idx, axis=0)


def gather_windows(data: jax.Array, idx: jax.Array, seq_len: int) -> jax.Array:
    """Sliding-window batch with zero left-padding.

    data (N, H, W, C), idx (B,) target indices -> (B, T, H, W, C) where
    window t covers [idx-T+1, ..., idx]; positions before t=0 are zeros
    (reference main_final.py:123-145).

    Dispatch: XLA take+mask everywhere by default. The Pallas row-DMA kernel
    (ops/window_gather.py) wins 1.67x as a STANDALONE program at seq12
    (tools/parity/kernel_bench_r2.txt) but measures ~7% slower inside the
    full fused training step (seq12 e50 run: 2174 vs 2341 samples/s) — XLA
    fuses its gather into the surrounding step, the kernel can't. Honest
    dispatch keeps XLA; force the kernel with CLIMATE_TPU_WINDOW_GATHER=pallas.
    """
    import os

    if os.environ.get("CLIMATE_TPU_WINDOW_GATHER") == "pallas":
        from ..ops.window_gather import gather_windows_pallas, supported

        platform = jax.default_backend()
        if supported(data.shape, platform):
            return gather_windows_pallas(data, idx, seq_len)
        # forced kernel on an ineligible shape/platform: fall back loudly
        # rather than fail in Mosaic with an opaque reshape error (ADVICE r2)
        import warnings

        warnings.warn(
            f"CLIMATE_TPU_WINDOW_GATHER=pallas but shape {tuple(data.shape)} on "
            f"{platform} is unsupported (needs TPU + H*W*C % 128 == 0); using XLA",
            stacklevel=2,
        )
    offsets = jnp.arange(seq_len, dtype=idx.dtype) - (seq_len - 1)  # [-T+1 .. 0]
    widx = idx[:, None] + offsets[None, :]  # (B, T)
    valid = widx >= 0
    safe = jnp.maximum(widx, 0)
    frames = jnp.take(data, safe.reshape(-1), axis=0)
    frames = frames.reshape(*widx.shape, *data.shape[1:])  # (B, T, H, W, C)
    return frames * valid[..., None, None, None].astype(frames.dtype)


def pad_for_windows(data: jax.Array, seq_len: int) -> jax.Array:
    """Prepend seq_len-1 zero frames ONCE (at dataset setup) so window
    gathers become contiguous slices: original frame i lives at padded
    row i + seq_len - 1, and the window [idx-T+1 .. idx] is exactly
    padded[idx : idx+T]. The zero rows reproduce the reference's zero
    left-padding (main_final.py:123-145) with no per-step mask work."""
    pad = jnp.zeros((seq_len - 1,) + data.shape[1:], data.dtype)
    return jnp.concatenate([pad, data], axis=0)


def gather_windows_slice(padded: jax.Array, idx: jax.Array, seq_len: int) -> jax.Array:
    """Window gather over a pad_for_windows array: one XLA gather with
    slice size T on the time axis (contiguous 580 KB reads at the final
    config vs B*T scattered single-frame rows for the take+mask path) and
    zero masking folded into the stored pad rows. Measured stage cost of
    the take+mask path is 1.75 ms of the 10.9 ms bf16 step
    (tools/parity/step_breakdown_bf16.json) — this is the bandwidth-shaped
    replacement. Semantics == gather_windows (tests/test_data.py)."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(padded, s, seq_len, axis=0)
    )(idx)


def epoch_permutation(rng: np.random.Generator, n: int, batch_size: int, drop_last: bool = False):
    """Shuffled batch index arrays for one epoch (host-side, tiny).

    Matches DataLoader(shuffle=True) semantics; the final short batch is kept
    (drop_last=False default, like torch).
    """
    perm = rng.permutation(n)
    stop = (n // batch_size) * batch_size if drop_last else n
    return [perm[i : i + batch_size] for i in range(0, stop, batch_size)]


def eval_batches(n: int, batch_size: int):
    """Sequential index batches (shuffle=False eval loaders)."""
    return [np.arange(i, min(i + batch_size, n)) for i in range(0, n, batch_size)]
