"""Autoregressive multi-decade rollout inference as a single lax.scan.

The reference has no rollout machinery — its temporal axis tops out at a
seq_len<=12 sliding-window dataset (main_final.py:97-154) evaluated
frame-by-frame through DataLoaders. The extended capability (BASELINE.json
config 5: "seq_len=12 with autoregressive multi-decade rollout inference")
is built here the TPU way: one compiled scan over the months of a scenario.

Because the emulator maps *forcings* -> (tas, pr), the scenario's forcing
sequence is known for the whole horizon; the rollout advances a seq_len
window over it month by month (zero left-padding at the start, exactly like
the training windows) and emits a prediction per month. If output channels
are ever fed back as inputs (`feedback=True` with matching channel slots),
the scan carries predictions into the next window — true autoregression.

Everything stays on device; host sees one final (T, H, W, C_out) array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout(apply_fn, variables, forcings, seq_len: int, *, feedback_channels: tuple[int, ...] = ()):
    """Predict every month of a scenario with one compiled scan.

    Args:
      apply_fn: model forward, (variables, (B, T, H, W, C_in)) -> (B, H, W, C_out).
      variables: model variables (params [+ batch_stats]).
      forcings: (T_total, H, W, C_in) normalized forcing sequence.
      seq_len: window length the model was trained with.
      feedback_channels: input channel indices to overwrite with the previous
        month's prediction (autoregressive feedback; () = pure forced run).

    Returns:
      (T_total, H, W, C_out) normalized predictions.
    """
    t_total, h, w, c_in = forcings.shape

    # left-pad so the window for month 0 is [0-pad..., frame0]
    padded = jnp.concatenate(
        [jnp.zeros((seq_len - 1, h, w, c_in), forcings.dtype), forcings], axis=0
    )

    def step(carry, t):
        prev_pred = carry  # (H, W, C_out) or None-like zeros
        window = jax.lax.dynamic_slice_in_dim(padded, t, seq_len, axis=0)
        if feedback_channels:
            # overwrite configured channels of the last frame with feedback
            last = window[-1]
            for j, ch in enumerate(feedback_channels):
                last = last.at[..., ch].set(prev_pred[..., j])
            window = window.at[-1].set(last)
        pred = apply_fn(variables, window[None])[0]  # (H, W, C_out)
        return pred, pred

    c_out_probe = apply_fn(variables, padded[None, :seq_len])  # trace-time shape probe
    init = jnp.zeros(c_out_probe.shape[1:], c_out_probe.dtype)
    _, preds = jax.lax.scan(step, init, jnp.arange(t_total))
    return preds


def rollout_jit(apply_fn, seq_len: int, feedback_channels: tuple[int, ...] = ()):
    """jit-wrapped rollout with static window config."""
    def run(variables, forcings):
        return rollout(apply_fn, variables, forcings, seq_len, feedback_channels=feedback_channels)

    return jax.jit(run)
