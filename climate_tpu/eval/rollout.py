"""Autoregressive multi-decade rollout inference as a single lax.scan.

The reference has no rollout machinery — its temporal axis tops out at a
seq_len<=12 sliding-window dataset (main_final.py:97-154) evaluated
frame-by-frame through DataLoaders. The extended capability (BASELINE.json
config 5: "seq_len=12 with autoregressive multi-decade rollout inference")
is built here the TPU way: one compiled scan over the months of a scenario.

Because the emulator maps *forcings* -> (tas, pr), the scenario's forcing
sequence is known for the whole horizon; the rollout advances a seq_len
window over it month by month (zero left-padding at the start, exactly like
the training windows) and emits a prediction per month.

Feedback semantics (round-2 redesign): autoregression is only physically
meaningful when the model was TRAINED with previous-month outputs as input
channels (`data.feedback_vars=[tas, pr]` appends teacher-forced `prev_<var>`
channels in the ETL). At rollout time, `feedback_slots` maps each output
channel onto its `prev_<var>` input channel; the scan carries a rolling
buffer of the last seq_len predictions and writes prediction(month-1) into
frame `month`'s prev channel — for EVERY frame of the window, not just the
last. The prev channels share the output variables' normalization stats
(experiment.py pins them equal), so normalized predictions feed back with no
re-normalization. Overwriting forcing channels (CO2/SO2/...) with
predictions — round 1's behavior — is rejected at the CLI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout(
    apply_fn,
    variables,
    forcings,
    seq_len: int,
    *,
    feedback_slots: dict[int, int] | None = None,
    init_history: jnp.ndarray | None = None,
):
    """Predict every month of a scenario with one compiled scan.

    Args:
      apply_fn: model forward, (variables, (B, T, H, W, C_in)) -> (B, H, W, C_out).
      variables: model variables (params [+ batch_stats]).
      forcings: (T_total, H, W, C_in) normalized forcing sequence. When
        feedback_slots is set, the mapped input channels are overwritten
        frame-by-frame with the scan's own predictions (their stored values —
        teacher-forced prev outputs or zeros — are ignored).
      seq_len: window length the model was trained with.
      feedback_slots: {output_channel: input_channel} — input channel receives
        the previous month's prediction for that output channel. None/{} =
        pure forced run (prev channels, if any, keep their stored values).
      init_history: optional (seq_len, H, W, C_out) normalized outputs for the
        months *before* the horizon start, seeding the feedback buffer. Two
        uses: (a) seed row [-1] with the true month-0 outputs to reproduce the
        training-time clamp prev[0]=out[0] (ETL: "a physical value, not an
        unphysical zero"); (b) start a rollout mid-scenario (e.g. the val
        window) with true outputs of the preceding months. Default zeros =
        the z-space mean — a train/inference mismatch at the horizon start
        that only matters for the first seq_len months (ADVICE round 2).

    Returns:
      (T_total, H, W, C_out) normalized predictions.
    """
    t_total, h, w, c_in = forcings.shape
    slots = dict(feedback_slots or {})

    # left-pad so the window for month 0 is [0-pad..., frame0]
    padded = jnp.concatenate(
        [jnp.zeros((seq_len - 1, h, w, c_in), forcings.dtype), forcings], axis=0
    )

    c_out_probe = jax.eval_shape(
        lambda v, x: apply_fn(v, x), variables, padded[None, :seq_len]
    )
    c_out = c_out_probe.shape[-1]

    def step(carry, t):
        # carry: (seq_len, H, W, C_out) — predictions for months
        # t-seq_len .. t-1 (zeros before the horizon start: the mean in
        # normalized z-space, matching the zero left-padding of training
        # windows).
        preds_hist = carry
        window = jax.lax.dynamic_slice_in_dim(padded, t, seq_len, axis=0)
        for out_c, in_c in slots.items():
            # frame k is month t-seq_len+1+k; its prev channel is the
            # prediction for month t-seq_len+k = preds_hist[k]
            window = window.at[..., in_c].set(preds_hist[..., out_c])
        pred = apply_fn(variables, window[None])[0]  # (H, W, C_out)
        new_hist = jnp.concatenate([preds_hist[1:], pred[None]], axis=0)
        return new_hist, pred

    if init_history is None:
        init = jnp.zeros((seq_len, h, w, c_out), c_out_probe.dtype)
    else:
        init = jnp.asarray(init_history, c_out_probe.dtype)
        if init.shape != (seq_len, h, w, c_out):
            raise ValueError(
                f"init_history shape {init.shape} != {(seq_len, h, w, c_out)}"
            )
    _, preds = jax.lax.scan(step, init, jnp.arange(t_total))
    return preds


def rollout_jit(apply_fn, seq_len: int, feedback_slots: dict[int, int] | None = None,
                with_history: bool = False):
    """jit-wrapped rollout with static window config. with_history adds an
    init_history positional arg (seed the feedback buffer, see rollout())."""
    slots = tuple(sorted((feedback_slots or {}).items()))

    if with_history:
        def run(variables, forcings, init_history):
            return rollout(apply_fn, variables, forcings, seq_len,
                           feedback_slots=dict(slots), init_history=init_history)
    else:
        def run(variables, forcings):
            return rollout(apply_fn, variables, forcings, seq_len, feedback_slots=dict(slots))

    return jax.jit(run)


def feedback_slots_from_names(
    input_vars: list[str], output_vars: list[str]
) -> dict[int, int]:
    """Derive {output_channel: input_channel} from `prev_<var>` input names.

    Returns {} when the model has no prev channels (not feedback-trained).
    """
    slots: dict[int, int] = {}
    for i, name in enumerate(input_vars):
        if name.startswith("prev_") and name[5:] in output_vars:
            slots[output_vars.index(name[5:])] = i
    return slots
