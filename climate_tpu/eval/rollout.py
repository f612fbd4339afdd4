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
    history_alphas: jnp.ndarray | None = None,
    history_ema_decay: float = 0.98,
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
      history_alphas: optional (C_out,) per-output-channel variance-inflation
        factors applied to the FED-BACK history (not the returned
        predictions): each history value is re-dispersed around a causal
        per-pixel running mean, fed = m_t + alpha * (pred - m_t), where m_t
        is a bias-corrected EMA of the scan's own predictions (the in-scan
        analogue of eval/calibrate.py's post-hoc re-inflation, which needs
        the full series and so can't run inside the scan). MSE-trained
        models under-disperse, so the raw fed-back history is
        out-of-distribution vs the teacher-forced history seen in training;
        alpha > 1 restores the variability. None = feed raw (default).
      history_ema_decay: EMA decay for the running mean m_t (0.98 at monthly
        steps ~ a 4-year memory; bias-corrected so early months are the
        plain mean of the predictions so far).

    Returns:
      (T_total, H, W, C_out) normalized predictions.
    """
    t_total, h, w, c_in = forcings.shape
    slots = dict(feedback_slots or {})
    if history_alphas is not None:
        history_alphas = jnp.asarray(history_alphas, jnp.float32)

    # left-pad so the window for month 0 is [0-pad..., frame0]
    padded = jnp.concatenate(
        [jnp.zeros((seq_len - 1, h, w, c_in), forcings.dtype), forcings], axis=0
    )

    c_out_probe = jax.eval_shape(
        lambda v, x: apply_fn(v, x), variables, padded[None, :seq_len]
    )
    c_out = c_out_probe.shape[-1]

    def assemble_and_apply(preds_hist, fed, t):
        window = jax.lax.dynamic_slice_in_dim(padded, t, seq_len, axis=0)
        for out_c, in_c in slots.items():
            # frame k is month t-seq_len+1+k; its prev channel is the
            # prediction for month t-seq_len+k = fed[k]
            window = window.at[..., in_c].set(fed[..., out_c])
        pred = apply_fn(variables, window[None])[0]  # (H, W, C_out)
        new_hist = jnp.concatenate([preds_hist[1:], pred[None]], axis=0)
        return new_hist, pred

    if history_alphas is None:
        def step(carry, t):
            # carry: (seq_len, H, W, C_out) — predictions for months
            # t-seq_len .. t-1 (zeros before the horizon start: the mean in
            # normalized z-space, matching the zero left-padding of training
            # windows).
            new_hist, pred = assemble_and_apply(carry, carry, t)
            return new_hist, pred
    else:
        def step(carry, t):
            # carry additionally holds m_acc (H, W, C_out), the running-mean
            # EMA accumulator for the in-scan history calibration.
            preds_hist, m_acc = carry
            # bias-corrected EMA of the scan's own predictions so far; at
            # month t the correction 1 - d^t makes m_t the plain mean of
            # the first few predictions instead of a zero-biased EMA.
            d = jnp.float32(history_ema_decay)
            m_t = m_acc / jnp.maximum(1.0 - d ** t.astype(jnp.float32), 1e-6)
            fed = m_t[None] + history_alphas * (
                preds_hist.astype(jnp.float32) - m_t[None]
            )
            new_hist, pred = assemble_and_apply(
                preds_hist, fed.astype(preds_hist.dtype), t
            )
            m_acc = d * m_acc + (1.0 - d) * pred.astype(jnp.float32)
            return (new_hist, m_acc), pred

    if init_history is None:
        init = jnp.zeros((seq_len, h, w, c_out), c_out_probe.dtype)
    else:
        init = jnp.asarray(init_history, c_out_probe.dtype)
        if init.shape != (seq_len, h, w, c_out):
            raise ValueError(
                f"init_history shape {init.shape} != {(seq_len, h, w, c_out)}"
            )
    carry0 = init if history_alphas is None else (
        init, jnp.zeros((h, w, c_out), jnp.float32)
    )
    _, preds = jax.lax.scan(step, carry0, jnp.arange(t_total))
    return preds


def rollout_jit(apply_fn, seq_len: int, feedback_slots: dict[int, int] | None = None,
                with_history: bool = False,
                history_alphas=None, history_ema_decay: float = 0.98):
    """jit-wrapped rollout with static window config. with_history adds an
    init_history positional arg (seed the feedback buffer); history_alphas
    turns on in-scan calibration of the fed-back history (see rollout())."""
    slots = tuple(sorted((feedback_slots or {}).items()))
    alphas = None if history_alphas is None else jnp.asarray(history_alphas, jnp.float32)

    if with_history:
        def run(variables, forcings, init_history):
            return rollout(apply_fn, variables, forcings, seq_len,
                           feedback_slots=dict(slots), init_history=init_history,
                           history_alphas=alphas, history_ema_decay=history_ema_decay)
    else:
        def run(variables, forcings):
            return rollout(apply_fn, variables, forcings, seq_len, feedback_slots=dict(slots),
                           history_alphas=alphas, history_ema_decay=history_ema_decay)

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
