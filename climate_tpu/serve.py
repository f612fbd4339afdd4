"""Serving API: load a checkpoint once, predict from forcings on demand.

The reference has no inference API at all — predictions only fall out of a
Lightning test loop (SURVEY.md 3.5). This module is the production-serving
surface: a `Predictor` owns the restored variables + normalizer stats and
exposes physical-unit predictions for arbitrary forcing windows, jit-compiled
per input shape and reusable across calls.

    from climate_tpu.serve import Predictor
    p = Predictor.from_checkpoint("outputs/.../checkpoints/best",
                                  model_type="unet_convlstm_attention")
    tas_pr = p.predict(forcings_nhwc)          # (B, T, H, W, C_in) -> (B, H, W, 2)
    series = p.rollout(scenario_forcings)      # (T, H, W, C_in) -> (T, H, W, 2)
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from .models import get_model
from .train.checkpoint import META_FILE
from .transforms import normalize as tf


class Predictor:
    def __init__(self, model, variables, input_stats: tf.StatsMap, output_stats: tf.StatsMap,
                 seq_len: int | None = None, input_var_names: list[str] | None = None,
                 output_var_names: list[str] | None = None,
                 calibration: dict[str, float] | None = None,
                 is_ensemble: bool = False,
                 member_weights=None):
        self.model = model
        self.variables = variables
        self.input_stats = input_stats
        self.output_stats = output_stats
        self.seq_len = seq_len
        self.input_var_names = list(input_var_names or [])
        self.output_var_names = list(output_var_names or [])
        # per-variable variance re-inflation alphas (eval/calibrate.py);
        # applied to time-series outputs (rollout) where a time mean exists
        self.calibration = dict(calibration or {})
        # is_ensemble: variables carry a leading member axis (stacked same-
        # architecture checkpoints); forward = vmap over members, mean of
        # their predictions (see ensemble_from_checkpoints)
        self._is_ensemble = bool(is_ensemble)
        # member_weights: convex blend over the member axis instead of the
        # uniform mean (serving-side mirror of cli/rollout.py
        # rollout.member_weights; normalized here so callers pass raw scores)
        if member_weights is not None:
            w = jnp.asarray(member_weights, jnp.float32)
            if w.ndim != 1 or bool((w < 0).any()) or float(w.sum()) <= 0:
                raise ValueError("member_weights must be non-negative with a positive sum")
            member_weights = w / w.sum()
        self._member_weights = member_weights
        self.grid: tuple[int, int] | None = None  # (H, W) the weights were built for
        self._forward = jax.jit(self._apply)

    def _check_grid(self, x) -> None:
        if self.grid is not None and tuple(x.shape[-3:-1]) != tuple(self.grid):
            raise ValueError(
                f"input grid {tuple(x.shape[-3:-1])} does not match the grid this "
                f"checkpoint was restored for {tuple(self.grid)}; pass grid=(H, W) "
                f"to from_checkpoint for non-reference grids"
            )

    def _apply(self, v, x):
        if self._is_ensemble:
            preds = jax.vmap(lambda vv: self.model.apply(vv, x))(v)
            if self._member_weights is not None:
                return jnp.tensordot(self._member_weights, preds, axes=1)
            return preds.mean(axis=0)
        return self.model.apply(v, x)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path: str,
        model_type: str = "unet_convlstm_attention",
        model_kwargs: dict | None = None,
        input_vars: list[str] | None = None,
        output_vars: list[str] | None = None,
        seasonal_embeddings: bool = True,
        seq_len: int | None = 6,
        calibration: dict[str, float] | None = None,
        grid: tuple[int, int] | None = None,
    ) -> "Predictor":
        """Restore weights + normalizer stats (saved in the checkpoint meta —
        no dataset access needed, unlike the reference which must recompute
        stats from data on every restore)."""
        meta_path = ckpt_path.rstrip("/") + "." + META_FILE
        if not os.path.exists(meta_path):
            raise FileNotFoundError(f"checkpoint meta not found: {meta_path}")
        with open(meta_path) as f:
            meta = json.load(f)
        input_stats = {int(k): v for k, v in meta["input_stats"].items()}
        output_stats = {int(k): v for k, v in meta["output_stats"].items()}

        # Round-2 checkpoints are self-describing: meta["data"] carries the
        # full resolved channel naming (incl. seasonal + prev_* channels) and
        # the trained seq_len; explicit arguments still win.
        data_meta = meta.get("data", {})
        channel_names = data_meta.get("input_vars")
        output_vars = output_vars or data_meta.get("output_vars") or ["tas", "pr"]
        if channel_names:
            n_in = len(channel_names)
            seasonal_embeddings = False  # already materialized in channel_names
            input_vars = input_vars or [v for v in channel_names
                                        if v not in ("sin_month", "cos_month")
                                        and not v.startswith("prev_")]
        else:
            input_vars = input_vars or ["CO2", "SO2", "CH4", "BC", "rsdt"]
            n_in = len(input_vars) + (2 if seasonal_embeddings else 0)
            channel_names = list(input_vars) + (
                ["sin_month", "cos_month"] if seasonal_embeddings else []
            )
        cfg = {
            "model": {"type": model_type, **(model_kwargs or {})},
            "data": {
                "input_vars": input_vars,
                "output_vars": output_vars,
                "seasonal_embeddings": seasonal_embeddings,
            },
            "training": {},
        }
        model = get_model(cfg)

        from .models import is_sequence_model

        seq = (data_meta.get("seq_len") or seq_len) if is_sequence_model(cfg) else None
        # Grid resolution: self-describing checkpoints (round 5+) record it in
        # meta["data"]["grid"]; explicit argument wins; the (48, 72) reference
        # grid (SURVEY.md L0) is only a LABELED fallback for legacy
        # checkpoints — predict()/rollout() assert inputs match, so a
        # different-grid deployment fails loudly instead of mis-initializing
        # (VERDICT r4 weak #5).
        grid = tuple(grid or data_meta.get("grid") or (48, 72))
        if seq is not None:
            example = jnp.zeros((1, seq, *grid, n_in), jnp.float32)
        else:
            example = jnp.zeros((1, *grid, n_in), jnp.float32)
        # checkpoints store the full TrainState; restore just the variables
        # (restore_state migrates round-1 constant-schedule opt_state layouts)
        from .train.checkpoint import restore_state
        from .train.state import build_optimizer, create_train_state

        state_template = create_train_state(model, jax.random.PRNGKey(0), example, build_optimizer(1e-3))
        restored = restore_state(ckpt_path, state_template)
        p = cls(model, restored.variables(), input_stats, output_stats, seq_len=seq,
                input_var_names=channel_names, output_var_names=output_vars,
                calibration=calibration or meta.get("calibration"))
        p.grid = grid
        return p

    @classmethod
    def ensemble_from_checkpoints(cls, ckpt_paths: list[str],
                                  weights: list[float] | None = None,
                                  **kwargs) -> "Predictor":
        """Serving-side ensemble: restore N same-architecture checkpoints,
        stack their variables along a member axis, and predict/roll out the
        member BLEND — uniform mean by default, or a convex combination when
        `weights` is given (e.g. 1/score**2 from each member's val composite;
        normalized internally; rollout feeds the blend back — closed-loop
        ensembling, same mechanism as cli/rollout.py rollout.extra_ckpts +
        rollout.member_weights). Normalizer stats and calibration come from
        the first checkpoint (the members share a data config by
        construction; a structure mismatch between member pytrees raises)."""
        if weights is not None and len(weights) != len(ckpt_paths):
            raise ValueError(
                f"weights has {len(weights)} entries for {len(ckpt_paths)} checkpoints"
            )
        members = [cls.from_checkpoint(p, **kwargs) for p in ckpt_paths]
        base = members[0]
        if len(members) == 1:
            return base
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[m.variables for m in members])
        p = cls(base.model, stacked, base.input_stats, base.output_stats,
                seq_len=base.seq_len, input_var_names=base.input_var_names,
                output_var_names=base.output_var_names,
                calibration=base.calibration, is_ensemble=True,
                member_weights=weights)
        p.grid = base.grid
        return p

    # ------------------------------------------------------------------
    def predict(self, forcings, normalized: bool = False):
        """Forcings (B, [T,] H, W, C_in) physical units -> (B, H, W, C_out)
        physical units."""
        x = jnp.asarray(forcings, jnp.float32)
        self._check_grid(x)
        if not normalized:
            x = jnp.nan_to_num(tf.normalize(x, self.input_stats, channel_axis=-1), nan=0.0)
        pred_norm = self._forward(self.variables, x)
        return tf.inverse_transform(pred_norm.astype(jnp.float32), self.output_stats, channel_axis=-1)

    def rollout(self, scenario_forcings, normalized: bool = False, feedback: bool = False):
        """Scenario forcings (T, H, W, C_in) -> (T, H, W, C_out), one scan.

        feedback=True feeds each month's prediction into the next month's
        prev_<var> input channels — only valid for models trained with
        data.feedback_vars (see eval/rollout.py); raises otherwise instead of
        corrupting forcing channels."""
        from .eval.rollout import feedback_slots_from_names, rollout_jit

        if self.seq_len is None:
            raise ValueError("rollout requires a sequence model")
        slots = feedback_slots_from_names(self.input_var_names, self.output_var_names)
        if feedback and not slots:
            raise ValueError(
                "feedback=True requires a model trained with data.feedback_vars "
                "(prev_* input channels); this checkpoint has none."
            )
        x = jnp.asarray(scenario_forcings, jnp.float32)
        self._check_grid(x)
        if not normalized:
            x = jnp.nan_to_num(tf.normalize(x, self.input_stats, channel_axis=-1), nan=0.0)
        run = rollout_jit(
            self._apply,
            seq_len=self.seq_len,
            feedback_slots=slots if feedback else None,
        )
        pred_norm = run(self.variables, x)
        out = tf.inverse_transform(pred_norm.astype(jnp.float32), self.output_stats, channel_axis=-1)
        return self._calibrate_rollout(out)

    def _calibrate_rollout(self, out):
        """Variance re-inflation over the rollout's time axis
        (eval/calibrate.py; channel-last (T, H, W, C) layout here)."""
        if not self.calibration:
            return out
        for c, var in enumerate(self.output_var_names):
            a = float(self.calibration.get(var, 1.0))
            if a != 1.0:
                m = out[..., c].mean(axis=0, keepdims=True)
                out = out.at[..., c].set(m + a * (out[..., c] - m))
        return out
