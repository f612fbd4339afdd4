"""Orbax checkpointing: params + opt state + step + normalizer stats.

Covers the reference's ModelCheckpoint behavior (monitor val/loss, keep
best + last, resume via ckpt_path — configs/trainer/default.yaml:12-18,
main_baseline.py:536-540) and fixes its gap: the reference never checkpoints
normalizer statistics, silently recomputing them from data on resume
(SURVEY.md section 5). Here the stats map rides along in every checkpoint.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

import jax
import optax
import orbax.checkpoint as ocp

from ..transforms.normalize import StatsMap
from .state import TrainState

META_FILE = "climate_meta.json"

log = logging.getLogger(__name__)


def _legacy_template(template: TrainState) -> TrainState:
    """Round-1 opt_state layout: build_optimizer passed a *float* LR to
    scale_by_learning_rate, so 'constant' runs saved a stateless ScaleState
    where current checkpoints save ScaleByScheduleState(count). This maps a
    current template to that legacy layout for restore-time migration."""
    legacy_opt = tuple(
        optax.ScaleState() if isinstance(s, optax.ScaleByScheduleState) else s
        for s in template.opt_state
    )
    return template.replace(opt_state=legacy_opt)


def _migrate_legacy_opt_state(state: TrainState, template: TrainState) -> TrainState:
    """Rebuild the schedule-state counters a legacy checkpoint lacks: the
    schedule count equals the Adam step count (both tick once per update)."""
    count = None
    for s in state.opt_state:
        if isinstance(s, optax.ScaleByAdamState):
            count = s.count
    if count is None:  # no adam state found — fall back to the global step
        count = state.step
    new_opt = tuple(
        optax.ScaleByScheduleState(count=count) if isinstance(t, optax.ScaleByScheduleState) else s
        for s, t in zip(state.opt_state, template.opt_state)
    )
    return state.replace(opt_state=new_opt)


def restore_state(path: str, state_template: TrainState) -> TrainState:
    """Restore a TrainState, migrating round-1 (constant-schedule) opt_state
    layouts: on a pytree-structure mismatch, retry with the legacy template
    and synthesize the missing ScaleByScheduleState from the Adam count
    (ADVICE round 2: old flagship/anchor checkpoints must stay restorable)."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    try:
        return ckptr.restore(path, state_template)
    except Exception as e:  # noqa: BLE001 — orbax raises ValueError subclasses
        legacy = _legacy_template(state_template)
        if jax.tree_util.tree_structure(legacy.opt_state) == jax.tree_util.tree_structure(
            state_template.opt_state
        ):
            raise  # template has no schedule state — mismatch is something else
        try:
            state = ckptr.restore(path, legacy)
        except Exception:
            raise e  # surface the original error, not the fallback's
        log.warning(
            "Checkpoint %s has a round-1 (constant-schedule) opt_state layout; "
            "migrated by rebuilding ScaleByScheduleState from the Adam count.",
            path,
        )
        return _migrate_legacy_opt_state(state, state_template)


class CheckpointManager:
    """best/ and last/ checkpoints under <run_dir>/checkpoints; with
    save_top_k > 1, additionally keeps the k best epochs as epoch_<N>/
    (Lightning ModelCheckpoint(save_top_k=k) semantics,
    configs/trainer/default.yaml:13). The top-k ledger is rebuilt from the
    on-disk meta files on init, so it survives restarts."""

    def __init__(self, run_dir: str, monitor: str = "val/loss", mode: str = "min",
                 save_last: bool = True, save_top_k: int = 1):
        self.dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.save_top_k = max(int(save_top_k), 1)
        self.best_value: float | None = None
        self._ckptr = ocp.StandardCheckpointer()
        # (value, name) best-first; rebuilt from disk for restart safety
        self.topk: list[tuple[float, str]] = []
        if self.save_top_k > 1:
            for fn in os.listdir(self.dir):
                if fn.startswith("epoch_") and fn.endswith("." + META_FILE):
                    name = fn[: -len("." + META_FILE)]
                    try:
                        with open(os.path.join(self.dir, fn)) as f:
                            value = json.load(f)["metrics"][self.monitor]
                        self.topk.append((float(value), name))
                    except (KeyError, ValueError, OSError):
                        continue
            self._sort_topk()
            if self.topk:
                self.best_value = self.topk[0][0]

    def _sort_topk(self) -> None:
        self.topk.sort(key=lambda t: t[0], reverse=(self.mode != "min"))

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" else value > self.best_value

    def update_meta(self, extra: dict[str, Any]) -> list[str]:
        """Merge keys into every existing checkpoint meta file (best/last/
        epoch_*). Used for post-training additions like the train-fitted
        variance calibration (experiment._fit_train_calibration), which is
        only known after the epoch loop has written the checkpoints."""
        updated = []
        for fn in os.listdir(self.dir):
            if not fn.endswith("." + META_FILE):
                continue
            path = os.path.join(self.dir, fn)
            with open(path) as f:
                meta = json.load(f)
            meta.update(extra)
            with open(path, "w") as f:
                json.dump(meta, f)
            updated.append(fn[: -len("." + META_FILE)])
        return updated

    def _save(self, name: str, state: TrainState, meta: dict) -> None:
        path = os.path.join(self.dir, name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.dir, f"{name}.{META_FILE}"), "w") as f:
            json.dump(meta, f)

    def save(
        self,
        state: TrainState,
        metrics: dict[str, Any],
        epoch: int,
        input_stats: StatsMap,
        output_stats: StatsMap,
        extra_meta: dict[str, Any] | None = None,
    ) -> bool:
        """Save last (always) and best (if monitor improved). Returns whether
        this checkpoint became the new best."""
        meta = {
            "epoch": epoch,
            "step": int(state.step),
            "metrics": {k: float(v) for k, v in metrics.items()},
            "input_stats": {str(k): v for k, v in input_stats.items()},
            "output_stats": {str(k): v for k, v in output_stats.items()},
            **(extra_meta or {}),
        }
        if self.save_last:
            self._save("last", state, meta)
        value = metrics.get(self.monitor)
        improved = value is not None and self._is_better(float(value))
        if improved:
            self.best_value = float(value)
            self._save("best", state, meta)
        if self.save_top_k > 1 and value is not None:
            v = float(value)
            if len(self.topk) < self.save_top_k or self._beats_worst(v):
                name = f"epoch_{epoch}"
                self._save(name, state, meta)
                self.topk.append((v, name))
                self._sort_topk()
                while len(self.topk) > self.save_top_k:
                    _, worst = self.topk.pop()
                    self._delete(worst)
        return improved

    def _beats_worst(self, value: float) -> bool:
        worst = self.topk[-1][0]
        return value < worst if self.mode == "min" else value > worst

    def _delete(self, name: str) -> None:
        import shutil

        path = os.path.join(self.dir, name)
        shutil.rmtree(path, ignore_errors=True)
        meta_path = os.path.join(self.dir, f"{name}.{META_FILE}")
        if os.path.exists(meta_path):
            os.remove(meta_path)

    def restore(self, state_template: TrainState, name: str = "last") -> tuple[TrainState, dict]:
        path = os.path.join(self.dir, name)
        state = restore_state(path, state_template)
        with open(os.path.join(self.dir, f"{name}.{META_FILE}")) as f:
            meta = json.load(f)
        meta["input_stats"] = {int(k): v for k, v in meta["input_stats"].items()}
        meta["output_stats"] = {int(k): v for k, v in meta["output_stats"].items()}
        return state, meta


def restore_from_path(ckpt_path: str, state_template: TrainState) -> tuple[TrainState, dict]:
    """Load an arbitrary checkpoint directory (cfg.ckpt_path resume)."""
    state = restore_state(ckpt_path, state_template)
    meta_path = os.path.join(ckpt_path + "." + META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        for key in ("input_stats", "output_stats"):
            if key in meta:
                meta[key] = {int(k): v for k, v in meta[key].items()}
    return state, meta
