"""Orbax checkpointing: params + opt state + step + normalizer stats.

Covers the reference's ModelCheckpoint behavior (monitor val/loss, keep
best + last, resume via ckpt_path — configs/trainer/default.yaml:12-18,
main_baseline.py:536-540) and fixes its gap: the reference never checkpoints
normalizer statistics, silently recomputing them from data on resume
(SURVEY.md section 5). Here the stats map rides along in every checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp

from ..transforms.normalize import StatsMap
from .state import TrainState

META_FILE = "climate_meta.json"


class CheckpointManager:
    """best/ and last/ checkpoints under <run_dir>/checkpoints."""

    def __init__(self, run_dir: str, monitor: str = "val/loss", mode: str = "min", save_last: bool = True):
        self.dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.best_value: float | None = None
        self._ckptr = ocp.StandardCheckpointer()

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" else value > self.best_value

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
        return improved

    def restore(self, state_template: TrainState, name: str = "last") -> tuple[TrainState, dict]:
        path = os.path.join(self.dir, name)
        state = self._ckptr.restore(path, state_template)
        with open(os.path.join(self.dir, f"{name}.{META_FILE}")) as f:
            meta = json.load(f)
        meta["input_stats"] = {int(k): v for k, v in meta["input_stats"].items()}
        meta["output_stats"] = {int(k): v for k, v in meta["output_stats"].items()}
        return state, meta


def restore_from_path(ckpt_path: str, state_template: TrainState) -> tuple[TrainState, dict]:
    """Load an arbitrary checkpoint directory (cfg.ckpt_path resume)."""
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(ckpt_path), state_template)
    meta_path = os.path.join(ckpt_path + "." + META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        for key in ("input_stats", "output_stats"):
            if key in meta:
                meta[key] = {int(k): v for k, v in meta[key].items()}
    return state, meta
