"""Logging: process-0-deduped stdlib logger + CSV metric stream + optional
wandb.

Replaces the reference's three channels (SURVEY.md section 5 observability):
rank_zero_only stdlib logging (utils_baseline.py:14-24), Lightning self.log
scalar streams, and the optional guarded wandb import
(main_baseline.py:20-23). Metric names are kept identical so runs can be
diffed against reference logs.
"""

from __future__ import annotations

import csv
import logging
import os
from typing import Any

import jax

try:  # optional, like the reference's guarded import
    import wandb  # type: ignore
except ImportError:
    wandb = None


def is_main_process() -> bool:
    # Avoid jax.process_index(): it initializes the backend, which would pin
    # the platform before the CLI can honor trainer.accelerator. Multi-host
    # process id is available without backend init via the distributed state.
    try:
        from jax._src import distributed

        return (distributed.global_state.process_id or 0) == 0
    except Exception:
        return True


def get_logger(name: str = __name__, level=logging.INFO) -> logging.Logger:
    """Multi-host-friendly logger: only process 0 emits."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level if is_main_process() else logging.CRITICAL)
    logger.propagate = False
    return logger


class MetricsLogger:
    """Appends scalar metric dicts to <run_dir>/metrics.csv; mirrors the
    reference's Lightning scalar stream names. Optionally forwards to wandb."""

    def __init__(self, run_dir: str, use_wandb: bool = False, wandb_kwargs: dict | None = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.csv_path = os.path.join(run_dir, "metrics.csv")
        self._fieldnames: list[str] | None = None
        self._wandb_run = None
        if use_wandb and wandb is not None and is_main_process():
            self._wandb_run = wandb.init(dir=run_dir, **(wandb_kwargs or {}))

    @property
    def wandb_active(self) -> bool:
        return self._wandb_run is not None

    def log(self, metrics: dict[str, Any], step: int) -> None:
        if not is_main_process():
            return
        row = {"step": step}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        write_header = self._fieldnames is None
        if write_header:
            self._fieldnames = list(row)
        elif any(k not in self._fieldnames for k in row):
            self._fieldnames += [k for k in row if k not in self._fieldnames]
            self._rewrite_with_header()
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames)
            if write_header and f.tell() == 0:
                w.writeheader()
            w.writerow(row)
        if self._wandb_run is not None:
            self._wandb_run.log(metrics, step=step)

    def log_image(self, name: str, fig, step: int) -> None:
        """Forward a matplotlib figure under a wandb-style name (e.g.
        `img/tas/time_mean`, matching main_baseline.py:410-442). With wandb
        off, the figure lands as <run_dir>/media/<name>.png (latest wins; the
        per-epoch archive lives under plots/), keeping the stream
        name-for-name diffable against the reference's."""
        if not is_main_process():
            return
        if self._wandb_run is not None:
            self._wandb_run.log({name: wandb.Image(fig)}, step=step)
        else:
            path = os.path.join(self.run_dir, "media", name.replace("/", "_") + ".png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            fig.savefig(path, dpi=72)

    def log_histogram(self, name: str, values, step: int, bins: int = 64) -> None:
        """Per-layer gradient/weight histograms (the reference's
        wandb.watch(model, log="all"), utils_baseline.py:122: names
        `gradients/<param>` and `parameters/<param>`). Fallback: JSON lines in
        <run_dir>/histograms.jsonl with counts+edges."""
        if not is_main_process():
            return
        import numpy as np

        flat = np.asarray(values, dtype=np.float32).ravel()
        counts, edges = np.histogram(flat, bins=bins)
        if self._wandb_run is not None:
            self._wandb_run.log(
                {name: wandb.Histogram(np_histogram=(counts.tolist(), edges.tolist()))},
                step=step,
            )
        else:
            import json

            with open(os.path.join(self.run_dir, "histograms.jsonl"), "a") as f:
                f.write(json.dumps({
                    "step": step, "name": name,
                    "counts": counts.tolist(),
                    "edges": [float(e) for e in edges],
                }) + "\n")

    def _rewrite_with_header(self) -> None:
        if not os.path.exists(self.csv_path):
            return
        with open(self.csv_path) as f:
            rows = list(csv.DictReader(f))
        with open(self.csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames)
            w.writeheader()
            for r in rows:
                w.writerow(r)

    def finish(self) -> None:
        if self._wandb_run is not None:
            self._wandb_run.finish()
