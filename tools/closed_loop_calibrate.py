#!/usr/bin/env python
"""Offline split-half calibration of a closed-loop val-window rollout.

The val-window scorer (cli/rollout.py rollout.val_window=true) persists the
(pred, truth) pair to <run>/rollout/valwin_closed_loop.npz. This tool fits
variance-inflation alphas on the FIRST half of the scored months and reports
the SECOND half raw vs calibrated — an honest holdout estimate of how much
post-hoc calibration buys in closed loop (training-time alphas from
training.fit_calibration are fit on teacher-forced train preds and
underestimate the inflation an autoregressive — and especially an ensemble —
rollout needs). No TPU required: pure numpy/scipy on the saved arrays.

  python tools/closed_loop_calibrate.py <valwin_closed_loop.npz> [more.npz...]

Prints one JSON line per file: split-half alphas, first/second-half raw and
second-half calibrated composites, plus full-window raw for cross-checking
against the rollout log.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from climate_tpu.eval.calibrate import apply_variance_inflation, fit_variance_inflation  # noqa: E402
from climate_tpu.eval.metrics import kaggle_composite_score  # noqa: E402


def analyze(path: str, train_alphas: dict[str, float] | None = None) -> dict:
    d = np.load(path, allow_pickle=False)
    preds, truth, lat = d["preds"], d["truth"], d["lat"]
    output_vars = [str(v) for v in d["output_vars"]]
    t = preds.shape[0]
    half = t // 2

    def score(p, y):
        return float(kaggle_composite_score(p, y, lat, output_vars))

    alphas = fit_variance_inflation(preds[:half], truth[:half], lat, output_vars)
    calibrated_2nd = apply_variance_inflation(preds[half:], alphas, output_vars)
    out = {
        "npz": path,
        "months": int(t),
        "alphas_fit_first_half": alphas,
        "full_raw": score(preds, truth),
        "first_half_raw": score(preds[:half], truth[:half]),
        "second_half_raw": score(preds[half:], truth[half:]),
        "second_half_calibrated": score(calibrated_2nd, truth[half:]),
    }
    if train_alphas:
        # "variance-calibrated scoring" with TRAIN-fitted alphas
        # (training.fit_calibration: fit on teacher-forced TRAIN preds —
        # zero val-label use, so this full-window number is as honest as
        # raw; same convention as the round-4 solo 0.8842 -> 0.8088 row)
        cal = apply_variance_inflation(preds, train_alphas, output_vars)
        out["train_alphas"] = train_alphas
        out["full_train_calibrated"] = score(cal, truth)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    train_alphas = None
    if "--train-alphas" in args:
        i = args.index("--train-alphas")
        vals = [float(x) for x in args[i + 1].split(",")]
        args = args[:i] + args[i + 2:]
        train_alphas = {"tas": vals[0], "pr": vals[1]}
    if not args:
        raise SystemExit(__doc__)
    for p in args:
        print(json.dumps(analyze(p, train_alphas)))
