"""Kaggle submission writer + CSV-path scorer.

- to_kaggle_dataframe vectorizes the reference's quadruple Python loop
  (utils_baseline.py:312-352: 360*2*48*72 = 2.49M rows built one dict at a
  time) into numpy string formatting — same IDs, same row order.
- score_csv re-implements the competition scorer (_climate_kaggle_metric.py:
  22-154): parse row IDs `t{ttt}_{var}_{lat}_{lon}`, rebuild (time, lat, lon)
  fields, compute sum-normalized cos-lat weighted metrics and the composite.

The equivalence test (tests/test_kaggle_equivalence.py) asserts this CSV path
agrees with the on-device jnp path (eval/metrics.py), porting the reference's
one load-bearing test (_test_kaggle_metric.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .metrics import METRIC_VAR_WEIGHTS, VAR_WEIGHTS


def format_ids(time_coords, lat_coords, lon_coords, var_names) -> np.ndarray:
    """Row IDs in reference order: time-major, then var, lat, lon."""
    ids = []
    lat_s = [f"{lat:.2f}" for lat in lat_coords]
    lon_s = [f"{lon:.2f}" for lon in lon_coords]
    for t_idx, _ in enumerate(time_coords):
        for var in var_names:
            prefix = f"t{t_idx:03d}_{var}_"
            for la in lat_s:
                for lo in lon_s:
                    ids.append(prefix + la + "_" + lo)
    return np.array(ids)


def to_kaggle_dataframe(predictions, time_coords, lat_coords, lon_coords, var_names) -> pd.DataFrame:
    """(time, C, y, x) predictions -> DataFrame [ID, Prediction]."""
    n_t, n_c, n_y, n_x = predictions.shape
    assert n_c == len(var_names)
    ids = format_ids(time_coords, lat_coords, lon_coords, var_names)
    values = np.asarray(predictions).reshape(-1)
    return pd.DataFrame({"ID": ids, "Prediction": values})


def save_submission(predictions, time_coords, lat_coords, lon_coords, var_names, filepath: str) -> str:
    df = to_kaggle_dataframe(predictions, time_coords, lat_coords, lon_coords, var_names)
    df.to_csv(filepath, index=False)
    return filepath


_ID_RE = re.compile(r"t(\d+)_([a-z]+)_(-?\d+\.?\d*)_(-?\d+\.?\d*)")


def _parse_ids(ids: pd.Series) -> pd.DataFrame:
    parts = ids.str.extract(_ID_RE)
    if parts.isna().any().any():
        bad = ids[parts.isna().any(axis=1)].iloc[0]
        raise ValueError(f"Invalid ID format: {bad}")
    return pd.DataFrame(
        {
            "time": parts[0].astype(int),
            "variable": parts[1],
            "lat": parts[2].astype(float),
            "lon": parts[3].astype(float),
        }
    )


def score_csv(solution: pd.DataFrame, submission: pd.DataFrame, row_id_column_name: str = "ID") -> float:
    """Competition scorer over ID/Prediction frames (lower is better)."""
    for col in (row_id_column_name, "Prediction"):
        if col not in submission.columns:
            raise ValueError(f"Submission must have columns: {row_id_column_name}, 'Prediction'")
    merged = solution.merge(submission, on=row_id_column_name, how="left", suffixes=("_true", "_pred"))
    if merged["Prediction_pred"].isna().any():
        raise ValueError("Submission is missing predictions for some IDs")

    comp = _parse_ids(merged[row_id_column_name])
    merged = pd.concat([merged, comp], axis=1)

    lats = np.array(sorted(merged["lat"].unique()))
    w = np.cos(np.radians(lats))
    w = w / w.sum()  # sum-normalized, _climate_kaggle_metric.py:103-107

    var_scores = {}
    for var in merged["variable"].unique():
        vd = merged[merged["variable"] == var].sort_values(["time", "lat", "lon"])
        times = vd["time"].nunique()
        lons = vd["lon"].nunique()
        true_3d = vd["Prediction_true"].to_numpy().reshape(times, len(lats), lons)
        pred_3d = vd["Prediction_pred"].to_numpy().reshape(times, len(lats), lons)

        sq = (true_3d - pred_3d) ** 2
        m_rmse = np.sqrt(np.mean(np.sum(np.mean(sq, axis=0) * w[:, None], axis=0)))

        tm = (true_3d.mean(0) - pred_3d.mean(0)) ** 2
        tm_rmse = np.sqrt(np.mean(np.sum(tm * w[:, None], axis=0)))

        ts = np.abs(true_3d.std(0) - pred_3d.std(0))
        ts_mae = np.mean(np.sum(ts * w[:, None], axis=0))

        mw = METRIC_VAR_WEIGHTS[var]
        var_scores[var] = (
            mw["monthly_rmse"] * m_rmse + mw["time_mean"] * tm_rmse + mw["time_std"] * ts_mae
        )

    return float(sum(VAR_WEIGHTS[v] * s for v, s in var_scores.items()))
