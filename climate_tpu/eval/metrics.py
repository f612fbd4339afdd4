"""On-device lat-weighted climate metrics (the parity instrument).

jnp re-implementation of the reference's evaluation stack:
- get_lat_weights: cos(lat) normalized to mean 1 (utils_baseline.py:290-309)
- monthly lat-weighted RMSE over (time, y, x), time-mean map RMSE, and
  time-stddev map MAE (main_baseline.py:351-407)
- the Kaggle composite: per-var = 0.1*monthly_rmse + 1.0*time_mean_rmse +
  w_std*time_std_mae (w_std: tas=1.0, pr=0.75), final = 0.5*tas + 0.5*pr
  (_climate_kaggle_metric.py:103-153)

Everything is pure jnp so whole-validation-set evaluation runs in one jit on
device — replacing the reference's per-step .cpu().numpy() sync
(main_baseline.py:345-347, the main throughput sin per SURVEY.md 2.6.7).
All metric math is fp32/fp64 regardless of model compute dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

VAR_WEIGHTS = {"tas": 0.5, "pr": 0.5}
METRIC_VAR_WEIGHTS = {
    "tas": {"monthly_rmse": 0.1, "time_mean": 1.0, "time_std": 1.0},
    "pr": {"monthly_rmse": 0.1, "time_mean": 1.0, "time_std": 0.75},
}


def get_lat_weights(latitude_values) -> np.ndarray:
    """cos(lat) area weights, normalized to mean 1 (utils_baseline.py:290-309)."""
    lat_rad = np.deg2rad(np.asarray(latitude_values, dtype=np.float64))
    w = np.cos(lat_rad)
    return w / np.mean(w)


def _wmean_yx(field, w):
    """Weighted mean over trailing (y, x) axes; w has shape (y,)."""
    xp = jnp if isinstance(field, jnp.ndarray) else np
    w = xp.asarray(w, dtype=field.dtype)
    num = xp.sum(field * w[..., :, None], axis=(-2, -1))
    den = xp.sum(xp.broadcast_to(w[:, None], field.shape[-2:]))
    return num / den


def monthly_rmse(pred, true, w):
    """sqrt of lat-weighted mean over (time, y, x) of squared error.

    pred/true: (time, y, x). Equals the xarray path
    (main_baseline.py:391-393) and the Kaggle path
    (_climate_kaggle_metric.py:126-129).
    """
    xp = jnp if isinstance(pred, jnp.ndarray) else np
    per_t = _wmean_yx((pred - true) ** 2, w)  # (time,)
    return xp.sqrt(xp.mean(per_t))


def time_mean_rmse(pred, true, w):
    """Lat-weighted RMSE of the time-mean maps (main_baseline.py:395-400)."""
    xp = jnp if isinstance(pred, jnp.ndarray) else np
    d = pred.mean(axis=0) - true.mean(axis=0)
    return xp.sqrt(_wmean_yx(d * d, w))


def time_std_mae(pred, true, w):
    """Lat-weighted MAE of the time-stddev maps (main_baseline.py:402-407).

    std is population std (ddof=0), matching xarray/np defaults used by both
    reference paths.
    """
    xp = jnp if isinstance(pred, jnp.ndarray) else np
    d = xp.abs(pred.std(axis=0) - true.std(axis=0))
    return _wmean_yx(d, w)


def evaluate_variable(pred, true, w) -> dict:
    """All three metrics for one variable; pred/true (time, y, x)."""
    return {
        "monthly_rmse": monthly_rmse(pred, true, w),
        "time_mean_rmse": time_mean_rmse(pred, true, w),
        "time_stddev_mae": time_std_mae(pred, true, w),
    }


def evaluate_predictions(preds, trues, lat, output_vars: list[str], phase: str = "val") -> dict:
    """Metric dict keyed like the reference's Lightning log stream
    (main_baseline.py:393-407): `{phase}/{var}/avg/monthly_rmse`, etc.

    preds/trues: (time, C, y, x) in physical units.
    """
    w = get_lat_weights(lat)
    out = {}
    for i, var in enumerate(output_vars):
        m = evaluate_variable(preds[:, i], trues[:, i], w)
        out[f"{phase}/{var}/avg/monthly_rmse"] = m["monthly_rmse"]
        out[f"{phase}/{var}/time_mean_rmse"] = m["time_mean_rmse"]
        out[f"{phase}/{var}/time_stddev_mae"] = m["time_stddev_mae"]
    return out


def kaggle_composite_score(preds, trues, lat, output_vars: list[str]):
    """The competition composite (lower is better), computed on device.

    Matches _climate_kaggle_metric.py:103-153 (its sum-normalized weights are
    equivalent to mean-normalized weights inside a weighted mean).
    """
    w = get_lat_weights(lat)
    total = 0.0
    for i, var in enumerate(output_vars):
        m = evaluate_variable(preds[:, i], trues[:, i], w)
        mw = METRIC_VAR_WEIGHTS[var]
        var_score = (
            mw["monthly_rmse"] * m["monthly_rmse"]
            + mw["time_mean"] * m["time_mean_rmse"]
            + mw["time_std"] * m["time_stddev_mae"]
        )
        total = total + VAR_WEIGHTS[var] * var_score
    return total
