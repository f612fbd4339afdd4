"""Post-hoc prediction calibration (beyond-parity; the reference has none).

MSE training produces conditional-mean predictions, which systematically
under-disperse the month-to-month variability the competition's time-std MAE
term scores (most severely for precipitation). Variance re-inflation
recenters each pixel's time series around its own time mean,

    calibrated = m + alpha * (pred - m),   m = pred.mean(time)

so alpha > 1 restores inter-month variability while leaving the time-mean
map (and therefore the time-mean RMSE term) untouched.

`fit_variance_inflation` fits one alpha per output variable by minimizing
that variable's composite term on a (pred, true) pair — typically the val
split (standard competition stacking; flag it as val selection) or, for a
selection-free estimate, the train split. `apply_variance_inflation`
applies a stored alpha map to new predictions (e.g. test submissions).

Measured effect (tools/ensemble_eval.py --weighted, PARITY.md): 5-member
ensemble 0.5822 -> 0.4703; split-half holdout confirms the gain is
calibration, not val memorization.
"""

from __future__ import annotations

import numpy as np

from .metrics import METRIC_VAR_WEIGHTS, get_lat_weights, monthly_rmse, time_mean_rmse, time_std_mae


def variable_score(pred, true, w_lat, var: str) -> float:
    """One variable's composite term (0.1*monthly + 1.0*mean + w_std*std)."""
    mw = METRIC_VAR_WEIGHTS[var]
    return float(
        mw["monthly_rmse"] * monthly_rmse(pred, true, w_lat)
        + mw["time_mean"] * time_mean_rmse(pred, true, w_lat)
        + mw["time_std"] * time_std_mae(pred, true, w_lat)
    )


def apply_variance_inflation(preds: np.ndarray, alphas: dict[str, float],
                             output_vars: list[str]) -> np.ndarray:
    """(T, C, H, W) predictions -> calibrated copy, per-variable alpha."""
    out = np.array(preds, dtype=np.float32, copy=True)
    for c, var in enumerate(output_vars):
        a = float(alphas.get(var, 1.0))
        if a == 1.0:
            continue
        m = out[:, c].mean(axis=0, keepdims=True)
        out[:, c] = m + a * (out[:, c] - m)
    return out


def fit_variance_inflation(preds: np.ndarray, trues: np.ndarray, lat,
                           output_vars: list[str],
                           bounds: tuple[float, float] = (0.5, 2.0)) -> dict[str, float]:
    """Fit one variance-inflation alpha per variable on (preds, trues).

    (T, C, H, W) arrays in physical units. Uses bounded golden-section
    search per variable (the objective is 1-D and well-behaved)."""
    from scipy.optimize import minimize_scalar

    w_lat = get_lat_weights(lat)
    alphas = {}
    for c, var in enumerate(output_vars):
        p = np.asarray(preds[:, c], np.float32)
        t = np.asarray(trues[:, c], np.float32)
        m = p.mean(axis=0, keepdims=True)
        dev = p - m

        res = minimize_scalar(
            lambda a: variable_score(m + a * dev, t, w_lat, var),
            bounds=bounds, method="bounded",
            options={"xatol": 1e-4},
        )
        alphas[var] = round(float(res.x), 4)
    return alphas
