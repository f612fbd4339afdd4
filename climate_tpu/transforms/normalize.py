"""Per-variable normalization as pure functions over an index-keyed stats map.

Unifies the reference's two Normalizer variants:
- utils_baseline.py:32-109 — global per-channel z-score, forward divides by
  the bare std (no epsilon), inverse multiplies by the bare std.
- utils_final.py:32-206 — per-variable method map (zscore/minimax/log1p/sqrt/
  pow), forward divides by (std + 1e-8) but the inverse multiplies by the
  bare std (asymmetry preserved on purpose, SURVEY.md 2.6.6).

The eps difference is encoded per-channel in params["eps"], so one code path
serves both pipelines. Stats are plain floats -> JSON-serializable, and are
included in checkpoints (fixing the reference's resume gap, SURVEY.md section
5 checkpoint note).

Stat computation mirrors main_final.py:349-441: per-channel mean/std over
(time, y, x) for zscore; data min/max (or config overrides) for minimax;
mean/std *of the transformed data* for log1p/sqrt/pow.
"""

from __future__ import annotations

import json
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

EPS_FINAL = 1e-8

# stats map: {channel_index: {"method": str, "params": {str: float}}}
StatsMap = dict[int, dict[str, Any]]


def compute_stats(
    data: np.ndarray,
    var_names: list[str],
    transform_map: dict[str, dict] | None,
    eps: float = EPS_FINAL,
) -> StatsMap:
    """Build the index-keyed stats map from training data (time, C, y, x)."""
    transform_map = transform_map or {}
    stats: StatsMap = {}
    for i, var in enumerate(var_names):
        user_cfg = transform_map.get(var, {"method": "zscore"})
        method = user_cfg.get("method", "zscore")
        sl = data[:, i, :, :]
        params: dict[str, float] = {"eps": float(eps)}
        if method == "zscore":
            params["mean"] = float(np.nanmean(sl))
            params["std"] = float(np.nanstd(sl))
        elif method == "minimax":
            params["min_val"] = float(user_cfg.get("min", np.nanmin(sl)))
            params["max_val"] = float(user_cfg.get("max", np.nanmax(sl)))
        elif method == "log1p":
            tr = np.log1p(sl)
            params["mean"] = float(np.nanmean(tr))
            params["std"] = float(np.nanstd(tr))
        elif method == "sqrt":
            tr = np.sqrt(sl)
            params["mean"] = float(np.nanmean(tr))
            params["std"] = float(np.nanstd(tr))
        elif method == "pow":
            lam = user_cfg.get("lambda")
            if lam is None:
                raise ValueError(f"'lambda' must be provided for 'pow' method for variable '{var}'")
            params["lambda"] = float(lam)
            tr = sl ** lam
            params["mean"] = float(np.nanmean(tr))
            params["std"] = float(np.nanstd(tr))
        else:
            raise ValueError(f"Unknown method {method!r} for var {var!r}")
        stats[i] = {"method": method, "params": params}
    return stats


def global_zscore_stats(data: np.ndarray, eps: float = 0.0) -> StatsMap:
    """Baseline-pipeline stats: per-channel z-score, no epsilon
    (utils_baseline.py:32-109; stats main_baseline.py:211-217)."""
    mean = np.nanmean(data, axis=(0, 2, 3))
    std = np.nanstd(data, axis=(0, 2, 3))
    return {
        i: {"method": "zscore", "params": {"mean": float(mean[i]), "std": float(std[i]), "eps": float(eps)}}
        for i in range(data.shape[1])
    }


def _fwd_channel(method: str, p: dict) -> Callable:
    eps = p.get("eps", 0.0)
    if method == "zscore":
        return lambda x, xp: (x - p["mean"]) / (p["std"] + eps)
    if method == "minimax":
        rng = p["max_val"] - p["min_val"]
        scale = rng if not np.isclose(rng, 0.0) else 1.0
        return lambda x, xp: (x - p["min_val"]) / scale
    if method == "log1p":
        return lambda x, xp: (xp.log1p(x) - p["mean"]) / (p["std"] + eps)
    if method == "sqrt":
        return lambda x, xp: (xp.sqrt(x) - p["mean"]) / (p["std"] + eps)
    if method == "pow":
        return lambda x, xp: (x ** p["lambda"] - p["mean"]) / (p["std"] + eps)
    raise ValueError(f"Unknown method {method!r}")


def _inv_channel(method: str, p: dict) -> Callable:
    # Inverses multiply by the BARE std (utils_final.py:161,177,186,195).
    if method == "zscore":
        return lambda x, xp: x * p["std"] + p["mean"]
    if method == "minimax":
        return lambda x, xp: x * (p["max_val"] - p["min_val"]) + p["min_val"]
    if method == "log1p":
        return lambda x, xp: xp.expm1(x * p["std"] + p["mean"])
    if method == "sqrt":
        return lambda x, xp: (x * p["std"] + p["mean"]) ** 2
    if method == "pow":
        return lambda x, xp: (x * p["std"] + p["mean"]) ** (1.0 / p["lambda"])
    raise ValueError(f"Unknown method {method!r}")


def _apply(data, stats: StatsMap, channel_fn_builder, channel_axis: int):
    xp = jnp if isinstance(data, jnp.ndarray) else np
    n_chan = data.shape[channel_axis]
    slices = []
    for c in range(n_chan):
        sl = xp.take(data, c, axis=channel_axis)
        cfg = stats.get(c)
        if cfg is None:
            slices.append(sl)  # pass-through, matching utils_final.py:63-66
            continue
        fn = channel_fn_builder(cfg["method"], cfg["params"])
        slices.append(fn(sl, xp))
    return xp.stack(slices, axis=channel_axis)


def normalize(data, stats: StatsMap, channel_axis: int = 1):
    """Forward transform. Works on numpy (host ETL) or jnp (on device)."""
    return _apply(data, stats, _fwd_channel, channel_axis)


def inverse_transform(data, stats: StatsMap, channel_axis: int = 1):
    """Inverse transform back to physical units (device or host)."""
    return _apply(data, stats, _inv_channel, channel_axis)


def stats_to_json(stats: StatsMap) -> str:
    return json.dumps({str(k): v for k, v in stats.items()})


def stats_from_json(s: str) -> StatsMap:
    return {int(k): v for k, v in json.loads(s).items()}
