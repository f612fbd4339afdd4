"""Prediction-ensemble scorer (round-2 beyond-parity, VERDICT item 10).

Averages val predictions (physical units) from N runs' *_valpreds.npz files
(written by parity_run.py --save-preds) and reports the composite + the
per-member composites. All members must share the same val split (same
pipeline/val config) — asserted via identical target arrays.

  python tools/ensemble_eval.py tools/parity/jax_*_seed*_valpreds.npz

--weighted additionally fits PER-VARIABLE convex member weights plus a
per-variable variance re-inflation alpha (SLSQP per variable — the composite
is separable across variables). The parameters are fit on the val split
itself — standard competition stacking, but a form of val selection; both
the uniform-mean and weighted scores are reported so the distinction stays
visible (round 3: 5 members, uniform 0.5822 -> weighted 0.5676 -> +alpha
see PARITY.md)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUTPUT_VARS = ["tas", "pr"]


def _var_score(pred, true, w_lat, var):
    """One variable's composite term (climate_tpu.eval.calibrate)."""
    from climate_tpu.eval.calibrate import variable_score

    return variable_score(pred, true, w_lat, var)


def search_weights(M: np.ndarray, trues, lat, seed: int = 0):
    """Per-variable convex member weights + a variance re-inflation factor
    alpha, fit by SLSQP on each variable's own composite term (the composite
    is separable per variable, so the two fits are independent).

    alpha counteracts the time-std shrinkage of mean-ensembling: the blended
    prediction is recentred per pixel as m + alpha*(pred - m) with m the
    pixel's time mean, so alpha>1 restores the inter-month variability the
    std-MAE term scores while leaving the time-mean map untouched.
    M: (N, T, C, H, W) member predictions."""
    from scipy.optimize import minimize

    from climate_tpu.eval.metrics import get_lat_weights

    n = M.shape[0]
    w_lat = get_lat_weights(lat)
    weights, alphas, var_scores = [], [], []

    for c, var in enumerate(OUTPUT_VARS):
        Mv, tv = M[:, :, c], trues[:, c].astype(np.float32)

        def obj(p):
            w = np.maximum(p[:n], 0.0)
            s = w.sum()
            w = w / s if s > 0 else np.full(n, 1.0 / n)
            pred = np.tensordot(w, Mv, axes=1)
            m = pred.mean(axis=0, keepdims=True)
            pred = m + p[n] * (pred - m)
            return _var_score(pred, tv, w_lat, var)

        starts = [np.full(n, 1.0 / n)]
        solo = [obj(np.concatenate([np.eye(n)[i], [1.0]])) for i in range(n)]
        starts.append(np.eye(n)[int(np.argmin(solo))])
        best = None
        for w0 in starts:
            res = minimize(
                obj,
                np.concatenate([w0, [1.0]]),
                method="SLSQP",
                bounds=[(0.0, 1.0)] * n + [(0.7, 1.6)],
                constraints=[{"type": "eq", "fun": lambda p: p[:n].sum() - 1.0}],
                options={"maxiter": 200, "ftol": 1e-8},
            )
            if best is None or res.fun < best.fun:
                best = res
        w = np.maximum(best.x[:n], 0.0)
        w /= w.sum()
        weights.append(w)
        alphas.append(float(best.x[n]))
        var_scores.append(float(best.fun))

    from climate_tpu.eval.metrics import VAR_WEIGHTS

    total = sum(VAR_WEIGHTS[v] * s for v, s in zip(OUTPUT_VARS, var_scores))
    return total, weights, alphas


def holdout_check(M, trues, lat):
    """Generalization check for the stacking fit: fit weights+alpha on the
    FIRST half of the val months, score frozen on the SECOND half, against
    the uniform mean on the same second half. If the frozen-fit score beats
    uniform out-of-sample, the stacking gain is calibration, not val
    memorization."""
    from climate_tpu.eval.metrics import VAR_WEIGHTS, get_lat_weights

    h = M.shape[1] // 2
    _, weights, alphas = search_weights(M[:, :h], trues[:h], lat)
    w_lat = get_lat_weights(lat)

    def apply_and_score(sl):
        total = 0.0
        for c, var in enumerate(OUTPUT_VARS):
            pred = np.tensordot(weights[c], M[:, sl, c], axes=1)
            m = pred.mean(axis=0, keepdims=True)
            pred = m + alphas[c] * (pred - m)
            total += VAR_WEIGHTS[var] * _var_score(
                pred, trues[sl, c].astype(np.float32), w_lat, var
            )
        return total

    def uniform_score(sl):
        total = 0.0
        for c, var in enumerate(OUTPUT_VARS):
            total += VAR_WEIGHTS[var] * _var_score(
                M[:, sl, c].mean(axis=0), trues[sl, c].astype(np.float32),
                w_lat, var,
            )
        return total

    second = slice(h, M.shape[1])
    return {
        "fit_months": h,
        "eval_months": M.shape[1] - h,
        "frozen_fit_second_half": apply_and_score(second),
        "uniform_second_half": uniform_score(second),
    }


def main(paths: list[str], weighted: bool = False, holdout: bool = False,
         align_tail: bool = False) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from climate_tpu.eval.metrics import kaggle_composite_score

    # --align-tail: allow members from different pipelines whose val splits
    # share a common TAIL — the final pipeline's 1080-month val is the
    # ensemble pipeline's 1021-month val (member 2's full ssp370 stream)
    # prefixed with 59 member-1 months, so cropping everyone to the shortest
    # member's tail puts them on identical rows (truths agree to fp32
    # roundtrip, ~2e-4 K; asserted below with a physical-units tolerance).
    loaded = [np.load(p) for p in paths]
    tmin = min(z["preds"].shape[0] for z in loaded)
    members, trues, lat = [], None, None
    per_member = {}
    for p, z in zip(paths, loaded):
        preds, tr = z["preds"], z["trues"]
        if align_tail:
            preds, tr = preds[-tmin:], tr[-tmin:]
        if trues is None:
            trues, lat = tr, z["lat"]
        elif align_tail:
            assert trues.shape == tr.shape and np.allclose(trues, tr, atol=1e-2), (
                f"{p}: val split tail differs beyond fp32 roundtrip"
            )
        else:
            assert np.allclose(trues, tr), f"{p}: val split differs (try --align-tail)"
        members.append(preds)
        per_member[os.path.basename(p)] = float(
            kaggle_composite_score(preds, trues, lat, OUTPUT_VARS)
        )

    # f32 keeps the 5-9 member x 1021-month search tractable on the 1-core
    # host; the reported scores are cross-checked with the canonical scorer
    M = np.stack(members).astype(np.float32)
    result = {
        "n_members": len(members),
        "member_composites": per_member,
        "ensemble_composite": float(
            kaggle_composite_score(M.mean(0).astype(np.float32), trues, lat, OUTPUT_VARS)
        ),
    }
    if weighted:
        best, weights, alphas = search_weights(M, trues, lat)
        # cross-check with the canonical scorer (the optimizer uses the
        # separable per-var terms; these must agree)
        blend = np.empty_like(M[0])
        for c in range(len(OUTPUT_VARS)):
            p = np.tensordot(weights[c], M[:, :, c], axes=1)
            m = p.mean(axis=0, keepdims=True)
            blend[:, c] = m + alphas[c] * (p - m)
        check = float(
            kaggle_composite_score(blend.astype(np.float32), trues, lat, OUTPUT_VARS)
        )
        assert abs(check - best) < 5e-4, (check, best)
        result["weighted_composite"] = best
        result["weighted_composite_canonical_scorer"] = check
        result["weights"] = {
            var: {os.path.basename(p): round(float(w), 4) for p, w in zip(paths, wv)}
            for var, wv in zip(OUTPUT_VARS, weights)
        }
        result["std_inflation_alpha"] = {
            var: round(a, 4) for var, a in zip(OUTPUT_VARS, alphas)
        }
        result["note"] = "weights+alpha fit on val (competition stacking); uniform mean above is selection-free"
    if holdout:
        result["holdout"] = holdout_check(M, trues, lat)
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        raise SystemExit(__doc__)
    main(args, weighted="--weighted" in flags, holdout="--holdout" in flags,
         align_tail="--align-tail" in flags)
