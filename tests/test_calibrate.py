"""Variance re-inflation calibration (climate_tpu/eval/calibrate.py)."""

from __future__ import annotations

import numpy as np
import pytest

from climate_tpu.eval.calibrate import (
    apply_variance_inflation,
    fit_variance_inflation,
    variable_score,
)
from climate_tpu.eval.metrics import get_lat_weights, kaggle_composite_score

VARS = ["tas", "pr"]


def _synthetic(shrink: float = 0.8, seed: int = 0):
    """Truth with seasonal structure; prediction = truth with its
    inter-month deviations shrunk by `shrink` (the MSE under-dispersion
    signature) plus small noise."""
    rng = np.random.default_rng(seed)
    t, h, w = 48, 12, 18
    base = rng.normal(280, 5, size=(1, 2, h, w))
    season = 8 * np.sin(2 * np.pi * np.arange(t) / 12)[:, None, None, None]
    truth = base + season + rng.normal(0, 1.5, size=(t, 2, h, w))
    m = truth.mean(axis=0, keepdims=True)
    pred = m + shrink * (truth - m) + rng.normal(0, 0.2, size=truth.shape)
    lat = np.linspace(-60, 60, h)
    return pred.astype(np.float32), truth.astype(np.float32), lat


class TestVarianceInflation:
    def test_fit_recovers_shrinkage(self):
        pred, truth, lat = _synthetic(shrink=0.8)
        alphas = fit_variance_inflation(pred, truth, lat, VARS)
        # deviations were shrunk by 0.8 -> optimal re-inflation ~1/0.8
        for var in VARS:
            assert alphas[var] == pytest.approx(1.25, abs=0.08)

    def test_apply_improves_composite_and_keeps_time_mean(self):
        pred, truth, lat = _synthetic(shrink=0.8)
        alphas = fit_variance_inflation(pred, truth, lat, VARS)
        cal = apply_variance_inflation(pred, alphas, VARS)
        before = kaggle_composite_score(pred, truth, lat, VARS)
        after = kaggle_composite_score(cal, truth, lat, VARS)
        assert after < before
        # the recentring leaves each pixel's time mean untouched
        np.testing.assert_allclose(
            cal.mean(axis=0), pred.mean(axis=0), rtol=1e-5, atol=1e-4
        )

    def test_alpha_one_is_identity(self):
        pred, _, _ = _synthetic()
        out = apply_variance_inflation(pred, {"tas": 1.0, "pr": 1.0}, VARS)
        np.testing.assert_array_equal(out, pred.astype(np.float32))

    def test_variable_score_matches_composite_decomposition(self):
        pred, truth, lat = _synthetic()
        w_lat = get_lat_weights(lat)
        total = 0.5 * variable_score(pred[:, 0], truth[:, 0], w_lat, "tas") + \
            0.5 * variable_score(pred[:, 1], truth[:, 1], w_lat, "pr")
        assert total == pytest.approx(
            float(kaggle_composite_score(pred, truth, lat, VARS)), rel=1e-5
        )


class TestPredictorCalibration:
    def test_rollout_applies_stored_alphas(self):
        """Predictor._calibrate_rollout re-inflates per variable, channel-last,
        matching eval.calibrate.apply_variance_inflation exactly."""
        import jax.numpy as jnp

        from climate_tpu.serve import Predictor

        t, h, w = 10, 4, 6
        rng = np.random.default_rng(1)
        out = jnp.asarray(rng.normal(size=(t, h, w, 2)).astype(np.float32))
        alphas = {"tas": 1.3, "pr": 1.1}
        p = Predictor(
            model=None, variables=None, input_stats={}, output_stats={},
            seq_len=6, output_var_names=VARS, calibration=alphas,
        )
        got = np.asarray(p._calibrate_rollout(out))
        # reference: the framework helper on (T, C, H, W)
        want = apply_variance_inflation(
            np.moveaxis(np.asarray(out), -1, 1), alphas, VARS
        )
        np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), rtol=1e-5, atol=1e-5)
