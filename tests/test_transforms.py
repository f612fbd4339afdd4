"""Normalization golden-value + round-trip tests (SURVEY.md build stage 1)."""

import numpy as np
import pytest

from climate_tpu.transforms.normalize import (
    EPS_FINAL,
    compute_stats,
    global_zscore_stats,
    inverse_transform,
    normalize,
    stats_from_json,
    stats_to_json,
)


def _data():
    rng = np.random.default_rng(0)
    return np.abs(rng.normal(2.0, 1.0, (20, 3, 4, 6))) + 0.1  # positive for log/sqrt


class TestGoldenValues:
    def test_zscore_forward_uses_eps_inverse_bare_std(self):
        # The reference asymmetry (utils_final.py:76 vs :161, SURVEY.md 2.6.6)
        data = _data()
        stats = compute_stats(data, ["a", "b", "c"], {"a": {"method": "zscore"}})
        p = stats[0]["params"]
        expected = (data[:, 0] - p["mean"]) / (p["std"] + EPS_FINAL)
        got = normalize(data, stats)[:, 0]
        np.testing.assert_allclose(got, expected, rtol=1e-12)
        inv = inverse_transform(normalize(data, stats), stats)[:, 0]
        # bare-std inverse => round trip differs by exactly eps/std factor
        np.testing.assert_allclose(inv, expected * p["std"] + p["mean"], rtol=1e-12)

    def test_baseline_zscore_no_eps_roundtrip_exact(self):
        data = _data()
        stats = global_zscore_stats(data)
        inv = inverse_transform(normalize(data, stats), stats)
        np.testing.assert_allclose(inv, data, rtol=1e-10)

    def test_log1p_standardizes_transformed_stats(self):
        # main_final.py:377-380: mean/std are of log1p(data)
        data = _data()
        stats = compute_stats(data, ["a"], {"a": {"method": "log1p"}})
        p = stats[0]["params"]
        tr = np.log1p(data[:, 0])
        assert p["mean"] == pytest.approx(np.nanmean(tr))
        assert p["std"] == pytest.approx(np.nanstd(tr))
        got = normalize(data[:, :1], stats)[:, 0]
        np.testing.assert_allclose(got, (tr - p["mean"]) / (p["std"] + EPS_FINAL), rtol=1e-12)

    def test_minimax_with_config_override(self):
        # rsdt recipe: min=0 max=550 (configs/data/data_final.yaml:38-41)
        data = _data()
        stats = compute_stats(data, ["rsdt"], {"rsdt": {"method": "minimax", "min": 0, "max": 550}})
        got = normalize(data[:, :1], stats)[:, 0]
        np.testing.assert_allclose(got, data[:, 0] / 550.0, rtol=1e-12)
        inv = inverse_transform(got[:, None], stats)[:, 0]
        np.testing.assert_allclose(inv, data[:, 0], rtol=1e-10)

    def test_minimax_zero_range_guard(self):
        data = np.full((5, 1, 2, 2), 3.0)
        stats = compute_stats(data, ["x"], {"x": {"method": "minimax"}})
        got = normalize(data, stats)
        np.testing.assert_allclose(got, 0.0)  # scale clamps to 1.0

    @pytest.mark.parametrize("method,inv_tol", [("sqrt", 1e-6), ("pow", 1e-6)])
    def test_sqrt_pow_roundtrip(self, method, inv_tol):
        data = _data()
        cfg = {"x": {"method": method}}
        if method == "pow":
            cfg["x"]["lambda"] = 0.5
        stats = compute_stats(data[:, :1], ["x"], cfg)
        norm = normalize(data[:, :1], stats)
        inv = inverse_transform(norm, stats)
        np.testing.assert_allclose(inv, data[:, :1], rtol=1e-4, atol=inv_tol)

    def test_pow_requires_lambda(self):
        with pytest.raises(ValueError, match="lambda"):
            compute_stats(_data()[:, :1], ["x"], {"x": {"method": "pow"}})


class TestDeviceParity:
    def test_jnp_matches_numpy(self):
        import jax.numpy as jnp

        data = _data().astype(np.float32)
        stats = compute_stats(
            data,
            ["a", "b", "c"],
            {"a": {"method": "log1p"}, "b": {"method": "minimax"}, "c": {"method": "zscore"}},
        )
        np_out = normalize(data.astype(np.float64), stats)  # fp64 ground truth
        j_out = normalize(jnp.asarray(data), stats)  # fp32 on device
        np.testing.assert_allclose(np.asarray(j_out), np_out, rtol=1e-4, atol=5e-4)
        np_inv = inverse_transform(np_out, stats)
        j_inv = inverse_transform(jnp.asarray(np_out, dtype=jnp.float32), stats)
        np.testing.assert_allclose(np.asarray(j_inv), np_inv, rtol=1e-4, atol=5e-4)

    def test_channels_last_axis(self):
        data = _data().astype(np.float32)
        stats = compute_stats(data, ["a", "b", "c"], None)
        nhwc = np.moveaxis(data, 1, -1)
        got = normalize(nhwc, stats, channel_axis=-1)
        np.testing.assert_allclose(np.moveaxis(got, -1, 1), normalize(data, stats), rtol=1e-6)


def test_stats_json_roundtrip():
    data = _data()
    stats = compute_stats(data, ["a", "b", "c"], {"a": {"method": "log1p"}})
    rt = stats_from_json(stats_to_json(stats))
    assert rt == stats
