"""Zarr reader + ETL parity tests against reproducible reference facts."""

import os

import numpy as np
import pytest

from tests.conftest import requires_data

INPUT_VARS = ["CO2", "SO2", "CH4", "BC", "rsdt"]
OUTPUT_VARS = ["tas", "pr"]
TRAIN_SSPS = ["ssp126", "ssp370", "ssp585"]


@requires_data
class TestZarrReader:
    def test_array_inventory(self, zarr_group):
        for name in INPUT_VARS + OUTPUT_VARS + ["time", "y", "x", "ssp", "member_id"]:
            assert name in zarr_group

    def test_shapes_and_dims(self, zarr_group):
        assert zarr_group.meta("tas").shape == (4, 1021, 3, 48, 72)
        assert zarr_group.meta("tas").dims == ("ssp", "time", "member_id", "y", "x")
        assert zarr_group.meta("CO2").shape == (4, 1021)
        assert zarr_group.meta("rsdt").shape == (4, 1021, 48, 72)

    def test_golden_stats(self, zarr_group):
        # Notebook cell 10 outputs (SURVEY.md section 6): tas mu=210.59 K
        # sigma=122.93; pr mu=1.894 sigma=2.801 mm/day.
        tas = zarr_group.read("tas")
        assert np.nanmean(tas) == pytest.approx(210.59, abs=0.01)
        assert np.nanstd(tas) == pytest.approx(122.93, abs=0.01)
        pr = zarr_group.read("pr")
        assert np.nanmean(pr) == pytest.approx(1.894, abs=0.001)
        assert np.nanstd(pr) == pytest.approx(2.801, abs=0.001)

    def test_native_loader_matches_ctypes_path(self, zarr_group):
        from climate_tpu.data import blosc as pyblosc
        from climate_tpu.data.native_loader import native_available, native_decode_chunks
        import os

        if not native_available():
            pytest.skip("native loader not built")
        cdir = os.path.join(zarr_group.path, "rsdt")
        paths = sorted(
            os.path.join(cdir, f) for f in os.listdir(cdir) if not f.startswith(".")
        )[:4]
        meta = zarr_group.meta("rsdt")
        nbytes = int(np.prod(meta.chunks)) * meta.dtype.itemsize
        native = native_decode_chunks(paths, nbytes)
        assert native is not None
        for p, buf in zip(paths, native):
            with open(p, "rb") as f:
                ref = pyblosc.decompress(f.read())
            assert bytes(buf[: len(ref)]) == bytes(ref)


@requires_data
@pytest.mark.slow  # full-store ETL on 1 core: minutes per split build
class TestETL:
    def test_month_index_noleap_exact(self, zarr_group):
        from climate_tpu.data.etl import month_index

        mi = month_index(zarr_group)
        # exact noleap arithmetic as ground truth
        mlens = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
        cum = np.concatenate([[0], np.cumsum(mlens)])
        days = zarr_group.read("time") + 14  # store starts 2015-01-15
        exact = np.searchsorted(cum, days % 365, "right") - 1
        np.testing.assert_array_equal(mi, exact)

    def test_broadcast_globals(self, zarr_group):
        from climate_tpu.data.etl import load_ssp_arrays

        x, y = load_ssp_arrays(zarr_group, "ssp126", INPUT_VARS, OUTPUT_VARS, [0])
        assert x.shape == (1021, 5, 48, 72)
        assert y.shape == (1021, 2, 48, 72)
        # CO2 is global: constant over the spatial grid per timestep
        # (NaN-aware: sanitization maps the store's corrupted scalars to NaN)
        co2 = x[:, 0]
        eq = (co2 == co2[:, :1, :1]) | (np.isnan(co2) & np.isnan(co2[:, :1, :1]))
        assert np.all(eq)
        # rsdt channel is spatially resolved
        assert np.std(x[100, 4]) > 0

    def test_sanitize_corrupted_globals(self, zarr_group):
        from climate_tpu.data.etl import load_ssp_arrays

        # the public store carries bit-corrupted CO2/CH4 scalars (|x|>1e30)
        x_raw, _ = load_ssp_arrays(
            zarr_group, "ssp370", ["CO2", "CH4"], OUTPUT_VARS, [0], sanitize_threshold=None
        )
        assert np.abs(x_raw).max() > 1e30
        x_clean, _ = load_ssp_arrays(
            zarr_group, "ssp370", ["CO2", "CH4"], OUTPUT_VARS, [0], sanitize_threshold=1e10
        )
        finite = np.isfinite(x_clean)
        assert np.abs(x_clean[finite]).max() < 1e10
        assert np.isnan(x_clean).any()  # garbage became NaN (skipped by nan-stats)

    @pytest.mark.parametrize(
        "pipeline,kwargs,expected",
        [
            ("baseline", dict(target_member_id=0), (2943, 120, 360)),
            ("ensemble", dict(member_ids=[0, 1, 2]), (8109, 1021, 360)),
            ("final", dict(member_ids=[0, 1, 2]), (8109, 1080, 360)),
        ],
    )
    def test_split_sizes(self, zarr_group, pipeline, kwargs, expected):
        # Derived sizes from SURVEY.md section 2.3
        from climate_tpu.data import prepare_databundle

        b = prepare_databundle(
            zarr_group,
            pipeline=pipeline,
            input_vars=INPUT_VARS,
            output_vars=OUTPUT_VARS,
            train_ssps=TRAIN_SSPS,
            test_ssp="ssp245",
            **kwargs,
        )
        assert (b.train.n, b.val.n, b.test.n) == expected

    def test_seasonal_channels(self, zarr_group):
        from climate_tpu.data import prepare_databundle

        b = prepare_databundle(
            zarr_group,
            pipeline="final",
            input_vars=INPUT_VARS,
            output_vars=OUTPUT_VARS,
            train_ssps=["ssp126"],
            test_ssp="ssp245",
            member_ids=[0],
            seasonal_embeddings=True,
            val_ssp="ssp126",
            val_months=120,
        )
        assert b.train.inputs.shape[1] == 7  # models.py:26 hardcoded in_ch=7
        sin_ch = b.train.inputs[:, 5, 0, 0]
        assert sin_ch[0] == pytest.approx(np.sin(0.0))
        assert sin_ch[3] == pytest.approx(np.sin(2 * np.pi * 3 / 12))

    def test_ensemble_val_is_member2_full(self, zarr_group):
        from climate_tpu.data import prepare_databundle
        from climate_tpu.data.etl import load_ssp_arrays

        b = prepare_databundle(
            zarr_group,
            pipeline="ensemble",
            input_vars=INPUT_VARS,
            output_vars=OUTPUT_VARS,
            train_ssps=["ssp370"],
            test_ssp="ssp245",
            member_ids=[0, 1, 2],
        )
        _, m2_out = load_ssp_arrays(zarr_group, "ssp370", INPUT_VARS, OUTPUT_VARS, [2])
        np.testing.assert_array_equal(b.val.outputs, m2_out)


@requires_data
class TestNonConsolidatedStore:
    def test_directory_walk_fallback(self, zarr_group, tmp_path):
        """Stores without .zmetadata are read by walking array directories."""
        import shutil

        from climate_tpu.data import open_zarr

        store = tmp_path / "mini.zarr"
        store.mkdir()
        shutil.copytree(os.path.join(zarr_group.path, "y"), store / "y")
        shutil.copytree(os.path.join(zarr_group.path, "time"), store / "time")

        g = open_zarr(str(store))
        assert g.array_names == ["time", "y"]
        np.testing.assert_array_equal(g.read("y"), zarr_group.read("y"))
        assert g.meta("time").dims == ("time",)


@requires_data
@pytest.mark.slow  # ensemble-pipeline ETL fixture: minutes on 1 core
class TestFeedbackChannels:
    """data.feedback_vars: teacher-forced prev_<var> input channels (round-2
    rollout-feedback redesign)."""

    def test_prev_channel_is_shifted_output_clamped_start(self, zarr_group):
        from climate_tpu.data.etl import load_ssp_arrays

        x, y = load_ssp_arrays(
            zarr_group, "ssp126", INPUT_VARS, OUTPUT_VARS, [0], feedback_vars=["tas", "pr"]
        )
        assert x.shape[1] == len(INPUT_VARS) + 2
        prev_tas, prev_pr = x[:, 5], x[:, 6]
        np.testing.assert_array_equal(prev_tas[0], y[0, 0])  # clamp: prev[0]=out[0]
        np.testing.assert_array_equal(prev_tas[1:], y[:-1, 0])
        np.testing.assert_array_equal(prev_pr[1:], y[:-1, 1])

    def test_prev_channels_do_not_cross_member_boundaries(self, zarr_group):
        from climate_tpu.data.etl import load_ssp_arrays

        x, y = load_ssp_arrays(
            zarr_group, "ssp126", INPUT_VARS, OUTPUT_VARS, [0, 1], feedback_vars=["tas"]
        )
        n = y.shape[0] // 2  # per-member length
        # first frame of member 1 clamps to member 1's own first output,
        # not member 0's last (shift applied before the time-concat)
        np.testing.assert_array_equal(x[n, 5], y[n, 0])
        assert not np.array_equal(x[n, 5], y[n - 1, 0])

    def test_bundle_names_and_order(self, zarr_group):
        from climate_tpu.data import prepare_databundle

        b = prepare_databundle(
            zarr_group, pipeline="final", input_vars=INPUT_VARS, output_vars=OUTPUT_VARS,
            train_ssps=["ssp126"], test_ssp="ssp245", member_ids=[0],
            seasonal_embeddings=True, feedback_vars=["tas", "pr"], val_ssp="ssp126",
            val_months=100,
        )
        assert b.input_vars == INPUT_VARS + ["sin_month", "cos_month", "prev_tas", "prev_pr"]
        assert b.train.inputs.shape[1] == 9

    def test_unknown_feedback_var_raises(self, zarr_group):
        from climate_tpu.data.etl import load_ssp_arrays

        with pytest.raises(ValueError, match="feedback var"):
            load_ssp_arrays(
                zarr_group, "ssp126", INPUT_VARS, OUTPUT_VARS, [0], feedback_vars=["rsdt"]
            )
