"""Test harness: force an 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the TPU-native analogue of multi-node tests
the reference never had — SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: ambient env sets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The ambient environment pins JAX_PLATFORMS=axon (real TPU via tunnel) and
# the axon plugin wins over the env var — force CPU through jax.config, which
# takes precedence. Tests must run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles are ~15s each on this host's
# single core; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_ZARR = "/root/reference/data/processed.zarr"


def has_reference_data() -> bool:
    return os.path.exists(os.path.join(REFERENCE_ZARR, ".zmetadata"))


requires_data = pytest.mark.skipif(
    not has_reference_data(), reason="reference zarr store not available"
)


@pytest.fixture(scope="session")
def zarr_group():
    from climate_tpu.data import open_zarr

    if not has_reference_data():
        pytest.skip("reference zarr store not available")
    return open_zarr(REFERENCE_ZARR)


@pytest.fixture(scope="session")
def synthetic_fields():
    """Procedurally generated climate-like fields, mirroring the reference
    test fixture (_test_kaggle_metric.py:46-78): cos-lat temperature gradient
    + seasonal sine + noise; non-negative precip. Small grid for speed."""
    rng = np.random.default_rng(42)
    n_t, n_y, n_x = 24, 10, 12
    lats = np.linspace(-80, 80, n_y)
    lons = np.linspace(0, 330, n_x)
    t = np.arange(n_t)

    base_tas = 288.0 - 30.0 * (np.abs(lats[None, :, None]) / 90.0)
    seasonal = 10.0 * np.sin(2 * np.pi * t / 12.0)[:, None, None]
    tas_true = base_tas + seasonal + rng.normal(0, 2.0, (n_t, n_y, n_x))
    tas_pred = tas_true + rng.normal(0, 1.0, (n_t, n_y, n_x))

    pr_true = np.maximum(rng.gamma(2.0, 1.5, (n_t, n_y, n_x)), 0.0)
    pr_pred = np.maximum(pr_true + rng.normal(0, 0.5, (n_t, n_y, n_x)), 0.0)

    preds = np.stack([tas_pred, pr_pred], axis=1)  # (time, C, y, x)
    trues = np.stack([tas_true, pr_true], axis=1)
    return preds, trues, lats, lons, t
