"""Rollout scan, plots, and bf16 precision policy."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestRollout:
    def _model(self):
        from climate_tpu.models import AttUNetConvLSTM

        m = AttUNetConvLSTM(n_output_channels=2, base=8)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 3, 48, 72, 5)))
        return m, v

    def test_forced_rollout_matches_windowed_inference(self):
        """Rollout over known forcings == per-frame sliding-window predictions."""
        from climate_tpu.eval.rollout import rollout_jit

        m, v = self._model()
        forcings = jax.random.normal(jax.random.PRNGKey(1), (10, 48, 72, 5))

        run = rollout_jit(lambda vv, x: m.apply(vv, x), seq_len=3)
        preds = run(v, forcings)
        assert preds.shape == (10, 48, 72, 2)

        # manual windowed prediction for month 5: frames [3,4,5]
        direct = jax.jit(m.apply)(v, forcings[3:6][None])[0]
        np.testing.assert_allclose(np.asarray(preds[5]), np.asarray(direct), rtol=2e-5, atol=2e-5)

        # month 0 uses zero left-padding like the training windows
        padded = jnp.concatenate([jnp.zeros((2, 48, 72, 5)), forcings[:1]], axis=0)
        direct0 = jax.jit(m.apply)(v, padded[None])[0]
        np.testing.assert_allclose(np.asarray(preds[0]), np.asarray(direct0), rtol=2e-5, atol=2e-5)

    def test_feedback_rollout_differs_from_forced(self):
        from climate_tpu.eval.rollout import rollout_jit

        m, v = self._model()
        forcings = jax.random.normal(jax.random.PRNGKey(1), (6, 48, 72, 5))
        forced = rollout_jit(lambda vv, x: m.apply(vv, x), seq_len=3)(v, forcings)
        fed = rollout_jit(lambda vv, x: m.apply(vv, x), seq_len=3, feedback_channels=(0, 1))(v, forcings)
        assert not np.allclose(np.asarray(forced[3:]), np.asarray(fed[3:]))


class TestPlots:
    def test_epoch_panels_and_worst_loss(self, tmp_path, synthetic_fields):
        from climate_tpu.eval.plots import save_epoch_panels, worst_loss_panels

        preds, trues, lats, lons, t = synthetic_fields
        paths = save_epoch_panels(
            str(tmp_path), "val", preds, trues, ["tas", "pr"],
            {"val/tas/time_mean_rmse": 1.0}, sample_timesteps=(0, 5),
        )
        assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths)
        assert len(paths) == 2 * (2 + 2)  # per var: mean, std, 2 timesteps

        wpaths = worst_loss_panels(str(tmp_path), preds, trues, ["tas", "pr"], k=2)
        assert len(wpaths) == 4
        assert all(os.path.exists(p) for p in wpaths)


class TestBf16Policy:
    def test_bf16_model_trains_and_evals_close_to_fp32(self):
        from climate_tpu.models import UNet
        from climate_tpu.parallel.mesh import create_mesh, replicate
        from climate_tpu.train.state import build_optimizer, create_train_state
        from climate_tpu.train.trainer import StepFunctions, pad_batch

        mesh = create_mesh(8)
        data_x = jax.random.normal(jax.random.PRNGKey(1), (16, 48, 72, 5))
        data_y = jax.random.normal(jax.random.PRNGKey(2), (16, 48, 72, 2))
        data_x, data_y = replicate(mesh, (data_x, data_y))

        results = {}
        for name, dtype in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
            m = UNet(n_output_channels=2, base=8, dtype=dtype)
            tx = build_optimizer(1e-3)
            state = replicate(
                mesh, create_train_state(m, jax.random.PRNGKey(0), jnp.zeros((8, 48, 72, 5)), tx)
            )
            # params stay fp32 regardless of compute dtype
            assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
            fns = StepFunctions.build(
                m, tx, mesh, seq_len=None, has_batch_stats=False, use_dropout=False
            )
            idx, mask = pad_batch(np.arange(8), 8)
            state, loss = fns.train_step(
                state, data_x, data_y, jnp.asarray(idx), jnp.asarray(mask), jax.random.PRNGKey(0)
            )
            assert loss.dtype == jnp.float32  # loss accumulated fp32
            results[name] = float(loss)
        # same init => losses close within bf16 tolerance
        assert results["bf16"] == pytest.approx(results["fp32"], rel=0.05)

    def test_registry_precision_plumbs_dtype(self):
        from climate_tpu.models import get_model

        cfg = {
            "model": {"type": "unet", "base_channels": 8},
            "data": {"input_vars": ["a"], "output_vars": ["b"]},
            "training": {"precision": "bf16"},
        }
        assert get_model(cfg).dtype == jnp.bfloat16
        cfg["training"]["precision"] = "fp32"
        assert get_model(cfg).dtype == jnp.float32
