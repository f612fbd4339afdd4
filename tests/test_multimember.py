"""Multi-member vmap training: K ensemble members in ONE jitted step
(trainer.StepFunctions.build(n_members=K) over a stacked-params TrainState).

Correctness contract: member k of the vmapped step must evolve exactly like
an independent single-member run fed the same init rng, batch indices, and
dropout rng — vmap changes the schedule, not the math (up to XLA:CPU
reduction-order noise ~1e-6 abs, same tolerance story as the multihost
equivalence test — NOTES_ROUND4 item 5). The reference trains
one model per process (main_final.py:751-785); this path is the TPU-native
ensemble factory (the step is kernel-latency-bound, so K members ride the
same kernel chain at near-constant wall clock — PARITY.md roofline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate_tpu.models import UNet
from climate_tpu.parallel.mesh import create_mesh, replicate
from climate_tpu.train.state import (
    build_optimizer,
    create_member_states,
    create_train_state,
    member_state,
)
from climate_tpu.train.trainer import StepFunctions, predict_dataset

K = 2
B = 16
N = 40


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"
    return create_mesh(8)


@pytest.fixture(scope="module")
def setup(mesh8):
    model = UNet(n_output_channels=2, base=8)
    tx = build_optimizer(1e-3)
    x = jnp.zeros((B, 48, 72, 5))
    rngs = [jax.random.PRNGKey(10 + k) for k in range(K)]
    data_x = jax.random.normal(jax.random.PRNGKey(1), (N, 48, 72, 5))
    data_y = jax.random.normal(jax.random.PRNGKey(2), (N, 48, 72, 2))
    data_x, data_y = replicate(mesh8, (data_x, data_y))
    fns_multi = StepFunctions.build(
        model, tx, mesh8, seq_len=None, has_batch_stats=False, n_members=K
    )
    fns_single = StepFunctions.build(
        model, tx, mesh8, seq_len=None, has_batch_stats=False
    )
    return model, tx, x, rngs, data_x, data_y, fns_multi, fns_single


def fresh_states(model, tx, x, rngs, mesh8):
    return replicate(mesh8, create_member_states(model, rngs, x, tx))


class TestMultiMemberStep:
    def test_member_k_matches_independent_single_run(self, setup, mesh8):
        model, tx, x, rngs, data_x, data_y, fns_multi, fns_single = setup
        states = fresh_states(model, tx, x, rngs, mesh8)

        host = np.random.default_rng(0)
        step_rng = jax.random.PRNGKey(7)
        idx_km = jnp.asarray(host.integers(0, N, size=(K, B)).astype(np.int32))
        mask_km = jnp.ones((K, B), jnp.float32)

        new_states, losses = fns_multi.train_step(
            states, data_x, data_y, idx_km, mask_km, step_rng
        )
        assert losses.shape == (K,)

        for k in range(K):
            s = replicate(mesh8, create_train_state(model, rngs[k], x, tx))
            # the multi path derives member k's rng as fold_in(rng, k)
            s, loss_k = fns_single.train_step(
                s, data_x, data_y, idx_km[k], mask_km[k],
                jax.random.fold_in(step_rng, k),
            )
            assert float(loss_k) == pytest.approx(float(losses[k]), rel=1e-5)
            got = jax.tree_util.tree_leaves(member_state(new_states, k).params)
            want = jax.tree_util.tree_leaves(s.params)
            for g, w in zip(got, want):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5
                )

    def test_members_diverge_with_different_inits(self, setup, mesh8):
        model, tx, x, rngs, data_x, data_y, fns_multi, _ = setup
        states = fresh_states(model, tx, x, rngs, mesh8)
        p0 = jax.tree_util.tree_leaves(member_state(states, 0).params)
        p1 = jax.tree_util.tree_leaves(member_state(states, 1).params)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1)
        )


class TestMultiMemberEpoch:
    def test_epoch_scan_shapes_and_step_count(self, setup, mesh8):
        model, tx, x, rngs, data_x, data_y, fns_multi, _ = setup
        states = fresh_states(model, tx, x, rngs, mesh8)
        n_steps = 3
        host = np.random.default_rng(1)
        idx_mat = jnp.asarray(host.integers(0, N, size=(n_steps, K, B)).astype(np.int32))
        mask_mat = jnp.ones((n_steps, K, B), jnp.float32)
        new_states, (losses, gnorms) = fns_multi.train_epoch(
            states, data_x, data_y, idx_mat, mask_mat, jax.random.PRNGKey(3)
        )
        assert losses.shape == (n_steps, K)
        assert gnorms.shape == (n_steps, K)
        assert np.isfinite(np.asarray(losses)).all()
        np.testing.assert_array_equal(np.asarray(new_states.step), n_steps)


class TestMultiMemberPredict:
    def test_predict_split_matches_per_member_single(self, setup, mesh8):
        model, tx, x, rngs, data_x, data_y, fns_multi, fns_single = setup
        states = fresh_states(model, tx, x, rngs, mesh8)
        preds = predict_dataset(fns_multi, states, data_x, N, B)
        assert preds.shape[:2] == (K, N)
        for k in range(K):
            single = predict_dataset(fns_single, member_state(states, k), data_x, N, B)
            np.testing.assert_allclose(
                np.asarray(preds[k]), np.asarray(single), rtol=2e-4, atol=1e-5
            )


from tests.conftest import requires_data  # noqa: E402


@requires_data
@pytest.mark.slow  # full Experiment fit on the 1-core host (~3-5 min)
class TestMultiMemberExperiment:
    def test_two_member_fit_checkpoints_and_ensemble_metrics(self, tmp_path):
        import os

        from climate_tpu.config.loader import compose
        from climate_tpu.train.experiment import Experiment

        cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
        cfg = compose(
            cfg_dir,
            overrides=[
                "data=default",
                "model=SimpleCNN",
                "model.init_dim=8",
                "model.depth=2",
                "trainer.accelerator=cpu",
                "trainer.max_epochs=1",
                "training.n_members=2",
                "training.member_seeds=[7,8]",
                "data.train_ssps=[ssp370]",
                f"output_dir={tmp_path}",
            ],
        )
        exp = Experiment(cfg)
        assert exp.n_members == 2 and exp.member_seeds == [7, 8]
        val = exp.fit()
        # ensemble-level metrics under the standard reference names
        for key in ("val/loss", "val/kaggle_score", "val/tas/avg/monthly_rmse"):
            assert key in val and np.isfinite(val[key]), key
        # per-member metrics recorded and distinct (different init seeds)
        assert len(exp._last_member_metrics) == 2
        m0, m1 = exp._last_member_metrics
        assert m0["val/loss"] != m1["val/loss"]
        # one standard checkpoint tree per member, restorable
        for k in range(2):
            root = os.path.join(exp.run_dir, f"member{k}", "checkpoints")
            assert os.path.isdir(os.path.join(root, "best")), root
            assert os.path.isdir(os.path.join(root, "last")), root
        from climate_tpu.train.checkpoint import restore_from_path
        from climate_tpu.train.state import member_state

        template = member_state(exp.state, 0)
        restored, meta = restore_from_path(
            os.path.join(exp.run_dir, "member1", "checkpoints", "best"), template
        )
        assert meta["member_seed"] == 8
        got = jax.tree_util.tree_leaves(restored.params)
        want = jax.tree_util.tree_leaves(member_state(exp.state, 1).params)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7)
        # test phase: member-mean ensemble -> one submission CSV
        tm = exp.test()
        assert os.path.exists(tm["submission_path"])
