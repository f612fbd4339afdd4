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

    def test_ensemble_rollout_equals_member_mean_when_forced(self):
        """The stacked-vmap ensemble apply (cli/rollout.py extra_ckpts): with
        no feedback the rollout is per-step linear in the member predictions,
        so the ensemble rollout must equal the mean of the member rollouts
        exactly; with feedback on it must differ (mean is fed back through
        the nonlinear model, which is the point of closed-loop ensembling)."""
        from climate_tpu.eval.rollout import rollout_jit

        m, v1 = self._model()
        v2 = jax.jit(m.init)(jax.random.PRNGKey(7), jnp.zeros((1, 3, 48, 72, 5)))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), v1, v2)

        def ens_apply(vv, x):
            return jax.vmap(lambda v: m.apply(v, x))(vv).mean(axis=0)

        forcings = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 72, 5))
        ens = np.asarray(rollout_jit(ens_apply, seq_len=3)(stacked, forcings))
        single = rollout_jit(lambda vv, x: m.apply(vv, x), seq_len=3)
        mean = np.asarray((single(v1, forcings) + single(v2, forcings)) / 2.0)
        np.testing.assert_allclose(ens, mean, rtol=2e-5, atol=2e-5)

        # with feedback, compounding through the model makes them differ
        slots = {0: 3, 1: 4}  # feed preds into the last two input channels
        ens_fb = np.asarray(
            rollout_jit(ens_apply, seq_len=3, feedback_slots=slots)(stacked, forcings)
        )
        fb = rollout_jit(lambda vv, x: m.apply(vv, x), seq_len=3, feedback_slots=slots)
        mean_fb = np.asarray((fb(v1, forcings) + fb(v2, forcings)) / 2.0)
        assert not np.allclose(ens_fb, mean_fb, rtol=1e-4, atol=1e-4)

        # weighted blend (cli/rollout.py rollout.member_weights): a one-hot
        # weight vector must reproduce that member's solo feedback rollout
        # exactly — the degenerate blend feeds back only member 1's preds
        w = jnp.asarray([1.0, 0.0])

        def w_apply(vv, x):
            preds = jax.vmap(lambda v: m.apply(v, x))(vv)
            return jnp.tensordot(w, preds.astype(jnp.float32), axes=1)

        solo = np.asarray(fb(v1, forcings))
        onehot = np.asarray(
            rollout_jit(w_apply, seq_len=3, feedback_slots=slots)(stacked, forcings)
        )
        np.testing.assert_allclose(onehot, solo, rtol=2e-5, atol=2e-5)

    def test_feedback_rollout_differs_from_forced(self):
        """A feedback-trained model (7 = 5 forcings + prev_tas/prev_pr input
        channels): autoregressive feedback must change the trajectory."""
        from climate_tpu.eval.rollout import rollout_jit
        from climate_tpu.models import AttUNetConvLSTM

        m = AttUNetConvLSTM(n_output_channels=2, base=8)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 3, 48, 72, 7)))
        forcings = jax.random.normal(jax.random.PRNGKey(1), (6, 48, 72, 7))
        forced = rollout_jit(lambda vv, x: m.apply(vv, x), seq_len=3)(v, forcings)
        fed = rollout_jit(
            lambda vv, x: m.apply(vv, x), seq_len=3, feedback_slots={0: 5, 1: 6}
        )(v, forcings)
        assert not np.allclose(np.asarray(forced[3:]), np.asarray(fed[3:]))

    def test_feedback_matches_manual_loop(self):
        """Pin the exact window assembly: every frame's prev channels carry
        the prediction for the frame's previous month, from a rolling buffer,
        zeros before the horizon start."""
        from climate_tpu.eval.rollout import rollout_jit

        seq, t_tot, h, w = 3, 6, 2, 2
        c_in, c_out = 4, 2  # channels 2,3 are prev_* slots
        slots = {0: 2, 1: 3}

        def apply_fn(v, x):  # deterministic mix so feedback is observable
            win = x[0]  # (T, H, W, 4)
            pred = win[..., :2].mean(axis=0) * 0.5 + win[..., 2:4].mean(axis=0) * 0.25 + 0.1
            return pred[None]

        forcings = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), (t_tot, h, w, c_in)), np.float32
        )
        got = np.asarray(rollout_jit(apply_fn, seq_len=seq, feedback_slots=slots)(
            {}, jnp.asarray(forcings)
        ))

        padded = np.concatenate([np.zeros((seq - 1, h, w, c_in), np.float32), forcings])
        hist = np.zeros((seq, h, w, c_out), np.float32)
        want = []
        for t in range(t_tot):
            win = padded[t : t + seq].copy()
            for oc, ic in slots.items():
                win[..., ic] = hist[..., oc]
            pred = win[..., :2].mean(axis=0) * 0.5 + win[..., 2:4].mean(axis=0) * 0.25 + 0.1
            hist = np.concatenate([hist[1:], pred[None]])
            want.append(pred)
        np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-6)

    def test_history_calibration_matches_manual_loop(self):
        """In-scan fed-back-history calibration (rollout history_alphas):
        alpha=1 must reproduce the raw feedback rollout exactly; alpha!=1
        must match a manual loop that re-disperses each fed value around the
        bias-corrected EMA of the scan's own predictions."""
        from climate_tpu.eval.rollout import rollout_jit

        seq, t_tot, h, w = 3, 6, 2, 2
        c_in = 4
        slots = {0: 2, 1: 3}
        decay = 0.9

        def apply_fn(v, x):
            win = x[0]
            pred = win[..., :2].mean(axis=0) * 0.5 + win[..., 2:4].mean(axis=0) * 0.25 + 0.1
            return pred[None]

        forcings = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), (t_tot, h, w, c_in)), np.float32
        )
        raw = np.asarray(rollout_jit(apply_fn, seq_len=seq, feedback_slots=slots)(
            {}, jnp.asarray(forcings)))
        ident = np.asarray(rollout_jit(
            apply_fn, seq_len=seq, feedback_slots=slots,
            history_alphas=[1.0, 1.0], history_ema_decay=decay,
        )({}, jnp.asarray(forcings)))
        np.testing.assert_allclose(ident, raw, rtol=1e-6, atol=1e-7)

        alphas = np.asarray([1.2, 0.8], np.float32)
        got = np.asarray(rollout_jit(
            apply_fn, seq_len=seq, feedback_slots=slots,
            history_alphas=alphas, history_ema_decay=decay,
        )({}, jnp.asarray(forcings)))

        padded = np.concatenate([np.zeros((seq - 1, h, w, c_in), np.float32), forcings])
        hist = np.zeros((seq, h, w, 2), np.float32)
        m_acc = np.zeros((h, w, 2), np.float32)
        want = []
        for t in range(t_tot):
            m_t = m_acc / max(1.0 - decay ** t, 1e-6)
            fed = m_t[None] + alphas * (hist - m_t[None])
            win = padded[t : t + seq].copy()
            for oc, ic in slots.items():
                win[..., ic] = fed[..., oc]
            pred = win[..., :2].mean(axis=0) * 0.5 + win[..., 2:4].mean(axis=0) * 0.25 + 0.1
            hist = np.concatenate([hist[1:], pred[None]])
            m_acc = decay * m_acc + (1.0 - decay) * pred
            want.append(pred)
        np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-6)
        assert not np.allclose(got, raw, rtol=1e-4, atol=1e-4)

    def test_feedback_slots_from_names(self):
        from climate_tpu.eval.rollout import feedback_slots_from_names

        names = ["CO2", "SO2", "sin_month", "cos_month", "prev_tas", "prev_pr"]
        assert feedback_slots_from_names(names, ["tas", "pr"]) == {0: 4, 1: 5}
        assert feedback_slots_from_names(["CO2", "SO2"], ["tas", "pr"]) == {}
        # a prev_* channel without a matching output var is ignored
        assert feedback_slots_from_names(["prev_foo"], ["tas", "pr"]) == {}


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


@pytest.mark.slow  # two full UNet train-step compiles (fp32 + bf16)
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
                m, tx, mesh, seq_len=None, has_batch_stats=False
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


class TestObservability:
    """Round-2 observability parity: reference-named image stream +
    watch-style histograms (VERDICT item 3)."""

    def test_reference_panel_names_exact(self, synthetic_fields):
        from climate_tpu.eval.plots import reference_panel_figures
        import matplotlib.pyplot as plt

        preds, trues, *_ = synthetic_fields
        names = []
        for name, stub, fig in reference_panel_figures(
            "val", preds, trues, ["tas", "pr"], {}, sample_timesteps=(0, 5)
        ):
            names.append(name)
            plt.close(fig)
        assert names == [
            "img/tas/time_mean", "img/tas/time_Stddev",  # capital S quirk
            "img/val/tas/month_idx_0", "img/val/tas/month_idx_5",
            "img/pr/time_mean", "img/pr/time_Stddev",
            "img/val/pr/month_idx_0", "img/val/pr/month_idx_5",
        ]

    def test_log_image_fallback_writes_png(self, tmp_path):
        import matplotlib.pyplot as plt
        from climate_tpu.utils.logging import MetricsLogger

        ml = MetricsLogger(str(tmp_path))
        fig = plt.figure()
        ml.log_image("img/tas/time_mean", fig, step=3)
        plt.close(fig)
        assert os.path.exists(tmp_path / "media" / "img_tas_time_mean.png")

    def test_log_histogram_fallback_jsonl(self, tmp_path):
        import json
        from climate_tpu.utils.logging import MetricsLogger

        ml = MetricsLogger(str(tmp_path))
        ml.log_histogram("gradients/conv.kernel", np.random.default_rng(0).normal(size=100), step=7)
        lines = [json.loads(ln) for ln in open(tmp_path / "histograms.jsonl")]
        assert lines[0]["name"] == "gradients/conv.kernel"
        assert lines[0]["step"] == 7
        assert sum(lines[0]["counts"]) == 100
        assert len(lines[0]["edges"]) == len(lines[0]["counts"]) + 1

    def test_wandb_forwarding_names(self, tmp_path, monkeypatch):
        """With a fake wandb module, images/histograms/scalars arrive under
        the reference names."""
        import matplotlib.pyplot as plt
        import climate_tpu.utils.logging as ul

        logged = []

        class FakeRun:
            def log(self, d, step=None):
                logged.append((dict(d), step))

            def finish(self):
                pass

        class FakeWandb:
            @staticmethod
            def init(**kw):
                return FakeRun()

            class Image:
                def __init__(self, fig):
                    self.fig = fig

            class Histogram:
                def __init__(self, np_histogram=None):
                    self.np_histogram = np_histogram

        monkeypatch.setattr(ul, "wandb", FakeWandb)
        ml = ul.MetricsLogger(str(tmp_path), use_wandb=True)
        assert ml.wandb_active
        fig = plt.figure()
        ml.log_image("img/pr/time_Stddev", fig, step=1)
        plt.close(fig)
        ml.log_histogram("parameters/dense.bias", np.zeros(4), step=1)
        ml.log({"val/loss": 0.5}, step=1)
        keys = [k for d, _ in logged for k in d]
        assert "img/pr/time_Stddev" in keys
        assert "parameters/dense.bias" in keys
        assert "val/loss" in keys
