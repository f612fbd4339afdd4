"""Model zoo: shape, dtype, and exact param-count parity with the reference.

Expected param counts computed from the reference definitions with torch
(src/models.py:76-123, src/cnn_transformer.py:4-54, src/unet.py:72-109,
src/unet_convlstm_attention.py:27-103):
  SimpleCNN 10,730,626; CNNTransformer 675,490; UNet 790,130;
  AttUNetConvLSTM 953,968 total of which 36,928 is the never-called post_conv
  (SURVEY.md 2.6.3) => 917,040 live params, which we match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate_tpu.models import (
    AttUNetConvLSTM,
    CNNTransformer,
    ConvLSTM,
    SimpleCNN,
    UNet,
    get_model,
)


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


# Whole-model jitted init/apply: XLA-CPU compiles eager op-by-op dispatch
# pathologically slowly on this single-core host; one fused compile per model
# (plus the persistent cache in conftest) keeps the suite fast.
def jinit(m, rng, x):
    out = jax.jit(m.init)(rng, x)
    jax.block_until_ready(out)
    return out


def japply(m, v, x, rngs=None, **static_kwargs):
    fn = jax.jit(lambda v_, x_, r_: m.apply(v_, x_, rngs=r_, **static_kwargs))
    return fn(v, x, rngs)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestSimpleCNN:
    def test_shape_and_params(self, rng):
        m = SimpleCNN(n_output_channels=2)
        x = jnp.zeros((2, 48, 72, 5))
        variables = jinit(m, rng, x)
        assert n_params(variables) == 10_730_626
        y = japply(m, variables, x)
        assert y.shape == (2, 48, 72, 2)

    def test_batch_stats_update_in_train(self, rng):
        m = SimpleCNN(n_output_channels=2, init_dim=8, depth=2)
        x = jax.random.normal(rng, (4, 48, 72, 5))
        variables = jinit(m, rng, x)
        _, mutated = japply(
            m, variables, x, rngs={"dropout": rng}, train=True, mutable=["batch_stats"]
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestCNNTransformer:
    def test_shape_and_params(self, rng):
        m = CNNTransformer(n_output_channels=2)
        x = jnp.zeros((2, 48, 72, 5))
        variables = jinit(m, rng, x)
        assert n_params(variables) == 675_490
        y = japply(m, variables, x)
        assert y.shape == (2, 48, 72, 2)

    def test_dropout_active_in_train(self, rng):
        m = CNNTransformer(n_output_channels=2, dropout=0.5)
        x = jax.random.normal(rng, (1, 48, 72, 5))
        variables = jinit(m, rng, x)
        y1 = japply(m, variables, x, rngs={"dropout": jax.random.PRNGKey(1)}, train=True)
        y2 = japply(m, variables, x, rngs={"dropout": jax.random.PRNGKey(2)}, train=True)
        assert not np.allclose(y1, y2)


class TestUNet:
    def test_shape_and_params(self, rng):
        m = UNet(n_output_channels=2, base=16)
        x = jnp.zeros((2, 48, 72, 5))
        variables = jinit(m, rng, x)
        assert n_params(variables) == 790_130
        y = japply(m, variables, x)
        assert y.shape == (2, 48, 72, 2)


class TestAttUNetConvLSTM:
    def test_shape_and_params(self, rng):
        m = AttUNetConvLSTM(n_output_channels=2, base=16)
        x = jnp.zeros((2, 3, 48, 72, 7))
        variables = jinit(m, rng, x)
        # 953,968 reference total minus the 36,928 dead post_conv params
        assert n_params(variables) == 917_040
        y = japply(m, variables, x)
        assert y.shape == (2, 48, 72, 2)

    def test_seq_len_agnostic(self, rng):
        m = AttUNetConvLSTM(n_output_channels=2, base=8)
        v = jinit(m, rng, jnp.zeros((1, 3, 48, 72, 7)))
        for t in (1, 6):
            y = japply(m, v, jnp.zeros((1, t, 48, 72, 7)))
            assert y.shape == (1, 48, 72, 2)

    def test_temporal_state_matters(self, rng):
        # last-frame-equal inputs with different histories must differ
        m = AttUNetConvLSTM(n_output_channels=2, base=8)
        v = jinit(m, rng, jnp.zeros((1, 3, 48, 72, 7)))
        last = jax.random.normal(rng, (1, 1, 48, 72, 7))
        hist_a = jnp.concatenate([jnp.zeros((1, 2, 48, 72, 7)), last], axis=1)
        hist_b = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(9), (1, 2, 48, 72, 7)), last], axis=1
        )
        assert not np.allclose(japply(m, v, hist_a), japply(m, v, hist_b))


class TestRegistry:
    def _cfg(self, mtype, **model_kw):
        return {
            "model": {"type": mtype, **model_kw},
            "data": {"input_vars": ["CO2", "SO2", "CH4", "BC", "rsdt"], "output_vars": ["tas", "pr"]},
            "training": {},
        }

    @pytest.mark.parametrize(
        "mtype,kw",
        [
            ("SimpleCNN", {"init_dim": 8, "depth": 2}),
            ("cnn_transformer", {"embed_dim": 32, "depth": 1, "n_heads": 2, "mlp_dim": 32}),
            ("unet", {"base_channels": 8}),
            ("unet_convlstm_attention", {"base_channels": 8}),
        ],
    )
    def test_factory(self, mtype, kw, rng):
        m = get_model(self._cfg(mtype, **kw))
        if mtype == "unet_convlstm_attention":
            x = jnp.zeros((1, 2, 48, 72, 5))
        else:
            x = jnp.zeros((1, 48, 72, 5))
        v = jinit(m, rng, x)
        y = japply(m, v, x)
        assert y.shape[-1] == 2

    def test_in_channels_derived_from_data_cfg(self):
        from climate_tpu.models import n_input_channels

        cfg = self._cfg("unet_convlstm_attention")["data"]
        assert n_input_channels(cfg) == 5
        cfg["seasonal_embeddings"] = True
        assert n_input_channels(cfg) == 7  # fixes models.py:26 hardcoded in_ch

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="Unknown model type"):
            get_model(self._cfg("nope"))


class TestConvLSTMScan:
    def test_matches_manual_unroll(self, rng):
        """lax.scan recurrence must equal the reference's Python-loop math."""
        m = ConvLSTM(c_hid=4)
        x = jax.random.normal(rng, (3, 2, 8, 8, 6))  # (T, B, H, W, C)
        v = jinit(m, rng, x)
        out = japply(m, v, x)
        assert out.shape == (3, 2, 8, 8, 4)

        kernel = v["params"]["cell"]["Conv_0"]["kernel"]
        bias = v["params"]["cell"]["Conv_0"]["bias"]

        @jax.jit
        def manual(x, kernel, bias):
            h = jnp.zeros((2, 8, 8, 4))
            c = jnp.zeros((2, 8, 8, 4))
            outs = []
            for t in range(3):
                inp = jnp.concatenate([x[t], h], axis=-1)
                gates = jax.lax.conv_general_dilated(
                    inp, kernel, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias
                i, f, o, g = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                outs.append(h)
            return jnp.stack(outs)

        np.testing.assert_allclose(out, manual(x, kernel, bias), rtol=2e-5, atol=2e-6)

    def test_split_input_conv_same_params_same_outputs(self, rng):
        """split_input_conv hoists the input half of the gate conv out of the
        scan (conv over concat == sum of convs). The param tree must be
        byte-identical in structure (shared checkpoint format) and outputs
        equal to float rounding."""
        fused = ConvLSTM(c_hid=4)
        split = ConvLSTM(c_hid=4, split_input_conv=True)
        x = jax.random.normal(rng, (3, 2, 8, 8, 6))
        v_fused = jinit(fused, rng, x)
        v_split = jinit(split, rng, x)
        assert jax.tree_util.tree_structure(v_fused) == jax.tree_util.tree_structure(v_split)
        for a, b in zip(jax.tree.leaves(v_fused), jax.tree.leaves(v_split)):
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(a, b)  # same init draw from same rng

        # fused-trained checkpoint applied through the split module
        out_fused = japply(fused, v_fused, x)
        out_split = japply(split, v_fused, x)
        np.testing.assert_allclose(out_split, out_fused, rtol=2e-5, atol=2e-6)

    def test_flagship_split_flag_checkpoint_compatible(self, rng):
        """AttUNetConvLSTM(split_lstm_conv=True) shares variables with the
        default module and produces the same forward output."""
        from climate_tpu.models import AttUNetConvLSTM

        base = AttUNetConvLSTM(n_output_channels=2, base=8)
        fast = AttUNetConvLSTM(n_output_channels=2, base=8, split_lstm_conv=True)
        x = jax.random.normal(rng, (2, 3, 48, 72, 7))
        v = jinit(base, rng, x)
        np.testing.assert_allclose(
            japply(fast, v, x), japply(base, v, x), rtol=2e-5, atol=2e-6
        )
