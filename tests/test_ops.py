"""Pallas kernels vs XLA reference paths: numerical equivalence + gradients.

On CPU the Pallas kernel runs in interpreter mode (same program, executed by
the Pallas interpreter); the compiled Mosaic path is exercised on the real
TPU chip by bench/kernel_bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate_tpu.ops.attention import _xla_attention
from climate_tpu.ops.convlstm_cell import _xla_gates, convlstm_gates
from climate_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, n=216, h=4, d=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, h, d)
    return tuple(jax.random.normal(k, shape, dtype=dtype) for k in ks)


class TestFlashAttention:
    def test_matches_xla_reference(self):
        q, k, v = _qkv()
        out_pallas = flash_attention(q, k, v)
        out_xla = _xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla), rtol=2e-5, atol=2e-5)

    def test_nonaligned_token_count_masked_correctly(self):
        # 216 tokens pad to 256; padded keys must not leak into the softmax
        q, k, v = _qkv(n=216)
        out = flash_attention(q, k, v)
        q2 = jnp.pad(q, ((0, 0), (0, 40), (0, 0), (0, 0)))
        k2 = jnp.pad(k, ((0, 0), (0, 40), (0, 0), (0, 0)))
        v2 = jnp.pad(v, ((0, 0), (0, 40), (0, 0), (0, 0)))
        # reference on the original size only
        ref = _xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
        assert out.shape == q.shape

    def test_gradients_match_xla(self):
        q, k, v = _qkv(b=1, n=64, h=2, d=16)

        def loss_pallas(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(_xla_attention(q, k, v) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)

    def test_bf16_path(self):
        q, k, v = _qkv(dtype=jnp.bfloat16)
        out = flash_attention(q, k, v)
        assert out.dtype == jnp.bfloat16
        ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=0.05, atol=0.05
        )

    def test_dispatch_env_override(self, monkeypatch):
        from climate_tpu.ops.attention import dot_product_attention

        q, k, v = _qkv(b=1, n=32, h=2, d=16)
        monkeypatch.setenv("CLIMATE_TPU_ATTN", "xla")
        out_xla = dot_product_attention(q, k, v)
        monkeypatch.setenv("CLIMATE_TPU_ATTN", "pallas")
        out_pl = dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_pl), rtol=2e-5, atol=2e-5)


class TestConvLSTMGates:
    def test_gate_math(self):
        gates = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
        h2, c2 = convlstm_gates(gates, c)
        i, f, o, g = np.split(np.asarray(gates), 4, axis=-1)
        sig = lambda x: 1 / (1 + np.exp(-x))  # noqa: E731
        c_ref = sig(f) * np.asarray(c) + sig(i) * np.tanh(g)
        h_ref = sig(o) * np.tanh(c_ref)
        np.testing.assert_allclose(np.asarray(c2), c_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2), h_ref, rtol=1e-5, atol=1e-6)

    def test_xla_path_is_default(self):
        gates = jnp.zeros((1, 2, 2, 8))
        c = jnp.ones((1, 2, 2, 2))
        h, c2 = _xla_gates(gates, c)
        assert h.shape == c.shape and c2.shape == c.shape


class TestFusedGatesPallas:
    def test_matches_xla_gates(self):
        from climate_tpu.ops.convlstm_gates_pallas import fused_gates

        gates = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 9, 256))
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 9, 64))
        h_ref, c_ref = _xla_gates(gates, c)
        h_pl, c_pl = fused_gates(gates, c)
        np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), rtol=2e-5, atol=2e-6)


class TestWindowGatherKernel:
    """Pallas window-gather (ops/window_gather.py) vs the XLA path — exact
    equality (it is a copy kernel), interpret mode on CPU."""

    def test_matches_xla_gather_with_padding(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental.pallas import tpu as pltpu

        from climate_tpu.data.dataset import gather_windows
        from climate_tpu.ops.window_gather import gather_windows_pallas

        data = jax.random.normal(jax.random.PRNGKey(0), (30, 48, 72, 7))
        idx = jnp.asarray([0, 1, 2, 15, 29], jnp.int32)  # incl. left-pad cases
        with pltpu.force_tpu_interpret_mode():
            got = gather_windows_pallas(data, idx, 4)
        want = gather_windows(data, idx, 4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_supported_gating(self):
        from climate_tpu.ops.window_gather import supported

        assert supported((7029, 48, 72, 7), "tpu")   # 24192 = 189*128
        assert supported((7029, 48, 72, 9), "tpu")   # 31104 = 243*128
        assert supported((7029, 48, 72, 5), "tpu")   # 48*72 = 27*128: any C aligns
        assert not supported((100, 5, 5, 3), "tpu")  # 75 % 128 != 0
        assert not supported((7029, 48, 72, 7), "cpu")
