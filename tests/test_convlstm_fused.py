"""Fused whole-T ConvLSTM recurrence kernel (ops/convlstm_fused.py) vs the
lax.scan reference — forward and gradients, interpret mode on CPU. The
compiled Mosaic path is validated on the real chip by tools/kernel_bench.py
(interpret mode does not enforce lowering constraints — see
.claude/skills/verify/SKILL.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from climate_tpu.ops.convlstm_cell import convlstm_gates
from climate_tpu.ops.convlstm_fused import build_masks, convlstm_recurrence, supported


def scan_reference(xg_seq, kh):
    """The split-mode lax.scan recurrence (models/convlstm.py::_split_forward
    without the input conv): gates_t = xg_t + conv(h, kh)."""
    t, b, h, w, c4 = xg_seq.shape
    c = c4 // 4
    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(1, 1), (1, 1)]

    def step(carry, xg_t):
        h_prev, c_prev = carry
        gates = xg_t + jax.lax.conv_general_dilated(
            h_prev, kh, (1, 1), pad, dimension_numbers=dn
        )
        h_next, c_next = convlstm_gates(gates, c_prev)
        return (h_next, c_next), h_next

    init = (jnp.zeros((b, h, w, c), xg_seq.dtype), jnp.zeros((b, h, w, c), xg_seq.dtype))
    _, hs = jax.lax.scan(step, init, xg_seq)
    return hs


@pytest.fixture()
def small_case():
    # c_hid=32 -> 4C=128 (lane-aligned); production bottleneck is (6, 9, 64)
    t, b, h, w, c = 3, 2, 6, 9, 32
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.normal(size=(t, b, h, w, 4 * c)).astype(np.float32))
    kh = jnp.asarray(0.3 * rng.normal(size=(3, 3, c, 4 * c)).astype(np.float32))
    return xg, kh


class TestForward:
    def test_matches_scan_reference(self, small_case):
        xg, kh = small_case
        ref = scan_reference(xg, kh)
        with pltpu.force_tpu_interpret_mode():
            got = convlstm_recurrence(xg, kh)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_single_step_no_recurrence_term(self, small_case):
        """T=1: h0 = o*tanh(i*g) with zero initial state — no kh dependence."""
        xg, kh = small_case
        xg1 = xg[:1]
        with pltpu.force_tpu_interpret_mode():
            a = convlstm_recurrence(xg1, kh)
            b = convlstm_recurrence(xg1, jnp.zeros_like(kh))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_masks_zero_padding_rows_and_edges(self):
        """Mask construction: interior rows have all 9 taps, corners 4; the
        Sp padding rows are dead for every tap."""
        h, w, sp = 6, 9, 56
        m = build_masks(h, w, sp, b=2)
        assert m.shape == (9, 112)
        per_row = m[:, : h * w].sum(axis=0)
        assert per_row[0] == 4  # corner (0, 0)
        assert per_row[w + 1] == 9  # interior (1, 1)
        assert m[:, h * w : sp].sum() == 0  # padding rows
        assert (m[:, :sp] == m[:, sp:]).all()  # tiled per batch entry


class TestGradients:
    def test_grads_match_scan_reference(self, small_case):
        xg, kh = small_case
        probe = jnp.asarray(
            np.random.default_rng(7).normal(size=(3, 2, 6, 9, 32)).astype(np.float32)
        )

        def loss_ref(xg_, kh_):
            return jnp.sum(scan_reference(xg_, kh_) * probe)

        def loss_fused(xg_, kh_):
            return jnp.sum(convlstm_recurrence(xg_, kh_) * probe)

        ref_dxg, ref_dkh = jax.grad(loss_ref, argnums=(0, 1))(xg, kh)
        with pltpu.force_tpu_interpret_mode():
            got_dxg, got_dkh = jax.grad(loss_fused, argnums=(0, 1))(xg, kh)
        np.testing.assert_allclose(np.asarray(got_dxg), np.asarray(ref_dxg),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_dkh), np.asarray(ref_dkh),
                                   rtol=1e-4, atol=1e-4)


class TestModelIntegration:
    def test_fused_flag_checkpoint_compatible_with_scan(self, monkeypatch):
        """fused_recurrence shares the scanned cell's params; outputs agree.
        On CPU supported() is False, so force the kernel path through the env
        override is NOT possible — instead call the module internals with
        interpret mode."""
        from climate_tpu.models.convlstm import ConvLSTM

        t, b, h, w, cin, chid = 2, 1, 6, 9, 16, 32
        x = jnp.asarray(np.random.default_rng(3).normal(size=(t, b, h, w, cin)).astype(np.float32))
        scan_mod = ConvLSTM(c_hid=chid)
        params = scan_mod.init(jax.random.PRNGKey(0), x)
        ref = scan_mod.apply(params, x)

        fused_mod = ConvLSTM(c_hid=chid, fused_recurrence=True)
        monkeypatch.setattr(
            "climate_tpu.ops.convlstm_fused.supported", lambda *a: True
        )
        with pltpu.force_tpu_interpret_mode():
            got = fused_mod.apply(params, x)  # same params pytree
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_supported_gating(self):
        assert not supported(64, 6, 9, 64, "cpu")
        assert supported(64, 6, 9, 64, "tpu")
        assert not supported(64, 6, 9, 48, "tpu")  # 4C not lane-aligned
        assert not supported(64, 2, 9, 64, "tpu")  # grid smaller than taps
