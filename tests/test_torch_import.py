"""Reference-checkpoint importer (climate_tpu.compat.torch_import).

Each test builds the reference-equivalent torch mirror
(tools/torch_mirrors.py — behaviorally identical to the reference
architectures, used for all parity anchors), renames its state_dict keys to
the REFERENCE's module names (src/models.py:76-123, src/cnn_transformer.py,
src/unet.py, src/unet_convlstm_attention.py — the naming the importer
accepts), imports, and asserts the Flax model reproduces the torch output on
random inputs — weights, layout transposes, and gate order all verified at
once.
"""

import os
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from torch_mirrors import (  # noqa: E402
    AttUNetConvLSTMTorch,
    CNNTransformerTorch,
    SimpleCNNTorch,
    UNetTorch,
)

from climate_tpu.compat import variables_from_torch  # noqa: E402
from climate_tpu.models import (  # noqa: E402
    AttUNetConvLSTM,
    CNNTransformer,
    SimpleCNN,
    UNet,
)

RTOL = ATOL = 2e-4


def _rename(sd: dict, rules: list[tuple[str, str]]) -> dict:
    """Mirror attribute names -> reference module names (regexes, applied
    cumulatively: a key may need both a prefix and an inner-module rename)."""
    out = {}
    for k, v in sd.items():
        for pat, rep in rules:
            k = re.sub(pat, rep, k)
        out[k] = v.detach().numpy()
    return out


def _np(t):
    return np.asarray(t.detach())


class TestSimpleCNNImport:
    RULES = [
        (r"^stem\.", "initial."),
        (r"^blocks\.(\d+)\.c1\.", r"res_blocks.\1.conv1."),
        (r"^blocks\.(\d+)\.b1\.", r"res_blocks.\1.bn1."),
        (r"^blocks\.(\d+)\.c2\.", r"res_blocks.\1.conv2."),
        (r"^blocks\.(\d+)\.b2\.", r"res_blocks.\1.bn2."),
        (r"^blocks\.(\d+)\.proj\.", r"res_blocks.\1.skip."),
        (r"^head\.", "final."),
    ]

    def test_output_parity(self):
        tm = SimpleCNNTorch(5, 2, dim=8, depth=3).eval()
        # make running stats non-trivial so the BN import is actually tested
        with torch.no_grad():
            tm(torch.randn(4, 5, 48, 72))
        tm.train(False)
        sd = _rename(tm.state_dict(), self.RULES)

        variables = variables_from_torch("SimpleCNN", sd)
        m = SimpleCNN(n_output_channels=2, init_dim=8, depth=3)
        x = np.random.default_rng(0).normal(size=(2, 48, 72, 5)).astype(np.float32)

        ref = _np(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.moveaxis(np.asarray(jax.jit(m.apply)(
            jax.tree.map(jnp.asarray, variables), jnp.asarray(x))), -1, 1)
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    def test_strict_rejects_leftovers(self):
        tm = SimpleCNNTorch(5, 2, dim=8, depth=2)
        sd = _rename(tm.state_dict(), self.RULES)
        sd["mystery.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            variables_from_torch("SimpleCNN", sd)
        variables_from_torch("SimpleCNN", sd, strict=False)  # opt-out works

    def test_lightning_wrapper_and_prefix(self):
        tm = SimpleCNNTorch(5, 2, dim=8, depth=2)
        sd = _rename(tm.state_dict(), self.RULES)
        wrapped = {"state_dict": {f"model.{k}": v for k, v in sd.items()},
                   "epoch": 3}
        v1 = variables_from_torch("SimpleCNN", wrapped)
        v2 = variables_from_torch("SimpleCNN", sd)
        a, b = jax.tree.leaves(v1), jax.tree.leaves(v2)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


class TestCNNTransformerImport:
    RULES = [
        (r"^enc\.", "encoder."),
        (r"^pos$", "pos_embedding"),
        (r"^tr\.", "transformer."),
        (r"^dec\.", "decoder."),
    ]

    def test_output_parity(self):
        tm = CNNTransformerTorch(5, 2, d=32, depth=2, heads=2, ff=64).eval()
        sd = _rename(tm.state_dict(), self.RULES)

        variables = variables_from_torch("cnn_transformer", sd)
        m = CNNTransformer(n_output_channels=2, embed_dim=32, depth=2,
                           n_heads=2, mlp_dim=64)
        x = np.random.default_rng(1).normal(size=(2, 48, 72, 5)).astype(np.float32)

        with torch.no_grad():
            ref = _np(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.moveaxis(np.asarray(jax.jit(m.apply)(
            jax.tree.map(jnp.asarray, variables), jnp.asarray(x))), -1, 1)
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


class TestUNetImport:
    RULES = [
        (r"^e1\.", "enc1."),
        (r"^e([234])\.1\.", r"enc\1.conv."),
        (r"^u([123])t\.", r"up\1.up."),
        (r"^u([123])c\.", r"up\1.conv."),
        (r"\.gate\.conv\.", ".spat.conv."),
    ]

    def test_output_parity(self):
        tm = UNetTorch(5, 2, b=8).eval()
        sd = _rename(tm.state_dict(), self.RULES)

        variables = variables_from_torch("unet", sd)
        m = UNet(n_output_channels=2, base=8)
        x = np.random.default_rng(2).normal(size=(2, 48, 72, 5)).astype(np.float32)

        with torch.no_grad():
            ref = _np(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.moveaxis(np.asarray(jax.jit(m.apply)(
            jax.tree.map(jnp.asarray, variables), jnp.asarray(x))), -1, 1)
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


class TestFlagshipImport:
    RULES = [
        (r"^e1\.", "enc1."),
        (r"^e([234])\.1\.", r"enc\1.conv."),
        (r"^lstm_conv\.", "convlstm.cell.conv."),
        (r"^u([123])t\.", r"up\1.up."),
        (r"^u([123])c\.", r"up\1.conv."),
        (r"\.gate\.conv\.", ".spat.conv."),
    ]

    def test_output_parity_and_dead_post_conv(self):
        tm = AttUNetConvLSTMTorch(7, 2, b=8).eval()
        sd = _rename(tm.state_dict(), self.RULES)
        # the reference checkpoint also carries the dead post_conv
        # (src/unet_convlstm_attention.py:47-50 — defined, never called);
        # the importer must accept and drop it
        sd["post_conv.0.weight"] = np.zeros((32, 32, 3, 3), np.float32)
        sd["post_conv.0.bias"] = np.zeros((32,), np.float32)

        variables = variables_from_torch("unet_convlstm_attention", sd)
        m = AttUNetConvLSTM(n_output_channels=2, base=8)
        x = np.random.default_rng(3).normal(size=(2, 3, 48, 72, 7)).astype(np.float32)

        with torch.no_grad():
            ref = _np(tm(torch.from_numpy(np.moveaxis(x, -1, 2).copy())))
        got = np.moveaxis(np.asarray(jax.jit(m.apply)(
            jax.tree.map(jnp.asarray, variables), jnp.asarray(x))), -1, 1)
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    def test_unknown_model_type(self):
        with pytest.raises(ValueError, match="unknown model_type"):
            variables_from_torch("resnet50", {})
