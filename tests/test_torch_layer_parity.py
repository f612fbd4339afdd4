"""Layer-semantics parity: flax layers vs torch layers with transplanted
weights (SURVEY.md section 7 hard part (b): ConvTranspose2d, GroupNorm,
BatchNorm conventions, TransformerEncoderLayer post-LN).

Each test builds the torch layer, maps its weights into our flax module, and
asserts numerically identical outputs on the same input — proving the
architecture re-statements compute the same function, not just the same
shapes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

RTOL, ATOL = 2e-5, 2e-5


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestConv:
    def test_conv2d_same_padding(self):
        tconv = torch.nn.Conv2d(5, 8, 3, padding=1)
        x = torch.randn(2, 5, 12, 16)
        ref = tconv(x).detach().numpy()

        fconv = nn.Conv(8, (3, 3), padding=1)
        variables = {
            "params": {
                "kernel": t2j(tconv.weight.permute(2, 3, 1, 0)),  # OIHW -> HWIO
                "bias": t2j(tconv.bias),
            }
        }
        got = fconv.apply(variables, t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref, rtol=RTOL, atol=ATOL)

    def test_conv2d_strided(self):
        tconv = torch.nn.Conv2d(5, 8, 3, stride=2, padding=1)
        x = torch.randn(2, 5, 48, 72)
        ref = tconv(x).detach().numpy()
        fconv = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)
        variables = {"params": {"kernel": t2j(tconv.weight.permute(2, 3, 1, 0)), "bias": t2j(tconv.bias)}}
        got = fconv.apply(variables, t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref, rtol=RTOL, atol=ATOL)


class TestConvTranspose:
    def test_convtranspose2d_k2s2(self):
        """The upsampling deconv used by UNet/CNNTransformer (k=2, s=2)."""
        tconv = torch.nn.ConvTranspose2d(8, 4, 2, stride=2)
        x = torch.randn(2, 8, 6, 9)
        ref = tconv(x).detach().numpy()

        fconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
        # torch weight (in, out, kh, kw) -> flax (kh, kw, in, out) + spatial
        # flip: flax ConvTranspose uses the unflipped-kernel convention. A
        # pure reparameterization — training from scratch learns the same
        # function class.
        kernel = np.asarray(tconv.weight.permute(2, 3, 0, 1).detach())[::-1, ::-1].copy()
        variables = {"params": {"kernel": jnp.asarray(kernel), "bias": t2j(tconv.bias)}}
        got = fconv.apply(variables, t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref, rtol=RTOL, atol=ATOL)


class TestNorms:
    def test_groupnorm(self):
        tn = torch.nn.GroupNorm(8, 32, eps=1e-5)
        with torch.no_grad():
            tn.weight.copy_(torch.randn(32))
            tn.bias.copy_(torch.randn(32))
        x = torch.randn(2, 32, 6, 9)
        ref = tn(x).detach().numpy()

        fn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
        variables = {"params": {"scale": t2j(tn.weight), "bias": t2j(tn.bias)}}
        got = fn.apply(variables, t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref, rtol=RTOL, atol=ATOL)

    def test_batchnorm_train_and_momentum(self):
        """Batch stats + running-stat update under torch conventions
        (momentum 0.1 torch == 0.9 flax)."""
        tn = torch.nn.BatchNorm2d(16, eps=1e-5, momentum=0.1)
        x = torch.randn(8, 16, 6, 9)
        tn.train()
        ref = tn(x).detach().numpy()

        fn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        variables = {
            "params": {"scale": t2j(tn.weight), "bias": t2j(tn.bias)},
            "batch_stats": {"mean": jnp.zeros(16), "var": jnp.ones(16)},
        }
        got, mutated = fn.apply(variables, t2j(x.permute(0, 2, 3, 1)), mutable=["batch_stats"])
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref, rtol=1e-4, atol=1e-4)
        # torch tracks running var with Bessel correction (unbiased); flax uses
        # the biased batch var. Compare means exactly, vars with the n/(n-1)
        # factor (n = 8*6*9 = 432).
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]), tn.running_mean.numpy(), rtol=1e-4, atol=1e-5
        )
        # torch's running var uses the UNBIASED batch var; flax EMAs the
        # biased one: torch = (flax_ema - 0.9*prior) * n/(n-1) + 0.9*prior
        n = 8 * 6 * 9
        flax_var = np.asarray(mutated["batch_stats"]["var"])
        np.testing.assert_allclose(
            (flax_var - 0.9) * n / (n - 1) + 0.9,
            tn.running_var.numpy(),
            rtol=1e-4,
            atol=1e-5,
        )


class TestTransformerLayer:
    def test_post_ln_encoder_layer(self):
        """Full TransformerEncoderLayer parity with transplanted weights
        (post-LN, ReLU FF, packed QKV — torch defaults used by the reference,
        src/cnn_transformer.py:25-32)."""
        from climate_tpu.models.layers import TransformerEncoderLayer

        d, h, ff = 32, 4, 64
        tl = torch.nn.TransformerEncoderLayer(d, h, ff, dropout=0.0, batch_first=True)
        tl.eval()
        x = torch.randn(2, 10, d)
        ref = tl(x).detach().numpy()

        fl = TransformerEncoderLayer(d_model=d, n_heads=h, mlp_dim=ff, dropout=0.0)
        params = {
            "MultiHeadSelfAttention_0": {
                "in_proj": {
                    "kernel": t2j(tl.self_attn.in_proj_weight.T),
                    "bias": t2j(tl.self_attn.in_proj_bias),
                },
                "out_proj": {
                    "kernel": t2j(tl.self_attn.out_proj.weight.T),
                    "bias": t2j(tl.self_attn.out_proj.bias),
                },
            },
            "LayerNorm_0": {"scale": t2j(tl.norm1.weight), "bias": t2j(tl.norm1.bias)},
            "LayerNorm_1": {"scale": t2j(tl.norm2.weight), "bias": t2j(tl.norm2.bias)},
            "Dense_0": {"kernel": t2j(tl.linear1.weight.T), "bias": t2j(tl.linear1.bias)},
            "Dense_1": {"kernel": t2j(tl.linear2.weight.T), "bias": t2j(tl.linear2.bias)},
        }
        got = fl.apply({"params": params}, t2j(x))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-5, atol=5e-5)


class TestActivations:
    def test_silu_sigmoid_tanh(self):
        x = torch.randn(100)
        np.testing.assert_allclose(
            np.asarray(nn.silu(t2j(x))), torch.nn.functional.silu(x).numpy(), rtol=RTOL, atol=ATOL
        )
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(t2j(x))), torch.sigmoid(x).numpy(), rtol=RTOL, atol=ATOL
        )

    def test_maxpool(self):
        x = torch.randn(2, 4, 8, 12)
        ref = torch.nn.functional.max_pool2d(x, 2).numpy()
        got = nn.max_pool(t2j(x.permute(0, 2, 3, 1)), (2, 2), strides=(2, 2))
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref, rtol=RTOL, atol=ATOL)
