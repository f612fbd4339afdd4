"""Import reference PyTorch checkpoints into this framework's Flax models.

Migration path for users of the reference stack
(ZhenmanShen/Physics-Based-Climate-Model): a state_dict trained there loads
here with no retraining. The converter maps the reference's module names —
src/models.py:76-123 (SimpleCNN), src/cnn_transformer.py (CNNTransformer),
src/unet.py (UNet), src/unet_convlstm_attention.py (AttUNetConvLSTM) — onto
our Flax trees, with the layout conversions the NHWC/Flax side needs:

  Conv2d          weight (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  ConvTranspose2d weight (I, O, kh, kw)  -> kernel (kh, kw, I, O), spatially
                  flipped (Flax's ConvTranspose uses the unflipped-kernel
                  convention; pinned by tests/test_torch_layer_parity.py)
  Linear          weight (O, I)          -> kernel (I, O)
  {Batch,Group,Layer}Norm weight/bias    -> scale/bias
  BatchNorm running_mean/var             -> batch_stats mean/var
  MultiheadAttention in_proj_weight      -> in_proj kernel (d, 3d); the
                  packed q/k/v row order matches torch's

Gate order of the ConvLSTM conv (i, f, o, g) and the [x; h] input-concat
order match the reference cell (src/convlstm.py:5-19) by construction, so
its fused kernel converts like any conv. The reference flagship's dead
`post_conv` (defined, never called in forward — SURVEY.md 2.6.3) is
accepted and dropped.

Accepts either a bare state_dict or a Lightning-style checkpoint dict
(`{"state_dict": {"model.<key>": ...}}`) — common prefixes are stripped.
Values may be torch tensors or numpy arrays; torch is only imported if
tensors need detaching.
"""

from __future__ import annotations

import numpy as np

__all__ = ["variables_from_torch", "strip_prefixes"]

_PREFIXES = ("model.", "module.", "net.")


def _np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (or anything exposing detach/cpu/numpy)
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def strip_prefixes(state_dict: dict) -> dict:
    """Unwrap Lightning checkpoints and strip common wrapper prefixes."""
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]
    out = {}
    for k, v in state_dict.items():
        for p in _PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


class _SD:
    """Key-tracking view of the state_dict: records what was consumed so the
    converter can fail loudly on leftovers (a misnamed checkpoint silently
    half-imported would be far worse than an error)."""

    def __init__(self, sd: dict):
        self.sd = sd
        self.used: set[str] = set()

    def __call__(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"torch checkpoint is missing '{key}' — wrong model type, or "
                f"a naming scheme this importer doesn't know. Present keys "
                f"start with: {sorted(self.sd)[:6]}"
            )
        self.used.add(key)
        return _np(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def leftovers(self, ignore: tuple[str, ...] = ()) -> list[str]:
        out = []
        for k in self.sd:
            if k in self.used:
                continue
            if k.endswith("num_batches_tracked"):
                continue  # torch BN bookkeeping with no Flax equivalent
            if any(k.startswith(p) for p in ignore):
                continue
            out.append(k)
        return sorted(out)


def _conv(sd: _SD, p: str, bias: bool = True) -> dict:
    out = {"kernel": sd(f"{p}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd(f"{p}.bias")
    return out


def _convT(sd: _SD, p: str) -> dict:
    w = sd(f"{p}.weight").transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w), "bias": sd(f"{p}.bias")}


def _dense(sd: _SD, p: str) -> dict:
    return {"kernel": sd(f"{p}.weight").T, "bias": sd(f"{p}.bias")}


def _norm(sd: _SD, p: str) -> dict:
    return {"scale": sd(f"{p}.weight"), "bias": sd(f"{p}.bias")}


def _bn_stats(sd: _SD, p: str) -> dict:
    return {"mean": sd(f"{p}.running_mean"), "var": sd(f"{p}.running_var")}


# --------------------------------------------------------------- SimpleCNN
def _simple_cnn(sd: _SD) -> dict:
    params = {
        "Conv_0": _conv(sd, "initial.0"),
        "BatchNorm_0": _norm(sd, "initial.1"),
        "Conv_1": _conv(sd, "final.0"),
        "BatchNorm_1": _norm(sd, "final.1"),
        "Conv_2": _conv(sd, "final.3"),
    }
    stats = {
        "BatchNorm_0": _bn_stats(sd, "initial.1"),
        "BatchNorm_1": _bn_stats(sd, "final.1"),
    }
    i = 0
    while sd.has(f"res_blocks.{i}.conv1.weight"):
        p = f"res_blocks.{i}"
        blk = {
            "Conv_0": _conv(sd, f"{p}.conv1"),
            "BatchNorm_0": _norm(sd, f"{p}.bn1"),
            "Conv_1": _conv(sd, f"{p}.conv2"),
            "BatchNorm_1": _norm(sd, f"{p}.bn2"),
        }
        blk_stats = {
            "BatchNorm_0": _bn_stats(sd, f"{p}.bn1"),
            "BatchNorm_1": _bn_stats(sd, f"{p}.bn2"),
        }
        if sd.has(f"{p}.skip.0.weight"):  # channel-changing block
            blk["Conv_2"] = _conv(sd, f"{p}.skip.0")
            blk["BatchNorm_2"] = _norm(sd, f"{p}.skip.1")
            blk_stats["BatchNorm_2"] = _bn_stats(sd, f"{p}.skip.1")
        params[f"ResidualBlock_{i}"] = blk
        stats[f"ResidualBlock_{i}"] = blk_stats
        i += 1
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------- CNNTransformer
def _cnn_transformer(sd: _SD) -> dict:
    params = {
        "Conv_0": _conv(sd, "encoder.0"),
        "Conv_1": _conv(sd, "encoder.2"),
        "pos_embedding": sd("pos_embedding"),
        "ConvTranspose_0": _convT(sd, "decoder.0"),
        "ConvTranspose_1": _convT(sd, "decoder.2"),
        "Conv_2": _conv(sd, "decoder.4"),
    }
    i = 0
    while sd.has(f"transformer.layers.{i}.norm1.weight"):
        p = f"transformer.layers.{i}"
        params[f"TransformerEncoderLayer_{i}"] = {
            "MultiHeadSelfAttention_0": {
                "in_proj": {
                    "kernel": sd(f"{p}.self_attn.in_proj_weight").T,
                    "bias": sd(f"{p}.self_attn.in_proj_bias"),
                },
                "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
            },
            "Dense_0": _dense(sd, f"{p}.linear1"),
            "Dense_1": _dense(sd, f"{p}.linear2"),
            "LayerNorm_0": _norm(sd, f"{p}.norm1"),
            "LayerNorm_1": _norm(sd, f"{p}.norm2"),
        }
        i += 1
    return {"params": params}


# --------------------------------------------------- UNet / AttUNetConvLSTM
def _conv_block(sd: _SD, p: str) -> dict:
    return {
        "Conv_0": _conv(sd, f"{p}.body.0", bias=False),
        "GroupNorm_0": _norm(sd, f"{p}.body.1"),
        "Conv_1": _conv(sd, f"{p}.body.3", bias=False),
        "GroupNorm_1": _norm(sd, f"{p}.body.4"),
        "SEBlock_0": {
            "Conv_0": _conv(sd, f"{p}.se.fc.0", bias=False),
            "Conv_1": _conv(sd, f"{p}.se.fc.2", bias=False),
        },
        "SpatialGate_0": {"Conv_0": _conv(sd, f"{p}.spat.conv", bias=False)},
    }


def _unet(sd: _SD) -> dict:
    return {"params": {
        "ConvBlock_0": _conv_block(sd, "enc1"),
        "Down_0": {"ConvBlock_0": _conv_block(sd, "enc2.conv")},
        "Down_1": {"ConvBlock_0": _conv_block(sd, "enc3.conv")},
        "Down_2": {"ConvBlock_0": _conv_block(sd, "enc4.conv")},
        "ConvBlock_1": _conv_block(sd, "bott"),
        "Up_0": {"ConvTranspose_0": _convT(sd, "up3.up"),
                 "ConvBlock_0": _conv_block(sd, "up3.conv")},
        "Up_1": {"ConvTranspose_0": _convT(sd, "up2.up"),
                 "ConvBlock_0": _conv_block(sd, "up2.conv")},
        "Up_2": {"ConvTranspose_0": _convT(sd, "up1.up"),
                 "ConvBlock_0": _conv_block(sd, "up1.conv")},
        "Conv_0": _conv(sd, "head"),
    }}


def _att_unet_convlstm(sd: _SD) -> dict:
    return {"params": {
        "ConvBlock_0": _conv_block(sd, "enc1"),
        "Down_0": {"ConvBlock_0": _conv_block(sd, "enc2.conv")},
        "Down_1": {"ConvBlock_0": _conv_block(sd, "enc3.conv")},
        "Down_2": {"ConvBlock_0": _conv_block(sd, "enc4.conv")},
        "ConvLSTM_0": {"cell": {"Conv_0": _conv(sd, "convlstm.cell.conv")}},
        "Up_0": {"ConvTranspose_0": _convT(sd, "up3.up"),
                 "ConvBlock_0": _conv_block(sd, "up3.conv")},
        "Up_1": {"ConvTranspose_0": _convT(sd, "up2.up"),
                 "ConvBlock_0": _conv_block(sd, "up2.conv")},
        "Up_2": {"ConvTranspose_0": _convT(sd, "up1.up"),
                 "ConvBlock_0": _conv_block(sd, "up1.conv")},
        "Conv_0": _conv(sd, "head"),
    }}


_CONVERTERS = {
    "SimpleCNN": (_simple_cnn, ()),
    "cnn_transformer": (_cnn_transformer, ()),
    "unet": (_unet, ()),
    # the reference defines post_conv but never calls it in forward
    # (src/unet_convlstm_attention.py:47-50,64-103); we drop it deliberately
    "unet_convlstm_attention": (_att_unet_convlstm, ("post_conv.",)),
}


def variables_from_torch(model_type: str, state_dict: dict,
                         strict: bool = True) -> dict:
    """Convert a reference torch state_dict into Flax variables for
    `climate_tpu.models.get_model({"model": {"type": model_type, ...}})`.

    Returns {"params": ..., [ "batch_stats": ...]} with numpy leaves.
    strict=True (default) raises on unconsumed keys (other than BN
    bookkeeping and known-dead modules) so silent half-imports can't happen.
    """
    if model_type not in _CONVERTERS:
        raise ValueError(
            f"unknown model_type {model_type!r}; supported: {sorted(_CONVERTERS)}"
        )
    fn, ignore = _CONVERTERS[model_type]
    sd = _SD(strip_prefixes(state_dict))
    variables = fn(sd)
    left = sd.leftovers(ignore)
    if left and strict:
        raise ValueError(
            f"torch checkpoint has {len(left)} unconsumed keys (pass "
            f"strict=False to ignore): {left[:8]}"
        )
    return variables
