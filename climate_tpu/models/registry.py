"""Model factory — dispatch on cfg.model.type (parity: src/models.py:7-38).

Fixes two reference gotchas deliberately (SURVEY.md 2.6.1/2.6.2):
- in_ch derives from the data config (input_vars + seasonal channels) instead
  of the hardcoded `in_ch=7` at src/models.py:26;
- seq_len has one source of truth (cfg.data.seq_len) and is a data-pipeline
  property; models consume whatever T they are given.
"""

from __future__ import annotations

import jax.numpy as jnp

from .att_unet_convlstm import AttUNetConvLSTM
from .cnn_transformer import CNNTransformer
from .simple_cnn import SimpleCNN
from .unet import UNet

SEQUENCE_MODELS = {"unet_convlstm_attention"}


def n_input_channels(data_cfg: dict) -> int:
    n = len(data_cfg["input_vars"])
    if data_cfg.get("seasonal_embeddings"):
        n += 2
    n += len(data_cfg.get("feedback_vars", []) or [])  # prev_<var> channels
    return n


def get_model(cfg: dict):
    """Build the Flax module from the composed config (data + model groups)."""
    model_cfg = cfg["model"]
    data_cfg = cfg["data"]
    mtype = model_cfg["type"]
    n_out = len(data_cfg["output_vars"])
    dtype = jnp.bfloat16 if cfg.get("training", {}).get("precision") == "bf16" else jnp.float32

    if mtype == "SimpleCNN":
        return SimpleCNN(
            n_output_channels=n_out,
            kernel_size=model_cfg.get("kernel_size", 3),
            init_dim=model_cfg.get("init_dim", 64),
            depth=model_cfg.get("depth", 4),
            dropout_rate=model_cfg.get("dropout_rate", 0.2),
            dtype=dtype,
        )
    if mtype == "cnn_transformer":
        return CNNTransformer(
            n_output_channels=n_out,
            embed_dim=model_cfg.get("embed_dim", 128),
            depth=model_cfg.get("depth", 4),
            n_heads=model_cfg.get("n_heads", 4),
            mlp_dim=model_cfg.get("mlp_dim", 256),
            dropout=model_cfg.get("dropout", 0.1),
            dtype=dtype,
        )
    if mtype == "unet":
        return UNet(n_output_channels=n_out, base=model_cfg.get("base_channels", 16), dtype=dtype)
    if mtype == "unet_convlstm_attention":
        return AttUNetConvLSTM(
            n_output_channels=n_out,
            base=model_cfg.get("base_channels", 16),
            dtype=dtype,
            split_lstm_conv=bool(model_cfg.get("split_lstm_conv", False)),
            fused_lstm=bool(model_cfg.get("fused_lstm", False)),
        )
    raise ValueError(f"Unknown model type: {mtype}")


def is_sequence_model(cfg: dict) -> bool:
    return cfg["model"]["type"] in SEQUENCE_MODELS
