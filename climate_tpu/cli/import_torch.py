"""Import a reference PyTorch checkpoint into this framework.

  python -m climate_tpu.cli.import_torch torch_ckpt=<file.pt> \
      model=unet_convlstm_attention data=data_final [out_dir=<dir>]

Migration path for users of the reference stack: a torch checkpoint (bare
state_dict, `torch.save(model.state_dict())`, or a Lightning .ckpt with a
"state_dict" entry) is converted (climate_tpu/compat/torch_import.py) and
written as an Orbax checkpoint directory that every CLI here accepts via
`ckpt_path=` — eval-only replay, rollout, serving, or fine-tuning (a fresh
optimizer state at step 0 is attached, matching training.lr).

Normalization stats are NOT in torch checkpoints (the reference keeps them
implicit in its dataloaders); on first load the Experiment recomputes them
deterministically from the configured data, exactly as the reference rebuilds
them on every run.
"""

from __future__ import annotations

import json
import os
import sys

from ..config.loader import compose, to_yaml
from ..utils.logging import get_logger
from .main import DEFAULT_CONFIG_DIR

log = get_logger("climate_tpu.import_torch")


def main(argv: list[str] | None = None) -> dict:
    argv = sys.argv[1:] if argv is None else argv
    cfg = compose(os.environ.get("CLIMATE_TPU_CONFIG_DIR", DEFAULT_CONFIG_DIR), overrides=argv)
    src = cfg.get("torch_ckpt")
    if not src:
        raise SystemExit("import_torch requires torch_ckpt=<file.pt>")

    import jax

    # conversion is pure host work — never touch (or wait for) an accelerator
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from ..compat import variables_from_torch
    from ..models.registry import get_model, is_sequence_model, n_input_channels
    from ..train.state import build_optimizer, create_train_state

    log.info(f"Import config:\n{to_yaml(cfg)}")
    raw = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(raw, "state_dict"):  # a pickled nn.Module instead of a dict
        raw = raw.state_dict()
    epoch = raw.get("epoch", -1) if isinstance(raw, dict) else -1

    mtype = cfg["model"]["type"]
    variables = variables_from_torch(
        mtype, raw, strict=not bool(cfg.get("import_lenient", False))
    )

    model = get_model(cfg)
    data_cfg = cfg["data"]
    c_in = n_input_channels(data_cfg)
    if is_sequence_model(cfg):
        example = jnp.zeros((1, int(data_cfg.get("seq_len", 1)), 48, 72, c_in), jnp.float32)
    else:
        example = jnp.zeros((1, 48, 72, c_in), jnp.float32)

    tx = build_optimizer(float(cfg.get("training", {}).get("lr", 5e-4)))
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    # shape-check the imported tree against the freshly-initialized one: a
    # config/checkpoint mismatch must fail HERE, not at first apply
    def _check(path, a, b):
        if tuple(a.shape) != tuple(b.shape):
            raise SystemExit(
                f"shape mismatch at {jax.tree_util.keystr(path)}: checkpoint "
                f"{tuple(b.shape)} vs model {tuple(a.shape)} — check the model/"
                f"data config matches the training run (widths, depth, channels)"
            )
        return jnp.asarray(np.asarray(b), a.dtype)

    params = jax.tree_util.tree_map_with_path(_check, state.params, variables["params"])
    state = state.replace(params=params)
    if "batch_stats" in variables and len(jax.tree.leaves(state.batch_stats)):
        bs = jax.tree_util.tree_map_with_path(
            _check, state.batch_stats, variables["batch_stats"]
        )
        state = state.replace(batch_stats=bs)

    out_dir = os.path.abspath(cfg.get("out_dir") or (os.path.splitext(src)[0] + "_imported"))
    os.makedirs(out_dir, exist_ok=True)
    import orbax.checkpoint as ocp

    path = os.path.join(out_dir, "imported")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    meta = {
        "epoch": int(epoch) if isinstance(epoch, (int, float)) else -1,
        "step": 0,
        "metrics": {},
        "imported_from": os.path.abspath(src),
        "imported_model_type": mtype,
    }
    with open(path + ".climate_meta.json", "w") as f:
        json.dump(meta, f)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    log.info(f"Imported {n_params:,} params -> {path} (use ckpt_path={path})")
    return {"ckpt_path": path, "n_params": n_params, "model": mtype}


if __name__ == "__main__":
    print(json.dumps(main()))
