"""Parity runner: train the same config through both stacks, record metrics.

  python tools/parity_run.py --stack torch --model cnn_transformer --pipeline baseline --epochs 50
  python tools/parity_run.py --stack jax   --model cnn_transformer --pipeline baseline --epochs 50

Identical data/splits/normalization (our tested ETL), identical architecture
(Flax zoo vs torch mirrors with matching param counts), identical optimizer
(Adam lr 5e-4), batch 64 shuffled. Per-epoch val metrics land in
tools/parity/<stack>_<model>_<pipeline>_e<epochs>.json; PARITY.md summarizes.

The jax stack path runs the real framework (climate_tpu Experiment); the
torch path is the reference-equivalent loop (per-step host dispatch, eager,
like the reference's Lightning loop).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PARITY_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity")
INPUT_VARS = ["CO2", "SO2", "CH4", "BC", "rsdt"]
OUTPUT_VARS = ["tas", "pr"]
TRAIN_SSPS = ["ssp126", "ssp370", "ssp585"]
BATCH = 64


def data_kwargs(pipeline: str, seq_len: int) -> dict:
    kw = dict(
        pipeline=pipeline, input_vars=INPUT_VARS, output_vars=OUTPUT_VARS,
        train_ssps=TRAIN_SSPS, test_ssp="ssp245",
    )
    if pipeline == "baseline":
        kw["target_member_id"] = 0
    else:
        kw["member_ids"] = [0, 1, 2]
    if pipeline == "final":
        kw["seasonal_embeddings"] = True
    return kw


TRANSFORM_MAP = {
    "CO2": {"method": "log1p"}, "SO2": {"method": "log1p"},
    "CH4": {"method": "minimax"}, "BC": {"method": "log1p"},
    "rsdt": {"method": "minimax", "min": 0, "max": 550},
    "tas": {"method": "zscore"}, "pr": {"method": "log1p"},
    "sin_month": {"method": "zscore"}, "cos_month": {"method": "zscore"},
}


def load_normalized(pipeline: str, seq_len: int):
    from climate_tpu.data import open_zarr, prepare_databundle
    from climate_tpu.transforms import normalize as tf

    g = open_zarr("/root/reference/data/processed.zarr")
    b = prepare_databundle(g, **data_kwargs(pipeline, seq_len))
    if pipeline == "final":
        in_stats = tf.compute_stats(b.train.inputs, b.input_vars, TRANSFORM_MAP)
        out_stats = tf.compute_stats(b.train.outputs, b.output_vars, TRANSFORM_MAP)
    else:
        in_stats = tf.global_zscore_stats(b.train.inputs)
        out_stats = tf.global_zscore_stats(b.train.outputs)
    xtr = np.nan_to_num(tf.normalize(b.train.inputs, in_stats), nan=0.0).astype(np.float32)
    ytr = tf.normalize(b.train.outputs, out_stats).astype(np.float32)
    xva = np.nan_to_num(tf.normalize(b.val.inputs, in_stats), nan=0.0).astype(np.float32)
    yva = tf.normalize(b.val.outputs, out_stats).astype(np.float32)
    return b, out_stats, xtr, ytr, xva, yva


def eval_metrics(preds_norm, yva_norm, out_stats, lat):
    from climate_tpu.eval.metrics import evaluate_predictions, kaggle_composite_score
    from climate_tpu.transforms import normalize as tf

    val_loss = float(np.mean((preds_norm - yva_norm) ** 2))
    preds_d = tf.inverse_transform(preds_norm.astype(np.float64), out_stats)
    trues_d = tf.inverse_transform(yva_norm.astype(np.float64), out_stats)
    m = {k: float(v) for k, v in evaluate_predictions(preds_d, trues_d, lat, OUTPUT_VARS, "val").items()}
    m["val/loss"] = val_loss
    m["val/kaggle_score"] = float(kaggle_composite_score(preds_d, trues_d, lat, OUTPUT_VARS))
    return m


def windows(x: np.ndarray, idx: np.ndarray, seq_len: int) -> np.ndarray:
    """(N,C,H,W) + target idx -> (B,T,C,H,W), zero left-padding."""
    out = np.zeros((len(idx), seq_len, *x.shape[1:]), dtype=x.dtype)
    for j, i in enumerate(idx):
        for t in range(seq_len):
            src = i - seq_len + 1 + t
            if src >= 0:
                out[j, t] = x[src]
    return out


def run_torch(model_name: str, pipeline: str, epochs: int, seq_len: int, out_path: str, model_kw: dict):
    import torch

    from tools.torch_mirrors import build

    torch.manual_seed(42)
    np.random.seed(42)
    b, out_stats, xtr, ytr, xva, yva = load_normalized(pipeline, seq_len)
    cin = xtr.shape[1]
    seq = model_name == "unet_convlstm_attention"

    model = build(model_name, cin, len(OUTPUT_VARS), **model_kw)
    print("torch params:", sum(p.numel() for p in model.parameters()), flush=True)
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    crit = torch.nn.MSELoss()

    # Epoch-level resume: long anchors (the flagship is ~10-30 min/epoch on
    # this 1-core host) survive machine restarts and round boundaries. The
    # RNG stream is torch/np state saved with the checkpoint, so a resumed
    # run draws the same permutations it would have drawn uninterrupted.
    ckpt_path = out_path.replace(".json", "_resume.pt")
    history = []
    start_epoch = 0
    if os.path.exists(ckpt_path) and os.path.exists(out_path):
        try:
            ck = torch.load(ckpt_path, weights_only=False)
            model.load_state_dict(ck["model"])
            opt.load_state_dict(ck["opt"])
            torch.set_rng_state(ck["torch_rng"])
            np.random.set_state(ck["np_rng"])
            history = json.load(open(out_path))[: ck["epoch"] + 1]
            start_epoch = ck["epoch"] + 1
            print(f"[torch {model_name}/{pipeline}] resuming at epoch {start_epoch}", flush=True)
        except Exception as e:  # corrupt checkpoint -> start over
            print(f"[torch {model_name}/{pipeline}] resume failed ({e}); restarting", flush=True)
            history, start_epoch = [], 0

    n = len(xtr)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        model.train()
        perm = np.random.permutation(n)
        tl = []
        for s in range(0, n, BATCH):
            idx = perm[s : s + BATCH]
            xb = windows(xtr, idx, seq_len) if seq else xtr[idx]
            opt.zero_grad()
            loss = crit(model(torch.from_numpy(xb)), torch.from_numpy(ytr[idx]))
            loss.backward()
            opt.step()
            tl.append(loss.item())
        model.eval()
        with torch.no_grad():
            preds = []
            for s in range(0, len(xva), BATCH):
                idx = np.arange(s, min(s + BATCH, len(xva)))
                xb = windows(xva, idx, seq_len) if seq else xva[idx]
                preds.append(model(torch.from_numpy(xb)).numpy())
            preds = np.concatenate(preds, 0)
        m = eval_metrics(preds, yva, out_stats, b.lat)
        m.update(epoch=epoch, train_loss=float(np.mean(tl)),
                 epoch_seconds=time.time() - t0, samples_per_sec=n / (time.time() - t0))
        history.append(m)
        with open(out_path, "w") as f:
            json.dump(history, f, indent=1)
        torch.save(
            {"model": model.state_dict(), "opt": opt.state_dict(), "epoch": epoch,
             "torch_rng": torch.get_rng_state(), "np_rng": np.random.get_state()},
            ckpt_path,
        )
        print(f"[torch {model_name}/{pipeline}] epoch {epoch}: train {m['train_loss']:.4f} "
              f"val {m['val/loss']:.4f} comp {m['val/kaggle_score']:.4f} ({m['epoch_seconds']:.0f}s)",
              flush=True)


def run_jax(model_name: str, pipeline: str, epochs: int, seq_len: int, out_path: str, model_kw: dict,
            save_preds: bool = False, members: int = 1, member_seeds: list[int] | None = None):
    import jax

    # PARITY_JAX_PLATFORM=cpu forces CPU; unset -> ambient default (axon TPU)
    plat = os.environ.get("PARITY_JAX_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from climate_tpu.train.experiment import Experiment

    data_group = {"baseline": "default", "ensemble": "data_ensemble", "final": "data_final"}[pipeline]
    from climate_tpu.config.loader import compose

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    overrides = [
        f"data={data_group}", f"model={model_name}",
        f"trainer.max_epochs={epochs}", "trainer.devices=1",
        f"output_dir={PARITY_DIR}/jax_runs",
    ]
    if pipeline == "final":
        overrides.append(f"data.seq_len={seq_len}")
    if members > 1:
        # K members vmapped into one jitted step (trainer.py n_members) —
        # the ensemble-member factory; per-member checkpoints + valpreds.
        overrides.append(f"training.n_members={members}")
        if member_seeds:
            overrides.append("training.member_seeds=[" + ",".join(map(str, member_seeds)) + "]")
    for k, v in model_kw.items():
        overrides.append(f"model.{k}={v}")
    overrides += [ov for ov in os.environ.get("PARITY_EXTRA_OVERRIDES", "").split() if ov]
    cfg = compose(cfg_dir, overrides=overrides)
    exp = Experiment(cfg)

    history = []
    orig_validate = exp.validate

    def recording_validate(epoch):
        m = orig_validate(epoch)
        entry = dict(m)
        entry["epoch"] = epoch
        entry["samples_per_sec"] = exp.timer.samples_per_sec
        if getattr(exp, "n_members", 1) > 1:
            entry["members"] = exp._last_member_metrics
        history.append(entry)
        with open(out_path, "w") as f:
            json.dump(history, f, indent=1)
        return m

    exp.validate = recording_validate
    exp.fit()

    if save_preds:
        # final-model val predictions in PHYSICAL units, for ensembling
        # (tools/ensemble_eval.py averages these across runs/seeds)
        import jax.numpy as jnp

        from climate_tpu.train.trainer import predict_dataset

        preds_norm = predict_dataset(
            exp.step_fns, exp.state, exp.val_x, exp.val_ds.n, exp.eval_batch_size
        )
        trues = np.asarray(exp._denorm_tchw(exp.val_ds.outputs), np.float64)
        if getattr(exp, "n_members", 1) > 1:
            # one npz per member — each feeds the stack like an independent run
            for k, seed in enumerate(exp.member_seeds):
                preds = np.asarray(
                    exp._denorm_tchw(preds_norm[k].astype(jnp.float32)), np.float64
                )
                npz = out_path.replace(".json", f"_seed{seed}_valpreds.npz")
                np.savez_compressed(npz, preds=preds, trues=trues, lat=np.asarray(exp.lat))
                print(f"member {k} (seed {seed}) val predictions saved to {npz}", flush=True)
        else:
            preds = np.asarray(exp._denorm_tchw(preds_norm.astype(jnp.float32)), np.float64)
            npz = out_path.replace(".json", "_valpreds.npz")
            np.savez_compressed(npz, preds=preds, trues=trues, lat=np.asarray(exp.lat))
            print(f"val predictions saved to {npz}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", choices=["torch", "jax"], required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--pipeline", choices=["baseline", "ensemble", "final"], default="baseline")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--seq-len", type=int, default=6)
    ap.add_argument("--model-kw", type=json.loads, default={})
    ap.add_argument("--tag", default="", help="suffix for the output file name")
    ap.add_argument("--save-preds", action="store_true",
                    help="save final val predictions (physical units) for ensembling")
    ap.add_argument("--members", type=int, default=1,
                    help="jax only: train K members in one vmapped step")
    ap.add_argument("--member-seeds", default="",
                    help="comma-separated member seeds (default seed..seed+K-1)")
    args = ap.parse_args()

    os.makedirs(PARITY_DIR, exist_ok=True)
    tag = f"_{args.tag}" if args.tag else ""
    out = os.path.join(PARITY_DIR, f"{args.stack}_{args.model}_{args.pipeline}{tag}_e{args.epochs}.json")
    if args.stack == "torch":
        run_torch(args.model, args.pipeline, args.epochs, args.seq_len, out, args.model_kw)
    else:
        seeds = [int(s) for s in args.member_seeds.split(",") if s] or None
        run_jax(args.model, args.pipeline, args.epochs, args.seq_len, out, args.model_kw,
                save_preds=args.save_preds, members=args.members, member_seeds=seeds)


if __name__ == "__main__":
    main()
