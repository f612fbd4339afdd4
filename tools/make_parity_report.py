"""Generate PARITY.md from tools/parity/*.json runs."""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARITY_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PARITY.md")

METRICS = [
    ("val/tas/avg/monthly_rmse", "tas monthly RMSE"),
    ("val/tas/time_mean_rmse", "tas time-mean RMSE"),
    ("val/tas/time_stddev_mae", "tas time-std MAE"),
    ("val/pr/avg/monthly_rmse", "pr monthly RMSE"),
    ("val/pr/time_mean_rmse", "pr time-mean RMSE"),
    ("val/pr/time_stddev_mae", "pr time-std MAE"),
    ("val/kaggle_score", "composite"),
    ("val/loss", "val MSE (norm)"),
]


def load_runs() -> dict:
    runs = {}
    for path in sorted(glob.glob(os.path.join(PARITY_DIR, "*.json"))):
        name = os.path.basename(path)[: -len(".json")]
        try:
            hist = json.load(open(path))
        except json.JSONDecodeError:
            continue
        # epoch-history runs are lists; analysis artifacts (step_breakdown,
        # ensemble scores) are dicts and get their own sections below
        if isinstance(hist, list) and hist:
            runs[name] = hist
    return runs


def load_json(name):
    """Parse an analysis artifact; tolerates tool banner lines (e.g. the
    tpu_when_alive echo) around the JSON by falling back to the last line
    that parses."""
    path = os.path.join(PARITY_DIR, name)
    if not os.path.exists(path):
        return None
    text = open(path).read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
    return None


def main():
    runs = load_runs()
    lines = [
        "# PARITY — val lat-weighted metrics, our JAX/TPU stack vs the reference-equivalent torch stack",
        "",
        "Same data, same splits, same normalization (our byte-exact-tested ETL), same architectures",
        "(param counts match the reference exactly: tests/test_models.py), same optimizer",
        "(Adam lr=5e-4, verified step-for-step against torch: tests/test_train.py), batch 64 shuffled.",
        "Torch = reference-equivalent mirrors (tools/torch_mirrors.py) on this host's CPU — the",
        "reference stack itself is not installed here and publishes no numbers (BASELINE.md);",
        "cnn_transformer, unet, and the flagship have FULL 50-epoch torch anchors; SimpleCNN",
        "is epoch-bounded (11,010 s/epoch on the 1-core host = 6.4 days for 50 epochs; the",
        "resumable run accumulates across rounds).",
        "JAX runs = this framework on one TPU v5e chip. Lower is better everywhere.",
        "",
        "Sections without a tag use the reference training recipe (Adam lr 5e-4 constant,",
        "50 epochs, batch 64). Tagged sections are beyond-parity runs on this framework:",
        "(cosine) = cosine lr decay over 150 epochs, (long) = 150 epochs constant lr,",
        "(seq12) = extended window, (bf16) = bfloat16 compute at the reference recipe,",
        "(feedback) = teacher-forced prev_<var> input channels for autoregressive rollout.",
        "Composite = the Kaggle score (0.5*tas + 0.5*pr).",
        "",
        "Headline parity results: full-length torch anchors at the reference recipe —",
        "cnn_transformer final composite torch 1.1348 vs jax 1.1342 (0.05% apart),",
        "unet best torch 1.1748 vs jax 1.1923, and the FLAGSHIP (round 3): torch",
        "best 0.8993 @ e45 / final 0.9244 vs jax best 0.8700 @ e47 / final 0.9581 —",
        "endpoint parity on all three, no extrapolation;",
        "bf16 flagship at the full",
        "reference recipe matches fp32 within epoch noise (best 0.8815 vs 0.8700, final",
        "0.974 vs 0.958) at higher throughput; beyond-parity: best single run 0.5803",
        "final / 0.5736 best-epoch (wide cnn_transformer, cosine e300), 5-member",
        "ensemble 0.582, flagship ensemble 0.697, feedback-trained flagship 0.6463",
        "(teacher-forced) with a stable 85-year closed-loop rollout scored honestly",
        "below.",
        "",
    ]

    # group by (model, pipeline[+tag]); filenames are
    # {stack}_{model}_{pipeline}[_{tag}]_e{N}.json
    groups: dict[tuple, dict] = {}
    for name, hist in runs.items():
        stack, rest = name.split("_", 1)
        base, _, _e = rest.rpartition("_e")
        model = pipeline = None
        for p in ("baseline", "ensemble", "final"):
            token = f"_{p}"
            if base.endswith(token):
                model, pipeline = base[: -len(token)], p
                break
            if f"{token}_" in base:
                model, tag = base.split(token + "_", 1)
                pipeline = f"{p} ({tag})"
                break
        if model is None:
            model, _, pipeline = base.rpartition("_")
        groups.setdefault((model, pipeline), {})[stack] = hist

    for (model, pipeline), stacks in sorted(groups.items()):
        lines.append(f"## {model} ({pipeline} pipeline)")
        lines.append("")
        jax_h = stacks.get("jax")
        torch_h = stacks.get("torch")
        header = "| metric |"
        sep = "|---|"
        if torch_h:
            n_t = len(torch_h)
            header += f" torch @ epoch {n_t - 1} |"
            sep += "---|"
            if jax_h:
                k = min(n_t, len(jax_h)) - 1
                header += f" jax @ epoch {k} |"
                sep += "---|"
        if jax_h:
            header += f" jax @ epoch {len(jax_h) - 1} (final) |"
            sep += "---|"
        lines += [header, sep]
        for key, label in METRICS:
            row = f"| {label} |"
            if torch_h:
                row += f" {torch_h[-1].get(key, float('nan')):.4f} |"
                if jax_h:
                    k = min(len(torch_h), len(jax_h)) - 1
                    row += f" {jax_h[k].get(key, float('nan')):.4f} |"
            if jax_h:
                row += f" {jax_h[-1].get(key, float('nan')):.4f} |"
            lines.append(row)
        tput = []
        if torch_h:
            tput.append(f"torch {torch_h[-1].get('samples_per_sec', 0):.1f} samples/s (CPU)")
        if jax_h:
            tput.append(f"jax {jax_h[-1].get('samples_per_sec', 0):.0f} samples/s (TPU v5e)")
        lines += ["", f"Throughput: {'; '.join(tput)}", ""]
        best = {}
        for stack, h in (("torch", torch_h), ("jax", jax_h)):
            if h:
                comps = [(e.get("val/kaggle_score"), e.get("epoch", i)) for i, e in enumerate(h)
                         if e.get("val/kaggle_score") is not None]
                if comps:
                    c, ep = min(comps)
                    best[stack] = f"{stack} {c:.4f} @ e{ep}"
        if best:
            lines += [f"Best-epoch composite: {'; '.join(best.values())}", ""]
        if "feedback" in pipeline:
            lines += [
                "Note: feedback training adds teacher-forced prev_<var> input channels, so",
                "these val metrics see the *true* previous month (easier than the standard",
                "setup); the honest closed-loop number comes from the autoregressive rollout",
                "CLI (`python -m climate_tpu.cli.rollout rollout.feedback=true`).",
                "",
            ]

    # --- MFU / step-time breakdown (tools/step_breakdown.py on the real chip) ---
    bks = [(p, load_json(f"step_breakdown_{p}.json")) for p in ("fp32", "bf16")]
    bks += [(f"{p} split-lstm", load_json(f"step_breakdown_{p}_splitlstm.json"))
            for p in ("fp32", "bf16")]
    bks = [(p, b) for p, b in bks if isinstance(b, dict) and b.get("step_time_s")]
    if bks:
        lines += [
            "## Flagship step-time breakdown + MFU (one TPU v5e chip)",
            "",
            "Full jitted train step (gather + fwd + bwd + adam) at batch 64, seq 6;",
            "FLOPs from XLA cost analysis; MFU against the v5e bf16 peak (197 TFLOP/s).",
            "Stage programs are separately jitted (they re-pay dispatch/boundary costs,",
            "so stages overlap and don't sum to the full step — the ranking is the signal).",
            "",
            "| precision | step ms | samples/s | TFLOP/s | MFU | gather ms | forward ms | encoder ms | convlstm ms |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for p, b in bks:
            lines.append(
                f"| {p} | {b['step_time_s']*1e3:.2f} | {b['samples_per_sec']:.0f} "
                f"| {b.get('achieved_tflops', 0):.1f} | {b.get('mfu_vs_bf16_peak', 0)*100:.1f}% "
                f"| {b.get('stage_gather_s', 0)*1e3:.2f} | {b.get('stage_forward_s', 0)*1e3:.2f} "
                f"| {b.get('stage_encoder_s', 0)*1e3:.2f} | {b.get('stage_convlstm_s', 0)*1e3:.2f} |"
            )
        lines += [
            "",
            "Reading: the flagship is latency/bandwidth-bound by construction — 2.2 GFLOP/sample",
            "through 48x72 conv maps and a 6x9 ConvLSTM leaves the MXU starved regardless of",
            "schedule (speed-of-light at peak FLOPs would be ~0.7 ms/step; the gap is small-op",
            "latency + HBM traffic, not a missing optimization). bf16 buys ~1.3x end-to-end.",
            "The cuDNN-style ConvLSTM recurrence split (model.split_lstm_conv) halves the",
            "sequential conv's input channels and shrinks the standalone ConvLSTM stage",
            "(2.36 -> 1.58 ms fp32) but does NOT improve the full fused step (XLA already",
            "overlaps the encoder with the scan), so it stays off by default — measured,",
            "honest dispatch, same policy as the kernels.",
            "",
        ]

    # --- seed-ensemble results (tools/ensemble_eval.py) ---
    for fname, title in [
        ("ensemble_cnn_t_cos300.json", "cnn_transformer, ensemble pipeline, cosine e300"),
        ("ensemble_cnn_t_cos300w.json",
         "3 seeds + wide 192/384 + wide 256/512 — the wide members alone are the best"
         " single runs (0.5803 final / 0.5736 best-epoch); mean-ensembling plateaus"
         " at ~0.58 because member errors are correlated and averaging shrinks the"
         " variability the time-stddev term scores"),
        ("ensemble_flagship_cos300.json", "unet_convlstm_attention, final pipeline, cosine e300"),
    ]:
        ens = load_json(fname)
        if isinstance(ens, dict) and ens.get("ensemble_composite"):
            singles = ", ".join(
                f"{os.path.basename(k).split('cos300')[-1].split('_valpreds')[0]}: {v:.4f}"
                for k, v in ens.get("member_composites", {}).items()
            )
            lines += [
                f"## Seed ensemble ({title})",
                "",
                f"Mean of {ens['n_members']} members' val predictions (physical units), one run per seed:",
                f"member composites [{singles}] -> ensemble composite **{ens['ensemble_composite']:.4f}**.",
                "",
            ]

    # --- closed-loop rollout score (cli/rollout.py rollout.score_last) ---
    cs = load_json("rollout_closed_loop_score.json")
    if isinstance(cs, dict) and cs.get("closed_loop_composite"):
        lines += [
            "## Closed-loop rollout score (honest autoregressive metric)",
            "",
            f"`rollout.score_last` scores the rolled months against the scenario's own truth:",
            f"feedback-trained flagship over ALL {cs['months']} months of {cs['scenario']} (85 years,",
            f"every prev_<var> input = the model's own prediction) -> composite",
            f"**{cs['closed_loop_composite']:.4f}** (teacher-forced val best: "
            f"{cs['teacher_forced_val_composite_best']:.4f}; the gap is compounding autoregressive",
            "error — reported as the honest closed-loop number; the reference has no rollout at all).",
            "",
        ]

    # --- closed-loop rollout demo (cli/rollout.py, feedback checkpoint) ---
    ro = load_json("rollout_feedback_demo.json")
    if isinstance(ro, dict) and ro.get("tas"):
        t, p = ro["tas"], ro["pr"]
        lines += [
            "## Closed-loop autoregressive rollout (feedback-trained flagship)",
            "",
            f"`python -m climate_tpu.cli.rollout rollout.feedback=true` over {ro['months']} months",
            f"of {ro['scenario']} forcings, predictions fed back into the prev_tas/prev_pr input",
            "channels (slots appended after the forcings — never overwriting them). Stability:",
            f"tas range [{t['min']:.1f}, {t['max']:.1f}] K, first-year mean {t['first_year_mean']:.2f} ->",
            f"last-year mean {t['last_year_mean']:.2f} (+{t['last_year_mean']-t['first_year_mean']:.2f} K over 30 y of"
            f" {ro['scenario']} — physically plausible warming, no drift blow-up); pr mean {p['mean']:.2f} mm/day.",
            "",
        ]

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({len(runs)} runs)")


if __name__ == "__main__":
    main()
