"""Headless matplotlib visualizations (observability parity).

Re-creates the reference's wandb image panels with an Agg backend
(the reference's src/mpl_no_gui.py intent, never actually wired up):
- 3-panel truth/prediction/difference maps with shared color scale and a
  zero-centered diverging difference (utils_baseline.py:218-287);
- worst-train-loss sample panels (main_ensemble.py:488-547).

Figures are saved under <run_dir>/plots and optionally forwarded to wandb by
the caller. All inputs are plain numpy (host) arrays — callers pull from
device once per epoch.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

VIZ = {
    "standard_cmap": "viridis",
    "diff_cmap": "RdBu_r",
    "variance_cmap": "plasma",
    "figure_size": (18, 6),
}


def comparison_figure(
    true_map: np.ndarray,
    pred_map: np.ndarray,
    title_prefix: str,
    metric_value: float | None = None,
    metric_name: str | None = None,
    cmap: str | None = None,
):
    """truth | prediction | zero-centered difference, shared color scale."""
    cmap = cmap or VIZ["standard_cmap"]
    fig, axes = plt.subplots(1, 3, figsize=VIZ["figure_size"])
    vmin = float(min(true_map.min(), pred_map.min()))
    vmax = float(max(true_map.max(), pred_map.max()))

    for ax, data, title in ((axes[0], true_map, "Ground Truth"), (axes[1], pred_map, "Prediction")):
        im = ax.imshow(data, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
        ax.set_title(f"{title_prefix} ({title})")
        fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)

    diff = pred_map - true_map
    dmax = float(np.abs(diff).max()) or 1.0
    im = axes[2].imshow(diff, origin="lower", cmap=VIZ["diff_cmap"], vmin=-dmax, vmax=dmax)
    metric_text = f" ({metric_name}: {metric_value:.4f})" if metric_value is not None and metric_name else ""
    axes[2].set_title(f"Difference{metric_text}")
    fig.colorbar(im, ax=axes[2], fraction=0.046, pad=0.04)
    fig.tight_layout()
    return fig


def reference_panel_figures(
    phase: str,
    preds_tchw: np.ndarray,
    trues_tchw: np.ndarray,
    output_vars: list[str],
    metrics: dict,
    sample_timesteps: tuple[int, ...] = (0, 12, 24, 36, 48, 60, 72, 84, 96, 108),
):
    """Yield (wandb_name, file_stub, figure) with the reference's EXACT image
    names — `img/{var}/time_mean`, `img/{var}/time_Stddev` (capital S quirk
    preserved, main_final.py:657) and `img/{phase}/{var}/month_idx_{t}`
    (main_baseline.py:410-442) — so the image stream is name-for-name
    diffable. Caller is responsible for plt.close()."""
    n_t = preds_tchw.shape[0]
    for i, var in enumerate(output_vars):
        p, t = preds_tchw[:, i], trues_tchw[:, i]

        fig = comparison_figure(
            t.mean(0), p.mean(0), f"{var} Mean",
            metrics.get(f"{phase}/{var}/time_mean_rmse"), "Weighted RMSE",
        )
        yield f"img/{var}/time_mean", f"{var}_time_mean", fig

        fig = comparison_figure(
            t.std(0), p.std(0), f"{var} Stddev",
            metrics.get(f"{phase}/{var}/time_stddev_mae"), "Weighted MAE",
            cmap=VIZ["variance_cmap"],
        )
        yield f"img/{var}/time_Stddev", f"{var}_time_stddev", fig

        if n_t > max(sample_timesteps):
            for ts in sample_timesteps:
                fig = comparison_figure(t[ts], p[ts], f"{var} Timestep {ts}")
                yield f"img/{phase}/{var}/month_idx_{ts}", f"{var}_month_idx_{ts}", fig


def save_epoch_panels(
    run_dir: str,
    phase: str,
    preds_tchw: np.ndarray,
    trues_tchw: np.ndarray,
    output_vars: list[str],
    metrics: dict,
    sample_timesteps: tuple[int, ...] = (0, 12, 24, 36, 48, 60, 72, 84, 96, 108),
    metrics_logger=None,
    step: int = 0,
    out_subdir: str | None = None,
) -> list[str]:
    """The reference's panel set (main_baseline.py:410-442): per variable a
    time-mean map, a time-stddev map, and fixed sample timesteps. Saved under
    <run_dir>/plots/<out_subdir or phase>; when a MetricsLogger is given, each
    figure is also forwarded under its reference wandb name."""
    out_dir = os.path.join(run_dir, "plots", out_subdir or phase)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for wandb_name, stub, fig in reference_panel_figures(
        phase, preds_tchw, trues_tchw, output_vars, metrics, sample_timesteps
    ):
        path = os.path.join(out_dir, f"{stub}.png")
        fig.savefig(path, dpi=72)
        if metrics_logger is not None:
            metrics_logger.log_image(wandb_name, fig, step=step)
        plt.close(fig)
        paths.append(path)
    return paths


def worst_loss_panels(
    run_dir: str,
    preds_tchw: np.ndarray,
    trues_tchw: np.ndarray,
    output_vars: list[str],
    k: int = 4,
    metrics_logger=None,
    step: int = 0,
) -> list[str]:
    """Highest per-sample-loss panels (main_ensemble.py:488-547): rank train
    samples by MSE and render the k worst, per variable. Forwarded under the
    reference's wandb names `img/train/{var}/month_idx_{sample}`
    (main_ensemble.py:526) when a MetricsLogger is given."""
    per_sample = ((preds_tchw - trues_tchw) ** 2).mean(axis=(1, 2, 3))
    worst = np.argsort(per_sample)[-k:][::-1]
    out_dir = os.path.join(run_dir, "plots", "worst_loss")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for rank, idx in enumerate(worst):
        for i, var in enumerate(output_vars):
            fig = comparison_figure(
                trues_tchw[idx, i], preds_tchw[idx, i],
                f"{var} worst#{rank} (sample {idx})",
                float(per_sample[idx]), "sample MSE",
            )
            path = os.path.join(out_dir, f"rank{rank}_{var}_sample{idx}.png")
            fig.savefig(path, dpi=72)
            if metrics_logger is not None:
                metrics_logger.log_image(f"img/train/{var}/month_idx_{idx}", fig, step=step)
            plt.close(fig)
            paths.append(path)
    return paths
