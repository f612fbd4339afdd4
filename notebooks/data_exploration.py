"""Data exploration (script form of the reference's
notebooks/data-exploration-basic.ipynb): load the Zarr store, print the
per-variable statistics the notebook reported, and save snapshot/time-series
plots.

  python notebooks/data_exploration.py [store_path] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from climate_tpu.data import open_zarr  # noqa: E402
from climate_tpu.data.etl import month_index  # noqa: E402


def main():
    store = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/processed.zarr"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "outputs/exploration"
    os.makedirs(out_dir, exist_ok=True)
    g = open_zarr(store)

    print("arrays:", g.array_names)
    print("ssp:", g.read("ssp"), " members:", g.read("member_id"))
    print("time: %d months, months-of-year head: %s" % (g.meta("time").shape[0], month_index(g)[:13]))

    for var in ["CO2", "SO2", "CH4", "BC", "rsdt", "tas", "pr"]:
        a = g.read(var)
        finite = a[np.isfinite(a) & (np.abs(a) < 1e10)]
        n_bad = int(np.isnan(a).sum() + (np.abs(a) >= 1e10).sum())
        print(
            f"{var:5s} shape={a.shape} dtype={a.dtype} "
            f"mean={finite.mean():.4g} std={finite.std():.4g} "
            f"min={finite.min():.4g} max={finite.max():.4g} corrupted/nan={n_bad}"
        )

    # snapshot maps (first month, ssp126) like notebook cells 6-8
    lat, lon = g.read("y"), g.read("x")
    for var in ["tas", "pr", "rsdt"]:
        a = g.read(var)
        field = a[0, 0, 0] if "member_id" in g.dims(var) else a[0, 0]
        fig, ax = plt.subplots(figsize=(8, 4))
        im = ax.pcolormesh(lon, lat, field, cmap="viridis")
        fig.colorbar(im)
        ax.set_title(f"{var} — 2015-01, ssp126")
        fig.savefig(os.path.join(out_dir, f"snapshot_{var}.png"), dpi=80)
        plt.close(fig)

    # global-mean time series per SSP (notebook cell 9 flavor)
    tas = g.read("tas")
    fig, ax = plt.subplots(figsize=(10, 4))
    w = np.cos(np.deg2rad(lat))[:, None]
    for i, ssp in enumerate(g.read("ssp")):
        gm = (tas[i, :, 0] * w).sum(axis=(1, 2)) / (w.sum() * tas.shape[-1])
        ax.plot(gm, label=str(ssp))
    ax.set_xlabel("month since 2015-01")
    ax.set_ylabel("global-mean tas (K)")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "tas_global_mean_timeseries.png"), dpi=80)
    plt.close(fig)
    print(f"plots saved under {out_dir}")


if __name__ == "__main__":
    main()
