"""Prediction-ensemble scorer (round-2 beyond-parity, VERDICT item 10).

Averages val predictions (physical units) from N runs' *_valpreds.npz files
(written by parity_run.py --save-preds) and reports the composite + the
per-member composites. All members must share the same val split (same
pipeline/val config) — asserted via identical target arrays.

  python tools/ensemble_eval.py tools/parity/jax_*_seed*_valpreds.npz
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUTPUT_VARS = ["tas", "pr"]


def main(paths: list[str]) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from climate_tpu.eval.metrics import kaggle_composite_score

    members, trues, lat = [], None, None
    per_member = {}
    for p in paths:
        z = np.load(p)
        if trues is None:
            trues, lat = z["trues"], z["lat"]
        else:
            assert np.allclose(trues, z["trues"]), f"{p}: val split differs"
        members.append(z["preds"])
        per_member[os.path.basename(p)] = float(
            kaggle_composite_score(z["preds"], trues, lat, OUTPUT_VARS)
        )

    mean_pred = np.mean(np.stack(members), axis=0)
    result = {
        "n_members": len(members),
        "member_composites": per_member,
        "ensemble_composite": float(kaggle_composite_score(mean_pred, trues, lat, OUTPUT_VARS)),
    }
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
