"""Standalone two-point-slope HBM bandwidth probe (VERDICT r4 item 5).

Re-measures ONLY the streaming-bandwidth denominator of the step roofline
and merges it into tools/parity/hbm_roofline.json, leaving the XLA cost
analysis numbers (flops / bytes-accessed / HLO counts) untouched — those
are deterministic properties of the compiled step and were captured by
bench.py's ROOFLINE mode; recomputing them costs a full train-step compile
(~tens of minutes on the remote compiler) for identical values.

Method (bench.py:138-164, extracted): time the SAME jitted
y = a*x + b fori_loop program at two rep counts over a 1 GiB fp32 buffer;
bytes_delta / time_delta cancels every constant term (axon tunnel
round-trip, dispatch, cache-load) exactly. The single-shot probe read
215.7 GB/s on an 819 GB/s chip because those constants are comparable to
the ~40 ms the traffic itself takes at peak.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tools", "parity", "hbm_roofline.json")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    big = jax.device_put(jnp.ones((256 * 1024 * 1024,), jnp.float32))  # 1 GiB

    def timed_saxpy(reps: int) -> float:
        f = jax.jit(lambda v: jax.lax.fori_loop(
            0, reps, lambda _, x: x * 1.0001 + 0.5, v))
        out = f(big)
        _ = np.asarray(out.ravel()[-1:])  # warm + true sync
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            out = f(big)
            _ = np.asarray(out.ravel()[-1:])
            best = min(best, time.perf_counter() - t0)
        return best

    # 2 GiB traffic (1 read + 1 write) per rep; 64-rep delta = 128 GiB of
    # traffic, ~170 ms at the 819 GB/s spec — two orders of magnitude above
    # the constant terms the slope cancels anyway
    r_lo, r_hi = 8, 72
    t_lo, t_hi = timed_saxpy(r_lo), timed_saxpy(r_hi)
    bw = (r_hi - r_lo) * 2 * big.nbytes / max(t_hi - t_lo, 1e-9)
    print(f"t({r_lo})={t_lo:.4f}s t({r_hi})={t_hi:.4f}s -> {bw/1e9:.1f} GB/s",
          file=sys.stderr)

    roof = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            roof = json.load(f)
    roof["measured_hbm_bw_gbps"] = round(bw / 1e9, 1)
    roof["bw_probe"] = {
        "method": "two-point slope",
        "reps": [r_lo, r_hi],
        "t_lo_s": round(t_lo, 4),
        "t_hi_s": round(t_hi, 4),
        "buffer_gib": round(big.nbytes / 2**30, 2),
    }
    if roof.get("xla_bytes_accessed_per_step"):
        roof["t_hbm_roof_ms"] = round(
            roof["xla_bytes_accessed_per_step"] / bw * 1e3, 4)
    with open(OUT, "w") as f:
        json.dump(roof, f, indent=1)
    print(json.dumps(roof))


if __name__ == "__main__":
    main()
