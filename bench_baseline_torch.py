"""Reference-equivalent PyTorch training-step throughput, used by bench.py as
the baseline measurement. The architecture mirrors live in
tools/torch_mirrors.py (incl. the reference's Python-loop encoder/ConvLSTM);
measured on this host's CPU — the only torch device available; the reference
publishes no numbers of its own (BASELINE.md)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure_torch_baseline(batch: int = 64, seq_len: int = 6, steps: int = 3) -> float:
    import torch

    from tools.torch_mirrors import AttUNetConvLSTMTorch

    torch.manual_seed(0)
    model = AttUNetConvLSTMTorch(cin=7, cout=2, b=16)
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    crit = torch.nn.MSELoss()
    x = torch.randn(batch, seq_len, 7, 48, 72)
    y = torch.randn(batch, 2, 48, 72)

    opt.zero_grad()
    crit(model(x), y).backward()
    opt.step()  # warmup

    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
    return batch * steps / (time.perf_counter() - t0)


if __name__ == "__main__":
    print(measure_torch_baseline())
