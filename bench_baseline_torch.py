"""Reference-equivalent PyTorch training step, used ONLY to measure the
baseline samples/sec that bench.py reports against.

The reference stack (torch + Lightning) cannot run here as-is (its deps are
absent and its GPU is unavailable), so this re-states the flagship
architecture (src/unet_convlstm_attention.py behavior: per-frame Python-loop
attention-UNet encoder, Python-loop ConvLSTM, time-mean skips, decoder) in
plain torch as a measurement harness. Written from the architecture spec in
SURVEY.md section 2.2; measured on this host's CPU (the only torch device
available) and cached in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import time


def measure_torch_baseline(batch: int = 64, seq_len: int = 6, steps: int = 3) -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 1))

    class SE(nn.Module):
        def __init__(self, c, r=8):
            super().__init__()
            self.pool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Sequential(
                nn.Conv2d(c, c // r, 1, bias=False), nn.ReLU(inplace=True),
                nn.Conv2d(c // r, c, 1, bias=False), nn.Sigmoid(),
            )

        def forward(self, x):
            return x * self.fc(self.pool(x))

    class Gate(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(2, 1, 7, padding=3, bias=False)

        def forward(self, x):
            g = torch.sigmoid(self.conv(torch.cat([x.mean(1, keepdim=True), x.amax(1, keepdim=True)], 1)))
            return x * g

    class Block(nn.Module):
        def __init__(self, ci, co):
            super().__init__()
            self.body = nn.Sequential(
                nn.Conv2d(ci, co, 3, padding=1, bias=False), nn.GroupNorm(8, co), nn.SiLU(inplace=True),
                nn.Conv2d(co, co, 3, padding=1, bias=False), nn.GroupNorm(8, co), nn.SiLU(inplace=True),
            )
            self.se, self.gate = SE(co), Gate()

        def forward(self, x):
            return self.gate(self.se(self.body(x)))

    class Net(nn.Module):
        def __init__(self, cin=7, cout=2, b=16):
            super().__init__()
            self.e1 = Block(cin, b)
            self.e2 = nn.Sequential(nn.MaxPool2d(2), Block(b, b * 2))
            self.e3 = nn.Sequential(nn.MaxPool2d(2), Block(b * 2, b * 4))
            self.e4 = nn.Sequential(nn.MaxPool2d(2), Block(b * 4, b * 8))
            self.lstm_conv = nn.Conv2d(b * 8 + b * 4, 4 * b * 4, 3, padding=1)
            self.u3t = nn.ConvTranspose2d(b * 4, b * 4, 2, stride=2)
            self.u3c = Block(b * 8, b * 4)
            self.u2t = nn.ConvTranspose2d(b * 4, b * 2, 2, stride=2)
            self.u2c = Block(b * 4, b * 2)
            self.u1t = nn.ConvTranspose2d(b * 2, b, 2, stride=2)
            self.u1c = Block(b * 2, b)
            self.head = nn.Conv2d(b, cout, 1)
            self.b = b

        def forward(self, xs):  # (B, T, C, H, W)
            B, T = xs.shape[:2]
            s1s, s2s, s3s, s4s = [], [], [], []
            for t in range(T):  # reference unrolls encoder in Python
                s1 = self.e1(xs[:, t])
                s2 = self.e2(s1)
                s3 = self.e3(s2)
                s4 = self.e4(s3)
                s1s.append(s1); s2s.append(s2); s3s.append(s3); s4s.append(s4)
            b4 = self.b * 4
            h = torch.zeros(B, b4, *s4s[0].shape[2:])
            c = torch.zeros_like(h)
            for t in range(T):  # reference's Python-loop ConvLSTM
                g = self.lstm_conv(torch.cat([s4s[t], h], 1))
                i, f, o, gg = g.chunk(4, 1)
                c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(gg)
                h = torch.sigmoid(o) * torch.tanh(c)
            s1m = torch.stack(s1s).mean(0)
            s2m = torch.stack(s2s).mean(0)
            s3m = torch.stack(s3s).mean(0)
            d3 = self.u3c(torch.cat([self.u3t(h), s3m], 1))
            d2 = self.u2c(torch.cat([self.u2t(d3), s2m], 1))
            d1 = self.u1c(torch.cat([self.u1t(d2), s1m], 1))
            return self.head(d1)

    model = Net()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    crit = nn.MSELoss()
    x = torch.randn(batch, seq_len, 7, 48, 72)
    y = torch.randn(batch, 2, 48, 72)

    # warmup
    opt.zero_grad(); crit(model(x), y).backward(); opt.step()

    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


if __name__ == "__main__":
    print(measure_torch_baseline())
