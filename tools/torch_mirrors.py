"""PyTorch mirrors of the four model architectures, used ONLY as the
reference-stack baseline in parity/throughput measurements (tools/parity_run.py,
bench_baseline_torch.py).

These re-state the reference architectures' behavior (SURVEY.md section 2.2:
src/models.py SimpleCNN, src/cnn_transformer.py, src/unet.py,
src/unet_convlstm_attention.py) in plain torch — including the reference's
Python-loop per-frame encoder and ConvLSTM recurrence — so "reference
samples/sec" and "reference val RMSE" can be measured on this host where the
reference's own Lightning/Hydra/dask stack is not installed.
"""

from __future__ import annotations

import torch
import torch.nn as nn


# ---------------------------------------------------------------- SimpleCNN
class _Res(nn.Module):
    def __init__(self, ci, co, k=3):
        super().__init__()
        self.c1 = nn.Conv2d(ci, co, k, padding=k // 2)
        self.b1 = nn.BatchNorm2d(co)
        self.c2 = nn.Conv2d(co, co, k, padding=k // 2)
        self.b2 = nn.BatchNorm2d(co)
        self.proj = (
            nn.Sequential(nn.Conv2d(ci, co, 1), nn.BatchNorm2d(co)) if ci != co else None
        )

    def forward(self, x):
        idt = self.proj(x) if self.proj is not None else x
        y = torch.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return torch.relu(y + idt)


class SimpleCNNTorch(nn.Module):
    def __init__(self, cin=5, cout=2, dim=64, depth=4, k=3, p=0.2):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(cin, dim, k, padding=k // 2), nn.BatchNorm2d(dim), nn.ReLU(True)
        )
        blocks, d = [], dim
        for i in range(depth):
            out = d * 2 if i < depth - 1 else d
            blocks.append(_Res(d, out, k))
            if i < depth - 1:
                d *= 2
        self.blocks = nn.Sequential(*blocks)
        self.drop = nn.Dropout2d(p)
        self.head = nn.Sequential(
            nn.Conv2d(d, d // 2, k, padding=k // 2), nn.BatchNorm2d(d // 2), nn.ReLU(True),
            nn.Conv2d(d // 2, cout, 1),
        )

    def forward(self, x):
        return self.head(self.drop(self.blocks(self.stem(x))))


# ----------------------------------------------------------- CNNTransformer
class CNNTransformerTorch(nn.Module):
    def __init__(self, cin=5, cout=2, d=128, depth=4, heads=4, ff=256, p=0.1):
        super().__init__()
        self.enc = nn.Sequential(
            nn.Conv2d(cin, d // 2, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(d // 2, d, 3, stride=2, padding=1), nn.ReLU(),
        )
        self.h, self.w, self.d = 12, 18, d
        self.pos = nn.Parameter(torch.randn(1, self.h * self.w, d))
        layer = nn.TransformerEncoderLayer(d, heads, ff, p, batch_first=True)
        self.tr = nn.TransformerEncoder(layer, depth)
        self.dec = nn.Sequential(
            nn.ConvTranspose2d(d, d // 2, 2, stride=2), nn.ReLU(),
            nn.ConvTranspose2d(d // 2, d // 4, 2, stride=2), nn.ReLU(),
            nn.Conv2d(d // 4, cout, 1),
        )

    def forward(self, x):
        b = x.size(0)
        x = self.enc(x).flatten(2).transpose(1, 2) + self.pos
        x = self.tr(x)
        x = x.transpose(1, 2).view(b, self.d, self.h, self.w)
        return self.dec(x)


# ------------------------------------------------------------ UNet building
class _SE(nn.Module):
    def __init__(self, c, r=8):
        super().__init__()
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Sequential(
            nn.Conv2d(c, c // r, 1, bias=False), nn.ReLU(True),
            nn.Conv2d(c // r, c, 1, bias=False), nn.Sigmoid(),
        )

    def forward(self, x):
        return x * self.fc(self.pool(x))


class _Gate(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(2, 1, 7, padding=3, bias=False)

    def forward(self, x):
        g = torch.sigmoid(
            self.conv(torch.cat([x.mean(1, keepdim=True), x.amax(1, keepdim=True)], 1))
        )
        return x * g


class _Block(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.body = nn.Sequential(
            nn.Conv2d(ci, co, 3, padding=1, bias=False), nn.GroupNorm(8, co), nn.SiLU(True),
            nn.Conv2d(co, co, 3, padding=1, bias=False), nn.GroupNorm(8, co), nn.SiLU(True),
        )
        self.se, self.gate = _SE(co), _Gate()

    def forward(self, x):
        return self.gate(self.se(self.body(x)))


class UNetTorch(nn.Module):
    def __init__(self, cin=5, cout=2, b=16):
        super().__init__()
        self.e1 = _Block(cin, b)
        self.e2 = nn.Sequential(nn.MaxPool2d(2), _Block(b, b * 2))
        self.e3 = nn.Sequential(nn.MaxPool2d(2), _Block(b * 2, b * 4))
        self.e4 = nn.Sequential(nn.MaxPool2d(2), _Block(b * 4, b * 8))
        self.bott = _Block(b * 8, b * 8)
        self.u3t = nn.ConvTranspose2d(b * 8, b * 4, 2, stride=2)
        self.u3c = _Block(b * 8, b * 4)
        self.u2t = nn.ConvTranspose2d(b * 4, b * 2, 2, stride=2)
        self.u2c = _Block(b * 4, b * 2)
        self.u1t = nn.ConvTranspose2d(b * 2, b, 2, stride=2)
        self.u1c = _Block(b * 2, b)
        self.head = nn.Conv2d(b, cout, 1)

    def forward(self, x):
        s1 = self.e1(x)
        s2 = self.e2(s1)
        s3 = self.e3(s2)
        s4 = self.e4(s3)
        y = self.bott(s4)
        y = self.u3c(torch.cat([self.u3t(y), s3], 1))
        y = self.u2c(torch.cat([self.u2t(y), s2], 1))
        y = self.u1c(torch.cat([self.u1t(y), s1], 1))
        return self.head(y)


# --------------------------------------------------- AttUNetConvLSTM (final)
class AttUNetConvLSTMTorch(nn.Module):
    def __init__(self, cin=7, cout=2, b=16):
        super().__init__()
        self.e1 = _Block(cin, b)
        self.e2 = nn.Sequential(nn.MaxPool2d(2), _Block(b, b * 2))
        self.e3 = nn.Sequential(nn.MaxPool2d(2), _Block(b * 2, b * 4))
        self.e4 = nn.Sequential(nn.MaxPool2d(2), _Block(b * 4, b * 8))
        self.lstm_conv = nn.Conv2d(b * 8 + b * 4, 4 * b * 4, 3, padding=1)
        self.u3t = nn.ConvTranspose2d(b * 4, b * 4, 2, stride=2)
        self.u3c = _Block(b * 8, b * 4)
        self.u2t = nn.ConvTranspose2d(b * 4, b * 2, 2, stride=2)
        self.u2c = _Block(b * 4, b * 2)
        self.u1t = nn.ConvTranspose2d(b * 2, b, 2, stride=2)
        self.u1c = _Block(b * 2, b)
        self.head = nn.Conv2d(b, cout, 1)
        self.b = b

    def forward(self, xs):  # (B, T, C, H, W)
        bsz, t = xs.shape[:2]
        s1s, s2s, s3s, s4s = [], [], [], []
        for i in range(t):  # reference unrolls in Python
            s1 = self.e1(xs[:, i])
            s2 = self.e2(s1)
            s3 = self.e3(s2)
            s4 = self.e4(s3)
            s1s.append(s1)
            s2s.append(s2)
            s3s.append(s3)
            s4s.append(s4)
        b4 = self.b * 4
        h = xs.new_zeros(bsz, b4, *s4s[0].shape[2:])
        c = torch.zeros_like(h)
        for i in range(t):  # reference's Python-loop ConvLSTM
            g = self.lstm_conv(torch.cat([s4s[i], h], 1))
            gi, gf, go, gg = g.chunk(4, 1)
            c = torch.sigmoid(gf) * c + torch.sigmoid(gi) * torch.tanh(gg)
            h = torch.sigmoid(go) * torch.tanh(c)
        s1m = torch.stack(s1s).mean(0)
        s2m = torch.stack(s2s).mean(0)
        s3m = torch.stack(s3s).mean(0)
        y = self.u3c(torch.cat([self.u3t(h), s3m], 1))
        y = self.u2c(torch.cat([self.u2t(y), s2m], 1))
        y = self.u1c(torch.cat([self.u1t(y), s1m], 1))
        return self.head(y)


def build(model: str, cin: int, cout: int, **kw) -> nn.Module:
    if model == "SimpleCNN":
        return SimpleCNNTorch(cin, cout, dim=kw.get("init_dim", 64), depth=kw.get("depth", 4))
    if model == "cnn_transformer":
        return CNNTransformerTorch(cin, cout)
    if model == "unet":
        return UNetTorch(cin, cout, b=kw.get("base_channels", 16))
    if model == "unet_convlstm_attention":
        return AttUNetConvLSTMTorch(cin, cout, b=kw.get("base_channels", 16))
    raise ValueError(model)
