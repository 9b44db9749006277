"""A compact torch mirror of the reference Onet, used ONLY as a test oracle.

This re-states the architecture of Onet_vanilla_20240606.py:39-191 (double
conv blocks, maxpool downs, transposed-conv ups with skip concats, twin
U-Nets over (X, 1-X), einsum projection, Softmax2d head, JSD loss) so the
JAX model can be checked for >=99% numerical agreement. It is an oracle,
not product code.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def dconv(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
        nn.Conv2d(cout, cout, 3, padding=1, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class MirrorUNet(nn.Module):
    def __init__(self, cin=1, base=64):
        super().__init__()
        c = [base * m for m in (1, 2, 4, 8, 16)]
        self.inc = dconv(cin, c[0])
        self.downs = nn.ModuleList(
            [nn.Sequential(nn.MaxPool2d(2), dconv(c[i], c[i + 1])) for i in range(4)]
        )
        self.ups_t = nn.ModuleList(
            [nn.ConvTranspose2d(c[4 - i], c[4 - i] // 2, 2, stride=2) for i in range(4)]
        )
        self.ups_c = nn.ModuleList([dconv(c[4 - i], c[3 - i]) for i in range(4)])

    def forward(self, x):
        feats = [self.inc(x)]
        for d in self.downs:
            feats.append(d(feats[-1]))
        y = feats[-1]
        for i in range(4):
            y = self.ups_t[i](y)
            skip = feats[3 - i]
            dh, dw = skip.shape[2] - y.shape[2], skip.shape[3] - y.shape[3]
            y = F.pad(y, [dw // 2, dw - dw // 2, dh // 2, dh - dh // 2])
            y = self.ups_c[i](torch.cat([skip, y], dim=1))
        return feats[0], y


class MirrorOnet(nn.Module):
    def __init__(self, cin=1, base=64, share=True):
        super().__init__()
        self.topu = MirrorUNet(cin, base)
        self.dwnu = self.topu if share else MirrorUNet(cin, base)

    def forward(self, x):
        lt, ht = self.topu(x)
        vt = torch.einsum("bpxy,bpxy->bxy", lt, ht).unsqueeze(1)
        xd = torch.clip(1 - x, 0, 1)
        ld, hd = self.dwnu(xd)
        vd = torch.einsum("bpxy,bpxy->bxy", ld, hd).unsqueeze(1)
        s = torch.softmax(torch.cat([vt, vd], dim=1), dim=1)
        return lt, vt, ld, vd, s


def t_log1pexp(x):
    x = x.clone()
    x[x <= -37.0] = torch.exp(x[x <= -37.0])
    idx = (x > -37) * (x <= 18.0)
    x[idx] = torch.log(1 + torch.exp(x[idx]))
    idx = (x > 18.0) * (x < 33.3)
    x[idx] = x[idx] + torch.exp(-x[idx])
    return x


def t_loss(lt, s, ld):
    st = s[:, 0:1]
    sd = s[:, 1:2]

    def one(li, si, sp):
        ls = torch.einsum("bpxy,bpxy->bxy", li, si)
        lsp = torch.einsum("bpxy,bpxy->bxy", li, sp)
        return -t_log1pexp(-ls).mean() - t_log1pexp(lsp).mean()

    return -(one(lt, st, sd) + one(ld, sd, st)) / 2
