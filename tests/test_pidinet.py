"""PiDiNet (softedge) parity vs a hand-rolled torch oracle that evaluates the
*original* pixel-difference convolutions (cd = conv minus center-sum, ad = conv
with clockwise-shift-subtracted kernel, rd = 5x5 radius-2 minus radius-1 rings)
dynamically — validating that the load-time vanilla-kernel conversion in
`ctrl_adapter_tpu.conditions.pidinet.convert_pdc` is mathematically exact.
Reference wiring: `ctrl_helper.py:98-102` (PidiNetDetector, table-5 carv4)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.pidinet import (
    CARV4,
    PiDiNet,
    convert_pidinet_state_dict,
)


def _pdc_conv(op, x, w, stride=1, groups=1):
    if op == "cv":
        return F.conv2d(x, w, stride=stride, padding=1, groups=groups)
    if op == "cd":
        wc = w.sum(dim=[2, 3], keepdim=True)
        return (F.conv2d(x, w, stride=stride, padding=1, groups=groups)
                - F.conv2d(x, wc, stride=stride, padding=0, groups=groups))
    if op == "ad":
        shape = w.shape
        wf = w.view(shape[0], shape[1], -1)
        wconv = (wf - wf[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).view(shape)
        return F.conv2d(x, wconv, stride=stride, padding=1, groups=groups)
    if op == "rd":
        shape = w.shape
        buf = torch.zeros(shape[0], shape[1], 25)
        wf = w.view(shape[0], shape[1], -1)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = wf[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -wf[:, :, 1:]
        buf = buf.view(shape[0], shape[1], 5, 5)
        return F.conv2d(x, buf, stride=stride, padding=2, groups=groups)
    raise ValueError(op)


class _Block(tnn.Module):
    def __init__(self, op, cin, cout, stride=1):
        super().__init__()
        self.op, self.stride = op, stride
        if stride > 1:
            self.shortcut = tnn.Conv2d(cin, cout, 1)
        self.conv1 = tnn.Conv2d(cin, cin, 3, padding=1, groups=cin, bias=False)
        self.conv2 = tnn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        if self.stride > 1:
            x = F.max_pool2d(x, 2, 2)
        y = _pdc_conv(self.op, x, self.conv1.weight, groups=x.shape[1])
        y = self.conv2(F.relu(y))
        if self.stride > 1:
            x = self.shortcut(x)
        return x + y


class _CDCM(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 1)
        for j, d in enumerate((5, 7, 9, 11)):
            setattr(self, f"conv2_{j + 1}",
                    tnn.Conv2d(cout, cout, 3, dilation=d, padding=d, bias=False))

    def forward(self, x):
        x = self.conv1(F.relu(x))
        return sum(getattr(self, f"conv2_{j}")(x) for j in (1, 2, 3, 4))


class _CSAM(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(ch, 4, 1)
        self.conv2 = tnn.Conv2d(4, 1, 3, padding=1, bias=False)

    def forward(self, x):
        return x * torch.sigmoid(self.conv2(self.conv1(F.relu(x))))


class _MapReduce(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, 1, 1)

    def forward(self, x):
        return self.conv(x)


class _TorchPiDiNet(tnn.Module):
    def __init__(self, c=12, dil=8):  # shrunk channels; same topology as table-5
        super().__init__()
        self.pdcs = CARV4
        self.init_block = tnn.Conv2d(3, c, 3, padding=1, bias=False)
        planes = [c, 2 * c, 4 * c, 4 * c]
        i = 1
        for s, ch in enumerate(planes):
            cin = planes[s - 1] if s else c
            for b in range(3 if s == 0 else 4):
                blk = _Block(self.pdcs[i], cin if b == 0 else ch, ch,
                             stride=2 if (s > 0 and b == 0) else 1)
                setattr(self, f"block{s + 1}_{b + 1}", blk)
                i += 1
        self.dilations = tnn.ModuleList([_CDCM(p, dil) for p in planes])
        self.attentions = tnn.ModuleList([_CSAM(dil) for _ in planes])
        self.conv_reduces = tnn.ModuleList([_MapReduce(dil) for _ in planes])
        self.classifier = tnn.Conv2d(4, 1, 1)

    def forward(self, x):
        H, W = x.shape[2:]
        x = _pdc_conv(self.pdcs[0], x, self.init_block.weight)
        feats = []
        for s in range(4):
            for b in range(3 if s == 0 else 4):
                x = getattr(self, f"block{s + 1}_{b + 1}")(x)
            feats.append(x)
        sides = []
        for i, f in enumerate(feats):
            e = self.conv_reduces[i](self.attentions[i](self.dilations[i](f)))
            sides.append(F.interpolate(e, (H, W), mode="bilinear",
                                       align_corners=False))
        fused = self.classifier(torch.cat(sides, dim=1))
        return torch.sigmoid(fused)


def test_pidinet_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = _TorchPiDiNet().eval()
    img = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        want = oracle(img)[0, 0].numpy()

    params = {"params": convert_pidinet_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    got = PiDiNet(inplane=12, dil=8).apply(
        params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-5)
