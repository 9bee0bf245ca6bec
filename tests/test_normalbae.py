"""NormalBae (surface normal) parity vs a hand-rolled torch oracle of the NNET
architecture (`ctrl_helper.py:85-88` wires controlnet_aux's NormalBaeDetector):
tf-efficientnet encoder (TF SAME padding, SE blocks, eval-mode BNs) + BN decoder
pyramid + dense per-pixel refinement heads with norm_normalize at every scale.
Validates the load-time BN folding and the channels-last reformulation."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.normalbae import (
    NNET,
    convert_nnet_state_dict,
)

STEM = 8
STAGES = ((2, 3, 1, 1, 4), (2, 3, 2, 6, 8), (1, 5, 2, 6, 8), (1, 3, 2, 6, 12),
          (1, 5, 1, 6, 12), (1, 5, 2, 6, 16), (1, 3, 1, 6, 16))
HEAD = 32
DEC = (32, 24, 16, 12, 8)


def _conv_same(x, w, b, stride, groups=1):
    """TF-style SAME padding conv (asymmetric, extra pad at bottom/right)."""
    kh, kw = w.shape[2:]
    ih, iw = x.shape[2:]
    ph = max(0, (math.ceil(ih / stride) - 1) * stride + kh - ih)
    pw = max(0, (math.ceil(iw / stride) - 1) * stride + kw - iw)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return F.conv2d(x, w, b, stride=stride, groups=groups)


class _SE(tnn.Module):
    def __init__(self, ch, mid):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, mid, 1)
        self.conv_expand = tnn.Conv2d(mid, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class _Block(tnn.Module):
    def __init__(self, cin, cout, k, stride, expand):
        super().__init__()
        self.stride, self.expand, self.cin, self.cout = stride, expand, cin, cout
        self.k = k
        mid = cin * expand
        if expand == 1:
            self.conv_dw = tnn.Conv2d(cin, cin, k, groups=cin, bias=False)
            self.bn1 = tnn.BatchNorm2d(cin, eps=1e-3)
            self.se = _SE(cin, max(1, cin // 4))
            self.conv_pw = tnn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout, eps=1e-3)
        else:
            self.conv_pw = tnn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
            self.conv_dw = tnn.Conv2d(mid, mid, k, groups=mid, bias=False)
            self.bn2 = tnn.BatchNorm2d(mid, eps=1e-3)
            self.se = _SE(mid, max(1, cin // 4))
            self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        sc = x
        if self.expand == 1:
            h = _conv_same(x, self.conv_dw.weight, None, self.stride,
                           groups=self.cin)
            h = F.silu(self.bn1(h))
            h = self.se(h)
            h = self.bn2(self.conv_pw(h))
        else:
            h = F.silu(self.bn1(self.conv_pw(x)))
            h = _conv_same(h, self.conv_dw.weight, None, self.stride,
                           groups=h.shape[1])
            h = F.silu(self.bn2(h))
            h = self.se(h)
            h = self.bn3(self.conv_pwl(h))
        if self.stride == 1 and self.cin == self.cout:
            h = h + sc
        return h


class _Encoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = tnn.Conv2d(3, STEM, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(STEM, eps=1e-3)
        blocks = []
        cin = STEM
        for (r, k, s, e, o) in STAGES:
            stage = []
            for b in range(r):
                stage.append(_Block(cin, o, k, s if b == 0 else 1, e))
                cin = o
            blocks.append(tnn.Sequential(*stage))
        self.blocks = tnn.Sequential(*blocks)
        self.conv_head = tnn.Conv2d(cin, HEAD, 1, bias=False)

    def forward(self, x):
        feats = [x]
        x = F.silu(self.bn1(_conv_same(x, self.conv_stem.weight, None, 2)))
        feats += [None, None, x]  # indices 1..3 (stem/bn/act), only [3] matters
        for stage in self.blocks:
            x = stage(x)
            feats.append(x)
        feats.append(self.conv_head(x))
        return feats


class _UpSampleBN(tnn.Module):
    def __init__(self, skip_input, out):
        super().__init__()
        self._net = tnn.Sequential(
            tnn.Conv2d(skip_input, out, 3, padding=1), tnn.BatchNorm2d(out),
            tnn.LeakyReLU(),
            tnn.Conv2d(out, out, 3, padding=1), tnn.BatchNorm2d(out),
            tnn.LeakyReLU())

    def forward(self, x, skip):
        up = F.interpolate(x, size=skip.shape[2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, skip], dim=1))


def _norm_normalize(out):
    n, kappa = out[:, :3], out[:, 3:]
    norm = torch.sqrt((n ** 2).sum(1, keepdim=True)) + 1e-10
    return torch.cat([n / norm, F.elu(kappa) + 1.01], dim=1)


class _Decoder(tnn.Module):
    def __init__(self):
        super().__init__()
        ch = [STAGES[i][4] for i in (0, 1, 2, 4)]  # skip channels
        self.conv2 = tnn.Conv2d(HEAD, DEC[0], 1)
        self.up1 = _UpSampleBN(DEC[0] + ch[3], DEC[1])
        self.up2 = _UpSampleBN(DEC[1] + ch[2], DEC[2])
        self.up3 = _UpSampleBN(DEC[2] + ch[1], DEC[3])
        self.up4 = _UpSampleBN(DEC[3] + ch[0], DEC[4])
        self.out_conv_res8 = tnn.Conv2d(DEC[2], 4, 3, padding=1)
        for scale, cin in (("res4", DEC[2]), ("res2", DEC[3]), ("res1", DEC[4])):
            setattr(self, f"out_conv_{scale}", tnn.Sequential(
                tnn.Conv1d(cin + 4, 128, 1), tnn.ReLU(),
                tnn.Conv1d(128, 128, 1), tnn.ReLU(),
                tnn.Conv1d(128, 128, 1), tnn.ReLU(),
                tnn.Conv1d(128, 4, 1)))

    def forward(self, feats):
        b0, b1, b2, b4, bh = feats[4], feats[5], feats[6], feats[8], feats[11]
        x_d0 = self.conv2(bh)
        x_d1 = self.up1(x_d0, b4)
        x_d2 = self.up2(x_d1, b2)
        x_d3 = self.up3(x_d2, b1)
        x_d4 = self.up4(x_d3, b0)
        out = _norm_normalize(self.out_conv_res8(x_d2))
        outs = [out]
        for scale, feat in (("res4", x_d2), ("res2", x_d3), ("res1", x_d4)):
            hw = (feat.shape[2] * 2, feat.shape[3] * 2)
            f = F.interpolate(feat, size=hw, mode="bilinear", align_corners=True)
            p = F.interpolate(outs[-1], size=hw, mode="bilinear",
                              align_corners=True)
            h = torch.cat([f, p], dim=1)
            B, C, H, W = h.shape
            y = getattr(self, f"out_conv_{scale}")(h.view(B, C, -1))
            outs.append(_norm_normalize(y.view(B, 4, H, W)))
        return outs


class _TorchNNET(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.decoder = _Decoder()

    def forward(self, x):
        return self.decoder(self.encoder(x))


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


def test_nnet_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = _TorchNNET().eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle)
    img = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        wants = oracle(img)

    sd = {f"encoder.original_model.{k}": v.numpy()
          for k, v in oracle.encoder.state_dict().items()}
    sd.update({f"decoder.{k}": v.numpy()
               for k, v in oracle.decoder.state_dict().items()})
    params = {"params": convert_nnet_state_dict(sd, stages=STAGES)}
    model = NNET(stem=STEM, stages=STAGES, head=HEAD, decoder_dims=DEC)
    gots = model.apply(params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    assert len(gots) == 4
    for got, want in zip(gots, wants):
        np.testing.assert_allclose(
            np.asarray(got)[0], want[0].numpy().transpose(1, 2, 0), atol=3e-5)
