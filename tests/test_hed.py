"""HED (scribble) parity vs a hand-rolled torch oracle of the ControlNetHED
architecture (`ctrl_helper.py:110-116` wires controlnet_aux's HEDdetector; the
annotator network is the Apache-2 ControlNetHED — five VGG stages with 1-channel
side projections, sigmoid of the mean side map)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.hed import (
    ControlNetHED,
    convert_hed_state_dict,
    scribble_postprocess,
)


class _TorchBlock(tnn.Module):
    def __init__(self, cin, cout, n):
        super().__init__()
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(cin if j == 0 else cout, cout, 3, padding=1) for j in range(n)])
        self.projection = tnn.Conv2d(cout, 1, 1)

    def forward(self, h, down_sampling=False):
        if down_sampling:
            h = F.max_pool2d(h, 2, 2)
        for conv in self.convs:
            h = F.relu(conv(h))
        return h, self.projection(h)


class _TorchHED(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm = tnn.Parameter(torch.randn(1, 3, 1, 1))
        self.block1 = _TorchBlock(3, 64, 2)
        self.block2 = _TorchBlock(64, 128, 2)
        self.block3 = _TorchBlock(128, 256, 3)
        self.block4 = _TorchBlock(256, 512, 3)
        self.block5 = _TorchBlock(512, 512, 3)

    def forward(self, x):
        h = x - self.norm
        h, p1 = self.block1(h)
        h, p2 = self.block2(h, down_sampling=True)
        h, p3 = self.block3(h, down_sampling=True)
        h, p4 = self.block4(h, down_sampling=True)
        _, p5 = self.block5(h, down_sampling=True)
        return p1, p2, p3, p4, p5


def test_hed_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = _TorchHED().eval()
    img = torch.rand(1, 3, 32, 32) * 255.0
    with torch.no_grad():
        sides = oracle(img)
        sides = [
            F.interpolate(s, size=(32, 32), mode="bilinear", align_corners=False)
            for s in sides
        ]
        want = torch.sigmoid(torch.stack(sides).mean(0))[0, 0].numpy()

    params = {"params": convert_hed_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    got = ControlNetHED().apply(params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=1e-5)


def test_scribble_postprocess_binarizes():
    rng = np.random.default_rng(0)
    edge = (rng.uniform(0, 1, (64, 64)) * 255).astype(np.uint8)
    out = scribble_postprocess(edge)
    assert set(np.unique(out)) <= {0, 255}
