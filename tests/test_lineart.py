"""Lineart parity vs a hand-rolled torch oracle of the Informative-Drawings
Generator (`ctrl_helper.py:104-108` wires controlnet_aux's LineartDetector; the
annotator network is Generator(3, 1, 3): reflect-pad stem, 2 stride-2 downs,
3 instance-norm residual blocks, 2 ConvTranspose ups, sigmoid head)."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.lineart import (
    LineartGenerator,
    convert_lineart_state_dict,
)


class _ResidualBlock(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(f, f, 3), tnn.InstanceNorm2d(f),
            tnn.ReLU(inplace=True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(f, f, 3), tnn.InstanceNorm2d(f))

    def forward(self, x):
        return x + self.conv_block(x)


class _TorchGenerator(tnn.Module):
    def __init__(self, input_nc=3, output_nc=1, n_residual_blocks=3):
        super().__init__()
        self.model0 = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(input_nc, 64, 7),
            tnn.InstanceNorm2d(64), tnn.ReLU(inplace=True))
        down = []
        in_f = 64
        for out_f in (128, 256):
            down += [tnn.Conv2d(in_f, out_f, 3, stride=2, padding=1),
                     tnn.InstanceNorm2d(out_f), tnn.ReLU(inplace=True)]
            in_f = out_f
        self.model1 = tnn.Sequential(*down)
        self.model2 = tnn.Sequential(
            *[_ResidualBlock(256) for _ in range(n_residual_blocks)])
        up = []
        for out_f in (128, 64):
            up += [tnn.ConvTranspose2d(in_f, out_f, 3, stride=2, padding=1,
                                       output_padding=1),
                   tnn.InstanceNorm2d(out_f), tnn.ReLU(inplace=True)]
            in_f = out_f
        self.model3 = tnn.Sequential(*up)
        self.model4 = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(64, output_nc, 7), tnn.Sigmoid())

    def forward(self, x):
        return self.model4(self.model3(self.model2(self.model1(self.model0(x)))))


def test_lineart_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = _TorchGenerator().eval()
    img = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        want = oracle(img)[0, 0].numpy()

    params = {"params": convert_lineart_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    got = LineartGenerator().apply(
        params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-5)
