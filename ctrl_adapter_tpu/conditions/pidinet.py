"""TPU-native PiDiNet soft-edge detection (flax) — the softedge condition frontend.

The reference wires controlnet_aux's ``PidiNetDetector`` (`model/ctrl_helper.py:98-102`,
applied at `:187-189`), whose annotator network is PiDiNet ("Pixel Difference
Networks for Efficient Edge Detection", table-5 config ``carv4`` with ``--sa --dil``):
an init pixel-difference conv (3->60) plus four stages of depthwise
pixel-difference blocks (60/120/240/240 channels, stride-2 maxpool between stages),
per-stage CDCM dilation modules (dilations 5/7/9/11 summed, 24 channels) -> CSAM
spatial attention -> 1-channel map reduce, bilinear upsample of the four side maps
to input size, and a 4->1 fusion classifier; sigmoid everywhere.

TPU-first design decision: the pixel-difference convolutions (central ``cd``,
angular ``ad``, radial ``rd``) are *linear reparameterizations* of vanilla convs,
so this port converts the checkpoint's raw PDC weights into standard kernels once
at load time (``convert_pdc``) and the device executes only plain NHWC convs —
no gather/subtract ops in the hot path. ``rd`` kernels become 5x5.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize

# table-5 config "carv4": [cd, ad, rd, cv] repeated over the 16 difference convs
CARV4 = ("cd", "ad", "rd", "cv") * 4


def convert_pdc(op: str, weight: np.ndarray) -> np.ndarray:
    """Raw PDC weight (o, i, 3, 3) -> equivalent vanilla conv kernel (OIHW).

    cd: y = conv(x, w) - x * sum(w)  ->  subtract the spatial sum at the center tap.
    ad: y = conv(x, w - rot_cw(w))   ->  neighbor taps minus their clockwise shift.
    rd: radius-2 ring minus radius-1 ring -> 5x5 kernel; outer-ring taps get
        w[1:], inner 3x3 ring gets -w[1:], center zero.
    cv: vanilla, unchanged.
    """
    w = np.asarray(weight, np.float32)
    o, i = w.shape[:2]
    if op == "cv":
        return w
    if op == "cd":
        out = w.copy()
        out[:, :, 1, 1] -= w.sum(axis=(2, 3))
        return out
    if op == "ad":
        flat = w.reshape(o, i, 9)
        return (flat - flat[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).reshape(w.shape)
    if op == "rd":
        flat = w.reshape(o, i, 9)
        buf = np.zeros((o, i, 25), np.float32)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = flat[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -flat[:, :, 1:]
        return buf.reshape(o, i, 5, 5)
    raise ValueError(f"unknown pdc op: {op}")


class _PDCBlock(nn.Module):
    """One converted PiDiNet block: depthwise (converted) conv -> relu -> 1x1,
    residual; stride-2 variant maxpools and projects the shortcut with a 1x1."""

    features: int
    kernel: int  # 3, or 5 for converted 'rd'
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stride > 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        cin = x.shape[-1]
        pad = self.kernel // 2
        y = nn.Conv(cin, (self.kernel, self.kernel), padding=pad, use_bias=False,
                    feature_group_count=cin, name="conv1", dtype=self.dtype)(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv2",
                    dtype=self.dtype)(y)
        if self.stride > 1:
            x = nn.Conv(self.features, (1, 1), name="shortcut", dtype=self.dtype)(x)
        return x + y


class _CDCM(nn.Module):
    """Compact dilation conv module: relu -> 1x1 -> sum of 4 dilated 3x3 convs."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (1, 1), name="conv1",
                    dtype=self.dtype)(jax.nn.relu(x))
        out = 0.0
        for j, d in enumerate((5, 7, 9, 11)):
            out = out + nn.Conv(
                self.features, (3, 3), padding=d, kernel_dilation=d, use_bias=False,
                name=f"conv2_{j + 1}", dtype=self.dtype)(x)
        return out


class _CSAM(nn.Module):
    """Compact spatial attention: sigmoid(3x3(1x1(relu(x)))) gate on x."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(4, (1, 1), name="conv1", dtype=self.dtype)(jax.nn.relu(x))
        y = nn.Conv(1, (3, 3), padding=1, use_bias=False, name="conv2",
                    dtype=self.dtype)(y)
        return x * jax.nn.sigmoid(y)


class PiDiNet(nn.Module):
    """(b, H, W, 3) RGB in [0, 1] -> (b, H, W) fused edge probability in [0, 1].

    The converted table-5 network: inplane 60, dil 24, spatial attention on."""

    inplane: int = 60
    dil: int = 24
    pdcs: Sequence[str] = CARV4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = x.shape[1:3]
        x = x.astype(self.dtype)
        k0 = 5 if self.pdcs[0] == "rd" else 3
        x = nn.Conv(self.inplane, (k0, k0), padding=k0 // 2, use_bias=False,
                    name="init_block", dtype=self.dtype)(x)

        planes = (self.inplane, self.inplane * 2, self.inplane * 4, self.inplane * 4)
        stage_outs = []
        pdc_i = 1
        for s, ch in enumerate(planes):
            n_blocks = 3 if s == 0 else 4
            for b in range(n_blocks):
                op = self.pdcs[pdc_i]
                pdc_i += 1
                x = _PDCBlock(
                    ch, kernel=5 if op == "rd" else 3,
                    stride=2 if (s > 0 and b == 0) else 1,
                    name=f"block{s + 1}_{b + 1}", dtype=self.dtype)(x)
            stage_outs.append(x)

        side_maps = []
        for i, feat in enumerate(stage_outs):
            y = _CDCM(self.dil, name=f"dilation_{i}", dtype=self.dtype)(feat)
            y = _CSAM(name=f"attention_{i}", dtype=self.dtype)(y)
            e = nn.Conv(1, (1, 1), name=f"conv_reduce_{i}", dtype=self.dtype)(y)
            if e.shape[1:3] != (H, W):
                e = bilinear_resize(e, (H, W))
            side_maps.append(e)

        fused = nn.Conv(1, (1, 1), name="classifier", dtype=self.dtype)(
            jnp.concatenate(side_maps, axis=-1))
        return jax.nn.sigmoid(fused[..., 0].astype(jnp.float32))


def convert_pidinet_state_dict(
        state_dict: Mapping[str, np.ndarray],
        pdcs: Sequence[str] = CARV4) -> Dict:
    """PiDiNet training checkpoint (raw PDC weights, ``module.``-prefixed torch
    state dict) -> flax params with all difference convs converted to vanilla.

    Torch layout: ``init_block.weight``; ``block{s}_{b}.{conv1,conv2,shortcut}``;
    ``dilations.{i}.{conv1,conv2_1..4}``; ``attentions.{i}.{conv1,conv2}``;
    ``conv_reduces.{i}.conv``; ``classifier``.
    """
    # map each PDC conv's module name to its op, in definition order
    pdc_of = {"init_block": pdcs[0]}
    i = 1
    for s in range(1, 5):
        n_blocks = 3 if s == 1 else 4
        for b in range(1, n_blocks + 1):
            pdc_of[f"block{s}_{b}.conv1"] = pdcs[i]
            i += 1

    params: Dict = {}

    def put(path: Sequence[str], leaf: str, v: np.ndarray) -> None:
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = v

    for key, v in state_dict.items():
        v = np.asarray(v, np.float32)
        parts = key.removeprefix("module.").split(".")
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        if parts[0] == "init_block":
            if leaf == "kernel":
                v = convert_pdc(pdc_of["init_block"], v).transpose(2, 3, 1, 0)
            put(["init_block"], leaf, v)
        elif parts[0].startswith("block"):
            name = ".".join(parts[:2])
            if leaf == "kernel":
                if parts[1] == "conv1":
                    v = convert_pdc(pdc_of[name], v)
                v = v.transpose(2, 3, 1, 0)
            put([parts[0], parts[1]], leaf, v)
        elif parts[0] == "dilations":
            if leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)
            put([f"dilation_{parts[1]}", parts[2]], leaf, v)
        elif parts[0] == "attentions":
            if leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)
            put([f"attention_{parts[1]}", parts[2]], leaf, v)
        elif parts[0] == "conv_reduces":
            if leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)
            put([f"conv_reduce_{parts[1]}"], leaf, v)
        elif parts[0] == "classifier":
            if leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)
            put(["classifier"], leaf, v)
        else:
            raise KeyError(f"unexpected pidinet key: {key}")
    return params


class SoftEdgePidiNet:
    """controlnet_aux ``PidiNetDetector`` semantics on the flax network: input
    uint8 RGB scaled to [0, 1]; output the fused sigmoid edge map as uint8 RGB."""

    def __init__(self, model_path: str, dtype=None):
        import torch

        self.model = PiDiNet(dtype=dtype or jnp.float32)
        ckpt = torch.load(model_path, map_location="cpu", weights_only=True)
        sd = ckpt.get("state_dict", ckpt)
        self.params = {"params": convert_pidinet_state_dict(
            {k: np.asarray(v) for k, v in sd.items()})}
        self._apply = jax.jit(self.model.apply)

    def __call__(self, images: List[np.ndarray],
                 safe: bool = False) -> List[np.ndarray]:
        out = []
        for img in images:
            h, w = img.shape[:2]
            ph, pw = (-h) % 8, (-w) % 8  # three stride-2 stages
            x = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
            edge = np.asarray(self._apply(
                self.params, jnp.asarray(x[None], jnp.float32) / 255.0))[0][:h, :w]
            if safe:  # controlnet_aux safe_step: quantize to 1/8 bands
                edge = np.floor(edge * 8 + 0.5) / 8
            edge = (edge * 255.0).clip(0, 255).astype(np.uint8)
            out.append(np.repeat(edge[:, :, None], 3, axis=2))
        return out
