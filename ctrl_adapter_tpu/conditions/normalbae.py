"""TPU-native surface-normal estimation (flax) — the normal condition frontend.

The reference wires controlnet_aux's ``NormalBaeDetector`` (`model/ctrl_helper.py:
85-88`, applied at `:181-183`): the "Estimating and Exploiting the Aleatoric
Uncertainty in Surface Normal Estimation" network (NNET, ``scannet.pt``) — a
tf_efficientnet_b5_ap encoder feeding a BN decoder pyramid (2048 -> 1024 -> 512 ->
256 -> 128) whose coarse-to-fine heads predict (normal_xyz, kappa) at 1/8, 1/4,
1/2 and 1/1 resolution; each finer head is a per-pixel MLP (1x1 "Conv1d" stack)
over the bilinearly upsampled previous-scale feature map concatenated with the
upsampled previous prediction; normals are L2-normalized at every scale
(``norm_normalize``: kappa gets elu+1.01).

TPU-first notes: inference mode of NNET is *fully dense* (the uncertainty-guided
point sampling only exists at train time to pick loss pixels), so the whole model
is one static-shape jit program. All encoder/decoder BatchNorms run in inference
mode and are folded into the preceding conv's kernel/bias at checkpoint-load time
(``_fold_bn``); the tf_* SAME-padding semantics of the encoder match flax/XLA
``padding="SAME"`` exactly.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize_align_corners

# tf_efficientnet_b5: (repeats, kernel, stride, expand_ratio, out_channels)
B5_STEM = 48
B5_STAGES = ((3, 3, 1, 1, 24), (5, 3, 2, 6, 40), (5, 5, 2, 6, 64),
             (7, 3, 2, 6, 128), (7, 5, 1, 6, 176), (9, 5, 2, 6, 304),
             (3, 3, 1, 6, 512))
B5_HEAD = 2048
# decoder taps: features[4]=stage0 (1/2), [5]=stage1 (1/4), [6]=stage2 (1/8),
# [8]=stage4 (1/16), [11]=conv_head (1/32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _SqueezeExcite(nn.Module):
    """EfficientNet SE gate; mid channels derive from the block *input* width."""

    mid: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = jax.nn.silu(nn.Conv(self.mid, (1, 1), name="conv_reduce",
                                dtype=self.dtype)(s))
        s = nn.Conv(x.shape[-1], (1, 1), name="conv_expand", dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class _MBConv(nn.Module):
    """One EfficientNet block with folded BNs. ``expand == 1`` is the
    depthwise-separable form (conv_dw -> SE -> conv_pw), otherwise the inverted
    residual (conv_pw expand -> conv_dw -> SE -> conv_pwl)."""

    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_mid: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        shortcut = x
        if self.expand == 1:
            h = nn.Conv(cin, (self.kernel, self.kernel), strides=self.stride,
                        padding="SAME", feature_group_count=cin, name="conv_dw",
                        dtype=self.dtype)(x)
            h = jax.nn.silu(h)
            h = _SqueezeExcite(self.se_mid, name="se", dtype=self.dtype)(h)
            h = nn.Conv(self.out_ch, (1, 1), name="conv_pw", dtype=self.dtype)(h)
        else:
            mid = cin * self.expand
            h = jax.nn.silu(nn.Conv(mid, (1, 1), name="conv_pw",
                                    dtype=self.dtype)(x))
            h = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                        padding="SAME", feature_group_count=mid, name="conv_dw",
                        dtype=self.dtype)(h)
            h = jax.nn.silu(h)
            h = _SqueezeExcite(self.se_mid, name="se", dtype=self.dtype)(h)
            h = nn.Conv(self.out_ch, (1, 1), name="conv_pwl", dtype=self.dtype)(h)
        if self.stride == 1 and cin == self.out_ch:
            h = h + shortcut
        return h


class EfficientNetEncoder(nn.Module):
    """tf_efficientnet_b5_ap feature extractor (BNs pre-folded into convs).

    Returns the five NNET taps: (stage0 1/2, stage1 1/4, stage2 1/8,
    stage4 1/16, conv_head 1/32)."""

    stem: int = B5_STEM
    stages: Sequence[Tuple[int, int, int, int, int]] = B5_STAGES
    head: int = B5_HEAD
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = jax.nn.silu(nn.Conv(self.stem, (3, 3), strides=2, padding="SAME",
                                name="conv_stem", dtype=self.dtype)(x))
        taps = []
        for s, (repeats, k, stride, expand, out_ch) in enumerate(self.stages):
            for b in range(repeats):
                cin = x.shape[-1]
                x = _MBConv(out_ch, k, stride if b == 0 else 1, expand,
                            se_mid=max(1, cin // 4), name=f"blocks_{s}_{b}",
                            dtype=self.dtype)(x)
            if s in (0, 1, 2, 4):
                taps.append(x)
        x = nn.Conv(self.head, (1, 1), name="conv_head", dtype=self.dtype)(x)
        taps.append(x)
        return tuple(taps)


def norm_normalize(out: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize the normal triplet; kappa -> elu(kappa) + 1.01 (channels
    last)."""
    n, kappa = out[..., :3], out[..., 3:]
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)) + 1e-10
    return jnp.concatenate([n / norm, jax.nn.elu(kappa) + 1.01], axis=-1)


class _UpSampleBN(nn.Module):
    """Bilinear-upsample x to the skip's size, concat, then two (folded-BN)
    conv3x3 + leaky-relu layers."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = bilinear_resize_align_corners(x, skip.shape[1:3])
        x = jnp.concatenate([x, skip], axis=-1)
        for i in (0, 1):
            x = nn.Conv(self.features, (3, 3), padding=1, name=f"conv_{i}",
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class _PixelMLP(nn.Module):
    """The NNET "Conv1d" refinement head: 1x1 convs 128-128-128-4 with relus."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            x = jax.nn.relu(nn.Conv(128, (1, 1), name=f"fc_{i}",
                                    dtype=self.dtype)(x))
        return nn.Conv(4, (1, 1), name="fc_3", dtype=self.dtype)(x)


class NNET(nn.Module):
    """(b, H, W, 3) ImageNet-normalized RGB -> list of (b, h, w, 4) predictions
    at 1/8, 1/4, 1/2, 1/1 resolution (normal_xyz + kappa), inference mode."""

    stem: int = B5_STEM
    stages: Sequence[Tuple[int, int, int, int, int]] = B5_STAGES
    head: int = B5_HEAD
    decoder_dims: Sequence[int] = (2048, 1024, 512, 256, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        b0, b1, b2, b4, bh = EfficientNetEncoder(
            self.stem, self.stages, self.head, name="encoder",
            dtype=self.dtype)(x)
        d = self.decoder_dims
        x_d0 = nn.Conv(d[0], (1, 1), name="conv2", dtype=self.dtype)(bh)
        x_d1 = _UpSampleBN(d[1], name="up1", dtype=self.dtype)(x_d0, b4)
        x_d2 = _UpSampleBN(d[2], name="up2", dtype=self.dtype)(x_d1, b2)
        x_d3 = _UpSampleBN(d[3], name="up3", dtype=self.dtype)(x_d2, b1)
        x_d4 = _UpSampleBN(d[4], name="up4", dtype=self.dtype)(x_d3, b0)

        out_res8 = norm_normalize(nn.Conv(
            4, (3, 3), padding=1, name="out_conv_res8", dtype=self.dtype)(x_d2))

        outs = [out_res8]
        for scale, feat in (("res4", x_d2), ("res2", x_d3), ("res1", x_d4)):
            up_hw = (feat.shape[1] * 2, feat.shape[2] * 2)
            feat_up = bilinear_resize_align_corners(feat, up_hw)
            pred_up = bilinear_resize_align_corners(outs[-1], up_hw)
            h = jnp.concatenate([feat_up, pred_up], axis=-1)
            outs.append(norm_normalize(_PixelMLP(
                name=f"out_conv_{scale}", dtype=self.dtype)(h)))
        return outs


# ---------------------------------------------------------------------------
# checkpoint conversion (torch 'scannet.pt' -> flax, BNs folded)
# ---------------------------------------------------------------------------

def _fold_bn(kernel_oihw: np.ndarray, bias, bn: Dict[str, np.ndarray],
             eps: float) -> Tuple[np.ndarray, np.ndarray]:
    scale = bn["weight"] / np.sqrt(bn["running_var"] + eps)
    k = kernel_oihw * scale[:, None, None, None]
    b = (bias if bias is not None else 0.0) * scale + (
        bn["bias"] - bn["running_mean"] * scale)
    return k, b


def _oihw_to_hwio(k: np.ndarray) -> np.ndarray:
    return k.transpose(2, 3, 1, 0)


def _dw_to_flax(k: np.ndarray) -> np.ndarray:
    # torch depthwise (C, 1, kh, kw) -> flax grouped (kh, kw, 1, C)
    return k.transpose(2, 3, 1, 0)


def convert_nnet_state_dict(
        state_dict: Mapping[str, np.ndarray],
        stages: Sequence[Tuple[int, int, int, int, int]] = B5_STAGES) -> Dict:
    """NNET checkpoint (``module.``-stripped torch state dict with
    ``encoder.original_model.*`` / ``decoder.*`` keys) -> flax params.

    Encoder BNs (tf eps 1e-3) and decoder UpSampleBN BNs (eps 1e-5) are folded
    into the adjacent convolutions; ``bn2``/``act2``/classifier of the
    EfficientNet are dead weight in NNET (the decoder taps conv_head pre-BN)
    and are dropped.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}

    def bn(prefix: str) -> Dict[str, np.ndarray]:
        return {leaf: sd[f"{prefix}.{leaf}"]
                for leaf in ("weight", "bias", "running_mean", "running_var")}

    params: Dict = {}

    def put(path: Sequence[str], k: np.ndarray, b: np.ndarray) -> None:
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"kernel": k, "bias": b}

    enc = "encoder.original_model"
    k, b = _fold_bn(sd[f"{enc}.conv_stem.weight"], None, bn(f"{enc}.bn1"), 1e-3)
    put(["encoder", "conv_stem"], _oihw_to_hwio(k), b)
    for s, (repeats, _k, _s, expand, _o) in enumerate(stages):
        for j in range(repeats):
            t = f"{enc}.blocks.{s}.{j}"
            f = ["encoder", f"blocks_{s}_{j}"]
            if expand == 1:
                k, b = _fold_bn(sd[f"{t}.conv_dw.weight"], None,
                                bn(f"{t}.bn1"), 1e-3)
                put(f + ["conv_dw"], _dw_to_flax(k), b)
                k, b = _fold_bn(sd[f"{t}.conv_pw.weight"], None,
                                bn(f"{t}.bn2"), 1e-3)
                put(f + ["conv_pw"], _oihw_to_hwio(k), b)
            else:
                k, b = _fold_bn(sd[f"{t}.conv_pw.weight"], None,
                                bn(f"{t}.bn1"), 1e-3)
                put(f + ["conv_pw"], _oihw_to_hwio(k), b)
                k, b = _fold_bn(sd[f"{t}.conv_dw.weight"], None,
                                bn(f"{t}.bn2"), 1e-3)
                put(f + ["conv_dw"], _dw_to_flax(k), b)
                k, b = _fold_bn(sd[f"{t}.conv_pwl.weight"], None,
                                bn(f"{t}.bn3"), 1e-3)
                put(f + ["conv_pwl"], _oihw_to_hwio(k), b)
            for se in ("conv_reduce", "conv_expand"):
                put(f + ["se", se], _oihw_to_hwio(sd[f"{t}.se.{se}.weight"]),
                    sd[f"{t}.se.{se}.bias"])
    put(["encoder", "conv_head"], _oihw_to_hwio(sd[f"{enc}.conv_head.weight"]),
        np.zeros(sd[f"{enc}.conv_head.weight"].shape[0], np.float32))

    put(["conv2"], _oihw_to_hwio(sd["decoder.conv2.weight"]),
        sd["decoder.conv2.bias"])
    for up in ("up1", "up2", "up3", "up4"):
        for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
            k, b = _fold_bn(sd[f"decoder.{up}._net.{ci}.weight"],
                            sd.get(f"decoder.{up}._net.{ci}.bias"),
                            bn(f"decoder.{up}._net.{bi}"), 1e-5)
            put([up, f"conv_{i}"], _oihw_to_hwio(k), b)
    put(["out_conv_res8"], _oihw_to_hwio(sd["decoder.out_conv_res8.weight"]),
        sd["decoder.out_conv_res8.bias"])
    for scale in ("res4", "res2", "res1"):
        for i, ci in enumerate((0, 2, 4, 6)):
            w = sd[f"decoder.out_conv_{scale}.{ci}.weight"]  # (out, in, 1)
            put([f"out_conv_{scale}", f"fc_{i}"],
                w.transpose(2, 1, 0)[None],  # -> (1, 1, in, out)
                sd[f"decoder.out_conv_{scale}.{ci}.bias"])
    return params


class NormalBaeDetector:
    """controlnet_aux ``NormalBaeDetector`` semantics on the flax NNET: input
    uint8 RGB; output the finest-scale normal map encoded as ((n + 1) / 2) RGB."""

    def __init__(self, model_path: str, dtype=None):
        import torch

        ckpt = torch.load(model_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}
        self.model = NNET(dtype=dtype or jnp.float32)
        self.params = {"params": convert_nnet_state_dict(sd)}
        self._apply = jax.jit(lambda p, x: self.model.apply(p, x)[-1])

    def __call__(self, images: List[np.ndarray]) -> List[np.ndarray]:
        out = []
        for img in images:
            h, w = img.shape[:2]
            ph, pw = (-h) % 32, (-w) % 32
            x = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
            x = (x.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            pred = np.asarray(self._apply(self.params, jnp.asarray(x[None])))[0]
            normal = pred[:h, :w, :3]
            rgb = ((normal + 1.0) * 0.5).clip(0, 1)
            out.append((rgb * 255.0).astype(np.uint8))
        return out
