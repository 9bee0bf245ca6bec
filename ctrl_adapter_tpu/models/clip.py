"""TPU-native CLIP text / vision encoders (flax).

The reference runs four frozen CLIP towers through HF transformers on GPU:

- SD-v1.5 CLIP-L text encoder for ControlNet prompts (`model/ctrl_helper.py:33-52`);
- backbone text encoders — CLIP-L for SDXL (plus OpenCLIP-bigG with projection,
  `train.py:441-466`) and OpenCLIP-H for I2VGen-XL;
- OpenCLIP-H vision encoder with projection for I2VGen-XL / SVD image embeddings
  (`i2vgen_xl_...pipeline.py:795-802`, `svd_...pipeline.py:553`).

Here they are first-class flax modules so prompt/image encoding runs on the TPU in the
same program as the diffusion stack (no host round-trip), with a dedicated
state-dict converter (`convert_clip_state_dict`) because embedding tables must keep
their (rows, features) layout — the generic linear rule would transpose them.

Numerics match transformers' ``CLIPTextModel`` / ``CLIPVisionModelWithProjection``:
fp32 LayerNorm/softmax, quick-GELU vs GELU per config, EOS-position pooling, and
``hidden_states`` output so ``clip_skip`` (penultimate-layer conditioning,
`i2vgen_xl_...pipeline.py:716-725`) works.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # "quick_gelu" (OpenAI CLIP) | "gelu" (OpenCLIP)
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for *WithProjection variants


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: Optional[int] = 1024


# Presets for the towers the reference loads (hub configs, cited above).
SD15_TEXT_CONFIG = CLIPTextConfig()  # CLIP ViT-L/14 text — ControlNet prompts
SDXL_TEXT_CONFIG = CLIPTextConfig()  # SDXL text_encoder (CLIP-L)
SDXL_TEXT2_CONFIG = CLIPTextConfig(  # SDXL text_encoder_2 (OpenCLIP bigG)
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1280,
)
I2VGENXL_TEXT_CONFIG = CLIPTextConfig(  # OpenCLIP ViT-H/14 text tower
    hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
    hidden_act="gelu",
)
CLIP_H_VISION_CONFIG = CLIPVisionConfig()  # OpenCLIP ViT-H/14 vision, proj 1024


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    """Biased multi-head self-attention (transformers CLIP layout: q/k/v/out_proj)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
        b, t, _ = x.shape
        hd = self.hidden_size // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_size, name=name, dtype=self.dtype)  # noqa: E731
        q = dense("q_proj")(x).reshape(b, t, self.num_heads, hd)
        k = dense("k_proj")(x).reshape(b, t, self.num_heads, hd)
        v = dense("v_proj")(x).reshape(b, t, self.num_heads, hd)
        # 77-token (text) / 257-token (vision) sequences: XLA's fused attention path;
        # fp32 logits+softmax for parity with the torch towers.
        out = jax.nn.dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            is_causal=causal,
        ).astype(x.dtype)
        return nn.Dense(self.hidden_size, name="out_proj", dtype=self.dtype)(
            out.reshape(b, t, self.hidden_size))


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.layer_norm_eps, name=name, dtype=jnp.float32)
        h = CLIPAttention(self.hidden_size, self.num_heads, name="self_attn",
                          dtype=self.dtype)(ln("layer_norm1")(x), causal)
        x = x + h
        h = nn.Dense(self.intermediate_size, name="mlp_fc1", dtype=self.dtype)(
            ln("layer_norm2")(x))
        h = _act(self.hidden_act)(h)
        h = nn.Dense(self.hidden_size, name="mlp_fc2", dtype=self.dtype)(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Text tower. Returns (last_hidden_state, pooled, hidden_states tuple).

    ``hidden_states[i]`` is the embedding output for i=0 then each layer's output, so
    ``hidden_states[-2]`` is the penultimate layer (SDXL/clip_skip conditioning).
    Pooling takes the EOS position (first occurrence of ``eos_token_id``), matching
    transformers' CLIPTextModel pooler.
    """

    config: CLIPTextConfig = SD15_TEXT_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, clip_skip: int = 0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding",
                       dtype=self.dtype)(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="position_embedding", dtype=self.dtype)(
            jnp.arange(input_ids.shape[1])[None, :])
        x = tok + pos
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg.hidden_size, cfg.num_heads, cfg.intermediate_size,
                cfg.hidden_act, cfg.layer_norm_eps, name=f"layers_{i}",
                dtype=self.dtype)(x, causal=True)
            hidden_states.append(x)
        final_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm",
                                dtype=jnp.float32)
        x = final_ln(x).astype(x.dtype)
        if cfg.eos_token_id == 2:
            # transformers' legacy branch (CLIPTextModel.forward): official CLIP-L /
            # SD-v1.5 / SDXL text configs carry eos_token_id=2, which never appears in
            # CLIPTokenizer output; transformers pools at input_ids.argmax(-1) — the
            # highest token id, i.e. <|endoftext|> (49407).
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax(
                (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)[:, 0]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              name="text_projection", dtype=self.dtype)(pooled)
        if clip_skip:
            # diffusers SD convention (`i2vgen_xl_..._pipeline.py:278-283`): take the
            # clip_skip-th layer from the end, then re-apply final_layer_norm. (SDXL
            # instead consumes raw hidden_states[-2] — via the hidden_states output.)
            x = final_ln(hidden_states[-(clip_skip + 1)]).astype(x.dtype)
        return x, pooled, tuple(hidden_states)


class CLIPVisionModel(nn.Module):
    """Vision tower (+ optional projection). Input: (b, H, W, 3) NHWC pixel values
    already CLIP-normalized. Returns (last_hidden_state, image_embeds)."""

    config: CLIPVisionConfig = CLIP_H_VISION_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            name="patch_embedding", dtype=self.dtype,
        )(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,)).astype(patches.dtype)
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)), patches], axis=1)
        x = x + nn.Embed((cfg.image_size // cfg.patch_size) ** 2 + 1, cfg.hidden_size,
                         name="position_embedding", dtype=self.dtype)(
            jnp.arange(x.shape[1])[None, :])
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layrnorm",
                         dtype=jnp.float32)(x).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg.hidden_size, cfg.num_heads, cfg.intermediate_size,
                cfg.hidden_act, cfg.layer_norm_eps, name=f"layers_{i}",
                dtype=self.dtype)(x, causal=False)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm",
                              dtype=jnp.float32)(x[:, 0]).astype(x.dtype)
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              name="visual_projection", dtype=self.dtype)(pooled)
        return x, pooled


def convert_clip_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """transformers CLIP{Text,Vision}Model(WithProjection) state dict -> flax params.

    Differences from the generic converter (convert/torch_to_jax.py):
    - ``*embedding.weight`` tables keep (rows, features) layout -> ``embedding``;
    - encoder layers flatten to ``layers_{i}`` at the top level (the flax modules
      above don't nest text_model/encoder scopes);
    - ``mlp.fc1`` -> ``mlp_fc1`` (flax scope names can't contain dots).
    """
    from ..convert.torch_to_jax import convert_tensor

    params: Dict = {}
    for key, value in state_dict.items():
        value = np.asarray(value)
        k = key
        for prefix in ("text_model.", "vision_model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        k = k.replace("embeddings.", "").replace("encoder.layers.", "layers.")
        k = k.replace("mlp.fc", "mlp_fc")
        parts = k.split(".")
        if parts[-1] == "weight" and parts[-2] == "patch_embedding":  # conv
            leaf_name, tensor = "kernel", value.transpose(2, 3, 1, 0)
        elif parts[-1] == "weight" and len(parts) >= 2 and \
                parts[-2].endswith("embedding"):
            leaf_name, tensor = "embedding", value
        elif parts == ["class_embedding"] or parts == ["logit_scale"]:
            params[parts[0]] = value
            continue
        else:
            leaf_name, tensor = convert_tensor(k, value)
        merged = []
        for p in parts[:-1]:
            if p.isdigit() and merged:
                merged[-1] = f"{merged[-1]}_{p}"
            else:
                merged.append(p)
        node = params
        for p in merged:
            node = node.setdefault(p, {})
        node[leaf_name] = tensor
    return params
