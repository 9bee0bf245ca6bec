"""Text / image encoder frontends.

Parity targets:
- SD-v1.5 tokenizer + CLIP-L text encoder shared by every ControlNet
  (`model/ctrl_helper.py:33-52`, `encode_controlnet_prompt` `:299-457`);
- backbone encoders: CLIP-L (+ OpenCLIP-bigG pooled) for SDXL, OpenCLIP-H for
  I2VGen-XL, CLIP-H vision tower for I2VGen-XL/SVD image embeddings
  (`inference.py:349-372`, `i2vgen_xl_..._pipeline.py:366-396,716-748`).

Primary path: the in-tree flax towers (:mod:`ctrl_adapter_tpu.models.clip`) fed by
on-the-fly conversion of the local diffusers-format torch safetensors — tokenization
stays on the host (string processing), the encoder matmuls run on the TPU. Encoders
run once per prompt; the jitted denoise/train programs consume only the embeddings.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from .clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
    convert_clip_state_dict,
)


def _load_tower(model_path: str, subfolder: str):
    """(config.json, converted flax params) from a local transformers dir."""
    from ..convert.torch_to_jax import load_safetensors

    root = os.path.join(model_path, subfolder)
    cfg = json.load(open(os.path.join(root, "config.json")))
    weights = None
    for name in ("model.safetensors", "model.fp16.safetensors"):
        p = os.path.join(root, name)
        if os.path.exists(p):
            weights = load_safetensors(p)
            break
    if weights is None:
        index = os.path.join(root, "model.safetensors.index.json")
        if os.path.exists(index):
            weights = {}
            for shard in set(json.load(open(index))["weight_map"].values()):
                weights.update(load_safetensors(os.path.join(root, shard)))
    if weights is None:
        raise FileNotFoundError(f"no safetensors under {root}")
    return cfg, {"params": convert_clip_state_dict(weights)}


def _text_config(cfg: dict, with_projection: bool) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        max_position_embeddings=cfg["max_position_embeddings"],
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        # Keep the checkpoint value verbatim: transformers defaults eos_token_id=2,
        # and the value 2 selects the legacy argmax(input_ids) pooling branch in
        # CLIPTextModel (see models/clip.py). Coercing to 49407 here would pool at
        # the first eos for checkpoints transformers pools at the *last* token of.
        eos_token_id=cfg.get("eos_token_id", 2) or 2,
        projection_dim=cfg.get("projection_dim") if with_projection else None,
    )


class NativeTextTower:
    """Tokenizer + in-tree flax CLIP text tower loaded from a local diffusers dir."""

    def __init__(self, model_path: str, subfolder: str = "text_encoder",
                 tokenizer_subfolder: str = "tokenizer", with_projection: bool = False):
        from transformers import CLIPTokenizer

        self.tokenizer = CLIPTokenizer.from_pretrained(
            model_path, subfolder=tokenizer_subfolder)
        cfg, self.params = _load_tower(model_path, subfolder)
        self.model = CLIPTextModel(config=_text_config(cfg, with_projection))

    def encode(self, texts: List[str], clip_skip: int = 0):
        """-> (last_hidden_state, pooled, hidden_states tuple) as jax arrays.

        With ``clip_skip>0`` the first output is final_layer_norm applied to the
        clip_skip-th layer from the end (diffusers SD convention)."""
        tokens = self.tokenizer(
            texts, padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        )
        import jax.numpy as jnp

        return self.model.apply(self.params, jnp.asarray(tokens["input_ids"]),
                                clip_skip=clip_skip)


def build_controlnet_text_encoder(
    pretrained_model_path: Optional[str],
    controlnet_text_encoder_path: Optional[str] = None,
    model_name: Optional[str] = None,
) -> "ControlNetTextEncoder":
    """Resolve the SD-v1.5 CLIP-L dir for the ControlNet prompt tower.

    The reference ControlNetHelper always loads SD-v1.5 (`model/ctrl_helper.py:24`)
    regardless of backbone. The backbone dir is only a valid substitute for SDXL
    (its text_encoder is also CLIP-L 768); I2VGen-XL's is OpenCLIP-H (1024-d, shape
    mismatch with the 768-d ControlNet cross-attention) and SVD checkpoints have no
    text tower at all — fail loudly instead of producing either error downstream.
    """
    path = controlnet_text_encoder_path
    if path is None:
        if model_name in ("i2vgenxl", "svd"):
            raise ValueError(
                f"--controlnet_text_encoder_path is required for model_name="
                f"{model_name}: the SD-v1.5 ControlNets need a CLIP-L (768-d) "
                f"prompt tower, but the {model_name} backbone dir carries "
                "OpenCLIP-H (i2vgenxl) or no text encoder (svd). Point it at a "
                "local SD-v1.5 diffusers dir (tokenizer/ + text_encoder/)."
            )
        path = pretrained_model_path
    if path is None:
        raise ValueError("no SD-v1.5 path for the ControlNet text encoder")
    return ControlNetTextEncoder(path)


class ControlNetTextEncoder:
    """SD-v1.5 CLIP-L producing the (2n, 77, 768) [neg; pos] ControlNet prompt
    embedding with classifier-free negative prompts (`ctrl_helper.py:299-457`)."""

    def __init__(self, model_path: str):
        self.tower = NativeTextTower(model_path)

    def __call__(
        self, prompts: List[str], negative_prompts: Optional[List[str]] = None
    ) -> np.ndarray:
        pos = np.asarray(self.tower.encode(prompts)[0])
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        neg = np.asarray(self.tower.encode(negative_prompts)[0])
        return np.concatenate([neg, pos], axis=0)  # (2n, 77, 768) [neg; pos]


class CLIPTextEncoder:
    """Backbone text encoder (I2VGen-XL OpenCLIP-H; SDXL CLIP-L with clip_skip)."""

    def __init__(self, model_path: str, subfolder: str = "text_encoder",
                 clip_skip: int = 0, with_projection: bool = False):
        self.tower = NativeTextTower(model_path, subfolder,
                                     with_projection=with_projection)
        self.clip_skip = clip_skip

    def __call__(self, prompts: List[str]) -> np.ndarray:
        # clip_skip>0 returns final_layer_norm(hidden_states[-(clip_skip+1)]) — the
        # diffusers SD convention the reference follows (`i2vgen_xl_...py:278-283`).
        last, _pooled, _hiddens = self.tower.encode(prompts, clip_skip=self.clip_skip)
        return np.asarray(last)

    def encode_with_pooled(self, prompts: List[str]):
        """SDXL dual-encoder path: (penultimate hidden, pooled/projected)."""
        _last, pooled, hiddens = self.tower.encode(prompts)
        return np.asarray(hiddens[-2]), np.asarray(pooled)


class CLIPImageEncoder:
    """CLIP-H vision tower -> projected image embeddings (n, 1, dim)
    (`i2vgen_xl_..._pipeline.py:366-396`)."""

    def __init__(self, model_path: str, subfolder: str = "image_encoder"):
        from transformers import CLIPImageProcessor

        self.processor = CLIPImageProcessor.from_pretrained(
            model_path, subfolder="feature_extractor")
        cfg, self.params = _load_tower(model_path, subfolder)
        self.model = CLIPVisionModel(config=CLIPVisionConfig(
            image_size=cfg["image_size"], patch_size=cfg["patch_size"],
            hidden_size=cfg["hidden_size"], num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            projection_dim=cfg.get("projection_dim", 1024),
        ))

    def __call__(self, images: List[np.ndarray],
                 antialiased: bool = False) -> np.ndarray:
        """``antialiased=True`` follows the SVD pipeline's preprocessing
        (`svd_..._pipeline.py:239-263`): gaussian-prefiltered bicubic 224 resize
        of the [-1,1] image, then CLIP mean/std normalize only — instead of the
        CLIPImageProcessor resize used by I2VGen-XL."""
        import jax.numpy as jnp

        if antialiased:
            from ..ops.resize import antialiased_resize

            arr = np.stack([np.asarray(im, np.float32) for im in images])
            if arr.max() > 1.5:  # uint8-range input -> [-1, 1]
                arr = arr / 127.5 - 1.0
            small = np.asarray(antialiased_resize(jnp.asarray(arr), (224, 224)))
            small = (small + 1.0) / 2.0
            mean = np.asarray(self.processor.image_mean, np.float32)
            std = np.asarray(self.processor.image_std, np.float32)
            pix = jnp.asarray((small - mean) / std)
        else:
            inputs = self.processor(images=images, return_tensors="np")
            pix = jnp.asarray(inputs["pixel_values"].transpose(0, 2, 3, 1))  # NHWC
        _, embeds = self.model.apply(self.params, pix)
        return np.asarray(embeds)[:, None, :]  # (n, 1, dim)
