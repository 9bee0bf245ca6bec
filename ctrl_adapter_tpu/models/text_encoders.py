"""Text / image encoder frontends (host-level, via transformers Flax CLIP).

Parity targets:
- SD-v1.5 tokenizer + CLIP-L text encoder shared by every ControlNet
  (`model/ctrl_helper.py:33-52`, `encode_controlnet_prompt` `:299-457`);
- backbone encoders: CLIP-L (+ OpenCLIP-bigG pooled) for SDXL, CLIP for I2VGen-XL,
  CLIP-H vision tower for I2VGen-XL/SVD image embeddings (`inference.py:349-372`,
  `i2vgen_xl_..._pipeline.py:366-396,716-748`).

These wrap ``transformers`` Flax CLIP classes loaded from *local* checkpoint dirs
(zero-egress image: nothing is downloaded). Encoders run once per prompt on the host
path; the jitted denoise/train programs consume only the embedding tensors.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class ControlNetTextEncoder:
    """SD-v1.5 tokenizer + text encoder producing the (n, 77, 768) ControlNet prompt
    embedding with classifier-free negative prompts (`ctrl_helper.py:299-457`)."""

    def __init__(self, model_path: str):
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        self.tokenizer = CLIPTokenizer.from_pretrained(model_path, subfolder="tokenizer")
        self.text_encoder = FlaxCLIPTextModel.from_pretrained(
            model_path, subfolder="text_encoder"
        )

    def __call__(
        self, prompts: List[str], negative_prompts: Optional[List[str]] = None
    ) -> np.ndarray:
        def encode(texts: List[str]) -> np.ndarray:
            tokens = self.tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.tokenizer.model_max_length, return_tensors="np",
            )
            return np.asarray(self.text_encoder(tokens["input_ids"])[0])

        pos = encode(prompts)
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        neg = encode(negative_prompts)
        return np.concatenate([neg, pos], axis=0)  # (2n, 77, 768) [neg; pos]


class CLIPTextEncoder:
    """Backbone text encoder (I2VGen-XL CLIP; SDXL dual-encoder handled by caller)."""

    def __init__(self, model_path: str, subfolder: str = "text_encoder"):
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        self.tokenizer = CLIPTokenizer.from_pretrained(model_path, subfolder="tokenizer")
        self.text_encoder = FlaxCLIPTextModel.from_pretrained(model_path, subfolder=subfolder)

    def __call__(self, prompts: List[str]) -> np.ndarray:
        tokens = self.tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        )
        return np.asarray(self.text_encoder(tokens["input_ids"])[0])


class CLIPImageEncoder:
    """CLIP vision tower -> projected image embeddings (n, 1, dim)
    (`i2vgen_xl_..._pipeline.py:366-396`)."""

    def __init__(self, model_path: str, subfolder: str = "image_encoder"):
        from transformers import CLIPImageProcessor, FlaxCLIPVisionModelWithProjection

        self.processor = CLIPImageProcessor.from_pretrained(model_path, subfolder="feature_extractor")
        self.encoder = FlaxCLIPVisionModelWithProjection.from_pretrained(
            model_path, subfolder=subfolder
        )

    def __call__(self, images: List[np.ndarray]) -> np.ndarray:
        inputs = self.processor(images=images, return_tensors="np")
        embeds = self.encoder(inputs["pixel_values"]).image_embeds
        return np.asarray(embeds)[:, None, :]  # (n, 1, dim)
