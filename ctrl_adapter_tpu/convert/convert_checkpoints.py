"""CLI: convert diffusers-format checkpoints (torch safetensors) to this framework.

Usage (local checkpoint dirs — this image is zero-egress):
  python -m ctrl_adapter_tpu.convert.convert_checkpoints \
      --src /path/to/i2vgen-xl --dst ./converted/i2vgenxl \
      --components unet vae
  python -m ctrl_adapter_tpu.convert.convert_checkpoints \
      --src /path/to/control_v11f1p_sd15_depth --dst ./converted/controlnet_depth \
      --components controlnet

Covers: backbone UNets (SDXL / I2VGen-XL / SVD), AutoencoderKL (+ temporal decoder),
SD-v1.5 ControlNet, released Ctrl-Adapter adapter/router subfolders
(reference layouts: `inference.py:216-254`, `train.py:406-421`).

The flax module trees in this package mirror diffusers names, so the mapping is the
mechanical rank-based rule in :mod:`ctrl_adapter_tpu.convert.torch_to_jax`; this file
adds config translation (diffusers config.json -> our dataclass kwargs) and validates
the converted tree against ``jax.eval_shape`` of the target module when requested.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict

import numpy as np

from .torch_to_jax import convert_state_dict, load_safetensors


def _find_weights(src: str) -> Dict[str, np.ndarray]:
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
        path = os.path.join(src, name)
        if os.path.exists(path):
            return load_safetensors(path)
    # sharded checkpoints
    for base in ("diffusion_pytorch_model", "model"):
        index = os.path.join(src, f"{base}.safetensors.index.json")
        if os.path.exists(index):
            shards = set(json.load(open(index))["weight_map"].values())
            out: Dict[str, np.ndarray] = {}
            for shard in shards:
                out.update(load_safetensors(os.path.join(src, shard)))
            return out
    raise FileNotFoundError(f"no safetensors weights under {src}")


def diffusers_config_to_ours(component: str, cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Map the relevant diffusers config keys onto our dataclass kwargs."""
    if component == "controlnet":
        return dict(
            in_channels=cfg.get("in_channels", 4),
            conditioning_channels=cfg.get("conditioning_channels", 3),
            block_out_channels=tuple(cfg["block_out_channels"]),
            layers_per_block=cfg.get("layers_per_block", 2),
            cross_attention_dim=cfg.get("cross_attention_dim", 768),
            num_attention_heads=tuple(
                cfg.get("num_attention_heads") or [cfg.get("attention_head_dim", 8)] * 4
            ) if isinstance(cfg.get("num_attention_heads") or cfg.get("attention_head_dim"), (list, tuple))
            else tuple([cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)] * 4),
            use_linear_projection=cfg.get("use_linear_projection", False),
            conditioning_embedding_out_channels=tuple(
                cfg.get("conditioning_embedding_out_channels", (16, 32, 96, 256))
            ),
        )
    if component == "vae":
        return dict(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 4),
            block_out_channels=tuple(cfg["block_out_channels"]),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            scaling_factor=cfg.get("scaling_factor", 0.18215),
        )
    if component == "unet":
        return dict(cfg)  # backbone-specific; consumed by the model constructors
    if component in ("adapter", "router"):
        return dict(cfg)
    if component in ("text_encoder", "text_encoder_2", "image_encoder"):
        return dict(cfg)  # transformers config consumed by models/text_encoders.py
    raise ValueError(component)


def convert_component(src: str, dst: str, component: str,
                      validate: bool = False, model_name: str | None = None) -> None:
    weights = _find_weights(src)
    if component in ("text_encoder", "text_encoder_2", "image_encoder"):
        from ..models.clip import convert_clip_state_dict

        params = convert_clip_state_dict(weights)
    else:
        params = convert_state_dict(weights)
    cfg_path = os.path.join(src, "config.json")
    config = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}

    if validate:
        if component in ("text_encoder", "text_encoder_2", "image_encoder"):
            print(f"validate: skipped for {component} (transformers-config module)")
        else:
            from .validate import build_target, validate_params

            module, example_args = build_target(component, config, model_name)
            n = validate_params(params, module, example_args, label=f"{component} ({src})")
            print(f"validated {component}: {n} leaves congruent with eval_shape init")

    import orbax.checkpoint as ocp

    os.makedirs(dst, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(os.path.join(dst, component)), {"params": params}, force=True)
    with open(os.path.join(dst, f"{component}_config.json"), "w") as f:
        json.dump(
            {"diffusers": config, "ours": _jsonable(diffusers_config_to_ours(component, config))},
            f, indent=2,
        )
    n = sum(v.size for v in weights.values())
    print(f"converted {component}: {len(weights)} tensors, {n / 1e6:.1f}M params -> {dst}")


def _jsonable(d):
    return {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="diffusers model dir (or repo root)")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--components", nargs="+", default=["unet"],
                    choices=["unet", "vae", "controlnet", "adapter", "router",
                             "text_encoder", "text_encoder_2", "image_encoder"])
    ap.add_argument("--validate", action="store_true",
                    help="assert the converted tree is path+shape congruent with "
                         "jax.eval_shape init of the target module (strict-load "
                         "equivalent of reference `inference.py:216-254`)")
    ap.add_argument("--model_name", default=None,
                    choices=["sdxl", "sd15", "svd", "i2vgenxl"],
                    help="backbone for --components unet (inferred from the "
                         "config's _class_name when omitted)")
    args = ap.parse_args()
    for comp in args.components:
        sub = os.path.join(args.src, comp)
        src = sub if os.path.isdir(sub) else args.src
        convert_component(src, args.dst, comp, validate=args.validate,
                          model_name=args.model_name)


if __name__ == "__main__":
    main()


def sdxl_cross_attention_paths(unet_config) -> list:
    """Flax paths of every cross-attention (attn2) in a UNet2DConfig, in the
    order diffusers' ``unet.attn_processors`` traverses them — down_blocks, then
    up_blocks, then mid_block (torch ``named_children`` insertion order), which
    is the order ``_load_ip_adapter_weights`` assigns ``ip_adapter.{1,3,5...}``
    keys (key_id starts at 1, += 2 per cross-attention)."""
    cfg = unet_config
    paths = []

    def transformer(prefix, n_layers):
        for k in range(n_layers):
            paths.append(prefix + [f"transformer_blocks_{k}", "attn2"])

    for i, bt in enumerate(cfg.down_block_types):
        if bt == "CrossAttnDownBlock2D":
            for j in range(cfg.layers_per_block):
                transformer([f"down_blocks_{i}", f"attentions_{j}"],
                            cfg.transformer_layers_per_block[i])
    n = len(cfg.block_out_channels)
    for i, bt in enumerate(cfg.up_block_types):
        if bt == "CrossAttnUpBlock2D":
            rev_idx = n - 1 - i
            for j in range(cfg.layers_per_block + 1):
                transformer([f"up_blocks_{i}", f"attentions_{j}"],
                            cfg.transformer_layers_per_block[rev_idx])
    transformer(["mid_block", "attentions_0"], cfg.transformer_layers_per_block[-1])
    return paths


def convert_ip_adapter_state_dict(state_dict: Dict[str, np.ndarray], unet_config) -> Dict:
    """Convert a standard ``ip_adapter.safetensors`` (image_proj.* + ip_adapter.*)
    into a params overlay for :class:`UNet2DConditionModel`; merge with
    ``merge_ip_adapter``. Accepts both the raw IP-Adapter key names
    (``image_proj.proj.weight``) and diffusers' renamed ones
    (``image_embeds.weight``)."""
    overlay: Dict = {}

    def put(path, leaf, arr):
        node = overlay
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr

    proj_path = ["encoder_hid_proj", "image_projection_layers_0"]
    for key, value in state_dict.items():
        if not key.startswith("image_proj."):
            continue
        sub = key[len("image_proj."):]
        name, leaf = sub.rsplit(".", 1)
        name = {"proj": "image_embeds"}.get(name, name)
        arr = np.asarray(value)
        if leaf == "weight" and arr.ndim == 2:
            put(proj_path + [name], "kernel", arr.T)
        elif name == "norm" and leaf == "weight":
            put(proj_path + [name], "scale", arr)
        else:
            put(proj_path + [name], "bias", arr)

    paths = sdxl_cross_attention_paths(unet_config)
    for key, value in state_dict.items():
        if not key.startswith("ip_adapter."):
            continue
        _, key_id, proj, leaf = key.split(".")  # ip_adapter.{id}.to_k_ip.weight
        idx = (int(key_id) - 1) // 2
        if idx >= len(paths):
            raise KeyError(f"ip_adapter key {key} beyond the UNet's {len(paths)} cross-attentions")
        assert leaf == "weight" and proj in ("to_k_ip", "to_v_ip"), key
        put(paths[idx] + ["processor", f"{proj}_0"], "kernel", np.asarray(value).T)
    return overlay


def merge_ip_adapter(unet_params: Dict, overlay: Dict) -> Dict:
    """Deep-merge an IP-Adapter overlay into converted UNet params."""
    import jax

    tree = dict(unet_params.get("params", unet_params))

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            out[k] = merge(out[k], v) if isinstance(v, dict) and k in out else (
                jax.numpy.asarray(v) if not isinstance(v, dict) else merge({}, v))
        return out

    merged = merge(tree, overlay)
    return {"params": merged} if "params" in unet_params else merged
