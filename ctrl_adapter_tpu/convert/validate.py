"""Converted-checkpoint validation: eval_shape congruence against target modules.

The reference loads released checkpoints with strict torch key matching
(`/root/reference/inference.py:216-254`); a silently mis-shaped conversion would
only surface as garbage samples. This module rebuilds the *target* flax module
from the translated config, runs ``jax.eval_shape`` over its ``init`` (so no
memory is allocated — real-width SDXL/SVD configs validate in seconds), and
asserts the converted param tree is congruent: same leaf paths, same shapes.

A transposed Linear kernel, a Conv kernel left in torch (O,I,kh,kw) layout, a
missing tensor, or an extra tensor all fail with a per-leaf diff.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ConversionValidationError(AssertionError):
    """Converted params are not congruent with the target module's init tree."""


def _filter_fields(cfg_cls, cfg: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cfg_cls)}
    out = {}
    for k, v in cfg.items():
        if k in names:
            out[k] = tuple(v) if isinstance(v, list) else v
    return out


def _heads_tuple(cfg: Dict[str, Any], n_blocks: int) -> Tuple[int, ...]:
    """diffusers historically stores per-block head counts under
    ``attention_head_dim`` when ``num_attention_heads`` is unset (the SDXL
    config does exactly this)."""
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)
    if isinstance(heads, (list, tuple)):
        return tuple(heads)
    return (int(heads),) * n_blocks


def unet_module_from_diffusers(model_name: str, cfg: Dict[str, Any], dtype=jnp.float32):
    """Build the backbone UNet flax module for a diffusers ``config.json``."""
    n = len(cfg.get("block_out_channels", (320, 640, 1280, 1280)))
    tl = cfg.get("transformer_layers_per_block", 1)
    tl = tuple(tl) if isinstance(tl, (list, tuple)) else (int(tl),) * n
    if model_name in ("sdxl", "sd15", "unet2d"):
        from ..models.unet_2d import UNet2DConditionModel, UNet2DConfig

        ours = _filter_fields(UNet2DConfig, cfg)
        ours["num_attention_heads"] = _heads_tuple(cfg, n)
        ours["transformer_layers_per_block"] = tl
        return UNet2DConditionModel(config=UNet2DConfig(**ours), dtype=dtype)
    if model_name == "svd":
        from ..models.unet_svd import SVDUNetConfig, UNetSpatioTemporalConditionModel

        ours = _filter_fields(SVDUNetConfig, cfg)
        ours["num_attention_heads"] = _heads_tuple(cfg, n)
        ours["transformer_layers_per_block"] = tl
        return UNetSpatioTemporalConditionModel(config=SVDUNetConfig(**ours), dtype=dtype)
    if model_name == "i2vgenxl":
        from ..models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig

        ours = _filter_fields(I2VGenXLUNetConfig, cfg)
        if isinstance(cfg.get("attention_head_dim"), (list, tuple)):
            ours["attention_head_dim"] = int(cfg["attention_head_dim"][0])
        return I2VGenXLUNet(config=I2VGenXLUNetConfig(**ours), dtype=dtype)
    raise ValueError(f"unknown backbone model_name: {model_name!r}")


def build_target(
    component: str,
    diffusers_cfg: Dict[str, Any],
    model_name: Optional[str] = None,
    dtype=jnp.float32,
):
    """(module, example_args) whose ``init`` creates every parameter of the
    target — spatial dims are tiny (param shapes never depend on them)."""
    cfg = dict(diffusers_cfg)
    cls_name = cfg.get("_class_name", "")

    if component == "controlnet":
        from ..models.controlnet import ControlNetConfig, ControlNetModel
        from .convert_checkpoints import diffusers_config_to_ours

        ours = diffusers_config_to_ours("controlnet", cfg) if cfg else {}
        module = ControlNetModel(config=ControlNetConfig(**ours), dtype=dtype)
        xd = ours.get("cross_attention_dim", 768)
        args = (
            jnp.zeros((1, 8, 8, module.config.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, xd)),
            jnp.zeros((1, 64, 64, module.config.conditioning_channels)),
        )
        return module, args

    if component == "vae":
        from ..models.vae import AutoencoderKL, VAEConfig
        from .convert_checkpoints import diffusers_config_to_ours

        ours = diffusers_config_to_ours("vae", cfg) if cfg else {}
        vcfg = VAEConfig(**_filter_fields(VAEConfig, ours))
        if cls_name == "AutoencoderKLTemporalDecoder" or model_name == "svd":
            from ..models.vae_temporal import AutoencoderKLTemporalDecoder

            module = AutoencoderKLTemporalDecoder(config=vcfg, dtype=dtype)
            return module, (jnp.zeros((2, 32, 32, vcfg.in_channels)), 2)
        module = AutoencoderKL(config=vcfg, dtype=dtype)
        return module, (jnp.zeros((1, 32, 32, vcfg.in_channels)),)

    if component == "unet":
        if model_name is None:
            cls_map = {
                "UNet2DConditionModel": "sdxl",
                "UNetSpatioTemporalConditionModel": "svd",
                "I2VGenXLUNet": "i2vgenxl",
            }
            model_name = cls_map.get(cls_name)
            if model_name is None:
                raise ValueError(
                    f"cannot infer backbone from _class_name={cls_name!r}; "
                    "pass --model_name")
        module = unet_module_from_diffusers(model_name, cfg, dtype)
        c = module.config
        if model_name in ("sdxl", "sd15", "unet2d"):
            added = None
            if c.addition_embed_type == "text_time":
                # text_embeds dim = projection_class_embeddings_input_dim - 6*addition_time_embed_dim
                te = c.projection_class_embeddings_input_dim - 6 * c.addition_time_embed_dim
                added = {"text_embeds": jnp.zeros((1, te)),
                         "time_ids": jnp.zeros((1, 6))}
            args = (jnp.zeros((1, 16, 16, c.in_channels)), jnp.zeros((1,)),
                    jnp.zeros((1, 77, c.cross_attention_dim)), added)
        elif model_name == "svd":
            args = (jnp.zeros((1, 2, 16, 16, c.in_channels)), jnp.zeros((1,)),
                    jnp.zeros((1, 1, c.cross_attention_dim)), jnp.zeros((1, 3)))
        else:  # i2vgenxl
            args = (jnp.zeros((1, 2, 16, 16, c.in_channels)), jnp.zeros((1,)),
                    jnp.zeros((1,)), jnp.zeros((1, 2, 16, 16, c.in_channels)),
                    jnp.zeros((1, 1, c.cross_attention_dim)),
                    jnp.zeros((1, 77, c.cross_attention_dim)))
        return module, args

    if component == "adapter":
        from ..models.adapter import ControlNetAdapter, get_down_block_channels

        fields = {f.name for f in dataclasses.fields(ControlNetAdapter)
                  if f.name not in ("parent", "name")}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in fields}
        module = ControlNetAdapter(**kw)
        chans = module.down_block_channels
        downs = [jnp.zeros((2, 8, 8, ch)) for ch in chans]
        mid = (jnp.zeros((2, 8, 8, module.custom_mid_block_channels or 1280))
               if "M" in module.adapter_locations else None)
        xd = module.cross_attention_dim or 1024
        args = (downs, mid)
        kwargs = dict(num_frames=2, timestep=jnp.ones((2,)),
                      encoder_hidden_states=jnp.zeros((1, 1, xd)))
        return module, (args, kwargs)

    if component == "router":
        from ..models.router import ControlNetRouter

        fields = {f.name for f in dataclasses.fields(ControlNetRouter)
                  if f.name not in ("parent", "name")}
        kw = {k: v for k, v in cfg.items() if k in fields}
        module = ControlNetRouter(**kw)
        rin = None
        if module.router_type in ("timestep_weights", "embedding_weights",
                                  "timestep_embedding_weights"):
            rin = jnp.zeros((1, module.embedding_dim or 1024))
        return module, ((rin,), {})

    raise ValueError(f"no validation target for component {component!r}")


def _leaf_shapes(tree) -> Dict[str, Tuple[Tuple[int, ...], Any]]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = (tuple(leaf.shape), jnp.dtype(leaf.dtype).name)
    return flat


def validate_params(
    converted: Dict[str, Any],
    module,
    example_args,
    label: str = "",
    check_dtypes: bool = False,
) -> int:
    """Raise :class:`ConversionValidationError` unless ``converted`` is
    path+shape congruent with ``jax.eval_shape(module.init, ...)``.

    ``converted`` may be the bare param dict or ``{"params": ...}``.
    Checkpoints legitimately carry fp16/bf16 leaves, so dtype congruence is
    opt-in. Returns the number of validated leaves.
    """
    if "params" not in converted:
        converted = {"params": converted}
    if isinstance(example_args, tuple) and len(example_args) == 2 and \
            isinstance(example_args[1], dict):
        args, kwargs = example_args
    else:
        args, kwargs = tuple(example_args), {}
    target = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs)
    )
    got = _leaf_shapes(converted)
    want = _leaf_shapes(target)

    problems: List[str] = []
    for key in sorted(set(want) - set(got)):
        problems.append(f"MISSING   {key}  want shape {want[key][0]}")
    for key in sorted(set(got) - set(want)):
        problems.append(f"UNEXPECTED {key}  got shape {got[key][0]}")
    for key in sorted(set(got) & set(want)):
        if got[key][0] != want[key][0]:
            problems.append(
                f"SHAPE     {key}  got {got[key][0]} want {want[key][0]}")
        elif check_dtypes and got[key][1] != want[key][1]:
            problems.append(
                f"DTYPE     {key}  got {got[key][1]} want {want[key][1]}")
    if problems:
        head = f"converted checkpoint {label or ''} fails validation " \
               f"({len(problems)} problems, {len(want)} target leaves):\n  "
        raise ConversionValidationError(head + "\n  ".join(problems[:40]) + (
            f"\n  ... and {len(problems) - 40} more" if len(problems) > 40 else ""))
    return len(want)
