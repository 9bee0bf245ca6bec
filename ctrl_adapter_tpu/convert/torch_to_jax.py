"""Torch/safetensors state-dict -> flax param-tree converter.

The flax modules in this package keep diffusers' module names (``.`` -> ``_`` for list
indices), so conversion is mechanical:

- Linear ``weight`` (out, in)            -> ``kernel`` (in, out)
- Conv2d ``weight`` (out, in, kh, kw)    -> ``kernel`` (kh, kw, in, out)
- Conv3d ``weight`` (out, in, kd, kh, kw)-> ``kernel`` (kd, kh, kw, in, out)
- Norm ``weight``/``bias``               -> ``scale``/``bias``
- everything else (1-D params like AlphaBlender ``mix_factor``) passes through.

Rank-based dispatch is unambiguous for every model in this framework (no nn.Embedding
in the UNet/ControlNet/adapter trees). Reference checkpoint layouts:
``adapter_{step}``/``router_{step}`` dirs with ``diffusion_pytorch_model.safetensors``
(reference `train.py:406-421`, `inference.py:216-254`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _is_norm_scale(torch_key: str) -> bool:
    parts = torch_key.split(".")
    if parts[-1] != "weight":
        return False
    leaf_module = parts[-2] if len(parts) >= 2 else ""
    return (
        leaf_module.startswith("norm")
        or leaf_module in ("group_norm", "layer_norm")
        or "norm" in leaf_module
    )


def convert_tensor(torch_key: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    """Map one torch tensor to its flax (name, layout)."""
    leaf = torch_key.rsplit(".", 1)[-1]
    if leaf == "weight":
        if value.ndim == 2:
            return "kernel", np.ascontiguousarray(value.T)
        if value.ndim == 4:
            return "kernel", np.ascontiguousarray(value.transpose(2, 3, 1, 0))
        if value.ndim == 5:
            return "kernel", np.ascontiguousarray(value.transpose(2, 3, 4, 1, 0))
        if value.ndim == 1:  # norm scale
            return "scale", value
    return leaf, value


def convert_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Convert a flat torch state dict into a nested flax params dict.

    Torch path ``down_blocks.0.resnets.1.conv1.weight`` becomes
    ``{"down_blocks_0": {"resnets_1": {"conv1": {"kernel": ...}}}}`` — matching the
    module names used throughout :mod:`ctrl_adapter_tpu`.
    """
    params: Dict = {}
    for torch_key, value in state_dict.items():
        value = np.asarray(value)
        leaf_name, tensor = convert_tensor(torch_key, value)
        parts = torch_key.split(".")[:-1]
        # merge pure-numeric segments into their parent: "resnets.0" -> "resnets_0"
        merged = []
        for p in parts:
            if p.isdigit() and merged:
                merged[-1] = f"{merged[-1]}_{p}"
            else:
                merged.append(p)
        # torch "to_out.0" -> flax "to_out_0" handled by the merge above.
        node = params
        for p in merged:
            node = node.setdefault(p, {})
        node[leaf_name] = tensor
    return params


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out
