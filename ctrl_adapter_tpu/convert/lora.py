"""LoRA checkpoint merging for converted flax params.

Parity target: reference `inference.py:169,374-375` — ``pipe.load_lora_weights(path)``
lets users apply a (typically SDXL, civitai-style) LoRA on top of the frozen
backbone before generation.

TPU-first design: instead of keeping low-rank factors live in the forward pass
(extra matmuls + dynamic module surgery), the deltas ``scale * (alpha / r) * up @
down`` are folded into the already-converted flax kernels once at load time —
the jitted program is unchanged and pays zero runtime cost. Supported layouts:

- kohya/civitai: ``lora_unet_<module with _>.lora_down.weight`` /
  ``.lora_up.weight`` / ``.alpha`` (also ``lora_te1_``/``lora_te2_`` for the two
  SDXL text encoders);
- peft/diffusers: ``unet.<module with .>.lora_A.weight`` / ``.lora_B.weight``.

Module-name resolution needs no hand mapping: the flax trees in this package keep
diffusers' names with ``_`` for list indices (`torch_to_jax.py:52-76`), so a
kohya module name equals the tree path joined on ``_`` exactly.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import numpy as np

from .torch_to_jax import convert_tensor

_COMPONENT_PREFIXES = {
    "unet": ("lora_unet_", "unet."),
    "te1": ("lora_te1_", "text_encoder."),
    "te2": ("lora_te2_", "text_encoder_2."),
}


def _group_lora_modules(
        lora_sd: Mapping[str, np.ndarray],
        component: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Group {module_name -> {down, up, alpha}} for one component's LoRA keys."""
    kohya_p, peft_p = _COMPONENT_PREFIXES[component]
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in lora_sd.items():
        if key.startswith(kohya_p):
            rest = key[len(kohya_p):]
            for suffix, leaf in ((".lora_down.weight", "down"),
                                 (".lora_up.weight", "up"), (".alpha", "alpha")):
                if rest.endswith(suffix):
                    groups.setdefault(
                        rest[: -len(suffix)], {})[leaf] = np.asarray(v)
                    break
        elif key.startswith(peft_p):
            rest = key[len(peft_p):]
            for suffix, leaf in ((".lora_A.weight", "down"),
                                 (".lora_B.weight", "up"), (".alpha", "alpha")):
                if rest.endswith(suffix):
                    # dotted torch path -> underscore form used by the flax tree
                    mod = rest[: -len(suffix)]
                    parts: List[str] = []
                    for p in mod.split("."):
                        if p.isdigit() and parts:
                            parts[-1] = f"{parts[-1]}_{p}"
                        else:
                            parts.append(p)
                    groups.setdefault("_".join(parts), {})[leaf] = np.asarray(v)
                    break
    return groups


def _kernel_paths(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[str, Tuple[str, ...]]:
    """{underscore-joined module name -> tree path} for every kernel leaf."""
    out: Dict[str, Tuple[str, ...]] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_kernel_paths(v, prefix + (k,)))
        elif k == "kernel":
            out["_".join(prefix)] = prefix
    return out


def _full_rank_delta(g: Dict[str, np.ndarray]) -> np.ndarray:
    """up @ down in the torch layout of the target weight, scaled by alpha/r."""
    down, up = np.asarray(g["down"], np.float32), np.asarray(g["up"], np.float32)
    rank = down.shape[0]
    alpha = float(np.asarray(g.get("alpha", rank)))
    if down.ndim == 2:  # linear: (r, in), (out, r) -> (out, in)
        delta = up @ down
    else:  # conv: up (out, r, 1, 1), down (r, in, kh, kw)
        o, r = up.shape[:2]
        delta = (up.reshape(o, r) @ down.reshape(r, -1)).reshape(
            (o,) + down.shape[1:])
    return delta * (alpha / rank)


def apply_lora(params: Dict, lora_sd: Mapping[str, np.ndarray],
               scale: float = 1.0, component: str = "unet") -> int:
    """Fold LoRA deltas into a converted flax param tree **in place**.

    Returns the number of modules merged; raises if the LoRA references modules
    absent from the tree (a wrong-base LoRA should fail loudly, like
    ``load_lora_weights`` does)."""
    root = params.get("params", params)
    groups = _group_lora_modules(lora_sd, component)
    if not groups:
        return 0
    paths = _kernel_paths(root)
    merged = 0
    for mod, g in groups.items():
        if "down" not in g or "up" not in g:
            raise KeyError(f"LoRA module {mod} missing down/up factors")
        if mod not in paths:
            raise KeyError(f"LoRA targets unknown module: {mod}")
        node = root
        for p in paths[mod]:
            node = node[p]
        delta = _full_rank_delta(g)
        _, delta = convert_tensor(f"{mod}.weight", delta)
        kernel = np.asarray(node["kernel"], np.float32)
        if kernel.shape != delta.shape:
            raise ValueError(
                f"LoRA delta shape {delta.shape} != kernel {kernel.shape} at {mod}")
        node["kernel"] = (kernel + scale * delta).astype(
            np.asarray(node["kernel"]).dtype)
        merged += 1
    return merged


def load_lora_file(path: str) -> Dict[str, np.ndarray]:
    """Read a LoRA checkpoint (.safetensors or torch .pt/.pth/.bin)."""
    if path.endswith(".safetensors"):
        from .torch_to_jax import load_safetensors

        return load_safetensors(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v) for k, v in sd.items()}
