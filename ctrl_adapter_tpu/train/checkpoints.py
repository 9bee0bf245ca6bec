"""Checkpoint save/load with the reference's directory layout.

Parity target: reference `train.py:406-421,1009-1015` — per-step directories
``checkpoint-{step}/`` containing ``adapter_{step}/`` and ``router_{step}/``
(each with model weights) plus optimizer state; inference loads from the same
subfolder layout or from converted HF releases (`inference.py:216-254`).

Implementation: orbax for the jax pytrees, plus a safetensors import path so released
torch checkpoints (``diffusion_pytorch_model.safetensors``) convert in place via
:mod:`ctrl_adapter_tpu.convert.torch_to_jax`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    output_dir: str,
    step: int,
    adapter_params: Dict[str, Any],
    router_params: Optional[Dict[str, Any]] = None,
    opt_state: Any = None,
    config: Optional[dict] = None,
) -> str:
    ocp = _ocp()
    ckpt_dir = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, f"adapter_{step}"), adapter_params, force=True)
        if router_params is not None:
            ckptr.save(os.path.join(ckpt_dir, f"router_{step}"), router_params, force=True)
        if opt_state is not None:
            ckptr.save(os.path.join(ckpt_dir, "optimizer"), opt_state, force=True)
    if config is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2)
    return ckpt_dir


def load_checkpoint(
    ckpt_dir: str,
    step: int,
    adapter_template: Dict[str, Any],
    router_template: Optional[Dict[str, Any]] = None,
    opt_template: Any = None,
):
    ocp = _ocp()
    out = {}
    with ocp.StandardCheckpointer() as ckptr:
        out["adapter"] = ckptr.restore(
            os.path.abspath(os.path.join(ckpt_dir, f"adapter_{step}")), adapter_template
        )
        router_path = os.path.join(ckpt_dir, f"router_{step}")
        if router_template is not None and os.path.exists(router_path):
            out["router"] = ckptr.restore(os.path.abspath(router_path), router_template)
        opt_path = os.path.join(ckpt_dir, "optimizer")
        if opt_template is not None and os.path.exists(opt_path):
            out["opt_state"] = ckptr.restore(os.path.abspath(opt_path), opt_template)
    return out


def load_torch_release(path: str) -> Dict[str, Any]:
    """Load a released HF Ctrl-Adapter subfolder (diffusion_pytorch_model.safetensors
    + config.json) into a flax param tree (`inference.py:216-254` equivalent)."""
    from ..convert.torch_to_jax import convert_state_dict, load_safetensors

    st = os.path.join(path, "diffusion_pytorch_model.safetensors")
    if not os.path.exists(st):
        raise FileNotFoundError(f"no safetensors checkpoint at {st}")
    params = convert_state_dict(load_safetensors(st))
    cfg_path = os.path.join(path, "config.json")
    config = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    return {"params": params}, config
