"""Multi-ControlNet wrapper: N frozen experts returning per-expert residual lists.

Parity target: reference `controlnet/multicontrolnet.py:45-213` — the fork that
returns *per-expert lists* of residuals (instead of upstream's summation) so the MoE
router can fuse them, plus ``save_pretrained``/``from_pretrained`` over
``controlnet``, ``controlnet_1``, ... subdirectories.

TPU-native: experts share one flax module definition (identical architecture); the
wrapper carries a params list and runs experts as a static Python loop inside the
jitted caller — masked experts are skipped entirely at trace time (the reference
computes every loaded expert, `train.py:1222-1235`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from .controlnet import ControlNetConfig, ControlNetModel


class MultiControlNetModel:
    def __init__(self, controlnet: ControlNetModel, params_per_expert: List[Dict[str, Any]]):
        self.controlnet = controlnet
        self.params_per_expert = params_per_expert

    @property
    def num_experts(self) -> int:
        return len(self.params_per_expert)

    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        controlnet_cond: jnp.ndarray,  # (E, n, h, w, 3)
        conditioning_scale: float | Sequence[float] = 1.0,
        skip_conv_in: bool = False,
        skip_time_emb: bool = False,
        expert_mask: Optional[Sequence[bool]] = None,  # static; True = compute
    ) -> Tuple[List[List[jnp.ndarray]], List[jnp.ndarray]]:
        """Returns per-expert (down residual lists, mid residuals) for active experts
        (`multicontrolnet.py:63-99` semantics, minus wasted masked-expert compute)."""
        scales = (
            list(conditioning_scale)
            if isinstance(conditioning_scale, (list, tuple))
            else [conditioning_scale] * self.num_experts
        )
        mask = list(expert_mask) if expert_mask is not None else [True] * self.num_experts
        per_down, per_mid = [], []
        for e, params in enumerate(self.params_per_expert):
            if not mask[e]:
                continue
            downs, mid = self.controlnet.apply(
                params, sample, timestep, encoder_hidden_states, controlnet_cond[e],
                conditioning_scale=scales[e],
                skip_conv_in=skip_conv_in, skip_time_emb=skip_time_emb,
            )
            per_down.append(downs)
            per_mid.append(mid)
        return per_down, per_mid

    # ------------------------------------------------------------- persistence
    @classmethod
    def from_pretrained(cls, root: str, config: Optional[ControlNetConfig] = None):
        """Load ``controlnet``, ``controlnet_1``, ... subdirs (converted checkpoints,
        reference `multicontrolnet.py:152-213` layout)."""
        from ..train.checkpoints import load_torch_release

        params = []
        idx = 0
        while True:
            sub = os.path.join(root, "controlnet" if idx == 0 else f"controlnet_{idx}")
            if not os.path.isdir(sub):
                break
            tree, _ = load_torch_release(sub)
            params.append(tree)
            idx += 1
        if not params:
            raise FileNotFoundError(f"no controlnet subdirs under {root}")
        return cls(ControlNetModel(config=config or ControlNetConfig()), params)

    def save_pretrained(self, root: str) -> None:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            for idx, params in enumerate(self.params_per_expert):
                sub = "controlnet" if idx == 0 else f"controlnet_{idx}"
                ckptr.save(os.path.abspath(os.path.join(root, sub)), params, force=True)
