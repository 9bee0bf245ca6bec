"""Multi-condition MoE router: per-block expert weights over N ControlNets.

Parity target: reference `model/ctrl_router.py:9-112`. Two live router types:
- ``equal_weights``: constant zero logits (uniform over unmasked experts);
- ``simple_weights``: free logits per block — a bias-free Linear(1 -> E) applied to the
  constant input 1, i.e. the logits are simply the weight column ``wg.weight[:, 0]``.

Extension beyond the reference: the reference's trainer and I2VGen-XL pipeline *wire*
three conditional router types (``timestep_weights`` / ``embedding_weights`` /
``timestep_embedding_weights``, `train.py:566-597`,
`i2vgen_xl_controlnet_adapter_pipeline.py:974-988`) but `ctrl_router.py:71-82` never
implements them — the class silently falls back. Here they are implemented for real:
the router input (a timestep embedding, a pooled encoder embedding, or their concat)
feeds a bias-free per-block Linear(D -> E) producing input-conditional expert logits.

Expert masking subtracts 1e6 from masked experts' logits before the softmax
(reference `:96-107`), which is how inference-time ``inference_expert_masks`` and the
training-time random expert subsets work.

TPU-native design: the 12 (+1 mid) routers collapse into a single (num_routers, E)
logits tensor -> one masked softmax; fusion of expert features is an einsum over a
static expert axis rather than per-expert Python loops. Param layout still mirrors the
torch tree (``down_blocks_router_{i}.wg.kernel``) for checkpoint conversion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

MASK_NEG = 1.0e6


class _WeightGate(nn.Module):
    """One per-block gate: a bias-free ``wg`` Linear, named to mirror the torch
    checkpoint tree (``down_blocks_router.{i}.wg.weight`` ->
    ``down_blocks_router_{i}/wg/kernel`` through the production converter)."""

    num_experts: int
    in_features: int = 1
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.num_experts, use_bias=False, name="wg",
            kernel_init=nn.initializers.normal(
                stddev=1.0 / jnp.sqrt(float(self.in_features))),
            param_dtype=self.param_dtype, dtype=jnp.float32,
        )(x)


class ControlNetRouter(nn.Module):
    num_experts: int = 2
    router_type: str = "simple_weights"  # "equal_weights" | "simple_weights"
    num_routers: int = 12
    add_mid_block_router: bool = True
    embedding_dim: Optional[int] = None
    backbone_model_name: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32

    def _logits(self, name: str, router_input: Optional[jnp.ndarray]) -> jnp.ndarray:
        if self.router_type == "equal_weights":
            return jnp.zeros((self.num_experts,), dtype=jnp.float32)
        if self.router_type == "simple_weights":
            # torch: nn.Linear(1, E, bias=False) applied to the constant 1.0, i.e.
            # the logits ARE the weight column. The param nests as
            # ``{name}/wg/kernel`` so released router checkpoints
            # (``down_blocks_router.{i}.wg.weight``) load through
            # ``load_torch_release`` without remapping.
            gate = _WeightGate(self.num_experts, 1, self.param_dtype, name=name)
            return gate(jnp.ones((1, 1), jnp.float32))[0].astype(jnp.float32)
        if self.router_type in (
            "timestep_weights", "embedding_weights", "timestep_embedding_weights"
        ):
            if router_input is None:
                raise ValueError(
                    f"router_type={self.router_type!r} needs router_input "
                    "(timestep embedding and/or pooled encoder embedding)"
                )
            x = jnp.asarray(router_input, jnp.float32)
            if x.ndim == 2:  # (B, D): one weight set per call, batch-averaged
                x = x.mean(axis=0)
            gate = _WeightGate(self.num_experts, x.shape[-1], self.param_dtype,
                               name=name)
            return gate(x[None])[0]
        raise ValueError(f"unsupported router_type: {self.router_type}")

    @nn.compact
    def __call__(
        self,
        router_input: Optional[jnp.ndarray] = None,
        sparse_mask: Optional[jnp.ndarray] = None,  # (E,) 1=keep, 0=mask
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        down_logits = jnp.stack(
            [self._logits(f"down_blocks_router_{i}", router_input)
             for i in range(self.num_routers)]
        )  # (num_routers, E)
        mid_logits = (
            self._logits("mid_block_router", router_input)
            if self.add_mid_block_router else None
        )

        if sparse_mask is not None:
            sparse_mask = jnp.asarray(sparse_mask, dtype=jnp.float32)
            penalty = (1.0 - sparse_mask) * MASK_NEG
            down_logits = down_logits - penalty[None, :]
            if mid_logits is not None:
                mid_logits = mid_logits - penalty

        down_weights = nn.softmax(down_logits, axis=-1)
        mid_weights = nn.softmax(mid_logits, axis=-1) if mid_logits is not None else None
        return down_weights, mid_weights


def build_router_input(
    router_type: str,
    timesteps: Optional[jnp.ndarray] = None,  # (B,) denoise timesteps
    encoder_hidden_states: Optional[jnp.ndarray] = None,  # (B, T, D)
    timestep_channels: int = 256,
) -> Optional[jnp.ndarray]:
    """Assemble the conditional router input for the timestep/embedding router types
    (the wiring the reference sketches at `train.py:566-597` /
    `i2vgen_xl_controlnet_adapter_pipeline.py:974-988`): a sinusoidal timestep
    embedding, a token-pooled encoder embedding, or their concatenation."""
    from ..nn.embeddings import get_timestep_embedding

    parts = []
    if router_type in ("timestep_weights", "timestep_embedding_weights"):
        if timesteps is None:
            raise ValueError(f"{router_type} needs timesteps")
        temb = get_timestep_embedding(jnp.atleast_1d(timesteps), timestep_channels)
        parts.append(temb.mean(axis=0))
    if router_type in ("embedding_weights", "timestep_embedding_weights"):
        if encoder_hidden_states is None:
            raise ValueError(f"{router_type} needs encoder_hidden_states")
        parts.append(
            jnp.asarray(encoder_hidden_states, jnp.float32).mean(axis=(0, 1))
        )
    if not parts:
        return None
    return jnp.concatenate(parts, axis=-1)


def fuse_expert_residuals(
    down_per_expert,  # list over E of list over K of (..., c) arrays
    mid_per_expert,  # list over E of arrays, or None
    down_weights: Optional[jnp.ndarray],  # (K, E); None = unweighted sum (no router)
    mid_weights: Optional[jnp.ndarray],  # (E,); None = unweighted sum
):
    """Router-weighted merge of per-expert ControlNet residuals.

    Equivalent to the per-expert accumulation loops at
    `i2vgen_xl_controlnet_adapter_pipeline.py:1000-1022` / `train.py:1262-1274`, but as
    a static sum so XLA fuses the scale+add chains into the producing convolutions.
    ``None`` weights mean the routerless single/summed-expert path (weight 1.0).
    """
    num_experts = len(down_per_expert)
    num_blocks = len(down_per_expert[0])
    fused_down = []
    for k in range(num_blocks):
        acc = 0
        for e in range(num_experts):
            r = down_per_expert[e][k]
            acc = acc + (r if down_weights is None
                         else r * down_weights[k, e].astype(r.dtype))
        fused_down.append(acc)
    fused_mid = None
    if mid_per_expert is not None and (mid_weights is not None or down_weights is None):
        acc = 0
        for e in range(num_experts):
            r = mid_per_expert[e]
            acc = acc + (r if mid_weights is None
                         else r * mid_weights[e].astype(r.dtype))
        fused_mid = acc
    return fused_down, fused_mid
