"""Device mesh + sharding helpers.

The reference's only distribution strategy is data-parallel DDP over NCCL via
HF Accelerate (`train.py:379-384,936-939`; SURVEY §2.4). The TPU-native equivalent is a
1-D ``data`` mesh: the batch is sharded over devices, parameters are replicated, and
XLA emits the gradient all-reduce over ICI from the pjit sharding — there is no
hand-written communication. A ``model`` axis is reserved for optional tensor
parallelism (not needed for parity: every backbone fits one v5e chip in bf16).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Shard every array in a pytree along its leading axis over `data`."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
