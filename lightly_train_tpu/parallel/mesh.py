"""Device mesh construction and sharding rules.

The TPU-native replacement for the reference's DDP strategy selection
(``src/lightly_train/_commands/train_helpers.py:282-332``). Distribution is
GSPMD: a 1-D (or 2-D for fsdp) ``jax.sharding.Mesh`` over all devices, the
global batch sharded along ``BATCH_AXIS``, parameters replicated (or sharded
along ``FSDP_AXIS`` for very large backbones). XLA inserts all collectives
(grad psum, center psum, Sinkhorn reductions) — no explicit backend code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"
FSDP_AXIS = "fsdp"


@dataclass(frozen=True)
class MeshConfig:
    """How to lay devices out.

    ``fsdp`` > 1 creates a second mesh axis for parameter sharding (ZeRO-3
    style); default is pure data parallelism which is sufficient for every
    model in the reference (SURVEY.md §2.7).
    """

    data: int = -1  # -1 = all remaining devices
    fsdp: int = 1

    def build(self, devices: list[Any] | None = None) -> Mesh:
        if devices is None:
            devices = jax.devices()
        n = len(devices)
        fsdp = max(1, self.fsdp)
        data = self.data if self.data > 0 else n // fsdp
        if data * fsdp != n:
            raise ValueError(
                f"Mesh {data}x{fsdp} does not cover {n} devices; adjust MeshConfig."
            )
        dev_array = np.asarray(devices).reshape(data, fsdp)
        return Mesh(dev_array, (BATCH_AXIS, FSDP_AXIS))


def get_default_mesh(devices: list[Any] | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    return MeshConfig().build(devices)


def batch_sharding(mesh: Mesh, ndim_leading_batch: int = 0) -> NamedSharding:
    """Sharding for arrays whose axis ``ndim_leading_batch`` is the batch axis.

    Multi-crop view stacks are (G, B, H, W, C): batch is axis 1, so pass 1.
    """
    spec = [None] * ndim_leading_batch + [BATCH_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, batch_axis_index: int = 0) -> Any:
    """Device-put a host batch pytree with the batch dimension sharded.

    Leaves whose rank is <= batch_axis_index are replicated.
    """

    def _put(x: Any) -> Any:
        arr = np.asarray(x) if not isinstance(x, jax.Array) else x
        if arr.ndim > batch_axis_index:
            return jax.device_put(arr, batch_sharding(mesh, batch_axis_index))
        return jax.device_put(arr, replicated_sharding(mesh))

    return jax.tree_util.tree_map(_put, batch)


def shard_train_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train-state pytree across the mesh (pure DP).

    For FSDP meshes, parameter sharding rules would go here; data-parallel
    replication is the default for all reference-parity models.
    """
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)
