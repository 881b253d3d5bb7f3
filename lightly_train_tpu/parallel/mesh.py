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

    multi_host = jax.process_count() > 1

    def _put(x: Any) -> Any:
        arr = np.asarray(x) if not isinstance(x, jax.Array) else x
        if arr.ndim > batch_axis_index:
            sharding = batch_sharding(mesh, batch_axis_index)
            if multi_host:
                # device_put rejects shardings spanning non-addressable
                # devices; each process contributes its local slice.
                return jax.make_array_from_process_local_data(sharding, arr)
            return jax.device_put(arr, sharding)
        return jax.device_put(arr, replicated_sharding(mesh))

    return jax.tree_util.tree_map(_put, batch)


def fsdp_leaf_sharding(
    leaf: Any, mesh: Mesh, min_size: int = 2**18
) -> NamedSharding:
    """ZeRO-3-style rule for one leaf: shard the largest divisible axis of
    big (>=2-D, >= min_size elements) tensors over FSDP_AXIS; replicate the
    rest. Shape-based, so it applies equally to params and same-shaped
    optimizer moments."""
    fsdp_n = mesh.shape[FSDP_AXIS]
    shape = getattr(leaf, "shape", ())
    ndim = len(shape)
    size = 1
    for s in shape:
        size *= s
    if fsdp_n > 1 and ndim >= 2 and size >= min_size:
        for ax in sorted(range(ndim), key=lambda a: -shape[a]):
            if shape[ax] % fsdp_n == 0:
                spec: list = [None] * ndim
                spec[ax] = FSDP_AXIS
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_train_state(state: Any, mesh: Mesh, fsdp_min_size: int = 2**18) -> Any:
    """Place a train-state pytree on the mesh.

    Pure-DP meshes (fsdp=1) replicate everything (sufficient for every
    reference-parity model, SURVEY.md §2.7). With an FSDP axis, large 2-D+
    leaves (params, Adam moments, EMA teachers) are sharded over it — the
    GSPMD analog of the reference's vestigial FSDP block chunking; XLA
    inserts the all-gathers/reduce-scatters.
    """
    if mesh.shape[FSDP_AXIS] == 1:
        return jax.device_put(state, replicated_sharding(mesh))
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, fsdp_leaf_sharding(leaf, mesh, fsdp_min_size)
        ),
        state,
    )
