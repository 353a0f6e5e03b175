"""Device-mesh construction for SPMD execution.

The framework runs every training/eval step as one pjit-compiled SPMD program over a
`jax.sharding.Mesh` with up to five logical axes:

  data   — batch sharding (classic data parallel; collectives: pmean of grads)
  fsdp   — batch sharding + parameter/optimizer-state sharding (ZeRO-3 style)
  model  — tensor parallelism (attention heads / MLP width)
  expert — expert parallelism for MoE layers (all_to_all dispatch)
  seq    — sequence/context parallelism for long video-token streams

This replaces the reference's process-per-GPU NCCL world
(``/root/reference/antmmf/trainers/base_trainer.py:184-218`` and
``antmmf/utils/launch.py``): instead of N OS processes + DDP, one mesh + sharding
annotations; XLA inserts the collectives and lays them onto ICI rings.

Axis order matters for the physical layout: `mesh_utils.create_device_mesh` places
the innermost (last) axes on the fastest ICI neighbours, so model/seq live
innermost and data outermost (DCN-friendly for multi-slice).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

MESH_AXES = ("data", "fsdp", "model", "expert", "seq")

# Batch (data) dimension is sharded across every axis that carries replicas of the
# model weights — data and fsdp — while model/expert/seq see the same examples.
BATCH_AXES = ("data", "fsdp")


def build_mesh(
    mesh_config: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Create a Mesh from an axis-size mapping. ``-1`` (on at most one axis) means
    "all remaining devices"; missing axes default to 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)

    sizes = {axis: 1 for axis in MESH_AXES}
    fill_axis = "data"
    for axis, size in dict(mesh_config or {}).items():
        if axis not in sizes:
            raise ValueError(f"Unknown mesh axis {axis!r}; valid: {MESH_AXES}")
        sizes[axis] = int(size)
    fills = [a for a, s in sizes.items() if s == -1]
    if len(fills) > 1:
        raise ValueError(f"Only one mesh axis may be -1, got {fills}")
    if fills:
        fill_axis = fills[0]
        sizes[fill_axis] = 1
        fixed = math.prod(sizes.values())
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes product {fixed}")
        sizes[fill_axis] = n // fixed
    total = math.prod(sizes.values())
    if total != n:
        raise ValueError(
            f"Mesh axis sizes {sizes} multiply to {total}, but {n} devices are visible"
        )

    shape = tuple(sizes[a] for a in MESH_AXES)
    try:
        device_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        # CPU virtual devices / odd topologies: plain reshape is fine.
        device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, MESH_AXES)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding for a batch-leading array: leading axis over (data, fsdp)."""
    spec = PartitionSpec(BATCH_AXES, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_spec() -> PartitionSpec:
    return PartitionSpec(BATCH_AXES)


def data_parallel_size(mesh: Mesh) -> int:
    return int(mesh.shape["data"] * mesh.shape["fsdp"])


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    dp = data_parallel_size(mesh)
    if global_batch_size % dp:
        raise ValueError(
            f"Global batch size {global_batch_size} must be divisible by the "
            f"data-parallel degree {dp} (mesh {dict(mesh.shape)})"
        )
    return global_batch_size // dp
