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
    mesh_config: Optional[Mapping[str, Any]] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Create a Mesh from an axis-size mapping. ``-1`` (on at most one axis) means
    "all remaining devices"; missing axes default to 1.

    Multi-slice (DCN) topologies: an optional ``dcn`` sub-mapping gives the
    slice-spanning degree per logical axis; the remaining sizes describe the
    within-slice (ICI) layout. Example — 2 slices of a v5e-8, data parallel
    across slices over DCN, FSDP within each slice over ICI::

        mesh: {dcn: {data: 2}, fsdp: -1}

    The DCN factor is placed OUTERMOST on each combined axis (so e.g. the
    gradient pmean hierarchically reduces over ICI first, then once over
    DCN) via ``mesh_utils.create_hybrid_device_mesh``; non-TPU device sets
    (CPU virtual meshes in tests) fall back to a slice-major reshape with
    the same ordering guarantee.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)

    cfg = dict(mesh_config or {})
    dcn_cfg = {a: int(s) for a, s in dict(cfg.pop("dcn", None) or {}).items()}
    for axis, size in dcn_cfg.items():
        if axis not in MESH_AXES:
            raise ValueError(f"Unknown dcn mesh axis {axis!r}; valid: {MESH_AXES}")
        if size < 1:
            raise ValueError(
                f"dcn sizes must be positive (no -1 fill); got {axis}={size}")
    dcn = {axis: dcn_cfg.get(axis, 1) for axis in MESH_AXES}
    n_dcn = math.prod(dcn.values())
    if n % n_dcn:
        raise ValueError(f"{n} devices not divisible by dcn degree {n_dcn}")
    n_ici = n // n_dcn

    sizes = {axis: 1 for axis in MESH_AXES}
    fill_axis = "data"
    for axis, size in cfg.items():
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
        if n_ici % fixed:
            raise ValueError(
                f"{n_ici} per-slice devices not divisible by fixed axes "
                f"product {fixed}")
        sizes[fill_axis] = n_ici // fixed
    total = math.prod(sizes.values())
    if total != n_ici:
        raise ValueError(
            f"Mesh axis sizes {sizes} multiply to {total}, but {n_ici} "
            f"devices are visible per slice"
        )

    ici_shape = tuple(sizes[a] for a in MESH_AXES)
    if n_dcn > 1:
        dcn_shape = tuple(dcn[a] for a in MESH_AXES)
        try:
            device_array = mesh_utils.create_hybrid_device_mesh(
                ici_shape, dcn_shape, devices=devices)
        except Exception:
            # CPU virtual devices: slice-major reshape, DCN factor outermost
            # on each combined axis — (d0..dk, i0..ik) → interleave → merge.
            arr = np.asarray(devices).reshape(dcn_shape + ici_shape)
            k = len(MESH_AXES)
            order = [x for pair in zip(range(k), range(k, 2 * k)) for x in pair]
            arr = arr.transpose(order)
            device_array = arr.reshape(
                tuple(d * i for d, i in zip(dcn_shape, ici_shape)))
        return Mesh(device_array, MESH_AXES)

    try:
        device_array = mesh_utils.create_device_mesh(ici_shape, devices=devices)
    except Exception:
        # CPU virtual devices / odd topologies: plain reshape is fine.
        device_array = np.asarray(devices).reshape(ici_shape)
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
