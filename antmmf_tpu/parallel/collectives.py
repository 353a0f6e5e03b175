"""Thin collectives surface so framework code stays backend-free.

Mirrors the call surface of the reference's distributed helpers
(``/root/reference/antmmf/utils/distributed_utils.py``: synchronize/get_rank/
get_world_size/is_main_process :21-58, broadcast_scalar :72, reduce_dict :205,
all_gather :231, gather_tensor :122-189, GradientAllGather :92) but maps onto the
JAX runtime:

* **host-level** helpers (process bootstrap, cross-host object sync) use
  ``jax.process_index``/``multihost_utils`` — these run *outside* jit;
* **in-step** collectives (``pmean_dict``, ``gather_with_grad``, ``all_to_all``)
  are `jax.lax` primitives meant to be called *inside* ``shard_map``/jit with a
  named mesh axis — XLA lowers them to ICI/DCN collectives.

There is no NCCL, no pickle transport, and no padded-gather workaround: JAX
collectives require static shapes by construction, which eliminates the
unequal-shape hang the reference defends against (distributed_utils.py:146-149).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

# --------------------------------------------------------------------- host level


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap — replaces the subprocess launcher + env-var plumbing of
    ``antmmf/utils/launch.py``. No-op when single-process or already initialised."""
    env_np = os.environ.get("JAX_NUM_PROCESSES") or num_processes
    if coordinator_address is None and env_np is None:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialised


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(name: str = "sync") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_scalar(value: float, source: int = 0) -> float:
    """Broadcast a host scalar from process ``source`` to all processes (early-stop
    flag etc.; reference ``distributed_utils.py:72``)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = jnp.asarray(value)
    if jax.process_index() != source:
        arr = jnp.zeros_like(arr)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=jax.process_index() == source)
    return out.item()


def all_gather_object(obj: Any) -> list:
    """Gather an arbitrary pytree-of-arrays/python object from every process."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


# --------------------------------------------------------------------- in-step


def pmean(x: Any, axis_name: Any) -> Any:
    return lax.pmean(x, axis_name)


def psum(x: Any, axis_name: Any) -> Any:
    return lax.psum(x, axis_name)


def pmean_dict(d: Mapping[str, jnp.ndarray], axis_name: Any) -> Dict[str, jnp.ndarray]:
    """Cross-replica mean of a metrics dict — the reference's ``reduce_dict``
    (rank-0 mean, distributed_utils.py:205-228) expressed as an in-step pmean so it
    fuses into the compiled step instead of being a post-hoc NCCL round."""
    return {k: lax.pmean(v, axis_name) for k, v in d.items()}


def gather_with_grad(x: jnp.ndarray, axis_name: Any, axis: int = 0) -> jnp.ndarray:
    """All-gather that passes gradients — the reference's ``GradientAllGather``
    autograd fn (distributed_utils.py:92-119). ``lax.all_gather``'s transpose is a
    reduce-scatter, which is exactly the correct VJP, so no custom autograd rule is
    needed; this wrapper only fixes tiling semantics (concat along ``axis``)."""
    return lax.all_gather(x, axis_name, axis=axis, tiled=True)


def all_gather(x: jnp.ndarray, axis_name: Any, axis: int = 0) -> jnp.ndarray:
    return lax.all_gather(lax.stop_gradient(x), axis_name, axis=axis, tiled=True)


def all_to_all(
    x: jnp.ndarray, axis_name: Any, split_axis: int, concat_axis: int
) -> jnp.ndarray:
    """MoE dispatch/combine primitive (reference `_AllToAll`,
    prj/M2_Encoder/.../xmoe/moe_layer.py:47-62)."""
    return lax.all_to_all(x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True)


def axis_index(axis_name: Any) -> jnp.ndarray:
    return lax.axis_index(axis_name)


def axis_size(axis_name: Any) -> int:
    return lax.axis_size(axis_name)


def ppermute(x: jnp.ndarray, axis_name: Any, perm: Sequence) -> jnp.ndarray:
    return lax.ppermute(x, axis_name, perm=perm)
