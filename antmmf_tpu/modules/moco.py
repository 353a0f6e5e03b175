"""MoCo utilities: momentum encoder + negative queue as functional state.

Reference parity: ``/root/reference/prj/base_vtp/roi_univl/univl/model/
moco_utils.py:13-108`` (momentum update, queue enqueue/dequeue) used by
``univl_video_ret.py:263-312``.

TPU mapping: the queue and momentum params are **explicit pytree state**
threaded through the jitted step (no in-place buffers) — enqueue is a static
roll+update, momentum update a tree-map EMA; both fuse into the train step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def init_momentum_params(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.array, params)


def momentum_update(momentum_params: Any, params: Any, momentum: float = 0.999) -> Any:
    return jax.tree_util.tree_map(
        lambda m, p: momentum * m + (1.0 - momentum) * p.astype(m.dtype),
        momentum_params, params)


def init_queue(queue_size: int, dim: int, dtype=jnp.float32,
               random_init: bool = False, seed: int = 0) -> Dict[str, jnp.ndarray]:
    """``random_init`` fills the queue with L2-normalized gaussian keys (the
    reference MocoUtils buffer init, moco_utils.py:38-52) so negatives exist
    from step 0; otherwise slots are masked until filled."""
    if random_init:
        q = jax.random.normal(jax.random.PRNGKey(seed), (queue_size, dim), dtype)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return {"queue": q, "ptr": jnp.zeros((), jnp.int32),
                "filled": jnp.full((), queue_size, jnp.int32)}
    return {
        "queue": jnp.zeros((queue_size, dim), dtype),
        "ptr": jnp.zeros((), jnp.int32),
        "filled": jnp.zeros((), jnp.int32),
    }


def enqueue(state: Dict[str, jnp.ndarray], keys: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Insert a batch of keys (stop-gradient) at the ring pointer."""
    keys = jax.lax.stop_gradient(keys.astype(state["queue"].dtype))
    K = state["queue"].shape[0]
    B = keys.shape[0]
    idx = (state["ptr"] + jnp.arange(B)) % K
    queue = state["queue"].at[idx].set(keys)
    return {
        "queue": queue,
        "ptr": (state["ptr"] + B) % K,
        "filled": jnp.minimum(state["filled"] + B, K),
    }


def queue_negatives(state: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (negatives [K, D], valid mask [K]) — unfilled slots masked."""
    K = state["queue"].shape[0]
    valid = jnp.arange(K) < state["filled"]
    return state["queue"], valid
