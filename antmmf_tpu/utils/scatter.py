"""Scatter/segment ops — torch_scatter equivalents on jax.ops.segment_*.

Reference parity: ``/root/reference/antmmf/utils/scatter.py:5-145`` (a
torch_scatter reimplementation used by the graph stack). JAX's segment ops are
the TPU-native form: XLA lowers them to sorted-segment reductions that map onto
the VPU without atomic ops. ``num_segments`` must be static under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scatter_add(src: jnp.ndarray, index: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(src, index, num_segments)


def scatter_mean(src: jnp.ndarray, index: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    total = jax.ops.segment_sum(src, index, num_segments)
    count = jax.ops.segment_sum(jnp.ones((src.shape[0],), src.dtype), index,
                                num_segments)
    shape = (num_segments,) + (1,) * (src.ndim - 1)
    return total / jnp.maximum(count.reshape(shape), 1)


def scatter_max(src: jnp.ndarray, index: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(src, index, num_segments)


def scatter_min(src: jnp.ndarray, index: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_min(src, index, num_segments)


def scatter_softmax(src: jnp.ndarray, index: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Per-segment softmax over the leading dim (attention over edges)."""
    seg_max = jax.ops.segment_max(src, index, num_segments)
    shifted = src - seg_max[index]
    exp = jnp.exp(shifted)
    denom = jax.ops.segment_sum(exp, index, num_segments)
    return exp / jnp.maximum(denom[index], 1e-16)


# graph-level readouts (reference utils/glob.py: global_{add,mean,max}_pool)


def global_add_pool(x: jnp.ndarray, batch: jnp.ndarray,
                    size: int) -> jnp.ndarray:
    """Sum node features per graph: [N, F] + graph ids [N] → [B, F]."""
    return scatter_add(x, batch, size)


def global_mean_pool(x: jnp.ndarray, batch: jnp.ndarray,
                     size: int) -> jnp.ndarray:
    return scatter_mean(x, batch, size)


def global_max_pool(x: jnp.ndarray, batch: jnp.ndarray,
                    size: int) -> jnp.ndarray:
    return scatter_max(x, batch, size)
