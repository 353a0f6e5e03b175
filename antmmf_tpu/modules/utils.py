"""Module-level helpers shared across model code.

Reference parity: ``/root/reference/antmmf/modules/utils.py`` — ``get_mask``
(:14), ``tiny_value_of_dtype`` (:40), the CompGCN composition ops
(:57-89, implemented in ``modules/graph.compgcn_compose``), ``drop_connect``
(:91, in ``modules/vision/efficientnet``), the hierarchical label tree
(:158-460, in ``modules/hier_tree``), and ``TimeDistributed`` (:461 — a
``jax.vmap`` one-liner here).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def get_mask(nums: jnp.ndarray, max_num: int) -> jnp.ndarray:
    """Length vector → float mask [B, max_num]: 1 where idx < nums[b]
    (reference modules/utils.py:14-37)."""
    arange = jnp.arange(max_num)[None, :]
    return (arange < jnp.asarray(nums).reshape(-1, 1)).astype(jnp.float32)


def tiny_value_of_dtype(dtype) -> float:
    """A small-but-safe epsilon for the dtype (reference :40-54); used to
    avoid 0/0 in normalizations."""
    dtype = jnp.dtype(dtype)
    if not jnp.issubdtype(dtype, jnp.floating):
        raise TypeError(f"Only supports floating point dtypes, got {dtype}")
    if dtype in (jnp.float32, jnp.float64):
        return 1e-13
    if dtype in (jnp.float16, jnp.bfloat16):
        return 1e-4
    raise TypeError(f"Does not support dtype {dtype}")


def time_distributed(fn: Callable, x: jnp.ndarray, *args, **kwargs):
    """Apply ``fn`` independently over axis 1 (reference TimeDistributed
    :461-524 reshapes [B, T, ...] → [B*T, ...]; here the fold is explicit
    and shape-preserving)."""
    B, T = x.shape[:2]
    flat = x.reshape((B * T,) + x.shape[2:])
    out = fn(flat, *args, **kwargs)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((B, T) + o.shape[1:]), out)
