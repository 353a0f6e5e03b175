"""Pipeline parallelism: GPipe-style microbatch pipeline over a mesh axis.

The reference has no PP (SURVEY.md §2.3 flags it as design-in-anyway). Here a
layer stack is split into S stages; stage s's parameters live on mesh slice s
of the ``model`` axis (leading-dim sharding), and activations flow stage→stage
via ``lax.ppermute`` inside ``shard_map``. A ``lax.scan`` over T = M + S - 1
ticks drives M microbatches through the pipe (bubble fraction (S-1)/T);
everything is differentiable — jax transposes the ppermute chain into the
reverse pipeline for the backward pass.

Usage::

    stage_fn = lambda params, x: block.apply({"params": params}, x)
    y = pipeline_apply(stage_fn, stacked_params, microbatches, mesh)

``stacked_params``: pytree whose leaves have leading dim S (one slice per
stage) — build with ``stack_stage_params``. ``microbatches``: [M, mb, ...].
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(param_list) -> Any:
    """[per-stage pytrees] → single pytree with leading stage dim."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_list)


def pipeline_apply(
    stage_fn: Callable[..., jnp.ndarray],
    stage_params: Any,  # leaves [S, ...] — shard leading dim over `axis`
    microbatches: jnp.ndarray,  # [M, mb, ...]
    mesh: Mesh,
    axis: str = "model",
    aux: Optional[Any] = None,  # pytree, leaves [M, ...] per-microbatch
) -> jnp.ndarray:
    """Returns [M, mb, ...] outputs of the last stage.

    ``aux`` carries per-microbatch side inputs that every stage needs
    alongside the activation (e.g. an attention mask/bias): stage s at tick
    t processes microbatch t − s, so each stage indexes ``aux`` with its own
    offset. When given, ``stage_fn(params, x, aux_mb)`` is called.
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    T = M + S - 1

    p_params = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    p_io = P(None)  # microbatches replicated across the pipe axis
    p_aux = jax.tree_util.tree_map(lambda _: P(None), aux)

    def inner(params, mbs, aux_mb):
        # params leaves: [1, ...] (this stage's slice); drop the stage dim
        local = jax.tree_util.tree_map(lambda x: x[0], params)
        stage_id = lax.axis_index(axis)
        perm_fwd = [(i, (i + 1) % S) for i in range(S)]

        state = jnp.zeros_like(mbs[0])  # activation entering this stage
        outputs = jnp.zeros_like(mbs)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (if in range)
            inject = mbs[jnp.clip(t, 0, M - 1)]
            x = jnp.where(stage_id == 0, inject, state)
            if aux_mb is None:
                y = stage_fn(local, x)
            else:
                # the microbatch on stage s at tick t is m = t − s
                m = jnp.clip(t - stage_id, 0, M - 1)
                a = jax.tree_util.tree_map(lambda v: v[m], aux_mb)
                y = stage_fn(local, x, a)
            # last stage emits the microbatch that entered the pipe at
            # t - (S - 1)
            out_idx = t - (S - 1)
            emit = (stage_id == S - 1) & (out_idx >= 0)
            outputs = lax.cond(
                emit,
                lambda o: o.at[jnp.clip(out_idx, 0, M - 1)].set(y),
                lambda o: o,
                outputs,
            )
            # send activations one stage downstream
            state = lax.ppermute(y, axis, perm_fwd)
            return (state, outputs), None

        (state, outputs), _ = lax.scan(tick, (state, outputs), jnp.arange(T))
        # outputs are zeros except on the last stage — psum broadcasts them
        return lax.psum(outputs, axis)

    return shard_map(
        inner, mesh=mesh, in_specs=(p_params, p_io, p_aux), out_specs=p_io,
        check_vma=False,
    )(stage_params, microbatches, aux)


def split_microbatches(batch: jnp.ndarray, num_microbatches: int) -> jnp.ndarray:
    """[B, ...] → [M, B/M, ...]."""
    B = batch.shape[0]
    if B % num_microbatches:
        raise ValueError(f"batch {B} not divisible by microbatches "
                         f"{num_microbatches}")
    return batch.reshape((num_microbatches, B // num_microbatches)
                         + batch.shape[1:])
