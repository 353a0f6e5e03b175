"""Sharding specs for the full TrainState (params + optimizer state + scalars).

The same path-regex rules that shard parameters also shard optimizer moments:
adam's mu/nu (and MultiSteps accumulators) are pytrees whose leaf paths end with
the identical parameter suffix (``.../mu/encoder/dense/kernel``), so suffix rules
like ``.*kernel$`` naturally cover them — ZeRO-style optimizer-state sharding for
free. Scalars (step counters, rng keys) fall through to the replicate-all rule.

One ``jax.device_put(state, state_shardings(...))`` places the whole state; the
jitted step donates it so it stays resident in HBM.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding

from antmmf_tpu.parallel.partitioning import infer_param_specs, relax_to_divisible


def state_specs(state: Any, rules: Optional[Any] = None,
                mesh: Optional[Mesh] = None) -> Any:
    """PartitionSpec tree matching any state pytree, via path-suffix rules.
    With ``mesh`` given, non-divisible dims relax to replication."""
    specs = infer_param_specs(state, rules)
    if mesh is not None:
        specs = relax_to_divisible(specs, state, mesh)
    return specs


def state_shardings(state: Any, mesh: Mesh, rules: Optional[Any] = None) -> Any:
    from jax.sharding import PartitionSpec

    specs = state_specs(state, rules, mesh)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def shard_state(state: Any, mesh: Mesh, rules: Optional[Any] = None) -> Any:
    return jax.device_put(state, state_shardings(state, mesh, rules))
