"""Mixture-of-Experts layer with expert parallelism (GShard / xMoE class).

Reference parity: ``/root/reference/prj/M2_Encoder/vlmo/torchscale/component/
xmoe/moe_layer.py:121-290`` (MOELayer with expert groups + ``_AllToAll`` dispatch
:47-62) and ``xmoe/routing.py`` (Top-1/Top-2 gating with capacity, load-balance
aux loss).

TPU-native design: experts are a single stacked parameter tensor [E, ...]
sharded over the ``expert`` mesh axis; token dispatch/combine are einsums against
one-hot dispatch tensors with a sharding constraint that makes GSPMD lower the
[E, C, D] dispatched activations into an ICI all-to-all — no hand-written
collective, same wire traffic as the reference's ``dist.all_to_all_single``.

Emits ``aux_loss`` (load balance) and ``router_z_loss`` for the trainer to add.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.constants import MESH_AXIS_EXPERT

Dtype = Any


def _top2_route(
    logits: jnp.ndarray,  # [T, E] fp32
    capacity: int,
    second_expert_policy: str = "sampling",
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           Dict[str, jnp.ndarray]]:
    """COMPACT top-2 routing: per token, (experts [T, 2] int, queue
    positions [T, 2] int, renormalized gates [T, 2] f32, kept [T, 2] bool,
    aux dict). The GShard math (argmax-1, masked argmax-2 with optional
    gumbel sampling, cumsum queue positions with slot-1 priority, capacity
    drop, gate renormalization, load-balance + z losses) without ever
    building the [T, E, C] one-hot tensors — those are only needed by the
    legacy einsum dispatch."""
    T, E = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)

    idx1 = jnp.argmax(probs, axis=-1)  # [T]
    mask1 = jax.nn.one_hot(idx1, E)
    probs_wo1 = probs * (1.0 - mask1)
    if second_expert_policy == "sampling" and rng is not None:
        noise = jax.random.gumbel(rng, probs_wo1.shape)
        idx2 = jnp.argmax(jnp.log(jnp.maximum(probs_wo1, 1e-9)) + noise, axis=-1)
    else:
        idx2 = jnp.argmax(probs_wo1, axis=-1)
    mask2 = jax.nn.one_hot(idx2, E)

    # load-balance aux loss (GShard): E * sum_e (frac_tokens_e * mean_prob_e)
    me = probs.mean(axis=0)
    ce = mask1.mean(axis=0)
    aux_loss = jnp.sum(me * ce) * E

    # capacity: position of each token within its expert's queue (slot-1
    # tokens fill first; slot-2 queues start after ALL slot-1 admissions)
    pos1 = (jnp.cumsum(mask1, axis=0) - 1.0) * mask1  # [T, E]
    kept1 = mask1 * (pos1 < capacity)
    pos2_base = jnp.sum(kept1, axis=0, keepdims=True)  # tokens taken by slot-1
    pos2 = (jnp.cumsum(mask2, axis=0) - 1.0) * mask2 + pos2_base * mask2
    kept2 = mask2 * (pos2 < capacity)

    g1 = jnp.sum(probs * kept1, axis=-1)
    g2 = jnp.sum(probs * kept2, axis=-1)
    denom = jnp.maximum(g1 + g2, 1e-9)
    g1, g2 = g1 / denom, g2 / denom

    experts = jnp.stack([idx1, idx2], axis=-1).astype(jnp.int32)
    pos = jnp.stack([jnp.sum(pos1, -1), jnp.sum(pos2, -1)],
                    axis=-1).astype(jnp.int32)
    gates = jnp.stack([g1, g2], axis=-1)
    keep = jnp.stack([jnp.sum(kept1, -1) > 0, jnp.sum(kept2, -1) > 0],
                     axis=-1)
    z_loss = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    aux = {
        "aux_loss": aux_loss, "router_z_loss": z_loss,
        "frac_tokens_dropped": 1.0 - jnp.sum(gates * keep) / T,
    }
    return experts, pos, gates, keep, aux


def _top1_route(logits: jnp.ndarray, capacity: int):
    T, E = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    mask = jax.nn.one_hot(idx, E)
    me, ce = probs.mean(axis=0), mask.mean(axis=0)
    aux_loss = jnp.sum(me * ce) * E
    pos = (jnp.cumsum(mask, axis=0) - 1.0) * mask
    kept = mask * (pos < capacity)
    gate = jnp.sum(probs * kept, axis=-1)
    z_loss = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    aux = {
        "aux_loss": aux_loss, "router_z_loss": z_loss,
        "frac_tokens_dropped": 1.0 - jnp.sum(gate) / T,
    }
    return (idx[:, None].astype(jnp.int32),
            jnp.sum(pos, -1)[:, None].astype(jnp.int32),
            gate[:, None], (jnp.sum(kept, -1) > 0)[:, None], aux)


def _dense_from_route(experts, pos, gates, keep, E: int, capacity: int):
    """Compact routing → legacy (dispatch [T, E, C] bool, combine f32)."""
    T, k = experts.shape
    e_oh = jax.nn.one_hot(experts, E)            # [T, k, E]
    c_oh = jax.nn.one_hot(pos, capacity)          # [T, k, C]
    w = gates * keep                              # [T, k]
    combine = jnp.einsum("tk,tke,tkc->tec", w, e_oh, c_oh)
    return combine > 0, combine


def top2_gating(
    logits: jnp.ndarray,  # [T, E] fp32
    capacity: int,
    second_expert_policy: str = "sampling",
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (dispatch [T, E, C] bool, combine [T, E, C] fp32, aux dict)."""
    experts, pos, gates, keep, aux = _top2_route(
        logits, capacity, second_expert_policy, rng)
    dispatch, combine = _dense_from_route(experts, pos, gates, keep,
                                          logits.shape[1], capacity)
    return dispatch, combine, aux


def top1_gating(logits: jnp.ndarray, capacity: int):
    experts, pos, gates, keep, aux = _top1_route(logits, capacity)
    dispatch, combine = _dense_from_route(experts, pos, gates, keep,
                                          logits.shape[1], capacity)
    return dispatch, combine, aux


class ExpertMlp(nn.Module):
    """Stacked experts: params [E, ...]; applied to dispatched [E, C, D]."""

    num_experts: int
    hidden_dim: int
    activation: Any = nn.gelu
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [E, C, D]
        E, C, D = x.shape
        w1 = self.param("w1", nn.initializers.normal(0.02),
                        (E, D, self.hidden_dim), self.param_dtype)
        b1 = self.param("b1", nn.initializers.zeros, (E, 1, self.hidden_dim),
                        self.param_dtype)
        w2 = self.param("w2", nn.initializers.normal(0.02),
                        (E, self.hidden_dim, D), self.param_dtype)
        b2 = self.param("b2", nn.initializers.zeros, (E, 1, D), self.param_dtype)
        h = jnp.einsum("ecd,edh->ech", x.astype(self.dtype), w1.astype(self.dtype))
        h = self.activation(h + b1.astype(self.dtype))
        out = jnp.einsum("ech,ehd->ecd", h, w2.astype(self.dtype))
        return out + b2.astype(self.dtype)


class MoELayer(nn.Module):
    num_experts: int = 8
    hidden_dim: int = 3072
    top_k: int = 2
    capacity_factor: float = 1.25
    eval_capacity_factor: float = 2.0
    second_expert_policy: str = "sampling"
    # token redistribution into the [E, C, D] expert buffers:
    #   "scatter" (default) — index scatters/gathers of the [T, D] tokens,
    #     O(T*k*D) work (the tutel-fused-dispatch role,
    #     reference xmoe/moe_layer.py:32-37; measured on-chip in
    #     BASELINE.md's round-4 MoE table);
    #   "einsum" — legacy one-hot einsums, O(T*E*C*D) work (~10x the expert
    #     FLOPs at capacity 1.25): the GShard formulation, kept because
    #     one-hot matmuls give GSPMD the cleanest all-to-all pattern.
    # Both produce IDENTICAL outputs (the gating/positions/gates math is
    # shared; regression-tested in test_moe_parallel.py).
    dispatch_mode: str = "scatter"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """x [B, L, D] → (out [B, L, D], aux dict)."""
        B, L, D = x.shape
        E = self.num_experts
        T = B * L
        tokens = x.reshape(T, D)
        router = nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                          param_dtype=self.param_dtype, name="router")
        logits = router(tokens.astype(jnp.float32))
        factor = self.eval_capacity_factor if deterministic else self.capacity_factor
        capacity = max(1, int(factor * T * self.top_k / self.num_experts))

        if self.top_k == 1:
            experts, pos, gates, keep, aux = _top1_route(logits, capacity)
        else:
            rng = (self.make_rng("dropout")
                   if not deterministic and self.has_rng("dropout") else None)
            experts, pos, gates, keep, aux = _top2_route(
                logits, capacity, self.second_expert_policy, rng)
        k = experts.shape[1]

        expert_mlp = ExpertMlp(
            num_experts=self.num_experts, hidden_dim=self.hidden_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="experts")

        if self.dispatch_mode == "scatter":
            # flat slot id per (token, k); dropped entries point one past
            # the buffer and fall out via scatter mode="drop"
            slot = jnp.where(keep, experts * capacity + pos,
                             E * capacity).reshape(-1)  # [T*k]
            src = jnp.broadcast_to(tokens.astype(self.dtype)[:, None],
                                   (T, k, D)).reshape(T * k, D)
            dispatched = jnp.zeros((E * capacity, D), self.dtype).at[
                slot].set(src, mode="drop", unique_indices=True)
            dispatched = dispatched.reshape(E, capacity, D)
            if _mesh_has_expert_axis():
                dispatched = jax.lax.with_sharding_constraint(
                    dispatched,
                    jax.sharding.PartitionSpec(MESH_AXIS_EXPERT, None, None))
            expert_out = expert_mlp(dispatched).reshape(E * capacity, D)
            # gather each (token, k) slot's output back and weight by gate
            picked = expert_out[jnp.clip(slot, 0, E * capacity - 1)]
            w = (gates * keep).astype(self.dtype).reshape(T * k, 1)
            out = (picked * w).reshape(T, k, D).sum(axis=1)
        else:
            dispatch, combine = _dense_from_route(experts, pos, gates, keep,
                                                  E, capacity)
            # [T, E, C] × [T, D] → [E, C, D]; constrain to the expert axis
            # so GSPMD lowers the redistribution to an ICI all-to-all
            dispatched = jnp.einsum("tec,td->ecd", dispatch.astype(self.dtype),
                                    tokens.astype(self.dtype))
            dispatched = jax.lax.with_sharding_constraint(
                dispatched,
                jax.sharding.PartitionSpec(MESH_AXIS_EXPERT, None, None)
            ) if _mesh_has_expert_axis() else dispatched
            expert_out = expert_mlp(dispatched)
            out = jnp.einsum("tec,ecd->td", combine.astype(self.dtype),
                             expert_out)
        return out.reshape(B, L, D), aux


def _mesh_has_expert_axis() -> bool:
    try:
        env = jax.sharding.get_abstract_mesh()
        return env is not None and MESH_AXIS_EXPERT in (env.axis_names or ())
    except Exception:
        return False
