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

    @staticmethod
    def _pin(w: jnp.ndarray, feature_dim: int) -> jnp.ndarray:
        """Constrain an expert kernel [E, ..in.., ..out..] to its declared
        (expert, fsdp-on-feature_dim) placement AT THE USE SITE. The
        constraint's transpose applies the same spec to the COTANGENT, so
        each weight grad is produced already sharded — without it the
        backward dot materializes the full [E_local, D, H] bf16 grad per
        MoE layer before any reduce-scatter, and the scheduler keeps every
        layer's alive at once (round-5 AOT: 17 live 400 MB temps pushed the
        10B step 297 MB past v5e HBM)."""
        from antmmf_tpu.parallel.partitioning import (
            _mesh_is_manual,
            ambient_mesh,
        )

        env = ambient_mesh()
        if env is None or _mesh_is_manual(env):
            return w
        names = env.axis_names or ()
        ex = MESH_AXIS_EXPERT if (MESH_AXIS_EXPERT in names
                                  and env.shape[MESH_AXIS_EXPERT] > 1
                                  and w.shape[0] % env.shape[
                                      MESH_AXIS_EXPERT] == 0) else None
        fs = "fsdp" if ("fsdp" in names and env.shape["fsdp"] > 1
                        and w.shape[feature_dim] % env.shape["fsdp"] == 0) \
            else None
        if ex is None and fs is None:
            return w
        spec = [None] * w.ndim
        spec[0] = ex
        spec[feature_dim] = fs
        return jax.lax.with_sharding_constraint(
            w, jax.sharding.PartitionSpec(*spec))

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
        # NOTE: a use-site _pin of w1/w2 to their declared placement (hoping
        # the constraint's transpose would shard the weight grads at birth)
        # was measured USELESS on the real v5e AOT (identical 296.64 MB
        # overage with and without) and implicated in an 86 GB CPU-backend
        # accounting blowup — removed; placement comes from the param rules
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
        """x [B, L, D] → (out [B, L, D], aux dict).

        SPMD grouping: when the ambient mesh shards the batch (data/fsdp
        axes of total size G dividing B), tokens are split into G groups
        aligned with the batch shards and routing (softmax/argmax/CUMSUM
        queue positions/capacity) runs PER GROUP — entirely device-local,
        with per-group capacity ``factor·T_g·k/E`` (the GShard/tutel
        convention: reference xmoe groups per rank too). The only
        cross-device movement is the [G, E, C, D] → [E, G·C, D] layout
        change, which GSPMD lowers to the ICI all-to-all. Routing a GLOBAL
        [T, E] tensor instead makes every cumsum a cross-device dependency
        and the dispatch buffers un-partitionable — AOT-measured TB-scale
        replicated temps on the 10B config (BASELINE.md round 4)."""
        B, L, D = x.shape
        E = self.num_experts
        T = B * L
        G, dp_spec = _token_groups(B)
        Tg = T // G
        tokens = x.reshape(G, Tg, D)
        if G > 1:
            tokens = jax.lax.with_sharding_constraint(
                tokens, jax.sharding.PartitionSpec(dp_spec, None, None))
        router = nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                          param_dtype=self.param_dtype, name="router")
        logits = router(tokens.astype(jnp.float32))  # [G, Tg, E]
        factor = self.eval_capacity_factor if deterministic else self.capacity_factor
        capacity = max(1, int(factor * Tg * self.top_k / self.num_experts))

        if self.top_k == 1:
            experts, pos, gates, keep, aux = jax.vmap(
                lambda lg: _top1_route(lg, capacity))(logits)
        else:
            rng = (self.make_rng("dropout")
                   if not deterministic and self.has_rng("dropout") else None)
            if rng is not None and self.second_expert_policy == "sampling":
                experts, pos, gates, keep, aux = jax.vmap(
                    lambda lg, r: _top2_route(
                        lg, capacity, self.second_expert_policy, r))(
                    logits, jax.random.split(rng, G))
            else:
                experts, pos, gates, keep, aux = jax.vmap(
                    lambda lg: _top2_route(
                        lg, capacity, self.second_expert_policy, None))(
                    logits)
        aux = {k: jnp.mean(v) for k, v in aux.items()}
        k = experts.shape[-1]

        expert_mlp = ExpertMlp(
            num_experts=self.num_experts, hidden_dim=self.hidden_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="experts")

        has_expert_axis = _mesh_has_expert_axis()
        ex_spec = (MESH_AXIS_EXPERT if has_expert_axis else None)

        if self.dispatch_mode == "scatter":
            # flat slot id per (token, k); dropped entries point one past
            # the buffer and fall out via scatter mode="drop"
            slot = jnp.where(keep, experts * capacity + pos,
                             E * capacity).reshape(G, Tg * k)
            src = jnp.broadcast_to(
                tokens.astype(self.dtype)[:, :, None],
                (G, Tg, k, D)).reshape(G, Tg * k, D)
            dispatched = jax.vmap(
                lambda s, v: jnp.zeros((E * capacity, D), self.dtype).at[
                    s].set(v, mode="drop", unique_indices=True))(slot, src)
            dispatched = dispatched.reshape(G, E, capacity, D)
            if G > 1:
                dispatched = jax.lax.with_sharding_constraint(
                    dispatched, jax.sharding.PartitionSpec(
                        dp_spec, ex_spec, None, None))
            # group-major → expert-major: THE all-to-all
            ex_in = dispatched.transpose(1, 0, 2, 3).reshape(
                E, G * capacity, D)
            if G > 1 or has_expert_axis:
                ex_in = jax.lax.with_sharding_constraint(
                    ex_in, jax.sharding.PartitionSpec(ex_spec, dp_spec, None))
            expert_out = expert_mlp(ex_in)  # [E, G*C, D]
            back = expert_out.reshape(E, G, capacity, D).transpose(1, 0, 2, 3)
            back = back.reshape(G, E * capacity, D)
            if G > 1:
                back = jax.lax.with_sharding_constraint(
                    back, jax.sharding.PartitionSpec(dp_spec, None, None))
            # gather each (token, k) slot's output back and weight by gate
            picked = jax.vmap(
                lambda eo, s: eo[jnp.clip(s, 0, E * capacity - 1)])(
                back, slot)  # [G, Tg*k, D]
            w = (gates * keep).astype(self.dtype).reshape(G, Tg * k, 1)
            out = (picked * w).reshape(G, Tg, k, D).sum(axis=2)
        else:
            dispatch, combine = jax.vmap(
                lambda e, p, g, kp: _dense_from_route(e, p, g, kp, E,
                                                      capacity))(
                experts, pos, gates, keep)
            # [G, Tg, E, C] × [G, Tg, D] → [G, E, C, D]; the expert-major
            # constraint makes GSPMD lower the redistribution to all-to-all
            dispatched = jnp.einsum(
                "gtec,gtd->gecd", dispatch.astype(self.dtype),
                tokens.astype(self.dtype))
            ex_in = dispatched.transpose(1, 0, 2, 3).reshape(
                E, G * capacity, D)
            if G > 1 or has_expert_axis:
                ex_in = jax.lax.with_sharding_constraint(
                    ex_in, jax.sharding.PartitionSpec(ex_spec, dp_spec, None))
            expert_out = expert_mlp(ex_in)
            back = expert_out.reshape(E, G, capacity, D).transpose(1, 0, 2, 3)
            if G > 1:
                back = jax.lax.with_sharding_constraint(
                    back, jax.sharding.PartitionSpec(dp_spec, None, None,
                                                     None))
            out = jnp.einsum("gtec,gecd->gtd", combine.astype(self.dtype),
                             back)
        return out.reshape(B, L, D), aux


# NOTE (round-5, measured): a 2D expert-activation layout (fsdp moved from
# the capacity dim to the model dim, making the expert matmuls
# contraction-sharded) was tried for the 10B AOT overage and REVERTED: at
# GShard capacity scales the forward partial-sum all-reduces materialize
# [E_local, G*C/data, H] bf16 per MoE layer — 6.27 GB each on the 10B
# config, 52 GB total (vs 16.04 GB before). Weight-gather is the right
# direction when capacity rows >> expert weights; the overage is handled
# by microbatch sizing instead (gradient_accumulation_steps).


def _token_groups(batch: int) -> Tuple[int, Any]:
    """(G, dp_axes_spec): how many device-aligned token groups the ambient
    mesh implies. G = product of >1 data/fsdp axis sizes when that divides
    the batch; 1 (ungrouped — the single-device / test path) otherwise."""
    from antmmf_tpu.parallel.partitioning import ambient_mesh

    env = ambient_mesh()
    if env is None:
        return 1, None
    axes = tuple(a for a in ("data", "fsdp")
                 if a in (env.axis_names or ()) and env.shape[a] > 1)
    if not axes:
        return 1, None
    g = 1
    for a in axes:
        g *= int(env.shape[a])
    if g <= 1 or batch % g:
        return 1, None
    return g, (axes if len(axes) > 1 else axes[0])


def _mesh_has_expert_axis() -> bool:
    from antmmf_tpu.parallel.partitioning import ambient_mesh

    env = ambient_mesh()
    return env is not None and MESH_AXIS_EXPERT in (env.axis_names or ())
