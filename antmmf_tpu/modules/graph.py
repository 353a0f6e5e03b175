"""Graph neural-network stack: message passing, GIN/GINE, CompGCN.

Reference parity: ``/root/reference/antmmf/modules/graph.py:51-540`` (GIN/GINE/
CompGCN convolutions), ``modules/message_passing/`` (MessagePassing base), and
the KG model ``models/comp_gcn.py``.

Graphs are static-shape: ``edge_index`` int[2, E] (src, dst) with an
``edge_mask`` for padding edges — segment reductions give TPU-friendly
aggregation (no dynamic shapes, no atomics).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.utils.scatter import scatter_add, scatter_mean

Dtype = Any


class MessagePassing(nn.Module):
    """Base: message → aggregate (segment reduce over dst) → update."""

    aggr: str = "add"

    def message(self, x_src: jnp.ndarray, x_dst: jnp.ndarray,
                edge_attr: Optional[jnp.ndarray]) -> jnp.ndarray:
        return x_src

    def update(self, aggregated: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return aggregated

    def propagate(
        self,
        x: jnp.ndarray,  # [N, D]
        edge_index: jnp.ndarray,  # int[2, E]
        edge_attr: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        src, dst = edge_index[0], edge_index[1]
        msg = self.message(x[src], x[dst], edge_attr)
        if edge_mask is not None:
            msg = msg * edge_mask[:, None].astype(msg.dtype)
        n = x.shape[0]
        if self.aggr == "add":
            agg = scatter_add(msg, dst, n)
        elif self.aggr == "mean":
            agg = scatter_mean(msg, dst, n)
        else:
            raise ValueError(f"Unknown aggregation {self.aggr!r}")
        return self.update(agg, x)


class GINConv(MessagePassing):
    """Graph isomorphism network layer: MLP((1+ε)·x + Σ neighbors)."""

    out_dim: int = 64
    train_eps: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_index, edge_mask=None):
        agg = self.propagate(x, edge_index, None, edge_mask)
        eps = self.param("eps", nn.initializers.zeros, ()) if self.train_eps \
            else 0.0
        h = (1.0 + eps) * x + agg
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="mlp_fc2")(h)


class GINEConv(MessagePassing):
    """GIN with edge features: messages are relu(x_src + edge_embed)."""

    out_dim: int = 64
    dtype: Dtype = jnp.float32

    def message(self, x_src, x_dst, edge_attr):
        return nn.relu(x_src + edge_attr)

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None):
        edge_attr = nn.Dense(x.shape[-1], dtype=self.dtype,
                             name="edge_proj")(edge_attr)
        agg = self.propagate(x, edge_index, edge_attr, edge_mask)
        eps = self.param("eps", nn.initializers.zeros, ())
        h = (1.0 + eps) * x + agg
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="mlp_fc2")(h)


def compgcn_compose(h: jnp.ndarray, r: jnp.ndarray, op: str) -> jnp.ndarray:
    if op == "sub":
        return h - r
    if op == "mult":
        return h * r
    if op == "corr":  # circular correlation via FFT
        fh = jnp.fft.rfft(h.astype(jnp.float32), axis=-1)
        fr = jnp.fft.rfft(r.astype(jnp.float32), axis=-1)
        return jnp.fft.irfft(jnp.conj(fh) * fr, n=h.shape[-1], axis=-1).astype(h.dtype)
    raise ValueError(f"Unknown composition {op!r}")


class CompGCNConv(nn.Module):
    """Composition-based GCN for knowledge graphs: entity/relation co-embedding
    with in/out/loop direction weights (modules/graph.py CompGCN)."""

    out_dim: int = 64
    composition: str = "sub"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, D] entity embeddings
        rel: jnp.ndarray,  # [R, D] relation embeddings
        edge_index: jnp.ndarray,  # int[2, E] (src, dst); first half forward
        edge_type: jnp.ndarray,  # int[E]
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = x.shape[0]
        E = edge_index.shape[1]
        half = E // 2
        src, dst = edge_index[0], edge_index[1]
        comp = compgcn_compose(x[src], rel[edge_type], self.composition)
        if edge_mask is not None:
            comp = comp * edge_mask[:, None].astype(comp.dtype)

        w_in = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="w_in")
        w_out = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                         name="w_out")
        w_loop = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                          name="w_loop")
        w_rel = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                         name="w_rel")

        msg_fwd = w_in(comp[:half])
        msg_bwd = w_out(comp[half:])
        agg = scatter_add(msg_fwd, dst[:half], n) + \
            scatter_add(msg_bwd, dst[half:], n)
        loop = w_loop(x)
        out = nn.tanh((agg + loop) / 3.0)
        return out, w_rel(rel)


@registry.register_model("comp_gcn")
class CompGCNModel(nn.Module):
    """KG link-prediction model over CompGCN layers (models/comp_gcn.py:8)."""

    num_entities: int = 100
    num_relations: int = 10
    embed_dim: int = 64
    num_layers: int = 2
    composition: str = "sub"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        x = nn.Embed(self.num_entities, self.embed_dim, name="entity_embed")(
            jnp.arange(self.num_entities))
        rel = nn.Embed(self.num_relations * 2, self.embed_dim,
                       name="relation_embed")(
            jnp.arange(self.num_relations * 2))
        edge_index = batch["edge_index"]
        edge_type = batch["edge_type"]
        edge_mask = batch.get("edge_mask")
        if edge_index.ndim == 3:
            # batched samples share one static graph (GraphLinkPredictionDataset
            # stacks identical copies) — use the first
            edge_index = edge_index[0]
            edge_type = edge_type[0]
            edge_mask = edge_mask[0] if edge_mask is not None else None
        for i in range(self.num_layers):
            x, rel = CompGCNConv(out_dim=self.embed_dim,
                                 composition=self.composition,
                                 dtype=self.dtype, name=f"conv_{i}")(
                x, rel, edge_index, edge_type, edge_mask)
        # score (head, relation) against all entities: DistMult
        heads = batch["head"]
        rels = batch["relation"]
        q = x[heads] * rel[rels]
        logits = q @ x.T
        out = {"logits": logits, "entity_embed": x, "relation_embed": rel}
        if "targets" in batch:
            logp = jax.nn.log_softmax(logits, -1)
            out["losses"] = {"link_pred_loss": -jnp.take_along_axis(
                logp, batch["targets"][:, None], axis=-1).mean()}
        return out

    @classmethod
    def from_config(cls, config):
        fields = {f for f in cls.__dataclass_fields__ if f not in ("parent", "name")}
        return cls(**{k: v for k, v in dict(config).items() if k in fields})

    @classmethod
    def for_test(cls, config):
        return cls.from_config(config)
