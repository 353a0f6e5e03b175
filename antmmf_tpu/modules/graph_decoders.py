"""Graph decoders: node/graph classification heads + KG triple scorers.

Reference parity: ``/root/reference/antmmf/modules/decoders/graph/`` —
``ClassifyDecoder`` (classify_decoder.py:9), ``DeltaKGDecoder``
(delta_kg_decoder.py:10, TransE/DTransE/PairRE scoring), ``FFNDecoder``
(ffn_decoder.py:11, (h, r, t)-concat MLP over positives + stacked
negatives with optional self-adversarial negative weighting).

All are pure jittable modules over static-shape inputs; the decoder-input
dict keys mirror the reference contract (node1/node2 encoder results,
head/tail negatives, update_rel_embed + edge_type).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry

Dtype = Any


@registry.register_decoder("classify_decoder")
class ClassifyDecoder(nn.Module):
    """MLP classification head: Linear→LN→ReLU chain, last layer bare
    (reference classify_decoder.py:9-34)."""

    node_embed_dim: int
    num_classes: int = 2
    layer_num: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.layer_num == 0:
            return x
        channels = ([self.node_embed_dim]
                    + [self.node_embed_dim // 4] * (self.layer_num - 1)
                    + [self.num_classes])
        for i in range(self.layer_num):
            x = nn.Dense(channels[i + 1], name=f"fc_{i}")(x)
            if i < self.layer_num - 1:  # last layer stays bare (ref [:-2])
                x = nn.relu(nn.LayerNorm(name=f"ln_{i}")(x))
        return x


@registry.register_decoder("delta_kg_decoder")
class DeltaKGDecoder(nn.Module):
    """KG triple scorer (reference delta_kg_decoder.py:10-55):
    TransE ‖h+r−t‖₁ / DTransE ‖h·r−t‖₁ / PairRE ‖h·r−t·r‖₁ over the
    decoder-input dict; returns (pos, neg_head, neg_tail, r)."""

    decoder_type: str = "DTransE"

    def _score(self, h, t, r):
        if self.decoder_type == "TransE":
            return jnp.linalg.norm(h + r - t, ord=1, axis=-1)
        if self.decoder_type == "DTransE":
            return jnp.linalg.norm(h * r - t, ord=1, axis=-1)
        if self.decoder_type == "PairRE":
            return jnp.linalg.norm(h * r - t * r, ord=1, axis=-1)
        raise ValueError(f"unknown decoder_type {self.decoder_type!r}")

    def __call__(self, decoder_input: Dict[str, jnp.ndarray]):
        r = decoder_input["update_rel_embed"][
            decoder_input["edge_type"].reshape(-1)]
        pos = neg_head = neg_tail = None
        if "node1_encoder_result" in decoder_input:
            pos = self._score(decoder_input["node1_encoder_result"],
                              decoder_input["node2_encoder_result"], r)
        if "head_neg_encoder_result" in decoder_input:
            neg_head = self._score(decoder_input["head_neg_encoder_result"],
                                   decoder_input["node2_encoder_result"], r)
        if "tail_neg_encoder_result" in decoder_input:
            neg_tail = self._score(decoder_input["node1_encoder_result"],
                                   decoder_input["tail_neg_encoder_result"], r)
        return pos, neg_head, neg_tail, r


@registry.register_decoder("ffn_decoder")
class FFNDecoder(nn.Module):
    """(h, r, t)-concat MLP over positives + stacked head/tail negatives
    (reference ffn_decoder.py:11-87). Returns (logits, neg_weights) where
    neg_weights implements the self-adversarial negative weighting when
    enabled (RotatE-style softmax over negative scores, stop-gradient)."""

    node_embed_dim: int
    edge_embed_dim: int
    num_classes: int = 2
    num_layers: int = 3
    neg_self_adversarial: bool = False

    @nn.compact
    def __call__(self, decoder_input: Dict[str, jnp.ndarray],
                 training: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        p_h = decoder_input["node1_encoder_result"]
        p_t = decoder_input["node2_encoder_result"]
        n_h = decoder_input.get("head_neg_encoder_result")
        n_t = decoder_input.get("tail_neg_encoder_result")
        p_r = decoder_input["update_rel_embed"][
            decoder_input["edge_type"].reshape(-1)].reshape(p_h.shape)

        # contract (ref forward): positives [G, B, D], negatives [K, B, D];
        # the stacked rows keep group structure so the self-adversarial
        # weighting can softmax over the negative-group axis
        if p_h.ndim == 2:
            p_h, p_t, p_r = p_h[None], p_t[None], p_r[None]
        rows = [jnp.concatenate([p_h, p_r, p_t], axis=-1)]
        if n_h is not None:
            k = n_h.shape[0]
            rows.append(jnp.concatenate(
                [n_h, jnp.broadcast_to(p_r[0], n_h.shape),
                 jnp.broadcast_to(p_t[0], n_h.shape)], axis=-1))
        if n_t is not None:
            k = n_t.shape[0]
            rows.append(jnp.concatenate(
                [jnp.broadcast_to(p_h[0], n_t.shape),
                 jnp.broadcast_to(p_r[0], n_t.shape), n_t], axis=-1))
        x = jnp.concatenate(rows, axis=0)  # [G+K+K', B, 3D]

        in_ch = 2 * self.node_embed_dim + self.edge_embed_dim
        channels = ([in_ch] + [in_ch // 4] * (self.num_layers - 1)
                    + [self.num_classes])
        for i in range(self.num_layers):
            x = nn.Dense(channels[i + 1], name=f"fc_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(nn.LayerNorm(name=f"ln_{i}")(x))

        weights = None
        if self.neg_self_adversarial and training:
            n_pos = p_h.shape[0]
            neg_logits = x[n_pos:]  # [K+K', B, C]
            neg_w = jax.nn.softmax(
                jax.nn.softmax(neg_logits, -1)[:, :, 1], axis=0)
            weights = jax.lax.stop_gradient(jnp.concatenate(
                [jnp.ones(p_h.shape[:2], x.dtype), neg_w], axis=0))
        return x, weights
