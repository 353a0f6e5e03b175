"""Classifier heads resolved by config type.

Reference parity: ``/root/reference/antmmf/modules/classifier/`` —
``ClassifierLayer`` registry pattern (logit/mlp/transformer variants) and the
hierarchical softmax classifier (``decoders/hierarchical_classifier.py``).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.layers import LayerNorm

Dtype = Any


class ClassifierLayer(nn.Module):
    """Dispatcher: config ``{type: logit|mlp|weight_norm|bert|transformer_decoder,
    num_labels, ...}`` (reference modules/classifier/ registry surface)."""

    classifier_type: str
    num_labels: int
    hidden_dim: Optional[int] = None
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.classifier_type == "logit":
            return nn.Dense(self.num_labels, dtype=self.dtype)(x)
        if self.classifier_type == "mlp":
            h = self.hidden_dim or x.shape[-1]
            for i in range(self.num_layers):
                x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
                x = nn.gelu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            return nn.Dense(self.num_labels, dtype=self.dtype, name="out")(x)
        if self.classifier_type == "weight_norm":
            x = LayerNorm(dtype=self.dtype)(x)
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
            w = self.param("weight", nn.initializers.normal(0.02),
                           (x.shape[-1], self.num_labels), jnp.float32)
            w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-6)
            scale = self.param("scale", nn.initializers.constant(10.0), (),
                               jnp.float32)
            return (x @ w.astype(x.dtype)) * scale
        if self.classifier_type == "bert":
            # BertPredictionHeadTransform + Linear (reference
            # classifier/bert_classifier_head.py:13): dropout → dense →
            # gelu → LN → logits
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.gelu(nn.Dense(x.shape[-1], dtype=self.dtype,
                                 name="transform")(x))
            x = LayerNorm(dtype=self.dtype, name="transform_ln")(x)
            return nn.Dense(self.num_labels, dtype=self.dtype, name="out")(x)
        if self.classifier_type == "transformer_decoder":
            # learned queries cross-attend the snapshot feature (reference
            # classifier/transformer_decoder.py:11 over
            # decoders/transformer_decoder_model.py)
            from antmmf_tpu.modules.decoders import TransformerDecoder

            B = x.shape[0]
            memory = x[:, None] if x.ndim == 2 else x
            queries = self.param(
                "queries", nn.initializers.normal(0.02),
                (1, memory.shape[-1]), jnp.float32)
            q = jnp.broadcast_to(queries[None], (B,) + queries.shape)
            h = TransformerDecoder(
                num_layers=self.num_layers, num_heads=max(
                    1, memory.shape[-1] // 64),
                dropout=self.dropout, dtype=self.dtype, name="decoder")(
                    q.astype(self.dtype), memory,
                    deterministic=deterministic)
            return nn.Dense(self.num_labels, dtype=self.dtype,
                            name="out")(h.reshape(B, -1))
        raise ValueError(f"Unknown classifier type {self.classifier_type!r}")


class HierarchicalClassifier(nn.Module):
    """Per-level softmax heads over a label taxonomy; level l conditions on the
    previous level's pooled logits (reference hierarchical_classifier.py)."""

    level_sizes: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        logits: List[jnp.ndarray] = []
        feat = x
        for i, n in enumerate(self.level_sizes):
            li = nn.Dense(n, dtype=self.dtype, name=f"level_{i}")(feat)
            logits.append(li)
            feat = jnp.concatenate([feat, jax.nn.softmax(li, -1)], axis=-1)
        return logits


class HierarchicalSoftmaxClassifier(nn.Module):
    """Grouped hierarchical softmax over a label tree (reference
    ``decoders/hierarchical_classifier.py:14-224``): one Dense head per
    softmax group (an internal node's children); group logits feed
    ``hier_softmax_loss`` at train time and host-side
    ``modules.hier_tree.greedy_decode`` at inference.

    ``hier_label_schema`` must be hashable (nested tuples / a schema file
    path) because it is static module structure.
    """

    hier_label_schema: Any
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        from antmmf_tpu.modules.hier_tree import build_hier_tree

        self.tree = build_hier_tree(
            list(self.hier_label_schema)
            if isinstance(self.hier_label_schema, tuple)
            else self.hier_label_schema)
        self.heads = [
            nn.Dense(g["num_outputs"], dtype=self.dtype, name=f"fc_{i}")
            for i, g in enumerate(self.tree.param_groups)]

    def __call__(self, x: jnp.ndarray) -> dict:
        return {"hier_logits": [h(x) for h in self.heads]}

    def build_tree(self):
        """The label tree (host metadata; rebuilt outside apply scope)."""
        from antmmf_tpu.modules.hier_tree import build_hier_tree

        return build_hier_tree(
            list(self.hier_label_schema)
            if isinstance(self.hier_label_schema, tuple)
            else self.hier_label_schema)

    def inference(self, variables, x, use_multilabel: bool = False):
        """Host-side decode (reference ``inference``/``greedy_decode``)."""
        import numpy as np

        from antmmf_tpu.modules.hier_tree import greedy_decode

        logits = self.apply(variables, x)["hier_logits"]
        if use_multilabel:
            probs = [np.asarray(jax.nn.sigmoid(l), np.float32) for l in logits]
        else:
            probs = [np.asarray(jax.nn.softmax(l, -1), np.float32)
                     for l in logits]
        return {"pred_hier_tags": greedy_decode(self.build_tree(), probs)}
