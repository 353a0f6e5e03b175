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
    """Dispatcher: config ``{type: logit|mlp|weight_norm, num_labels, ...}``."""

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
