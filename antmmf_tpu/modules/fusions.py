"""Multimodal fusion modules.

Reference parity: ``/root/reference/antmmf/modules/fusions.py`` —
``simple_linear`` (:25), ``encoder`` fusion (:76), ``cosine_fusion`` (:93).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.transformers.base import TransformerEncoder

Dtype = Any


@registry.register_fusion("simple_linear")
class SimpleLinearFusion(nn.Module):
    """Concat modality vectors → Dense → activation."""

    out_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, *features: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate(features, axis=-1)
        return nn.relu(nn.Dense(self.out_dim, dtype=self.dtype)(x))


@registry.register_fusion("encoder")
class EncoderFusion(nn.Module):
    """Concatenate modality token streams and run a small transformer."""

    num_layers: int = 2
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, *streams: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = jnp.concatenate(streams, axis=1)
        return TransformerEncoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            norm_style="post", final_norm=False, dtype=self.dtype,
        )(x, bias=bias, deterministic=deterministic)


@registry.register_fusion("cosine_fusion")
class CosineFusion(nn.Module):
    """Scaled cosine-similarity logits between two modality embeddings."""

    scale: float = 100.0

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-6)
        return (a @ b.T) * self.scale
