"""Region-feature encoders: projections over precomputed detector features.

Reference parity: ``/root/reference/antmmf/modules/encoders/
image_feature_encoder.py`` — identity / fc projections with optional spatial
(bbox) feature fusion, consumed by VisualBERT/ViLBERT-class models.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.layers import LayerNorm

Dtype = Any


@registry.register_encoder("image_feature_encoder")
class ImageFeatureEncoder(nn.Module):
    """type: identity | projection | spatial_projection."""

    encoder_type: str = "projection"
    out_dim: int = 768
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # [B, R, D]
        boxes: Optional[jnp.ndarray] = None,  # [B, R, 4] normalised xyxy
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.encoder_type == "identity":
            return features
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(features)
        if self.encoder_type == "spatial_projection" and boxes is not None:
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            spatial = jnp.concatenate([boxes, (w * h)[..., None]], axis=-1)
            x = x + nn.Dense(self.out_dim, dtype=self.dtype,
                             name="spatial_proj")(spatial)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
