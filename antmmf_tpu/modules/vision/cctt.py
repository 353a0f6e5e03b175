"""CCTT: Compact Convolutional Transformer backbone.

Reference parity: ``/root/reference/antmmf/modules/vision/backbone/cctt.py``
(1040 LoC). The CCT design (Hassani et al.): a small conv tokenizer instead of
hard patch slicing, a lightweight pre-LN transformer, and sequence pooling
(learned attention over tokens) instead of a CLS token.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.modules.layers import LayerNorm
from antmmf_tpu.modules.transformers.base import TransformerEncoder

Dtype = Any

PRESETS = {
    "cct_7": dict(embed_dim=256, num_layers=7, num_heads=4, conv_layers=2),
    "cct_14": dict(embed_dim=384, num_layers=14, num_heads=6, conv_layers=2),
    "cct_test": dict(embed_dim=32, num_layers=1, num_heads=2, conv_layers=1),
}


class ConvTokenizer(nn.Module):
    embed_dim: int
    conv_layers: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(self.dtype)
        ch = self.embed_dim // (2 ** (self.conv_layers - 1))
        for i in range(self.conv_layers):
            x = nn.Conv(min(ch * (2 ** i), self.embed_dim), (3, 3),
                        strides=(1, 1), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        B, h, w, C = x.shape
        return x.reshape(B, h * w, C)


class SeqPool(nn.Module):
    """Learned attention pooling over the token sequence (CCT's head)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        logits = nn.Dense(1, dtype=jnp.float32, name="attn")(
            tokens.astype(jnp.float32))[..., 0]
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bl,blc->bc", weights, tokens.astype(jnp.float32)
                          ).astype(tokens.dtype)


class CompactConvTransformer(nn.Module):
    preset: str = "cct_7"
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        p = PRESETS[self.preset]
        tokens = ConvTokenizer(p["embed_dim"], p["conv_layers"],
                               dtype=self.dtype, name="tokenizer")(images)
        L = tokens.shape[1]
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (L, p["embed_dim"]), jnp.float32)
        tokens = tokens + pos[None].astype(tokens.dtype)
        tokens = TransformerEncoder(
            num_layers=p["num_layers"], num_heads=p["num_heads"],
            norm_style="pre", final_norm=True, dropout=self.dropout,
            dtype=self.dtype, name="encoder",
        )(tokens, deterministic=deterministic)
        pooled = SeqPool(dtype=self.dtype, name="seq_pool")(tokens)
        return {"sequence": tokens, "pooled": pooled}
