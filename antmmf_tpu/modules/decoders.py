"""Decoder modules: causal transformer decoder + captioning language decoder.

Reference parity: ``/root/reference/antmmf/modules/decoders/`` — transformer
decoder, language decoder (caption generation head fed to the beam-search /
nucleus decoders in utils/text_utils.py), hierarchical classifier (in
``modules/classifier.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.attention import MultiHeadAttention
from antmmf_tpu.modules.layers import LayerNorm, Mlp, make_attention_mask

Dtype = Any


def causal_bias(length: int) -> jnp.ndarray:
    """[1, 1, L, L] additive causal mask."""
    mask = jnp.tril(jnp.ones((length, length), bool))
    return jnp.where(mask, 0.0, -1e30)[None, None].astype(jnp.float32)


class TransformerDecoderLayer(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, memory, self_bias=None, cross_bias=None,
                 deterministic: bool = True):
        x = x + MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attention",
        )(LayerNorm(dtype=self.dtype, name="norm1")(x), bias=self_bias,
          deterministic=deterministic)
        x = x + MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="cross_attention",
        )(LayerNorm(dtype=self.dtype, name="norm2")(x), kv=memory,
          bias=cross_bias, deterministic=deterministic)
        x = x + Mlp(hidden_dim=int(x.shape[-1] * self.mlp_ratio),
                    dropout=self.dropout, dtype=self.dtype, name="mlp")(
            LayerNorm(dtype=self.dtype, name="norm3")(x),
            deterministic=deterministic)
        return x


class TransformerDecoder(nn.Module):
    num_layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    causal: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, memory, memory_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        self_bias = causal_bias(x.shape[1]) if self.causal else None
        cross_bias = make_attention_mask(memory_mask) \
            if memory_mask is not None else None
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dropout=self.dropout, dtype=self.dtype, name=f"layer_{i}",
            )(x, memory, self_bias, cross_bias, deterministic)
        return LayerNorm(dtype=self.dtype, name="final_norm")(x)


@registry.register_encoder("language_decoder")
class LanguageDecoder(nn.Module):
    """Caption generator: token embedding + causal decoder over visual memory
    + vocab projection. Compose with ``utils.text_utils.beam_search`` via
    ``make_logits_fn``."""

    vocab_size: int
    hidden_size: int = 512
    num_layers: int = 3
    num_heads: int = 8
    max_length: int = 40
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    def setup(self) -> None:
        self.token_embed = nn.Embed(self.vocab_size, self.hidden_size,
                                    dtype=self.dtype)
        self.pos_embed = nn.Embed(self.max_length, self.hidden_size,
                                  dtype=self.dtype)
        self.decoder = TransformerDecoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype)
        self.out_proj = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, tokens: jnp.ndarray, memory: jnp.ndarray,
                 memory_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        L = tokens.shape[1]
        x = self.token_embed(tokens) + self.pos_embed(jnp.arange(L))[None]
        x = self.decoder(x, memory, memory_mask, deterministic)
        return self.out_proj(x).astype(jnp.float32)  # [B, L, V]
