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
                 deterministic: bool = True, prime: bool = False,
                 self_cache=None, decode_pos=None, mem_kv=None):
        self_attn = MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attention")
        cross_attn = MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="cross_attention")
        if prime:
            # precompute this layer's cross-attention memory k/v (the
            # KV-cache serving path — see modules/llm.py for the scheme)
            return cross_attn(memory, kv=memory, return_kv=True)
        if self_cache is not None:
            a, new_cache = self_attn(
                LayerNorm(dtype=self.dtype, name="norm1")(x),
                cache=self_cache, decode_pos=decode_pos)
            x = x + a
            x = x + cross_attn(
                LayerNorm(dtype=self.dtype, name="norm2")(x),
                cached_kv=mem_kv, bias=cross_bias)
            x = x + Mlp(hidden_dim=int(x.shape[-1] * self.mlp_ratio),
                        dropout=self.dropout, dtype=self.dtype, name="mlp")(
                LayerNorm(dtype=self.dtype, name="norm3")(x),
                deterministic=True)
            return x, new_cache
        x = x + self_attn(
            LayerNorm(dtype=self.dtype, name="norm1")(x), bias=self_bias,
            deterministic=deterministic)
        x = x + cross_attn(
            LayerNorm(dtype=self.dtype, name="norm2")(x), kv=memory,
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
                 deterministic: bool = True, prime: bool = False,
                 caches=None, decode_pos=None, mem_kvs=None):
        cross_bias = make_attention_mask(memory_mask) \
            if memory_mask is not None else None
        layers = [TransformerDecoderLayer(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            dropout=self.dropout, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)]
        if prime:
            return [layer(memory, memory, prime=True) for layer in layers]
        if caches is not None:
            new_caches = []
            for layer, sc, mkv in zip(layers, caches, mem_kvs):
                x, nc = layer(x, None, cross_bias=cross_bias,
                              self_cache=sc, decode_pos=decode_pos,
                              mem_kv=mkv)
                new_caches.append(nc)
            return LayerNorm(dtype=self.dtype, name="final_norm")(x), \
                new_caches
        self_bias = causal_bias(x.shape[1]) if self.causal else None
        for layer in layers:
            x = layer(x, memory, self_bias, cross_bias, deterministic)
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

    # -- incremental decoding (KV-cache serving path) ----------------------
    def prime(self, memory: jnp.ndarray):
        """Precompute per-layer cross-attention memory k/v once."""
        return self.decoder(memory, memory, prime=True)

    def decode_step(self, tokens: jnp.ndarray, pos: jnp.ndarray,
                    caches, mem_kvs, memory_mask=None):
        """One token per row: ``tokens`` int[B] at position ``pos`` int[B].
        Returns (logits f32[B, V], new_caches)."""
        x = self.token_embed(tokens[:, None]) + \
            self.pos_embed(pos[:, None].clip(0, self.max_length - 1))
        x, caches = self.decoder(x, None, memory_mask, caches=caches,
                                 decode_pos=pos, mem_kvs=mem_kvs)
        return self.out_proj(x[:, 0]).astype(jnp.float32), caches
