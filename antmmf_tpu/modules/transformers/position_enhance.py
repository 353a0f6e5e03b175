"""Position-enhanced transformer: positions injected into attention at
every layer (DETR Table-3 style), with DETR-query and generation decoding.

Reference parity: ``/root/reference/antmmf/modules/transformers/
position_enhance.py:14-325`` — the encoder/decoder pair behind the UniVL
image+OCR ROI models (``prj/*/roi_univl/univl/model/univl_base.py``):
q/k carry the position embedding at EVERY layer (values do not), the
decoder supports ``decoding_type`` ∈ {"detr", "generation",
"detr+generation"} with learned query embeddings for the DETR branch and
causal regression for the generation branch.

TPU design: one module, static decode shapes; the combined decoding_type
shares the encoder memory across both decode branches in a single jitted
forward.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.modules.layers import LayerNorm, Mlp, make_attention_mask

Dtype = Any


def with_pos(x: jnp.ndarray, pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    """DETR's with_pos_embed: add when given (q/k only, never values)."""
    return x if pos is None else x + pos.astype(x.dtype)


class _PosAttention(nn.Module):
    """Attention whose q/k inputs carry positions but values do not."""

    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, bias=None, deterministic=True):
        C = q_in.shape[-1]
        hd = C // self.num_heads

        def heads(t):
            return t.reshape(t.shape[:-1] + (self.num_heads, hd))

        q = heads(nn.Dense(C, dtype=self.dtype, name="q")(q_in))
        k = heads(nn.Dense(C, dtype=self.dtype, name="k")(k_in))
        v = heads(nn.Dense(C, dtype=self.dtype, name="v")(v_in))
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, -1).astype(v.dtype)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(q_in.shape[:-1] + (C,))
        return nn.Dense(C, dtype=self.dtype, name="out")(out)


class PositionEnhancedEncoderLayer(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, bias=None, deterministic=True):
        q = k = with_pos(src, pos)
        src = LayerNorm(dtype=self.dtype, name="norm1")(
            src + _PosAttention(self.num_heads, self.dropout, self.dtype,
                                name="self_attn")(
                q, k, src, bias, deterministic))
        src = LayerNorm(dtype=self.dtype, name="norm2")(
            src + Mlp(hidden_dim=int(src.shape[-1] * self.mlp_ratio),
                      dropout=self.dropout, dtype=self.dtype, name="mlp")(
                src, deterministic=deterministic))
        return src


class PositionEnhancedDecoderLayer(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, memory_pos=None,
                 self_bias=None, cross_bias=None, deterministic=True):
        q = k = with_pos(tgt, query_pos)
        tgt = LayerNorm(dtype=self.dtype, name="norm1")(
            tgt + _PosAttention(self.num_heads, self.dropout, self.dtype,
                                name="self_attn")(
                q, k, tgt, self_bias, deterministic))
        tgt = LayerNorm(dtype=self.dtype, name="norm2")(
            tgt + _PosAttention(self.num_heads, self.dropout, self.dtype,
                                name="cross_attn")(
                with_pos(tgt, query_pos), with_pos(memory, memory_pos),
                memory, cross_bias, deterministic))
        tgt = LayerNorm(dtype=self.dtype, name="norm3")(
            tgt + Mlp(hidden_dim=int(tgt.shape[-1] * self.mlp_ratio),
                      dropout=self.dropout, dtype=self.dtype, name="mlp")(
                tgt, deterministic=deterministic))
        return tgt


class PositionEnhancedTransformer(nn.Module):
    """Encoder + multi-mode decoder (reference position_enhance.py:14).

    ``decoding_type``: "detr" (learned num_queries object queries →
    [B, Q, C] states), "generation" (causal token decode over memory), or
    "detr+generation" (both branches share the encoder memory); results
    keyed by decoding type like the reference's forward_decoder.
    """

    num_layers: int = 2
    num_decoder_layers: int = 2
    num_heads: int = 8
    num_queries: int = 100
    decoding_type: str = "detr"
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_pos=None, src_mask=None, tgt=None,
                 tgt_pos=None, deterministic=True) -> Dict[str, jnp.ndarray]:
        bias = make_attention_mask(src_mask) if src_mask is not None else None
        memory = src
        for i in range(self.num_layers):
            memory = PositionEnhancedEncoderLayer(
                self.num_heads, self.mlp_ratio, self.dropout, self.dtype,
                name=f"enc_{i}")(memory, src_pos, bias, deterministic)

        cross_bias = bias
        decoders = {
            mode: [PositionEnhancedDecoderLayer(
                self.num_heads, self.mlp_ratio, self.dropout, self.dtype,
                name=f"dec_{mode}_{i}") for i in range(self.num_decoder_layers)]
            for mode in self.decoding_type.split("+")}

        def run_decoder(layers, q0, query_pos, causal):
            self_bias = None
            if causal:
                L = q0.shape[1]
                self_bias = jnp.where(
                    jnp.arange(L)[None, :] > jnp.arange(L)[:, None], -1e9, 0.0
                )[None, None]
            h = q0
            for layer in layers:
                h = layer(h, memory, query_pos, src_pos, self_bias,
                          cross_bias, deterministic)
            return h

        out: Dict[str, jnp.ndarray] = {"memory": memory}
        B, _, C = src.shape
        for mode, layers in decoders.items():
            if mode == "detr":
                queries = self.param("object_queries",
                                     nn.initializers.normal(0.02),
                                     (self.num_queries, C), jnp.float32)
                q0 = jnp.zeros((B, self.num_queries, C), memory.dtype)
                qpos = jnp.broadcast_to(
                    queries[None], (B,) + queries.shape).astype(memory.dtype)
                out["detr"] = run_decoder(layers, q0, qpos, causal=False)
            elif mode == "generation":
                assert tgt is not None, "generation decoding needs tgt"
                out["generation"] = run_decoder(layers, tgt, tgt_pos,
                                                causal=True)
            else:
                raise ValueError(f"unknown decoding_type {mode!r}")
        return out
