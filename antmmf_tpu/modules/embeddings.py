"""Embedding modules: text (word+position+type) and visual (patch + 2D pos).

Reference parity: ``/root/reference/antmmf/modules/embeddings/`` — text embeddings
(``text_embedding.py``), CLIP visual embedding with 2D-interpolated positions
(``clip_visual_embedding.py``), DETR sine positions
(``detr_position_embedding_sine.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.modules.layers import LayerNorm

Dtype = Any


class TextEmbeddings(nn.Module):
    """BERT-style: word + learned-position + token-type, then LN + dropout."""

    vocab_size: int
    hidden_size: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,  # int[B, L]
        segment_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        inputs_embeds: Optional[jnp.ndarray] = None,  # float[B, L, C]
        word_only: bool = False,
        extra: Optional[jnp.ndarray] = None,  # float[B, L, C] pre-LN additive
    ) -> jnp.ndarray:
        """Pass ``inputs_embeds`` to skip the word lookup — the HF
        inputs_embeds path the reference's cross-encoder splice relies on
        (univl_video_base.py:198-200: visual tokens through BERT embeddings).
        ``word_only=True`` returns the raw word-table rows for ``input_ids``
        (no position/type/LN — the SEP-token splice lookup,
        univl_video_base.py:186-189). ``extra`` is summed in BEFORE the
        LayerNorm — the LayoutLM 2D-position slot (reference
        layout_lm_embeddings.py:118-128 adds bbox embeddings to the 1D
        positions pre-LN)."""
        if inputs_embeds is not None:
            B, L = inputs_embeds.shape[:2]
        else:
            B, L = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="word_embeddings")
        if word_only:
            return word(input_ids)
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="position_embeddings")
        typ = nn.Embed(self.type_vocab_size, self.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_type_embeddings")
        if position_ids is None:
            position_ids = jnp.arange(L)[None, :]
        if segment_ids is None:
            segment_ids = jnp.zeros((B, L), jnp.int32)
        base = (word(input_ids) if inputs_embeds is None
                else inputs_embeds.astype(self.dtype))
        x = base + pos(position_ids) + typ(segment_ids)
        if extra is not None:
            x = x + extra.astype(x.dtype)
        x = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="layer_norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


def interpolate_pos_embed_2d(
    pos: jnp.ndarray, src_hw: tuple, dst_hw: tuple
) -> jnp.ndarray:
    """Bilinearly resample a [1 + h*w, C] position table (leading CLS) to a new
    grid — the CLIP trick for off-res inputs (clip_visual_embedding.py)."""
    if src_hw == dst_hw:
        return pos
    cls_tok, grid = pos[:1], pos[1:]
    h0, w0 = src_hw
    h1, w1 = dst_hw
    grid = grid.reshape(h0, w0, -1)
    grid = jax.image.resize(grid, (h1, w1, grid.shape[-1]), method="bilinear")
    return jnp.concatenate([cls_tok, grid.reshape(h1 * w1, -1)], axis=0)


class PatchEmbed(nn.Module):
    """Image → patch tokens. stride-p conv (XLA lowers it to one MXU matmul)."""

    patch_size: int = 32
    embed_dim: int = 768
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, 3]
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(images.astype(self.dtype))
        B, h, w, C = x.shape
        return x.reshape(B, h * w, C)


class VisualEmbeddings(nn.Module):
    """Patchify + CLS token + learned 2D positions (resolution-adaptive)."""

    image_size: int = 224
    patch_size: int = 32
    embed_dim: int = 768
    dropout: float = 0.0
    use_cls_token: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, _ = images.shape
        tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                            self.param_dtype, name="patch_embed")(images)
        n_base = (self.image_size // self.patch_size) ** 2
        n_extra = 1 if self.use_cls_token else 0
        pos_table = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (n_base + n_extra, self.embed_dim),
            self.param_dtype,
        )
        if self.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.embed_dim), self.param_dtype)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(tokens.dtype),
                 tokens], axis=1)
        src = self.image_size // self.patch_size
        dst_h, dst_w = H // self.patch_size, W // self.patch_size
        pos = interpolate_pos_embed_2d(
            pos_table if self.use_cls_token else jnp.concatenate(
                [jnp.zeros((1, self.embed_dim), pos_table.dtype), pos_table]),
            (src, src), (dst_h, dst_w),
        )
        if not self.use_cls_token:
            pos = pos[1:]
        # broadcast [N, C] directly (no [1, N, C] intermediate): the
        # transpose of a leading-dim broadcast keeps a size-1-dim tensor
        # that GSPMD over-shards with the batch spec and then involuntarily
        # rematerializes when the fsdp-sharded kernels pull it
        # feature-sharded (MULTICHIP r4 tail)
        x = tokens + pos.astype(tokens.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class SinePositionEmbedding2D(nn.Module):
    """DETR-style fixed sine/cosine 2D positions over a feature grid mask."""

    num_pos_feats: int = 128
    temperature: float = 10000.0

    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:  # bool[B, h, w] True=valid
        y = jnp.cumsum(mask.astype(jnp.float32), axis=1)
        x = jnp.cumsum(mask.astype(jnp.float32), axis=2)
        eps = 1e-6
        y = y / (y[:, -1:, :] + eps) * 2 * jnp.pi
        x = x / (x[:, :, -1:] + eps) * 2 * jnp.pi
        dim_t = self.temperature ** (
            2 * (jnp.arange(self.num_pos_feats) // 2) / self.num_pos_feats
        )
        pos_x = x[..., None] / dim_t
        pos_y = y[..., None] / dim_t
        pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                          axis=-1).reshape(*x.shape, -1)
        pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                          axis=-1).reshape(*y.shape, -1)
        return jnp.concatenate([pos_y, pos_x], axis=-1)  # [B, h, w, 2*feats]


class LearnedPositionEmbedding2D(nn.Module):
    """Learned absolute 2D position plane (reference
    embeddings/detr_position_embedding_learned.py:10): per-row and
    per-column embedding tables concatenated to [B, h, w, 2·D]."""

    num_pos_feats: int = 256
    max_position_embeddings: int = 50

    @nn.compact
    def __call__(self, grid: jnp.ndarray) -> jnp.ndarray:
        """grid [B, h, w, C] (NHWC) → positions [B, h, w, 2·num_pos_feats]."""
        B, h, w = grid.shape[:3]
        rows = nn.Embed(self.max_position_embeddings, self.num_pos_feats,
                        embedding_init=nn.initializers.uniform(1.0),
                        name="row_embed")(jnp.arange(h))
        cols = nn.Embed(self.max_position_embeddings, self.num_pos_feats,
                        embedding_init=nn.initializers.uniform(1.0),
                        name="col_embed")(jnp.arange(w))
        pos = jnp.concatenate([
            jnp.broadcast_to(cols[None, :, :], (h, w, self.num_pos_feats)),
            jnp.broadcast_to(rows[:, None, :], (h, w, self.num_pos_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (B,) + pos.shape)


class ImageBertEmbeddings(nn.Module):
    """MMBT-style image-token embeddings sharing the text tables (reference
    embeddings/image_bert_embeddings.py:10): project image features into the
    text hidden space, wrap with [CLS] ... [SEP] word embeddings, add
    position + token-type, LN + dropout. The companion text-embedding
    TABLES are passed as arrays (the caller reads them off its
    ``TextEmbeddings`` params) so the weights stay shared; LN params are
    local."""

    hidden_size: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_features: jnp.ndarray,
                 word_table: jnp.ndarray,      # [V, C]
                 position_table: jnp.ndarray,  # [P, C]
                 token_type_table: jnp.ndarray,  # [T, C]
                 token_type: int = 0, cls_id: int = 101, sep_id: int = 102,
                 deterministic: bool = True) -> jnp.ndarray:
        """image_features [B, N, Dv] → [B, N+2, C] (CLS + imgs + SEP)."""
        B, N = image_features.shape[:2]
        proj = nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="img_embeddings")(image_features)
        cls_tok = jnp.broadcast_to(word_table[cls_id][None, None],
                                   (B, 1, self.hidden_size))
        sep_tok = jnp.broadcast_to(word_table[sep_id][None, None],
                                   (B, 1, self.hidden_size))
        x = jnp.concatenate([cls_tok.astype(proj.dtype), proj,
                             sep_tok.astype(proj.dtype)], axis=1)
        L = N + 2
        x = x + (position_table[:L] + token_type_table[token_type][None]
                 )[None].astype(x.dtype)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        scale = self.param("ln_scale", nn.initializers.ones,
                           (self.hidden_size,))
        bias = self.param("ln_bias", nn.initializers.zeros,
                          (self.hidden_size,))
        x = ((xf - mu) / jnp.sqrt(var + 1e-12) * scale + bias).astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
