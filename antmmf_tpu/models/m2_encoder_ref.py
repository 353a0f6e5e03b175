"""Reference-faithful M2-Encoder/VLMo eval model (BEiT3 torchscale stack).

The released M2-Encoder checkpoints are torchscale **BEiT3** models, NOT the
in-repo ``multiway_transformer.py`` (the VLMo module builds
``self.backbone = BEiT3(args)`` — reference
``prj/M2_Encoder/vlmo/modules/vlmo_module.py:169`` and
``vlmo/torchscale/model/BEiT3.py:17-96``). This module mirrors that stack
exactly for weight import + numerical parity (the role ``convert_deepspeed_
ckpt`` plays upstream, ``vlmo_module.py:59``):

* ``TextEmbedding`` / ``VisionEmbedding`` (conv patch + prepended CLS,
  ``component/embedding.py:28-90``);
* fairseq-convention positions starting at 2 through a ``MutliwayEmbedding``
  (vision table A, text table B — ``BEiT3.py:33-40``);
* torchscale ``Encoder`` at the ``_get_base_config`` settings
  (``modeling_utils.py:21-61``): subln (inner_attn_ln before out_proj +
  ffn_layernorm between fc1/fc2), pre-norm, eps 1e-5, no embed scaling,
  every projection/norm Multiway-wrapped (A=vision, B=text);
* the VLMo heads: ``Pooler`` and bias-free ``ITCHead`` projections with L2
  normalization (``vlmo/modules/heads.py``; ``infer_text``/``infer_image``,
  ``vlmo_module.py:325-400``), plus the vl-FFN second stack ``backbone_vl``.

Like ``univl_ref``/``s3d_ref``, this is the faithful EVAL twin used for
checkpoint conversion and parity; production training runs the TPU-first
``models/m2_encoder.M2Encoder``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel

Dtype = Any

EPS = 1e-5


def _multiway(A, B, x: jnp.ndarray, split: int) -> jnp.ndarray:
    """torchscale MultiwayNetwork routing (multiway_network.py:24-45):
    split == -1 → A everywhere (vision), 0 → B everywhere (text), else
    tokens [:split] through A and [split:] through B."""
    if split == -1:
        return A(x)
    if split == 0:
        return B(x)
    return jnp.concatenate([A(x[:, :split]), B(x[:, split:])], axis=1)


class MultiwayDense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, split: int):
        mk = lambda name: nn.Dense(  # noqa: E731
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        return _multiway(mk("A"), mk("B"), x, split)


class MultiwayLayerNorm(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, split: int):
        mk = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=EPS, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        return _multiway(mk("A"), mk("B"), x, split)


class MultiwayFFN(nn.Module):
    """FeedForwardNetwork with subln (feedforward_network.py:91-128):
    fc1 → gelu → ffn_layernorm → fc2, per multiway branch."""

    ffn_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, split: int):
        def branch(name):
            def f(h):
                h = nn.Dense(self.ffn_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"{name}_fc1")(h)
                h = nn.gelu(h, approximate=False)
                h = nn.LayerNorm(epsilon=EPS, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"{name}_ffn_ln")(h)
                return nn.Dense(x.shape[-1], dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"{name}_fc2")(h)
            return f
        return _multiway(branch("A"), branch("B"), x, split)


class BEiT3Layer(nn.Module):
    """torchscale EncoderLayer at the base config (encoder.py:28-168):
    pre-norm, subln, alpha=1."""

    num_heads: int
    ffn_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, split: int,
                 key_padding: Optional[jnp.ndarray] = None):
        B, L, C = x.shape
        H = self.num_heads
        hd = C // H

        h = MultiwayLayerNorm(dtype=self.dtype,
                              name="self_attn_layer_norm")(x, split)
        q = MultiwayDense(C, dtype=self.dtype, name="q_proj")(h, split)
        k = MultiwayDense(C, dtype=self.dtype, name="k_proj")(h, split)
        v = MultiwayDense(C, dtype=self.dtype, name="v_proj")(h, split)

        def heads(t):
            return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", heads(q) * (hd ** -0.5),
                            heads(k), preferred_element_type=jnp.float32)
        if key_padding is not None:  # 1 = PAD (torchscale convention)
            scores = jnp.where(key_padding[:, None, None, :] > 0,
                               -jnp.inf, scores)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, C)
        attn = MultiwayLayerNorm(dtype=self.dtype,
                                 name="inner_attn_ln")(attn, split)
        attn = MultiwayDense(C, dtype=self.dtype, name="out_proj")(attn, split)
        x = x + attn

        h = MultiwayLayerNorm(dtype=self.dtype,
                              name="final_layer_norm")(x, split)
        return x + MultiwayFFN(ffn_dim=self.ffn_dim, dtype=self.dtype,
                               name="ffn")(h, split)


class BEiT3Stack(nn.Module):
    """A torchscale Encoder without embeddings (used for backbone layers and
    the vl stack): layers + final multiway layer_norm."""

    num_layers: int
    num_heads: int
    ffn_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, split: int,
                 key_padding: Optional[jnp.ndarray] = None):
        if key_padding is not None:
            # padded embeddings are zeroed before the layers
            # (encoder.py:441: x = x * (1 - encoder_padding_mask))
            x = x * (1 - key_padding)[:, :, None].astype(x.dtype)
        for i in range(self.num_layers):
            x = BEiT3Layer(num_heads=self.num_heads, ffn_dim=self.ffn_dim,
                           dtype=self.dtype, name=f"layer_{i}")(
                               x, split, key_padding)
        return MultiwayLayerNorm(dtype=self.dtype, name="layer_norm")(
            x, split)


@registry.register_model("m2_encoder_ref")
class M2EncoderRef(BaseModel):
    """Full eval model: BEiT3 backbone + vl stack + ITC heads.

    Methods mirror the reference inference paths:
    ``encode_text`` ≙ ``infer_text`` (vlmo_module.py:325-357),
    ``encode_image`` ≙ ``infer_image`` (:360-400),
    ``encode_fused`` ≙ BEiT3 joint forward (BEiT3.py:49-96)."""

    vocab_size: int = 64010
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    vl_layers: int = 0
    out_dim: int = 512
    max_text_len: int = 52
    max_source_positions: int = 1024
    dtype_str: str = "float32"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self._dtype = dtype
        ffn = int(self.embed_dim * self.mlp_ratio)
        self.text_embed = nn.Embed(self.vocab_size, self.embed_dim,
                                   dtype=dtype, param_dtype=jnp.float32)
        self.patch_proj = nn.Conv(self.embed_dim,
                                  (self.patch_size, self.patch_size),
                                  strides=(self.patch_size, self.patch_size),
                                  dtype=dtype, param_dtype=jnp.float32,
                                  name="vision_proj_conv")
        num_patches = (self.image_size // self.patch_size) ** 2
        self.cls_token = self.param("cls_token", nn.initializers.zeros,
                                    (1, 1, self.embed_dim), jnp.float32)
        # fairseq positions start at 2: table rows 0/1 unused
        self.pos_vision = nn.Embed(num_patches + 1 + 2, self.embed_dim,
                                   dtype=dtype, param_dtype=jnp.float32)
        self.pos_text = nn.Embed(self.max_source_positions, self.embed_dim,
                                 dtype=dtype, param_dtype=jnp.float32)
        self.backbone = BEiT3Stack(
            num_layers=self.num_layers, num_heads=self.num_heads,
            ffn_dim=ffn, dtype=dtype)
        if self.vl_layers:
            self.backbone_vl = BEiT3Stack(
                num_layers=self.vl_layers, num_heads=self.num_heads,
                ffn_dim=ffn, dtype=dtype)
        else:
            self.backbone_vl = None
        self.itc_text_proj = nn.Dense(self.out_dim, use_bias=False,
                                      dtype=dtype, param_dtype=jnp.float32)
        self.itc_image_proj = nn.Dense(self.out_dim, use_bias=False,
                                       dtype=dtype, param_dtype=jnp.float32)
        self.itc_vl_text_proj = nn.Dense(self.out_dim, use_bias=False,
                                         dtype=dtype,
                                         param_dtype=jnp.float32)
        self.itc_vl_image_proj = nn.Dense(self.out_dim, use_bias=False,
                                          dtype=dtype,
                                          param_dtype=jnp.float32)
        self.pooler = nn.Dense(self.embed_dim, dtype=dtype,
                               param_dtype=jnp.float32)
        self.logit_scale = self.param(
            "logit_scale", lambda *_: jnp.asarray(np.log(1 / 0.07),
                                                  jnp.float32), ())

    @staticmethod
    def _norm(x):
        n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return x.astype(jnp.float32) / jnp.maximum(n, 1e-12)

    def _positions(self, L: int, table: nn.Embed) -> jnp.ndarray:
        return table(jnp.arange(2, L + 2))[None]

    def _text_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        x = self.text_embed(ids)
        return x + self._positions(x.shape[1], self.pos_text)

    def _vision_tokens(self, images: jnp.ndarray) -> jnp.ndarray:
        """images float[B, H, W, 3] (already normalized)."""
        x = self.patch_proj(images.astype(self._dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, self.embed_dim)
        cls = jnp.broadcast_to(
            self.cls_token.astype(x.dtype), (B, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        return x + self._positions(x.shape[1], self.pos_vision)

    def encode_text(self, ids: jnp.ndarray, mask: jnp.ndarray):
        x = self._text_tokens(ids)
        pad = (1 - mask).astype(jnp.int32)
        h = self.backbone(x, 0, pad)
        out = {"text_hiddens": h,
               "cls_feats": self._norm(self.itc_text_proj(h[:, 0]))}
        if self.backbone_vl is not None:
            hv = self.backbone_vl(h, -1, pad)
            out["cls_vlffn_feats"] = self._norm(
                self.itc_vl_text_proj(hv[:, 0]))
        return out

    def encode_image(self, images: jnp.ndarray):
        x = self._vision_tokens(images)
        h = self.backbone(x, -1, None)
        out = {"image_hiddens": h,
               "cls_feats": self._norm(self.itc_image_proj(h[:, 0]))}
        if self.backbone_vl is not None:
            hv = self.backbone_vl(h, -1, None)
            out["cls_vlffn_feats"] = self._norm(
                self.itc_vl_image_proj(hv[:, 0]))
        return out

    def encode_fused(self, ids, mask, images):
        xv = self._vision_tokens(images)
        xt = self._text_tokens(ids)
        split = xv.shape[1]
        x = jnp.concatenate([xv, xt], axis=1)
        pad = jnp.concatenate(
            [jnp.zeros(xv.shape[:2], jnp.int32),
             (1 - mask).astype(jnp.int32)], axis=1)
        h = self.backbone(x, split, pad)
        pooled = jnp.tanh(self.pooler(h[:, 0]))
        return {"fused_hiddens": h, "pooled": pooled, "split": split}

    def __call__(self, batch, deterministic: bool = True):
        ids = batch.get("input_ids")
        mask = batch.get("input_mask")
        images = batch.get("image", batch.get("image_data"))
        out = {}
        if ids is not None:
            out["text"] = self.encode_text(
                ids, mask if mask is not None else jnp.ones_like(ids))
        if images is not None:
            out["image"] = self.encode_image(images)
        if ids is not None and images is not None:
            sim = out["text"]["cls_feats"] @ out["image"]["cls_feats"].T
            out["logits"] = sim * jnp.exp(self.logit_scale)
        return out
