"""ViLBERT: two-stream transformer with co-attention exchange.

Reference parity: ``/root/reference/antmmf/models/vilbert.py`` (:1202, 1408
LoC). Architecture per the published design: a text stream (BERT) and a visual
stream (region features), connected by co-attentional layers where each
stream's queries attend to the *other* stream's keys/values, followed by
per-stream FFNs. Heads: classification over the fused pooled pair, or
pretraining (masked LM + masked region modeling + alignment).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.modules.attention import MultiHeadAttention
from antmmf_tpu.modules.classifier import ClassifierLayer
from antmmf_tpu.modules.embeddings import TextEmbeddings
from antmmf_tpu.modules.layers import LayerNorm, Mlp, make_attention_mask

Dtype = Any


class CoAttentionLayer(nn.Module):
    """Bi-directional cross-attention + per-stream FFN (post-LN, BERT-style)."""

    num_heads_text: int
    num_heads_visual: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, text, visual, text_bias, visual_bias,
                 deterministic: bool = True):
        # queries from one stream, kv from the other
        t_att = MultiHeadAttention(num_heads=self.num_heads_text,
                                   dtype=self.dtype, name="text_cross")(
            text, kv=visual, bias=visual_bias, deterministic=deterministic)
        v_att = MultiHeadAttention(num_heads=self.num_heads_visual,
                                   dtype=self.dtype, name="visual_cross")(
            visual, kv=text, bias=text_bias, deterministic=deterministic)
        text = LayerNorm(dtype=self.dtype, name="t_norm1")(text + t_att)
        visual = LayerNorm(dtype=self.dtype, name="v_norm1")(visual + v_att)
        text = LayerNorm(dtype=self.dtype, name="t_norm2")(
            text + Mlp(hidden_dim=text.shape[-1] * 4, dtype=self.dtype,
                       name="t_mlp")(text, deterministic=deterministic))
        visual = LayerNorm(dtype=self.dtype, name="v_norm2")(
            visual + Mlp(hidden_dim=visual.shape[-1] * 4, dtype=self.dtype,
                         name="v_mlp")(visual, deterministic=deterministic))
        return text, visual


class SelfLayer(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        att = MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype,
                                 name="self_attn")(
            x, bias=bias, deterministic=deterministic)
        x = LayerNorm(dtype=self.dtype, name="norm1")(x + att)
        return LayerNorm(dtype=self.dtype, name="norm2")(
            x + Mlp(hidden_dim=x.shape[-1] * 4, dtype=self.dtype,
                    name="mlp")(x, deterministic=deterministic))


@registry.register_model("vilbert")
class ViLBERT(BaseModel):
    vocab_size: int = 30522
    text_hidden: int = 768
    visual_hidden: int = 1024
    visual_dim: int = 2048
    num_text_layers: int = 6
    num_visual_layers: int = 3
    num_co_layers: int = 3
    num_heads_text: int = 12
    num_heads_visual: int = 8
    num_labels: int = 2
    training_head_type: str = "classification"  # classification | pretraining
    region_classes: int = 13
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.embeddings = TextEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.text_hidden,
            dtype=dtype)
        self.visual_proj = nn.Dense(self.visual_hidden, dtype=dtype)
        self.visual_loc_proj = nn.Dense(self.visual_hidden, dtype=dtype)
        self.text_layers = [
            SelfLayer(self.num_heads_text, dtype, name=f"text_layer_{i}")
            for i in range(self.num_text_layers)]
        self.visual_layers = [
            SelfLayer(self.num_heads_visual, dtype, name=f"visual_layer_{i}")
            for i in range(self.num_visual_layers)]
        self.co_layers = [
            CoAttentionLayer(self.num_heads_text, self.num_heads_visual, dtype,
                             name=f"co_layer_{i}")
            for i in range(self.num_co_layers)]
        self.text_pooler = nn.Dense(self.text_hidden, dtype=dtype)
        self.visual_pooler = nn.Dense(self.visual_hidden, dtype=dtype)
        if self.training_head_type == "pretraining":
            from antmmf_tpu.modules.transformers.heads.mlm import MLMHead

            from antmmf_tpu.modules.transformers.heads.mrc import MRCHead

            self.mlm_head = MLMHead(vocab_size=self.vocab_size,
                                    hidden_size=self.text_hidden, dtype=dtype)
            self.region_head = nn.Dense(self.visual_dim, dtype=dtype)
            # masked-region CLASSIFICATION vs detector distributions (the
            # vilbert KL task, reference vilbert.py BertImagePredictionHead)
            self.mrc_head = MRCHead(vocab_size=self.region_classes,
                                    hidden_size=self.visual_hidden,
                                    dtype=dtype)
            self.alignment_head = nn.Dense(2, dtype=dtype)
        else:
            self.classifier = ClassifierLayer(
                "mlp", self.num_labels, num_layers=1, dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        ids = batch.get("input_ids", batch.get("caption_input_ids"))
        mask = batch.get("input_mask", jnp.ones_like(ids))
        seg = batch.get("segment_ids")
        feats = batch["image_feature"]  # [B, R, Dv]
        boxes = batch.get("image_boxes")  # [B, R, 5] normalised + area
        vis_mask = batch.get("image_feature_mask",
                             jnp.ones(feats.shape[:2], mask.dtype))

        text = self.embeddings(ids, seg, deterministic=deterministic)
        visual = self.visual_proj(feats)
        if boxes is not None:
            visual = visual + self.visual_loc_proj(boxes)
        text_bias = make_attention_mask(mask)
        visual_bias = make_attention_mask(vis_mask)

        for layer in self.text_layers:
            text = layer(text, text_bias, deterministic)
        for layer in self.visual_layers:
            visual = layer(visual, visual_bias, deterministic)
        for layer in self.co_layers:
            text, visual = layer(text, visual, text_bias, visual_bias,
                                 deterministic)

        t_pooled = jnp.tanh(self.text_pooler(text[:, 0]))
        v_pooled = jnp.tanh(self.visual_pooler(visual[:, 0]))
        out: Dict[str, Any] = {
            "sequence_output_t": text, "sequence_output_v": visual,
            "pooled_output": jnp.concatenate([t_pooled, v_pooled], -1),
        }
        if self.training_head_type == "pretraining":
            table = self.embeddings.variables["params"]["word_embeddings"][
                "embedding"]
            mlm_logits = self.mlm_head(text, table)
            out["logits"] = mlm_logits
            losses: Dict[str, jnp.ndarray] = {}
            metrics: Dict[str, jnp.ndarray] = {}
            lm_labels = batch.get("lm_label_ids",
                                  batch.get("caption_lm_label_ids"))
            if lm_labels is not None:
                from antmmf_tpu.modules.transformers.heads.mlm import MLMHead

                lm = MLMHead.loss_metric(mlm_logits, lm_labels)
                losses.update(lm["losses"])
                metrics.update(lm["metrics"])
            if "masked_regions" in batch:
                pred = self.region_head(visual)
                m = batch["masked_regions"].astype(jnp.float32)[..., None]
                losses["masked_region_loss"] = (
                    ((pred - feats.astype(pred.dtype)) ** 2) * m
                ).sum() / jnp.maximum(m.sum() * feats.shape[-1], 1.0)
            if "region_cls_dis" in batch and "masked_regions" in batch:
                mrc_logits = self.mrc_head(visual)
                mrc = self.mrc_head.loss_metric(
                    mrc_logits, batch["masked_regions"],
                    batch["region_cls_dis"])
                losses.update(mrc["losses"])
                metrics.update(mrc["metrics"])
            if "alignment_labels" in batch:
                al = self.alignment_head(
                    (t_pooled * v_pooled).astype(jnp.float32))
                logp = jax.nn.log_softmax(al, -1)
                losses["alignment_loss"] = -jnp.take_along_axis(
                    logp, batch["alignment_labels"][:, None], -1).mean()
            out["losses"] = losses
            out["metrics"] = metrics
        else:
            out["logits"] = self.classifier(
                out["pooled_output"], deterministic=deterministic
            ).astype(jnp.float32)
        return out
