"""Classic multimodal model zoo.

Reference parity (``/root/reference/antmmf/models/``):
  * ``ant_mmf`` two-tower VQA (ant_mmf.py:19) + question-only / image-only
    ablations (:308, :334)
  * ``mmbt`` multimodal bitransformer (mmbt.py:17) — image tokens spliced into
    a BERT stream with its ``MultimodalBertEncoder``
    (modules/encoders/multimodal_encoder.py:28)
  * ``visual_bert`` (visual_bert.py:383) — joint text+region-feature encoder
    with optional MLM pretraining head
  * ``concat_bert`` (concat_bert.py:20) + ``openai_clip`` dual-tower variant
    (:148)
  * ``cnn_lstm`` (cnn_lstm.py:19)
  * ``multitask_model`` (multitask_model.py:12)

All are registry-registered flax modules taking the standard batch schema
(``image_data`` NHWC / ``image_feature`` regions, ``input_ids``/``input_mask``/
``segment_ids``, ``targets``) and emitting ``logits`` (+config losses apply).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.modules.classifier import ClassifierLayer
from antmmf_tpu.modules.encoders.text_encoder import (
    PRESETS as BERT_PRESETS, BertEncoder,
)
from antmmf_tpu.modules.layers import make_attention_mask
from antmmf_tpu.modules.transformers.base import TransformerEncoder
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any


def _text_fields(batch: Mapping) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    ids = batch.get("input_ids", batch.get("caption_input_ids"))
    mask = batch.get("input_mask", batch.get("caption_input_mask"))
    seg = batch.get("segment_ids", batch.get("caption_segment_ids"))
    return ids, mask, seg


def _image_field(batch: Mapping) -> jnp.ndarray:
    img = batch.get("image", batch.get("image_data"))
    if img.ndim == 5:  # [B, F, H, W, C] → first frame for image models
        img = img[:, 0]
    return img


@registry.register_model("ant_mmf")
@registry.register_model("two_tower_vqa")
class TwoTowerVQA(BaseModel):
    """Image tower + question tower → fusion → answer classifier."""

    vit_preset: str = "vit_base_patch32"
    bert_preset: str = "bert_base"
    image_size: int = 224
    num_labels: int = 3129
    modality: str = "both"  # both | text_only | image_only (ablations)
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        if self.modality != "text_only":
            self.img_encoder = VisionTransformer(
                image_size=self.image_size, dtype=dtype,
                **dict(VIT_PRESETS[self.vit_preset]))
        if self.modality != "image_only":
            kw = dict(BERT_PRESETS[self.bert_preset])
            self.text_encoder = BertEncoder(dtype=dtype, **kw)
        self.classifier = ClassifierLayer(
            classifier_type="mlp", num_labels=self.num_labels,
            num_layers=2, dtype=dtype)

    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        feats = []
        if self.modality != "text_only":
            feats.append(self.img_encoder(
                _image_field(batch), deterministic=deterministic)["pooled"])
        if self.modality != "image_only":
            ids, mask, seg = _text_fields(batch)
            feats.append(self.text_encoder(
                ids, mask, seg, deterministic=deterministic)["pooled_output"])
        fused = feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)
        logits = self.classifier(fused, deterministic=deterministic)
        return {"logits": logits.astype(jnp.float32)}


@registry.register_model("mmbt")
class MMBT(BaseModel):
    """Multimodal bitransformer: ViT grid tokens prepended to the BERT stream
    with modality type embeddings; single joint encoder."""

    vit_preset: str = "vit_base_patch32"
    bert_preset: str = "bert_base"
    image_size: int = 224
    num_labels: int = 2
    num_image_tokens: int = 9
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.img_encoder = VisionTransformer(
            image_size=self.image_size, dtype=dtype,
            **dict(VIT_PRESETS[self.vit_preset]))
        kw = dict(BERT_PRESETS[self.bert_preset])
        self.hidden = kw["hidden_size"]
        self.text_encoder = BertEncoder(dtype=dtype, **kw)
        vit_dim = VIT_PRESETS[self.vit_preset]["embed_dim"]
        self.img_proj = nn.Dense(self.hidden, dtype=dtype)
        self.classifier = ClassifierLayer("logit", self.num_labels, dtype=dtype)

    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        img_tokens = self.img_encoder(
            _image_field(batch), deterministic=deterministic)["sequence"]
        img_tokens = self.img_proj(img_tokens[:, : self.num_image_tokens])
        # embed text, then run the joint stream through the bert encoder stack
        emb = self.text_encoder.embeddings_apply(ids, seg, deterministic)
        joint = jnp.concatenate([img_tokens, emb], axis=1)
        img_mask = jnp.ones(img_tokens.shape[:2], mask.dtype)
        joint_mask = jnp.concatenate([img_mask, mask], axis=1)
        seq = self.text_encoder.encoder_apply(joint, joint_mask, deterministic)
        pooled = jnp.tanh(self.text_encoder.pooler_apply(seq[:, 0]))
        logits = self.classifier(pooled, deterministic=deterministic)
        return {"logits": logits.astype(jnp.float32), "pooled_output": pooled}


@registry.register_model("visual_bert")
class VisualBERT(BaseModel):
    """Joint encoder over text tokens + visual region features
    (``image_feature`` [B, R, D]) or ViT grid features from raw pixels."""

    bert_preset: str = "bert_base"
    visual_dim: int = 2048
    num_labels: int = 2
    training_head_type: str = "classification"  # classification | pretraining
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        kw = dict(BERT_PRESETS[self.bert_preset])
        self.hidden = kw["hidden_size"]
        self.text_encoder = BertEncoder(dtype=dtype, **kw)
        self.visual_proj = nn.Dense(self.hidden, dtype=dtype)
        if self.training_head_type == "pretraining":
            from antmmf_tpu.modules.transformers.heads.mlm import MLMHead

            self.mlm_head = MLMHead(vocab_size=kw["vocab_size"],
                                    hidden_size=self.hidden, dtype=dtype)
        else:
            self.classifier = ClassifierLayer("mlp", self.num_labels,
                                              num_layers=1, dtype=dtype)

    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        vis = batch["image_feature"]
        vis = self.visual_proj(vis)
        emb = self.text_encoder.embeddings_apply(ids, seg, deterministic)
        joint = jnp.concatenate([emb, vis], axis=1)
        vis_mask = batch.get("image_feature_mask",
                             jnp.ones(vis.shape[:2], mask.dtype))
        joint_mask = jnp.concatenate([mask, vis_mask], axis=1)
        seq = self.text_encoder.encoder_apply(joint, joint_mask, deterministic)
        out: Dict[str, Any] = {"sequence_output": seq}
        if self.training_head_type == "pretraining":
            table = self.text_encoder.variables["params"]["embeddings"][
                "word_embeddings"]["embedding"]
            Lt = ids.shape[1]
            logits = self.mlm_head(seq[:, :Lt], table)
            out["logits"] = logits
            if "lm_label_ids" in batch:
                from antmmf_tpu.modules.transformers.heads.mlm import MLMHead

                lm = MLMHead.loss_metric(logits, batch["lm_label_ids"])
                out["losses"] = lm["losses"]
                out["metrics"] = lm["metrics"]
        else:
            pooled = jnp.tanh(self.text_encoder.pooler_apply(seq[:, 0]))
            out["logits"] = self.classifier(
                pooled, deterministic=deterministic).astype(jnp.float32)
        return out


@registry.register_model("concat_bert")
class ConcatBERT(BaseModel):
    """Independent towers, concatenated pooled features → MLP classifier."""

    vit_preset: str = "vit_base_patch32"
    bert_preset: str = "bert_base"
    image_size: int = 224
    num_labels: int = 2
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.img_encoder = VisionTransformer(
            image_size=self.image_size, dtype=dtype,
            **dict(VIT_PRESETS[self.vit_preset]))
        self.text_encoder = BertEncoder(dtype=dtype,
                                        **dict(BERT_PRESETS[self.bert_preset]))
        self.classifier = ClassifierLayer("mlp", self.num_labels, num_layers=2,
                                          dtype=dtype)

    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        img = self.img_encoder(_image_field(batch),
                               deterministic=deterministic)["pooled"]
        txt = self.text_encoder(ids, mask, seg,
                                deterministic=deterministic)["pooled_output"]
        logits = self.classifier(jnp.concatenate([img, txt], -1),
                                 deterministic=deterministic)
        return {"logits": logits.astype(jnp.float32)}


@registry.register_model("openai_clip")
class CLIPDualTower(BaseModel):
    """CLIP-style dual towers with cosine logits (concat_bert.py:148 variant)."""

    vit_preset: str = "vit_base_patch32"
    bert_preset: str = "bert_base"
    image_size: int = 224
    embed_dim: int = 512
    init_logit_scale: float = 2.6592
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.img_encoder = VisionTransformer(
            image_size=self.image_size, output_dim=self.embed_dim, dtype=dtype,
            **dict(VIT_PRESETS[self.vit_preset]))
        self.text_encoder = BertEncoder(dtype=dtype,
                                        **dict(BERT_PRESETS[self.bert_preset]))
        self.text_proj = nn.Dense(self.embed_dim, use_bias=False, dtype=dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.init_logit_scale), (),
            jnp.float32)

    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        from antmmf_tpu.models.univl import l2_normalize
        from antmmf_tpu.modules.losses.contrastive import symmetric_cross_en

        ids, mask, seg = _text_fields(batch)
        img = l2_normalize(self.img_encoder(
            _image_field(batch), deterministic=deterministic)["pooled"])
        txt = l2_normalize(self.text_proj(self.text_encoder(
            ids, mask, seg, deterministic=deterministic)["pooled_output"]))
        scale = jnp.exp(jnp.clip(self.logit_scale, 0.0, jnp.log(100.0)))
        sim = (txt.astype(jnp.float32) @ img.astype(jnp.float32).T) * scale
        return {"sim": sim, "l1_simi": sim, "logits": sim,
                "text_embed": txt, "visual_embed": img,
                "losses": {"clip_contrastive_loss": symmetric_cross_en(sim)}}


@registry.register_model("cnn_lstm")
class CNNLstm(BaseModel):
    """Small conv image tower + LSTM question tower (cnn_lstm.py:19)."""

    vocab_size: int = 30522
    text_embed_dim: int = 128
    lstm_dim: int = 128
    num_labels: int = 2
    dtype_str: str = "float32"

    @nn.compact
    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        dtype = jnp.dtype(self.dtype_str)
        img = _image_field(batch).astype(dtype)
        for i, ch in enumerate((32, 64, 64)):
            img = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=dtype,
                          name=f"conv{i}")(img)
            img = nn.relu(img)
        img_feat = img.mean(axis=(1, 2))

        ids, mask, _ = _text_fields(batch)
        emb = nn.Embed(self.vocab_size, self.text_embed_dim, dtype=dtype,
                       name="embed")(ids)
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.lstm_dim), name="lstm")
        seq = lstm(emb)
        lengths = jnp.maximum(mask.sum(-1) - 1, 0)
        txt_feat = jnp.take_along_axis(
            seq, lengths[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        logits = nn.Dense(self.num_labels, dtype=dtype, name="classifier")(
            jnp.concatenate([img_feat, txt_feat], -1))
        return {"logits": logits.astype(jnp.float32)}


@registry.register_model("multitask_model")
class MultitaskModel(BaseModel):
    """Shared towers + per-task classifier heads selected by ``task_id``
    (multitask_model.py:12)."""

    bert_preset: str = "bert_tiny_test"
    task_heads: Tuple[int, ...] = (2, 3)
    dtype_str: str = "float32"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.text_encoder = BertEncoder(dtype=dtype,
                                        **dict(BERT_PRESETS[self.bert_preset]))
        self.heads = [
            ClassifierLayer("logit", n, dtype=dtype, name=f"task_head_{i}")
            for i, n in enumerate(self.task_heads)
        ]

    def __call__(self, batch: Mapping, deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        pooled = self.text_encoder(ids, mask, seg,
                                   deterministic=deterministic)["pooled_output"]
        out = {f"task_{i}_logits": h(pooled).astype(jnp.float32)
               for i, h in enumerate(self.heads)}
        out["logits"] = out["task_0_logits"]
        return out
