"""Simple single-modality and attention-pooling models.

Reference parity (``/root/reference/antmmf/models/``): ``bert`` (:21 text-only
classifier), ``cnn`` (:16), ``image_model`` (:10), ``top_down_bottom_up`` (:10
— question-guided attention over region features, the classic VQA butd model),
``AttriMMBT`` (mmbt.py:125 — MMBT with attribute token stream).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.classic import MMBT, _image_field, _text_fields
from antmmf_tpu.modules.classifier import ClassifierLayer
from antmmf_tpu.modules.encoders.text_encoder import (
    PRESETS as BERT_PRESETS, BertEncoder,
)
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer


@registry.register_model("bert")
class BertClassifier(BaseModel):
    bert_preset: str = "bert_base"
    num_labels: int = 2
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.text_encoder = BertEncoder(dtype=dtype,
                                        **dict(BERT_PRESETS[self.bert_preset]))
        self.classifier = ClassifierLayer("logit", self.num_labels, dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        pooled = self.text_encoder(ids, mask, seg,
                                   deterministic=deterministic)["pooled_output"]
        return {"logits": self.classifier(pooled).astype(jnp.float32),
                "pooled_output": pooled}


@registry.register_model("cnn")
class SimpleCNN(BaseModel):
    num_labels: int = 2
    channels: Any = (32, 64, 128)
    dtype_str: str = "float32"

    @nn.compact
    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        dtype = jnp.dtype(self.dtype_str)
        x = _image_field(batch).astype(dtype)
        for i, ch in enumerate(tuple(self.channels)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_labels, dtype=dtype,
                          name="classifier")(x.mean(axis=(1, 2)))
        return {"logits": logits.astype(jnp.float32)}


@registry.register_model("image_model")
class ImageOnlyModel(BaseModel):
    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    num_labels: int = 1000
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.backbone = VisionTransformer(
            image_size=self.image_size, dtype=dtype,
            **dict(VIT_PRESETS[self.vit_preset]))
        self.classifier = ClassifierLayer("logit", self.num_labels, dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        pooled = self.backbone(_image_field(batch),
                               deterministic=deterministic)["pooled"]
        return {"logits": self.classifier(pooled).astype(jnp.float32)}


@registry.register_model("top_down_bottom_up")
class TopDownBottomUp(BaseModel):
    """BUTD VQA: question-guided attention over region features."""

    bert_preset: str = "bert_tiny_test"
    visual_dim: int = 2048
    hidden: int = 512
    num_labels: int = 3129
    dtype_str: str = "float32"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.text_encoder = BertEncoder(dtype=dtype,
                                        **dict(BERT_PRESETS[self.bert_preset]))
        self.v_proj = nn.Dense(self.hidden, dtype=dtype)
        self.q_proj = nn.Dense(self.hidden, dtype=dtype)
        self.att = nn.Dense(1, dtype=jnp.float32)
        self.q_fuse = nn.Dense(self.hidden, dtype=dtype)
        self.v_fuse = nn.Dense(self.hidden, dtype=dtype)
        self.classifier = ClassifierLayer("mlp", self.num_labels, num_layers=1,
                                          dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        q = self.text_encoder(ids, mask, seg,
                              deterministic=deterministic)["pooled_output"]
        v = batch["image_feature"]  # [B, R, Dv]
        vmask = batch.get("image_feature_mask",
                          jnp.ones(v.shape[:2], jnp.int32))
        joint = nn.tanh(self.v_proj(v)) * nn.tanh(self.q_proj(q))[:, None]
        logits_att = self.att(joint.astype(jnp.float32))[..., 0]
        logits_att = jnp.where(vmask > 0, logits_att,
                               jnp.finfo(jnp.float32).min)
        weights = jax.nn.softmax(logits_att, -1)
        v_att = jnp.einsum("br,brd->bd", weights, v.astype(jnp.float32))
        fused = nn.tanh(self.q_fuse(q)).astype(jnp.float32) * \
            nn.tanh(self.v_fuse(v_att.astype(q.dtype))).astype(jnp.float32)
        logits = self.classifier(fused.astype(q.dtype),
                                 deterministic=deterministic)
        return {"logits": logits.astype(jnp.float32),
                "attention": weights}


@registry.register_model("attri_mmbt")
class AttriMMBT(MMBT):
    """MMBT with an attribute-token stream appended to the image tokens
    (mmbt.py:125): ``attribute_ids`` int[B, A] embedded via the text table."""

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        ids, mask, seg = _text_fields(batch)
        img_tokens = self.img_encoder(
            _image_field(batch), deterministic=deterministic)["sequence"]
        img_tokens = self.img_proj(img_tokens[:, : self.num_image_tokens])
        streams = [img_tokens]
        masks = [jnp.ones(img_tokens.shape[:2], mask.dtype)]
        if "attribute_ids" in batch:
            attr = self.text_encoder.embeddings_apply(
                batch["attribute_ids"], None, deterministic)
            streams.append(attr)
            masks.append(batch.get("attribute_mask",
                                   jnp.ones(attr.shape[:2], mask.dtype)))
        emb = self.text_encoder.embeddings_apply(ids, seg, deterministic)
        streams.append(emb)
        masks.append(mask)
        joint = jnp.concatenate(streams, axis=1)
        joint_mask = jnp.concatenate(masks, axis=1)
        seq = self.text_encoder.encoder_apply(joint, joint_mask, deterministic)
        pooled = jnp.tanh(self.text_encoder.pooler_apply(seq[:, 0]))
        return {"logits": self.classifier(
            pooled, deterministic=deterministic).astype(jnp.float32),
            "pooled_output": pooled}
