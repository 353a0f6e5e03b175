"""Video (S3D MIL-NCE) and audio (speaker ResNet) models.

Reference parity: ``/root/reference/antmmf/models/s3d.py`` — the S3D video
tower trained with MIL-NCE against ASR text (:432) and ``SpkResNet`` speaker
audio encoder (:151, spectrogram ResNet).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import l2_normalize
from antmmf_tpu.modules.classifier import ClassifierLayer
from antmmf_tpu.modules.encoders.text_encoder import (
    PRESETS as BERT_PRESETS, BertEncoder,
)
from antmmf_tpu.modules.losses.contrastive import mil_nce
from antmmf_tpu.modules.vision.resnet import ResNet
from antmmf_tpu.modules.vision.s3d import S3DG


@registry.register_model("s3d")
class S3DMilNce(BaseModel):
    """S3D-G video tower + text tower trained with MIL-NCE (multiple captions
    per clip are positives)."""

    width: int = 64
    num_blocks: int = 3
    bert_preset: str = "bert_tiny_test"
    embed_dim: int = 256
    captions_per_clip: int = 1
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.video_encoder = S3DG(width=self.width, num_blocks=self.num_blocks,
                                  dtype=dtype)
        self.text_encoder = BertEncoder(dtype=dtype,
                                        **dict(BERT_PRESETS[self.bert_preset]))
        self.video_fc = nn.Dense(self.embed_dim, use_bias=False, dtype=dtype)
        self.text_fc = nn.Dense(self.embed_dim, use_bias=False, dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        video = batch.get("video", batch.get("image_data"))
        v = self.video_encoder(video, deterministic=deterministic)["pooled"]
        v = l2_normalize(self.video_fc(v))
        ids = batch.get("caption_input_ids", batch.get("input_ids"))
        mask = batch.get("caption_input_mask", batch.get("input_mask"))
        t = self.text_encoder(ids, mask,
                              deterministic=deterministic)["pooled_output"]
        t = l2_normalize(self.text_fc(t))
        sim = t.astype(jnp.float32) @ v.astype(jnp.float32).T
        # MIL positive mask: each clip's group of captions_per_clip captions
        n_text, n_vid = sim.shape
        group = max(1, n_text // max(n_vid, 1))
        pos = jnp.repeat(jnp.eye(n_vid), group, axis=0)[:n_text]
        loss = 0.5 * (mil_nce(sim * 10.0, pos) + mil_nce(sim.T * 10.0, pos.T))
        return {"sim": sim, "l1_simi": sim, "logits": sim,
                "text_embed": t, "visual_embed": v,
                "losses": {"mil_nce_loss": loss}}


@registry.register_model("spk_resnet")
class SpkResNet(BaseModel):
    """Speaker-verification audio tower: spectrogram [B, T, F] → ResNet →
    embedding + AM-softmax-ready cosine logits."""

    resnet_preset: str = "resnet_tiny_test"
    embed_dim: int = 128
    num_speakers: int = 100
    dtype_str: str = "float32"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.trunk = ResNet(preset=self.resnet_preset, width=32, dtype=dtype)
        self.embed_fc = nn.Dense(self.embed_dim, dtype=dtype)
        self.classifier = ClassifierLayer("weight_norm", self.num_speakers,
                                          dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        spec = batch["audio"]  # [B, T, F] or [B, T, F, 1]
        if spec.ndim == 3:
            spec = spec[..., None]
        out = self.trunk(spec)
        emb = l2_normalize(self.embed_fc(out["pooled"]))
        logits = self.classifier(emb)
        return {"logits": logits.astype(jnp.float32), "speaker_embed": emb}
