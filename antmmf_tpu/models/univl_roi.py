"""UniVL ROI: region-feature + OCR + caption joint model.

Reference parity: ``/root/reference/prj/base_vtp/roi_univl/roi/`` —
``roi/model.py`` (536 LoC): detector region features and OCR tokens join the
caption stream in the shared cross-encoder; ``roi/region_processor.py`` (181)
prepares fixed-count region features/boxes. The prefix-routing batch schema is
kept (§8.2: region_/ocr_/caption_ field prefixes).

Batch fields:
  region_feature       f32[B, R, Dr]   detector features (FeaturesDatabase)
  region_boxes         f32[B, R, 4]    normalised xyxy
  region_mask          int[B, R]
  ocr_input_ids/_mask  int[B, Lo]      OCR tokens (optional)
  ocr_bboxes           int[B, Lo, 4]   LayoutLM-bucketised xyxy (0..1023)
  caption_input_ids/_mask/_segment_ids/_lm_label_ids   int[B, Lt]
  image_data           f32[B, F, H, W, 3] (optional grid stream)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import UnivlVideoBase
from antmmf_tpu.modules.encoders.image_feature_encoder import ImageFeatureEncoder
from antmmf_tpu.modules.layers import make_attention_mask
from antmmf_tpu.modules.transformers.heads.itm import ITMHead
from antmmf_tpu.modules.transformers.heads.mlm import MLMHead
from antmmf_tpu.modules.transformers.heads.mrc import MRCHead


@registry.register_model("univl_roi")
class UnivlRoiModel(BaseModel):
    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    bert_preset: str = "bert_base"
    embed_dim: int = 512
    n_clips: int = 1
    cross_layers: int = 2
    region_dim: int = 2048
    with_grid_stream: bool = True  # also feed ViT grid tokens
    with_mlm: bool = True
    with_itm: bool = True
    # masked-region classification over detector class distributions
    # (reference ROIPreTrainingHeads task 2, roi/model.py:350-379)
    with_mrc: bool = False
    region_classes: int = 13
    # LayoutLM-style 2D layout embeddings over OCR box coordinates
    # (reference roi/model.py:90-98: ocr_embeddings = LayoutLMEmbeddings
    # over ocr_bboxes, sharing the BERT word/position/type tables) —
    # spatial grounding of the OCR stream. Engages when the batch carries
    # ``ocr_bboxes``; without boxes OCR falls back to plain text embeddings.
    ocr_layout: bool = True
    ocr_layout_max_position: int = 1024
    dropout: float = 0.0
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.base = UnivlVideoBase(
            vit_preset=self.vit_preset, image_size=self.image_size,
            bert_preset=self.bert_preset, embed_dim=self.embed_dim,
            n_clips=self.n_clips, with_cross_encoder=True,
            cross_layers=self.cross_layers, dropout=self.dropout,
            dtype_str=self.dtype_str)
        self.region_encoder = ImageFeatureEncoder(
            encoder_type="spatial_projection",
            out_dim=self.base.visual_hidden, dtype=dtype)
        if self.ocr_layout:
            from antmmf_tpu.models.layoutlm import LayoutEmbeddings

            self.ocr_layout_embeddings = LayoutEmbeddings(
                hidden_size=self.base.text_hidden,
                max_position=self.ocr_layout_max_position, dtype=dtype)
        vocab = self.base.text_encoder.vocab_size
        if self.with_mlm:
            self.mlm_head = MLMHead(vocab_size=vocab,
                                    hidden_size=self.base.text_hidden,
                                    dtype=dtype)
        if self.with_itm:
            self.itm_head = ITMHead(hidden_size=self.base.cross_width,
                                    dtype=dtype)
        if self.with_mrc:
            self.mrc_head = MRCHead(vocab_size=self.region_classes,
                                    hidden_size=self.base.cross_width,
                                    dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        ids = batch["caption_input_ids"]
        mask = batch["caption_input_mask"]
        B, Lt = ids.shape
        text = self.base.forward_text_encoder(
            ids, mask, batch.get("caption_segment_ids"),
            deterministic=deterministic)

        # visual stream: regions (+ optional grid tokens), concatenated
        streams = []
        stream_masks = []
        if "region_feature" in batch:
            regions = self.region_encoder(
                batch["region_feature"], batch.get("region_boxes"),
                deterministic=deterministic)
            streams.append(regions)
            stream_masks.append(batch.get(
                "region_mask", jnp.ones(regions.shape[:2], jnp.int32)))
        if self.with_grid_stream and "image_data" in batch:
            video = self.base.forward_img_encoder(
                batch["image_data"], deterministic=deterministic)
            vt = video["visual_tokens"]  # [B, F, Lv, C]
            F_, Lv = vt.shape[1], vt.shape[2]
            streams.append(vt.reshape(B, F_ * Lv, -1))
            stream_masks.append(jnp.repeat(
                batch.get("video_mask", jnp.ones((B, F_), jnp.int32)), Lv,
                axis=1))
        # OCR tokens ride through the text embedding table into the visual
        # slot — with LayoutLM 2D box-position embeddings summed in pre-LN
        # when boxes are present (reference roi/model.py:90-98,268-273:
        # ocr_embeddings(ocr_input_ids, ocr_bboxes)), so the cross-encoder
        # sees WHERE each OCR token sits on the document
        if "ocr_input_ids" in batch:
            extra = None
            if self.ocr_layout and "ocr_bboxes" in batch:
                extra = self.ocr_layout_embeddings(
                    batch["ocr_bboxes"].astype(jnp.int32))
            ocr = self.base.text_encoder.embeddings_apply(
                batch["ocr_input_ids"], None, deterministic, extra=extra)
            streams.append(ocr)
            stream_masks.append(batch.get(
                "ocr_input_mask", jnp.ones(ocr.shape[:2], jnp.int32)))

        visual_seq = jnp.concatenate(streams, axis=1)
        visual_mask = jnp.concatenate(stream_masks, axis=1)

        cross = self.base.forward_cross_encoder(
            text["sequence_output"], mask, visual_seq, visual_mask,
            deterministic=deterministic)

        out: Dict[str, Any] = {"cross_pooled": cross["cross_pooled"],
                               "text_embed": text["text_embed"]}
        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        lm_labels = batch.get("caption_lm_label_ids")
        if self.with_mlm and lm_labels is not None:
            table = self.base.text_encoder.variables["params"]["embeddings"][
                "word_embeddings"]["embedding"]
            logits = self.mlm_head(cross["cross_sequence"][:, :Lt], table)
            lm = MLMHead.loss_metric(logits, lm_labels)
            losses.update(lm["losses"])
            metrics.update(lm["metrics"])
            out["logits"] = logits
        if self.with_itm:
            labels = batch.get(
                "itm_labels", (jnp.arange(B) % 2).astype(jnp.int32))
            itm_logits = self.itm_head(cross["cross_pooled"])
            lm = ITMHead.loss_metric(itm_logits, labels)
            losses.update(lm["losses"])
            metrics.update(lm["metrics"])
            out.setdefault("logits", itm_logits)
        if self.with_mrc and "region_to_predict" in batch and \
                "region_feature" in batch:
            # region states sit right after the text segment in the cross
            # sequence (streams are concatenated regions-first)
            R = batch["region_feature"].shape[1]
            region_states = cross["cross_sequence"][:, Lt: Lt + R]
            mrc_logits = self.mrc_head(region_states)
            mrc = self.mrc_head.loss_metric(
                mrc_logits, batch["region_to_predict"],
                batch["region_cls_dis"])
            losses.update(mrc["losses"])
            metrics.update(mrc["metrics"])
            out["mrc_logits"] = mrc_logits
        out["losses"] = losses
        out["metrics"] = metrics
        return out
