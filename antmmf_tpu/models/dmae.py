"""DMAE: dual-modal attention-enhanced retrieval (ACM MM'23) — WTI token-wise
interaction, NegNCE hard-negative loss, and TPM-CL token-importance selection.

Reference parity: ``/root/reference/prj/dmae_vtp/roi_univl/univl/model/
dmae_utils.py`` — ``DmaeUtils`` WTI weighted token-wise interaction (:85-185),
seqTransf temporal head, ``CrossEn:528`` / ``NegNCE:539`` — and
``tpmcl_utils.py`` (token-importance selector with attention X-weight
predictors). Monitored metric name pattern kept: ``l3_simi_t2v-*``.

WTI semantics (from the DMAE/"Disentangled Representation Learning" line of
work): per-token text/video representations are compared all-pairs; each text
token takes its max-similarity video token (and vice versa), and the token
contributions are combined with learned softmax weights:

    sim(t, v) = 0.5 * [ Σ_i w_t(i) · max_j c(i, j) + Σ_j w_v(j) · max_i c(i, j) ]
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import UnivlVideoBase, l2_normalize
from antmmf_tpu.modules.losses.contrastive import neg_nce_dmae, symmetric_cross_en
from antmmf_tpu.modules.transformers.base import TransformerEncoder

Dtype = Any


def wti_similarity(
    text_tokens: jnp.ndarray,  # [Bt, Lt, D] L2-normalised
    text_weights: jnp.ndarray,  # [Bt, Lt] softmax over valid tokens
    video_tokens: jnp.ndarray,  # [Bv, Lv, D]
    video_weights: jnp.ndarray,  # [Bv, Lv]
    text_mask: jnp.ndarray,  # [Bt, Lt]
    video_mask: jnp.ndarray,  # [Bv, Lv]
) -> jnp.ndarray:
    """Weighted token-wise interaction sim matrix [Bt, Bv].

    Masking matches the reference exactly (dmae_utils.py:92-96): invalid
    token pairs are ZEROED before the max (not -inf-filled), so a word whose
    frame sims are all negative contributes 0 — the reference's floor."""
    c = jnp.einsum("tld,vmd->tvlm", text_tokens.astype(jnp.float32),
                   video_tokens.astype(jnp.float32))
    c = c * text_mask[:, None, :, None].astype(jnp.float32)
    c = c * video_mask[None, :, None, :].astype(jnp.float32)
    t2v = jnp.max(c, axis=-1)  # [Bt, Bv, Lt]
    sim_t2v = jnp.einsum("tvl,tl->tv", t2v, text_weights.astype(jnp.float32))
    v2t = jnp.max(c, axis=-2)  # [Bt, Bv, Lv]
    sim_v2t = jnp.einsum("tvm,vm->tv", v2t, video_weights.astype(jnp.float32))
    return 0.5 * (sim_t2v + sim_v2t)


class TokenWeightHead(nn.Module):
    """Predict per-token importance weights (TPM-CL X-weight predictor)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        logits = nn.Dense(1, dtype=jnp.float32, name="weight_proj")(
            tokens.astype(jnp.float32))[..., 0]
        logits = jnp.where(mask > 0, logits, jnp.finfo(jnp.float32).min)
        return jax.nn.softmax(logits, axis=-1)


@registry.register_model("dmae_retrieval")
@registry.register_model("dmae")
class DmaeForVideoTextRetrieval(BaseModel):
    """Two-tower + WTI fine-grained interaction (+ seqTransf temporal encoder).

    Outputs: ``l1_simi`` (pooled two-tower), ``l3_simi`` (WTI) and losses
    ``level1_similarity_loss`` (CrossEn) + ``level3_similarity_loss`` (NegNCE).
    """

    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    bert_preset: str = "bert_base"
    max_text_len: int = 30
    embed_dim: int = 512
    n_clips: int = 1
    temporal_layers: int = 2  # seqTransf over frame tokens
    dropout: float = 0.0
    neg_nce_margin: float = 0.0
    neg_nce_weight: float = 1.0
    l3_weight: float = 1.0
    init_logit_scale: float = 2.6592
    remat: bool = False
    use_pallas: bool = True
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        self.base = UnivlVideoBase(
            vit_preset=self.vit_preset, image_size=self.image_size,
            bert_preset=self.bert_preset, max_text_len=self.max_text_len,
            embed_dim=self.embed_dim, n_clips=self.n_clips,
            dropout=self.dropout, remat=self.remat, use_pallas=self.use_pallas,
            dtype_str=self.dtype_str,
        )
        # seqTransf: small temporal transformer over per-frame pooled features
        self.temporal_encoder = TransformerEncoder(
            num_layers=self.temporal_layers,
            num_heads=max(1, self.embed_dim // 64), norm_style="pre",
            final_norm=True, dtype=dtype)
        self.frame_fc = nn.Dense(self.embed_dim, use_bias=False, dtype=dtype)
        self.token_fc = nn.Dense(self.embed_dim, use_bias=False, dtype=dtype)
        self.text_weight_head = TokenWeightHead()
        self.video_weight_head = TokenWeightHead()
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.init_logit_scale), (),
            jnp.float32)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        text = self.base.forward_text_encoder(
            batch["caption_input_ids"], batch["caption_input_mask"],
            batch.get("caption_segment_ids"), deterministic=deterministic)
        video = self.base.forward_img_encoder(
            batch["image_data"], deterministic=deterministic)

        scale = jnp.exp(jnp.clip(self.logit_scale, 0.0, jnp.log(100.0)))

        # ---- L1: pooled two-tower with seqTransf temporal aggregation
        frames = self.frame_fc(video["frame_pooled"])  # [B, F, D]
        B, F = frames.shape[:2]
        video_mask = batch.get("video_mask", jnp.ones((B, F), jnp.int32))
        from antmmf_tpu.modules.layers import make_attention_mask

        frames_t = self.temporal_encoder(
            frames, bias=make_attention_mask(video_mask),
            deterministic=deterministic) + frames  # residual (CLIP4Clip seqTransf)
        denom = jnp.maximum(video_mask.sum(-1, keepdims=True), 1)
        v_pooled = l2_normalize((frames_t * video_mask[..., None]).sum(1) / denom)
        t_pooled = text["text_embed"]
        l1 = (t_pooled.astype(jnp.float32) @ v_pooled.astype(jnp.float32).T) * scale

        # ---- L3: WTI fine-grained token interaction
        text_tokens = l2_normalize(self.token_fc(text["sequence_output"]))
        video_tokens = l2_normalize(frames_t)
        text_mask = batch["caption_input_mask"]
        tw = self.text_weight_head(text["sequence_output"], text_mask)
        vw = self.video_weight_head(frames_t, video_mask)
        l3 = wti_similarity(text_tokens, tw, video_tokens, vw,
                            text_mask, video_mask) * scale

        losses = {
            "level1_similarity_loss": symmetric_cross_en(l1),
            # reference NegNCE form (dmae_utils.py:539-563); l3 already
            # carries the learnable logit scale, so the internal scale is 1
            "level3_similarity_loss": self.l3_weight * 0.5 * (
                neg_nce_dmae(l3, logit_scale=1.0, c_neg=self.neg_nce_weight,
                             margin=self.neg_nce_margin)
                + neg_nce_dmae(l3.T, logit_scale=1.0,
                               c_neg=self.neg_nce_weight,
                               margin=self.neg_nce_margin)),
        }
        return {
            "l1_simi": l1, "l3_simi": l3, "sim": l3, "logits": l3,
            "text_embed": t_pooled, "visual_embed": v_pooled,
            # WTI components for the corpus-level L3 evaluation (the dmae
            # monitored metric val/l3_simi_t2v-mean_recall; the retrieval
            # trainer caches these and scores the full grid chunked)
            "wti_text_tokens": text_tokens, "wti_text_weights": tw,
            "wti_video_tokens": video_tokens, "wti_video_weights": vw,
            "wti_text_mask": text_mask, "wti_video_mask": video_mask,
            "losses": losses,
        }
