"""UniVL-family video/image-text models: two-tower retrieval + cross-encoder.

Reference parity (``/root/reference/prj/base_vtp/roi_univl/univl/model/``):
  * ``UnivlVideoBase`` (univl_video_base.py:14-317): TextEncoder + VisualEncoder
    towers, frame→clip mean-pool (:91-97), shared cross-encoder input splice
    (:178-204 token-type + SEP splice);
  * ``UnivlForVideoTextRetrieval`` (univl_video_ret.py:16-520): L1 two-tower
    similarity with clip logsumexp (:345-355), L2 cross-encoder similarity,
    MIL-NCE / CrossEn / NegNCE losses (:146-197; dmae_utils.py:528-563), global
    negatives across replicas (:91-144).

TPU-native design decisions:
  * frames fold into the batch dim for the ViT pass (one big MXU-friendly
    matmul stream), then unfold for clip pooling — same trick as the reference's
    clip-batch folding (univl_video_base.py:84-89) but jit-static;
  * **global-batch negatives need no explicit gather**: the train step runs under
    pjit over the global batch, so ``text @ videoᵀ`` *is* the global similarity
    matrix — XLA inserts the all-gather of the small [B, D] embeddings over ICI
    (the M2-Encoder "grouped aggregation" memory trick is the sharded variant in
    ``antmmf_tpu/parallel/contrastive.py``);
  * the learnable temperature is an fp32 param with CLIP-style clamping.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.modules.encoders.text_encoder import (
    PRESETS as BERT_PRESETS,
    BertEncoder,
)
from antmmf_tpu.modules.layers import make_attention_mask
from antmmf_tpu.modules.losses.contrastive import (
    mil_nce,
    neg_nce,
    symmetric_cross_en,
)
from antmmf_tpu.modules.transformers.base import TransformerEncoder
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True) + eps)


class UnivlVideoBase(nn.Module):
    """Shared towers used by retrieval / pretraining variants."""

    # visual tower
    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    # text tower
    bert_preset: str = "bert_base"
    max_text_len: int = 30
    # shared space
    embed_dim: int = 512
    n_clips: int = 1
    # cross encoder (L2/L3 path)
    with_cross_encoder: bool = False
    cross_layers: int = 2
    dropout: float = 0.0
    remat: bool = False
    use_pallas: bool = True
    # sequence parallelism for the visual token stream over the mesh `seq`
    # axis (projects/base_vtp/configs/long_video.yml)
    sequence_parallel: str = "none"
    # ToMe token merging in the ViT (serving speedup; modules/vision/
    # token_merging.py)
    token_merge_r: int = 0
    # fold the BERT stack into one nn.scan body (deep-stack compile lever)
    scan_layers: bool = False
    # GPipe the BERT layer stack over the mesh `model` axis (absent in the
    # reference — SURVEY §2.3 design-in-anyway; pairs with pipelined_lm)
    pipeline_stages: int = 1
    pipeline_microbatches: int = 4
    dtype_str: str = "bfloat16"

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_str)

    def setup(self) -> None:
        vit_kw = dict(VIT_PRESETS[self.vit_preset])
        self.img_encoder = VisionTransformer(
            image_size=self.image_size, dropout=self.dropout, remat=self.remat,
            use_pallas=self.use_pallas,
            sequence_parallel=self.sequence_parallel,
            token_merge_r=self.token_merge_r, dtype=self.dtype, **vit_kw,
        )
        bert_kw = dict(BERT_PRESETS[self.bert_preset])
        hidden = bert_kw.pop("hidden_size")
        self.text_encoder = BertEncoder(
            hidden_size=hidden, dropout=self.dropout, remat=self.remat,
            scan_layers=self.scan_layers,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            use_pallas=self.use_pallas, dtype=self.dtype, **bert_kw,
        )
        self.text_hidden = hidden
        self.visual_hidden = vit_kw["embed_dim"]
        self.img_fc = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="img_fc")
        self.text_fc = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                                param_dtype=jnp.float32, name="text_fc")
        if self.with_cross_encoder:
            width = max(self.text_hidden, self.visual_hidden)
            self.cross_width = width
            self.cross_text_proj = nn.Dense(width, dtype=self.dtype,
                                            param_dtype=jnp.float32)
            self.cross_visual_proj = nn.Dense(width, dtype=self.dtype,
                                              param_dtype=jnp.float32)
            self.cross_type_embed = nn.Embed(2, width, dtype=self.dtype,
                                             param_dtype=jnp.float32)
            self.cross_encoder = TransformerEncoder(
                num_layers=self.cross_layers,
                num_heads=max(1, width // 64),
                norm_style="post", final_norm=False, dropout=self.dropout,
                remat=self.remat, use_pallas=self.use_pallas,
                # the L2 pair stream (Lt + F·Lv tokens) is where long-video
                # sequence parallelism pays off
                sequence_parallel=self.sequence_parallel, dtype=self.dtype,
            )
            self.cross_pooler = nn.Dense(width, dtype=self.dtype,
                                         param_dtype=jnp.float32)
            # trained L2 match score over the cross-pooled pair feature
            self.cross_sim_head = nn.Dense(1, dtype=jnp.float32,
                                           param_dtype=jnp.float32)

    # ------------------------------------------------------------------ towers
    def forward_img_encoder(
        self, image_data: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """image_data float[B, F, H, W, 3] → clip_embed [B, n_clips, D] (+tokens).

        Frames fold into the batch dim; frame→clip mean pooling follows
        (univl_video_base.py:84-97).
        """
        B, F = image_data.shape[0], image_data.shape[1]
        flat = image_data.reshape((B * F,) + image_data.shape[2:])
        enc = self.img_encoder(flat, deterministic=deterministic)
        pooled = enc["pooled"].reshape(B, F, -1)  # [B, F, C]
        fpc = F // self.n_clips  # frames per clip (static)
        clip_feat = pooled.reshape(B, self.n_clips, fpc, -1).mean(axis=2)
        clip_embed = l2_normalize(self.img_fc(clip_feat))
        tokens = enc["sequence"].reshape(B, F, enc["sequence"].shape[1], -1)
        return {"clip_embed": clip_embed, "frame_pooled": pooled,
                "visual_tokens": tokens}

    def forward_text_encoder(
        self,
        input_ids: jnp.ndarray,
        input_mask: jnp.ndarray,
        segment_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        enc = self.text_encoder(input_ids, input_mask, segment_ids,
                                deterministic=deterministic)
        text_embed = l2_normalize(self.text_fc(enc["pooled_output"]))
        return {"text_embed": text_embed,
                "sequence_output": enc["sequence_output"],
                "pooled_output": enc["pooled_output"]}

    # ----------------------------------------------------------- cross encoder
    def forward_cross_encoder(
        self,
        text_seq: jnp.ndarray,  # [B, Lt, Ct]
        text_mask: jnp.ndarray,  # [B, Lt]
        visual_seq: jnp.ndarray,  # [B, Lv, Cv]
        visual_mask: jnp.ndarray,  # [B, Lv]
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Concatenate modality streams with type embeddings (SEP-splice analogue,
        univl_video_base.py:178-204) and run the shared encoder."""
        t = self.cross_text_proj(text_seq) + self.cross_type_embed(
            jnp.zeros(text_seq.shape[:2], jnp.int32))
        v = self.cross_visual_proj(visual_seq) + self.cross_type_embed(
            jnp.ones(visual_seq.shape[:2], jnp.int32))
        x = jnp.concatenate([t, v], axis=1)
        mask = jnp.concatenate([text_mask, visual_mask], axis=1)
        bias = make_attention_mask(mask)
        seq = self.cross_encoder(x, bias=bias, deterministic=deterministic)
        pooled = jnp.tanh(self.cross_pooler(seq[:, 0]))
        return {"cross_sequence": seq, "cross_pooled": pooled, "cross_mask": mask}

    def cross_pair_scores(
        self,
        text_seq: jnp.ndarray,  # [P, Lt, Ct]
        text_mask: jnp.ndarray,
        visual_seq: jnp.ndarray,  # [P, Lv, Cv]
        visual_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Trained L2 match score per (text, video) pair → f32[P]."""
        cross = self.forward_cross_encoder(
            text_seq, text_mask, visual_seq, visual_mask,
            deterministic=deterministic)
        return self.cross_sim_head(
            cross["cross_pooled"].astype(jnp.float32))[..., 0]


def _univl_dispatch(config):
    """The reference's ``Univl`` model dispatches on its task config
    (univl_model.py:16). ``training_stage`` picks the concrete family:
    pretraining | retrieval | classification | mcqa | caption | roi."""
    from antmmf_tpu.common.registry import registry as _r

    stage = dict(config or {}).get("training_stage", "retrieval")
    name = {
        "pretraining": "univl_pretrain",
        "pretrain": "univl_pretrain",
        "retrieval": "univl_retrieval",
        "classification": "univl_classification",
        "mcqa": "univl_mcqa",
        "caption": "univl_caption",
        "generation": "univl_caption",
        "roi": "univl_roi",
    }.get(stage)
    if name is None:
        raise KeyError(f"Unknown univl training_stage {stage!r}")
    cls = _r.get_model_class(name)
    cfg = {k: v for k, v in dict(config).items() if k != "training_stage"}
    return cls.from_config(cfg)


@registry.register_model("univl_auto")
class UnivlDispatch(BaseModel):
    """Config-dispatched UniVL entry point (see ``_univl_dispatch``)."""

    @classmethod
    def from_config(cls, config):
        return _univl_dispatch(config)

    @classmethod
    def for_test(cls, config):
        return _univl_dispatch(config)


@registry.register_model("univl_retrieval")
@registry.register_model("univl")
class UnivlForVideoTextRetrieval(BaseModel):
    """Two-tower (L1) + optional cross-encoder (L2) retrieval.

    Output surface (§8.3 contract): ``l1_simi`` [Bt, Bv] (clip-logsumexp),
    ``sim`` alias, ``text_embed``/``visual_embed`` for corpus eval, plus
    ``losses.level1_similarity_loss`` (+``level2_similarity_loss`` when the
    cross-encoder is on).
    """

    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    bert_preset: str = "bert_base"
    max_text_len: int = 30
    embed_dim: int = 512
    n_clips: int = 1
    with_cross_encoder: bool = False
    cross_layers: int = 2
    # in-step hard-negative mining for the L2 cross-encoder: each text row
    # cross-encodes only its positive + (k-1) hardest L1 negatives — B·k pairs
    # instead of the B² grid (reference _cross_similarity_hard_mining,
    # univl_video_ret.py:91-144, re_sample_method=top_k). 0 = full grid.
    hard_mining_k: int = 0
    dropout: float = 0.0
    loss_type: str = "cross_en"  # cross_en | mil_nce | neg_nce
    neg_nce_margin: float = 0.0
    neg_nce_weight: float = 1.0
    # MoCo-style negative queue (reference moco_utils.py:13-108 +
    # univl_video_ret.py:263-312): stale embeddings enlarge the negative set
    with_queue: bool = False
    queue_size: int = 4096
    # full MoCo: keys come from EMA momentum towers (reference moco_utils
    # momentum_update_key_encoder). The trainer owns the momentum param copy
    # (state.variables["momentum"]) and injects the key embeddings as
    # batch["_moco_key_text"/"_moco_key_video"]; EMA rate below.
    with_momentum: bool = False
    momentum: float = 0.999
    init_logit_scale: float = 2.6592  # ln(1/0.07)
    remat: bool = False
    use_pallas: bool = True
    sequence_parallel: str = "none"
    token_merge_r: int = 0
    scan_layers: bool = False
    pipeline_stages: int = 1
    pipeline_microbatches: int = 4
    dtype_str: str = "bfloat16"
    training_head_only: bool = False  # freeze towers (linear-probe style)

    def setup(self) -> None:
        self.base = UnivlVideoBase(
            vit_preset=self.vit_preset, image_size=self.image_size,
            bert_preset=self.bert_preset, max_text_len=self.max_text_len,
            embed_dim=self.embed_dim, n_clips=self.n_clips,
            with_cross_encoder=self.with_cross_encoder,
            cross_layers=self.cross_layers, dropout=self.dropout,
            remat=self.remat, use_pallas=self.use_pallas,
            sequence_parallel=self.sequence_parallel,
            token_merge_r=self.token_merge_r,
            scan_layers=self.scan_layers,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            dtype_str=self.dtype_str,
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.init_logit_scale), (),
            jnp.float32,
        )
        if self.with_queue:
            from antmmf_tpu.modules import moco

            self.text_queue = self.variable(
                "moco", "text_queue",
                lambda: moco.init_queue(self.queue_size, self.embed_dim,
                                        random_init=self.with_momentum, seed=1))
            self.video_queue = self.variable(
                "moco", "video_queue",
                lambda: moco.init_queue(self.queue_size, self.embed_dim,
                                        random_init=self.with_momentum, seed=2))

    # reference reads encoder_lr_decay from the MODEL config with default
    # 0.01 (univl_video_ret.py:482-520). Here the model field wins; the
    # training_parameters key is an alias; the default is OFF (1.0) so
    # from-scratch fixture configs keep full-lr towers — reference recipes
    # set model_attributes.<model>.encoder_lr_decay: 0.01 explicitly.
    encoder_lr_decay: float = 1.0

    def optimizer_lr_multipliers(self, tp):
        """Reference per-model optimizer grouping (univl_video_ret.py:482-520
        / univl_model.py:80-106): pretrained towers train at
        ``encoder_lr_decay``×lr while new heads get full lr. Consumed by
        BaseTrainer.load_optimizer; config lr_multipliers take precedence."""
        decay = float(self.encoder_lr_decay
                      if self.encoder_lr_decay != 1.0
                      else tp.get("encoder_lr_decay", 1.0) or 1.0)
        if decay == 1.0:
            return []
        return [[r"base/(img_encoder|text_encoder)/", decay]]

    def encode_text(self, batch: Mapping, deterministic: bool = True):
        return self.base.forward_text_encoder(
            batch["caption_input_ids"], batch["caption_input_mask"],
            batch.get("caption_segment_ids"), deterministic=deterministic,
        )

    def encode_video(self, batch: Mapping, deterministic: bool = True):
        return self.base.forward_img_encoder(
            batch["image_data"], deterministic=deterministic
        )

    def caption_hotflip_loss(
        self, batch: Mapping[str, Any], caption_embeds: jnp.ndarray
    ) -> jnp.ndarray:
        """L1 contrastive loss as a function of the caption word-embedding
        rows — the hook MMHotFlip differentiates to pick token flips
        (models/adversarial.py; reference mm_adversarial.py:283 attacks the
        text modality through the embedding layer)."""
        emb = self.base.text_encoder.embeddings(
            None, batch.get("caption_segment_ids"),
            inputs_embeds=caption_embeds, deterministic=True)
        seq = self.base.text_encoder.encoder_apply(
            emb, batch["caption_input_mask"], True)
        pooled = jnp.tanh(self.base.text_encoder.pooler_apply(seq[:, 0]))
        text_embed = l2_normalize(self.base.text_fc(pooled))
        video = self.encode_video(batch, deterministic=True)
        sim = self.similarity(text_embed, video["clip_embed"])
        return symmetric_cross_en(sim)

    def similarity(
        self, text_embed: jnp.ndarray, clip_embed: jnp.ndarray
    ) -> jnp.ndarray:
        """[Bt, D] × [Bv, n_clips, D] → [Bt, Bv] via logsumexp over clips
        (univl_video_ret.py:345-355)."""
        scale = jnp.exp(jnp.clip(self.logit_scale, 0.0, jnp.log(100.0)))
        sims = jnp.einsum("td,vcd->tvc", text_embed.astype(jnp.float32),
                          clip_embed.astype(jnp.float32))
        n_clips = sims.shape[-1]
        sim = jax.nn.logsumexp(sims * scale, axis=-1) - jnp.log(float(n_clips))
        return sim

    def __call__(
        self, batch: Mapping[str, Any], deterministic: bool = True
    ) -> Dict[str, Any]:
        text = self.encode_text(batch, deterministic)
        video = self.encode_video(batch, deterministic)
        text_embed = text["text_embed"]
        clip_embed = video["clip_embed"]
        if self.training_head_only:
            text_embed = jax.lax.stop_gradient(text_embed)
            clip_embed = jax.lax.stop_gradient(clip_embed)

        sim = self.similarity(text_embed, clip_embed)
        output: Dict[str, Any] = {
            "l1_simi": sim,
            "sim": sim,
            "text_embed": text_embed,
            "visual_embed": clip_embed.mean(axis=1),
            "logits": sim,
        }
        # the loss is cheap relative to the towers; emit it in eval too so the
        # single-batch validation at log_interval reports val loss (reference
        # base_trainer.py:805-814 behavior)
        losses: Dict[str, jnp.ndarray] = {}
        if self.with_queue:
            from antmmf_tpu.modules import moco

            scale = jnp.exp(jnp.clip(self.logit_scale, 0.0, jnp.log(100.0)))
            v_mean = clip_embed.mean(axis=1)
            # full-MoCo keys from the momentum towers when the trainer injects
            # them (univl_video_ret.py:270-312); else keys = online embeds
            key_text = batch.get("_moco_key_text")
            key_video = batch.get("_moco_key_video")
            if key_text is None:
                key_text = text_embed
            if key_video is None:
                key_video = v_mean
            key_text = jax.lax.stop_gradient(key_text.astype(jnp.float32))
            key_video = jax.lax.stop_gradient(key_video.astype(jnp.float32))
            tq, vq = self.text_queue, self.video_queue
            neg_inf = jnp.finfo(jnp.float32).min

            def moco_infonce(q, k_pos, queue_state):
                """q vs (its positive key + queue negatives) — the reference
                moco_loss form (pos logits column 0)."""
                negs, valid = moco.queue_negatives(queue_state)
                pos = jnp.sum(q.astype(jnp.float32) * k_pos, axis=-1,
                              keepdims=True) * scale
                neg = (q.astype(jnp.float32) @ negs.T.astype(jnp.float32)
                       ) * scale
                neg = jnp.where(valid[None, :], neg, neg_inf)
                logits = jnp.concatenate([pos, neg], axis=1)
                return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])

            losses["level1_similarity_loss"] = 0.5 * (
                moco_infonce(text_embed, key_video, vq.value)
                + moco_infonce(v_mean, key_text, tq.value))
            if not deterministic:
                tq.value = moco.enqueue(tq.value, key_text)
                vq.value = moco.enqueue(vq.value, key_video)
        elif self.loss_type == "mil_nce":
            eye = jnp.eye(sim.shape[0], sim.shape[1])
            losses["level1_similarity_loss"] = 0.5 * (
                mil_nce(sim, eye) + mil_nce(sim.T, eye.T)
            )
        elif self.loss_type == "neg_nce":
            losses["level1_similarity_loss"] = 0.5 * (
                neg_nce(sim, self.neg_nce_margin, self.neg_nce_weight)
                + neg_nce(sim.T, self.neg_nce_margin, self.neg_nce_weight)
            )
        else:
            losses["level1_similarity_loss"] = symmetric_cross_en(sim)

        if self.with_cross_encoder:
            B = text["sequence_output"].shape[0]
            vis_tokens = video["visual_tokens"]  # [B, F, Lv, C]
            F_, Lv = vis_tokens.shape[1], vis_tokens.shape[2]
            vis_seq = vis_tokens.reshape(B, F_ * Lv, -1)
            vis_mask = jnp.repeat(batch.get(
                "video_mask", jnp.ones((B, F_), jnp.int32)), Lv, axis=1)
            text_seq = text["sequence_output"]
            text_mask = batch["caption_input_mask"]
            k = min(self.hard_mining_k, B) if self.hard_mining_k > 0 else 0
            if not deterministic and k > 1:
                # L2 training with hard-negative mining: pair row i with its
                # positive + (k-1) hardest L1 negatives (stop-gradient sims).
                neg_inf = jnp.finfo(jnp.float32).min
                ranking = jax.lax.stop_gradient(sim)
                masked = ranking + jnp.eye(B) * neg_inf  # exclude the positive
                _, hard_idx = jax.lax.top_k(masked, k - 1)  # [B, k-1]
                cols = jnp.concatenate(
                    [jnp.arange(B)[:, None], hard_idx], axis=1)  # [B, k]
                t_rep = jnp.repeat(text_seq, k, axis=0)
                tm_rep = jnp.repeat(text_mask, k, axis=0)
                flat = cols.reshape(-1)
                v_sel = jnp.take(vis_seq, flat, axis=0)
                vm_sel = jnp.take(vis_mask, flat, axis=0)
                scores = self.base.cross_pair_scores(
                    t_rep, tm_rep, v_sel, vm_sel,
                    deterministic=deterministic).reshape(B, k)
                # positive sits in column 0 of each mined row
                logp = jax.nn.log_softmax(scores, axis=-1)
                losses["level2_similarity_loss"] = -jnp.mean(logp[:, 0])
                output["l2_pair_scores"] = scores
                output["l2_pair_cols"] = cols
            else:
                # full B×B pair grid through the cross encoder (folded into
                # the batch dim — the reference's _cross_similarity, chunked
                # there on CPU, univl_video_ret.py:33). Used for eval and as
                # the training fallback when mining is off.
                t_rep = jnp.repeat(text_seq, B, axis=0)  # pair (i, j) = i*B+j
                tm_rep = jnp.repeat(text_mask, B, axis=0)
                v_til = jnp.tile(vis_seq, (B, 1, 1))
                vm_til = jnp.tile(vis_mask, (B, 1))
                l2 = self.base.cross_pair_scores(
                    t_rep, tm_rep, v_til, vm_til,
                    deterministic=deterministic).reshape(B, B)
                output["l2_simi"] = l2
                losses["level2_similarity_loss"] = symmetric_cross_en(l2)
            output["text_seq"] = text_seq
            output["visual_tokens"] = vis_tokens
        return {**output, "losses": losses}
