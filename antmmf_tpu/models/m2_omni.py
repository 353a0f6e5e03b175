"""M2-omni: omni-modal LLM (image/video/audio/text in → text out).

Reference parity: ``/root/reference/prj/M2_omni/models/`` —
``modeling_m2omni.py`` (866 LoC), ``modeling_llama_3d.py`` (3D-RoPE LLaMA),
``qwen2_vit.py`` (vision tower), ``sanm_audio.py`` (audio encoder). Fresh
TPU-first build:

  * a LLaMA-class decoder (``modules/llm.DecoderLM``) with **3D RoPE**: vision
    tokens carry (t, h, w) rotary coordinates, text/audio tokens carry
    (p, p, p);
  * a ViT vision tower + linear projector; an audio encoder (conv subsample +
    transformer, SANM-class) + projector;
  * prefix-style fusion: [vision tokens][audio tokens][text tokens] in one
    causal stream; LM loss on text positions only.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.modules.llm import DecoderLM, RMSNorm
from antmmf_tpu.modules.qdense import QuantDense
from antmmf_tpu.parallel.partitioning import shard_vocab_dim
from antmmf_tpu.modules.transformers.base import TransformerEncoder
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any

# serving-time decode programs, memoized per (module config, shapes,
# options) — see M2Omni.generate
_GEN_JIT_CACHE: Dict[Any, Any] = {}

LM_PRESETS = {
    "omni_tiny_test": dict(hidden=64, num_layers=2, num_heads=2, num_kv_heads=1,
                           vocab_size=1000),
    "omni_1b": dict(hidden=2048, num_layers=22, num_heads=16, num_kv_heads=4,
                    vocab_size=151936),
    "omni_7b": dict(hidden=4096, num_layers=32, num_heads=32, num_kv_heads=8,
                    vocab_size=151936),
}


class AudioEncoder(nn.Module):
    """SANM-class: 2× conv subsampling over fbank frames + transformer."""

    hidden: int = 256
    num_layers: int = 4
    num_heads: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fbank: jnp.ndarray, deterministic: bool = True):
        """fbank float[B, T, F] → [B, T/4, hidden]."""
        x = fbank[..., None].astype(self.dtype)
        for i in range(2):
            x = nn.Conv(self.hidden // (2 - i), (3, 3), strides=(2, 2),
                        dtype=self.dtype, name=f"subsample{i}")(x)
            x = nn.relu(x)
        B, T, F_, C = x.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, name="proj")(
            x.reshape(B, T, F_ * C))
        return TransformerEncoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            norm_style="pre", final_norm=True, dtype=self.dtype,
            name="encoder")(x, deterministic=deterministic)


@registry.register_model("m2_omni")
class M2Omni(BaseModel):
    lm_preset: str = "omni_1b"
    # visual tower family: "vit" (CLIP-style, legacy) or "qwen2" — the
    # faithful reference tower (qwen2_vit.py Qwen2ViT: conv3d patchify, 2D
    # rope, temporal-group attention, PatchMerger; parity in
    # tests/test_qwen2_vit_parity.py, import via convert_checkpoint
    # --arch qwen2_vit)
    visual_tower: str = "vit"
    vit_preset: str = "vit_base_patch32"
    qwen2_preset: str = "qwen2_vit"
    image_size: int = 224
    # audio tower family: "conv" (generic conv+transformer, legacy) or
    # "sanm" — the faithful reference tower (sanm_audio.py SANMEncoder,
    # funasr schema; parity in tests/test_sanm_parity.py; import via
    # convert_checkpoint --arch sanm) with the reference post-processing:
    # 3× frame compression + linear_proj_audio MLP + L2 normalize
    # (modeling_m2omni.py:640-693)
    audio_tower: str = "conv"
    sanm_preset: str = "bailing2_audio"
    audio_compress: int = 3
    mlp_depths: int = 1
    audio_hidden: int = 256
    max_vision_tokens: int = 256
    # in-text placeholder splicing (reference prompt_wrap_image/video/audio,
    # modeling_m2omni.py:695-771): when set, <image>/<video>/<audio>
    # placeholder ids inside input_ids are REPLACED by the modality
    # embeddings (the processor must expand each tag to exactly the
    # modality token count); when None, modality segments are prepended
    # (legacy layout). video_token_id mirrors the reference's
    # frame_patch_token: a video is a separate pixel stream
    # (batch["video_data"]) spliced at its own placeholder id with its own
    # (t, h, w) grid positions.
    image_token_id: Optional[int] = None
    audio_token_id: Optional[int] = None
    video_token_id: Optional[int] = None
    # Reference quirk (get_rope_index, modeling_m2omni.py:398-404):
    # image_nums is only counted when video_grid_thw is None, so in a row
    # that mixes images WITH a video the image runs silently degrade to
    # sequential 1-D text positions (only video runs get 3D grids).
    # False (default) reproduces that behavior for checkpoint parity;
    # True gives image runs their 3D grids in mixed rows (the documented
    # intent).
    mixed_vision_grid_positions: bool = False
    # LoRA on the decoder projections (reference wrap_llm_lora,
    # modeling_m2omni.py:311-326); 0 = off. llm_lora_targets "qv" is the
    # lightweight default; "all" matches the reference recipe exactly
    # (q/k/v/o + gate/up/down)
    llm_lora_rank: int = 0
    llm_lora_targets: str = "qv"
    # LoRA on the Qwen2-ViT tower blocks (reference wrap_vit_lora,
    # modeling_m2omni.py:301-309: qkv/proj/fc1/fc2); 0 = off
    vit_lora_rank: int = 0
    # rematerialize decoder layers in the training forward (see
    # modules/llm.DecoderLM.remat) — the memory knob for 1B-class LoRA
    # finetuning on a 16 GB chip; no effect on the cached decode paths
    remat: bool = False
    # fold decoder layers into one nn.scan body (see
    # modules/llm.DecoderLM.scan_layers) — the production-scale
    # memory/compile structure; params live under decoder/layers/
    # with a leading [num_layers] dim (stack imported per-layer
    # checkpoints with modules.llm.stack_decoder_layers)
    scan_layers: bool = False
    # sequence parallelism for the decoder's training forward over the mesh
    # `seq` axis: "none" | "ring" | "ulysses" (see modules/llm.DecoderLM).
    # The long-video escape hatch — >16k-token multi-frame streams shard
    # their sequence over ICI instead of OOMing one chip
    sequence_parallel: str = "none"
    # 3D mrope (the reference scheme) — False degrades to 1D rotary over
    # the sequential positions; ablation knob for MFU attribution
    # (bench_llm_train m2omni_1d leg), NOT checkpoint-compatible
    rope_3d: bool = True
    dtype_str: str = "bfloat16"
    # int8 KV cache for generate/serving: halves the per-step HBM cache read
    # (see modules/llm.init_decoder_cache); tokens may differ slightly from
    # the bf16 cache (quantization), gate per deployment
    kv_int8: bool = False

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        p = LM_PRESETS[self.lm_preset]
        self.hidden = p["hidden"]
        self.vocab_size = p["vocab_size"]
        self.token_embed = nn.Embed(self.vocab_size, self.hidden, dtype=dtype,
                                    param_dtype=jnp.float32)
        if self.llm_lora_targets not in ("qv", "all"):
            raise ValueError(
                f"llm_lora_targets must be 'qv' or 'all', got "
                f"{self.llm_lora_targets!r}")
        all_tgt = self.llm_lora_targets == "all"
        self.decoder = DecoderLM(
            num_layers=p["num_layers"], num_heads=p["num_heads"],
            num_kv_heads=p["num_kv_heads"], rope_3d=self.rope_3d,
            lora_rank=self.llm_lora_rank,
            lora_targets=("q", "k", "v", "o") if all_tgt else ("q", "v"),
            lora_mlp=all_tgt, remat=self.remat, scan_layers=self.scan_layers,
            sequence_parallel=self.sequence_parallel, dtype=dtype)
        if self.visual_tower == "qwen2":
            from antmmf_tpu.modules.vision.qwen2_vit import build_qwen2_vit

            # reference wiring (modeling_m2omni.py:255-267): the PatchMerger
            # outputs vit_hidden_size; linear_proj = Linear +
            # (mlp_depths-1)×[GELU, Linear] maps into the LM width, then
            # F.normalize (extract_image_feature, :652-660)
            self.vision_tower = build_qwen2_vit(
                self.qwen2_preset, image_size=self.image_size,
                lora_rank=self.vit_lora_rank, remat=self.remat, dtype=dtype)
            self.vision_proj = [nn.Dense(self.hidden, dtype=dtype,
                                         param_dtype=jnp.float32)
                                for _ in range(self.mlp_depths)]
        elif self.visual_tower == "vit":
            # model-level remat covers the tower too: at dense video
            # sampling the frames fold into the tower batch (48+ frames)
            # and the un-remat'd per-layer attention probs alone are
            # ~0.9 GB/layer f32 — the long-video OOM
            self.vision_tower = VisionTransformer(
                image_size=self.image_size, dtype=dtype, remat=self.remat,
                **dict(VIT_PRESETS[self.vit_preset]))
            self.vision_proj = nn.Dense(self.hidden, dtype=dtype,
                                        param_dtype=jnp.float32)
        else:
            raise ValueError(
                f"visual_tower must be 'vit' or 'qwen2', got "
                f"{self.visual_tower!r}")
        if self.audio_tower == "sanm":
            from antmmf_tpu.modules.encoders.sanm_audio import (
                build_sanm_encoder)

            self.audio_encoder = build_sanm_encoder(self.sanm_preset,
                                                    dtype=dtype)
            # reference linear_proj_audio: Linear + (mlp_depths-1)×[GELU,
            # Linear] (modeling_m2omni.py:269-275)
            self.audio_proj = [nn.Dense(self.hidden, dtype=dtype,
                                        param_dtype=jnp.float32)
                               for _ in range(self.mlp_depths)]
        elif self.audio_tower == "conv":
            self.audio_encoder = AudioEncoder(hidden=self.audio_hidden,
                                              dtype=dtype)
            self.audio_proj = nn.Dense(self.hidden, dtype=dtype,
                                       param_dtype=jnp.float32)
        else:
            raise ValueError(
                f"audio_tower must be 'conv' or 'sanm', got "
                f"{self.audio_tower!r}")
        # QuantDense == nn.Dense(use_bias=False) at init/train; at serving
        # it can consume int4-packed weights (modules/qdense.py) — the
        # vocab projection is ~20% of decode weight bytes
        self.lm_head = QuantDense(self.vocab_size, dtype=dtype,
                                  param_dtype=jnp.float32)

    def _audio_tokens(self, batch: Mapping[str, Any],
                      deterministic: bool) -> jnp.ndarray:
        """audio fbank [B, T, F] (+ optional 'audio_mask' [B, T]) →
        LM-space audio tokens [B, Ta, hidden]."""
        feats = batch["audio"]
        if self.audio_tower == "sanm":
            from antmmf_tpu.modules.encoders.sanm_audio import (
                compress_audio_tokens)

            enc = self.audio_encoder(feats, batch.get("audio_mask"),
                                     deterministic=deterministic)
            x = compress_audio_tokens(enc, self.audio_compress)
            for i, layer in enumerate(self.audio_proj):
                if i:
                    x = nn.gelu(x, approximate=False)
                x = layer(x)
            # reference F.normalize(audio_embeds, dim=-1)
            # (modeling_m2omni.py:693)
            norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True)
            return (x.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(
                x.dtype)
        return self.audio_proj(self.audio_encoder(
            feats, deterministic=deterministic))

    def _vision_tokens(self, images: jnp.ndarray, deterministic: bool):
        """images [B, F, H, W, 3] → (tokens [B, L, C], positions [B, L, 3])
        with (t, h, w) grid positions per the get_rope_index llm grids."""
        B, F = images.shape[:2]
        if self.visual_tower == "qwen2":
            out = self.vision_tower(images, deterministic=deterministic)
            x = out["sequence"]  # [B, t*gh*gw, vit_hidden]
            for i, layer in enumerate(self.vision_proj):
                if i:
                    x = nn.gelu(x, approximate=False)
                x = layer(x)
            # reference F.normalize(image_embeds) (modeling_m2omni.py:659)
            norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True)
            tokens = (x.astype(jnp.float32)
                      / jnp.maximum(norm, 1e-12)).astype(x.dtype)
            t, gh, gw = out["grid_thw"]
            t_pos = jnp.repeat(jnp.arange(t), gh * gw)
            h_pos = jnp.tile(jnp.repeat(jnp.arange(gh), gw), t)
            w_pos = jnp.tile(jnp.tile(jnp.arange(gw), gh), t)
            pos = jnp.stack([t_pos, h_pos, w_pos], axis=-1)
            L = tokens.shape[1]
            return tokens, jnp.broadcast_to(pos[None], (B, L, 3))
        flat = images.reshape((B * F,) + images.shape[2:])
        seq = self.vision_tower(flat, deterministic=deterministic)["sequence"]
        seq = seq[:, 1:]  # drop CLS
        N = seq.shape[1]
        hw = int(N ** 0.5)
        tokens = self.vision_proj(seq).reshape(B, F * N, self.hidden)
        t_pos = jnp.repeat(jnp.arange(F), N)
        h_pos = jnp.tile(jnp.repeat(jnp.arange(hw), hw), F)
        w_pos = jnp.tile(jnp.tile(jnp.arange(hw), hw), F)
        pos = jnp.stack([t_pos, h_pos, w_pos], axis=-1)  # [F*N, 3]
        return tokens, jnp.broadcast_to(pos[None], (B, F * N, 3))

    def _encode_visual_streams(self, data, deterministic: bool):
        """One or several visual streams → concatenated (tokens, positions).

        ``data`` is a single array [B, F, H, W, 3] (or [B, H, W, 3]) or a
        tuple/list of them — one entry per image/video in the row, encoded
        separately and concatenated in order, exactly how the reference
        concatenates per-image patch streams into one flat ``pixel_values``
        consumed by masked_scatter in placeholder reading order
        (prompt_wrap_image, modeling_m2omni.py:695-715). Each stream's grid
        positions start at (0, 0, 0); ``_modal_rel_positions`` re-bases per
        placeholder RUN, so streams and runs must align 1:1 (the processor
        separates runs with image_start/end tokens, as the reference
        format does)."""
        streams = data if isinstance(data, (tuple, list)) else (data,)
        toks, poss = [], []
        for img in streams:
            if img.ndim == 4:
                img = img[:, None]
            t, p = self._vision_tokens(img, deterministic)
            toks.append(t)
            poss.append(p)
        if len(toks) == 1:
            return toks[0], poss[0]
        return jnp.concatenate(toks, 1), jnp.concatenate(poss, 1)

    @staticmethod
    def _splice_embeds(text_embeds: jnp.ndarray, input_ids: jnp.ndarray,
                       token_id: int, modal_tokens: jnp.ndarray
                       ) -> jnp.ndarray:
        """Replace placeholder-token slots with modality embeddings
        (reference prompt_wrap, modeling_m2omni.py:695-771): the k-th
        placeholder slot in each row takes modal_tokens[:, k]."""
        mask = input_ids == token_id  # [B, L]
        k = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0,
                     modal_tokens.shape[1] - 1)  # [B, L]
        gathered = jnp.take_along_axis(
            modal_tokens, k[..., None], axis=1)  # [B, L, C]
        return jnp.where(mask[..., None], gathered, text_embeds)

    @staticmethod
    def _modal_rel_positions(mask: jnp.ndarray, modal_pos: jnp.ndarray
                             ) -> jnp.ndarray:
        """Per-slot RELATIVE 3D positions for a modality's placeholder slots:
        modal_pos of the k-th placeholder minus modal_pos at its RUN start,
        so each contiguous placeholder run restarts at (0, 0, 0). mask
        bool[B, L]; modal_pos int[B, Lm, 3] → rel int[B, L, 3] (0 off-run)."""
        B, L = mask.shape
        k = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0,
                     modal_pos.shape[1] - 1)  # [B, L]
        prev = jnp.concatenate(
            [jnp.zeros((B, 1), bool), mask[:, :-1]], axis=1)
        run_start = mask & ~prev
        # k at the most recent run start (valid wherever mask is set)
        k_start = jax.lax.cummax(jnp.where(run_start, k, -1), axis=1)
        gathered = jnp.take_along_axis(modal_pos, k[..., None], axis=1)
        base = jnp.take_along_axis(
            modal_pos, jnp.clip(k_start, 0)[..., None], axis=1)
        rel = gathered - base
        return jnp.where(mask[..., None], rel, 0), run_start

    @staticmethod
    def get_rope_index(modal_mask: jnp.ndarray, run_start: jnp.ndarray,
                       rel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """EXACT reference ``get_rope_index`` semantics
        (modeling_m2omni.py:327-494): positions advance sequentially; a text
        slot takes (base, base, base) and advances base by 1; a placeholder
        run's slots take run-start base + relative (t, h, w) grid positions,
        and the slot after the run resumes at run base + run max + 1.

        modal_mask bool[B, L] (True = placeholder slot, any modality);
        run_start bool[B, L] (True at the first slot of each run);
        rel int[B, L, 3] relative positions within each run (0 elsewhere).
        Returns (positions int[B, L, 3], next_base int[B] — the base after
        the final slot, i.e. the continuation position for incremental
        decoding, matching ``mrope_position_deltas``).

        CLOSED FORM, no serial scan: the reference recurrence is a per-slot
        base increment (+1 at text slots, +run_max+1 at run-END slots) whose
        prefix sum gives every base; the only run-global quantity (the run's
        max grid coordinate, read at its end slot) comes from a
        reset-at-run-start cummax built as ``cummax(value + run_id·K) -
        run_id·K`` (run_id is nondecreasing, so adding K per run makes
        earlier runs strictly smaller — an O(log L) segmented max with no
        scatter). The former ``lax.scan`` over L (kept below as
        ``get_rope_index_scan``, the equivalence oracle) serialized 16k
        tiny VPU steps per forward on long-video streams."""
        B, L = modal_mask.shape
        is_m = modal_mask
        rel = rel.astype(jnp.int32)
        curmax = jnp.max(rel, axis=-1)  # [B, L]
        rid = jnp.cumsum(run_start.astype(jnp.int32), axis=1)  # run ids ≥ 1
        # run end: last slot of a run (next slot starts a new run / is text)
        nxt_start = jnp.concatenate(
            [run_start[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
        nxt_mask = jnp.concatenate(
            [is_m[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
        run_end = is_m & (nxt_start | ~nxt_mask)
        # reset-cummax: K bounds grid coords (h, w ≤ 1k; t ≤ frames); rid·K
        # stays well inside int32 for L ≤ 32k
        K = jnp.int32(1 << 16)
        shifted = jnp.where(is_m, curmax, -1) + rid * K
        run_cummax = jax.lax.cummax(shifted, axis=1) - rid * K
        inc = jnp.where(is_m, 0, 1) + \
            jnp.where(run_end, run_cummax + 1, 0)
        after = jnp.cumsum(inc, axis=1)
        base_excl = after - inc  # base BEFORE each slot
        # run base per slot = base_excl at its run start (cummax-gather)
        idx = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        start_idx = jax.lax.cummax(jnp.where(run_start, idx, -1), axis=1)
        run_base = jnp.take_along_axis(
            base_excl, jnp.clip(start_idx, 0), axis=1)
        pos = jnp.where(is_m[..., None], run_base[..., None] + rel,
                        base_excl[..., None])
        return pos, after[:, -1]

    @staticmethod
    def get_rope_index_scan(modal_mask: jnp.ndarray, run_start: jnp.ndarray,
                            rel: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The direct ``lax.scan`` transcription of the reference recurrence
        — the equivalence oracle for the closed-form ``get_rope_index``
        (tests/test_rope_parity.py pins both)."""
        B, L = modal_mask.shape

        def step(carry, xs):
            base, run_base, run_max = carry
            is_m, is_start, rel_i = xs  # [B], [B], [B, 3]
            run_base = jnp.where(is_start, base, run_base)
            cur_max = jnp.max(rel_i, axis=-1)  # [B]
            run_max = jnp.where(
                is_start, cur_max,
                jnp.where(is_m, jnp.maximum(run_max, cur_max), run_max))
            pos_i = jnp.where(is_m[:, None], run_base[:, None] + rel_i,
                              base[:, None])
            base = jnp.where(is_m, run_base + run_max + 1, base + 1)
            return (base, run_base, run_max), pos_i

        init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), jnp.int32))
        (base, _, _), pos = jax.lax.scan(
            step, init,
            (modal_mask.T, run_start.T,
             rel.astype(jnp.int32).transpose(1, 0, 2)))
        return pos.transpose(1, 0, 2), base

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        input_ids = batch["input_ids"]  # int[B, Lt]
        text_mask = batch.get("input_mask", jnp.ones_like(input_ids))
        B, Lt = input_ids.shape

        if self.image_token_id is not None or self.audio_token_id is not None \
                or self.video_token_id is not None:
            return self._forward_spliced(batch, input_ids, text_mask,
                                         deterministic)

        embeds, positions, mask = self._assemble_prefix(
            batch, input_ids, text_mask, deterministic)
        hidden = self.decoder(embeds, positions, mask,
                              deterministic=deterministic)
        text_hidden = hidden[:, -Lt:]
        logits = shard_vocab_dim(
            self.lm_head(text_hidden)).astype(jnp.float32)  # [B, Lt, V]

        out: Dict[str, Any] = {"logits": logits, "hidden": text_hidden}
        out.update(self._lm_loss(logits, batch.get("labels")))
        return out

    def _assemble_prefix(self, batch: Mapping[str, Any],
                         input_ids: jnp.ndarray, text_mask: jnp.ndarray,
                         deterministic: bool):
        """Legacy prefix layout: [vision][audio][text] segments concatenated.
        Returns (embeds [B, L, C], positions int[B, L, 3], mask [B, L])."""
        B, Lt = input_ids.shape
        segments, seg_positions, seg_masks = [], [], []
        pos_offset = jnp.zeros((B,), jnp.int32)

        if "image_data" in batch and batch["image_data"] is not None:
            img = batch["image_data"]
            if img.ndim == 4:
                img = img[:, None]
            vtok, vpos = self._vision_tokens(img, deterministic)
            segments.append(vtok)
            seg_positions.append(vpos)
            seg_masks.append(jnp.ones(vtok.shape[:2], jnp.int32))
            pos_offset = pos_offset + jnp.max(vpos[..., 0], axis=-1) + 1

        if "audio" in batch and batch["audio"] is not None:
            atok = self._audio_tokens(batch, deterministic)
            La = atok.shape[1]
            apos = pos_offset[:, None] + jnp.arange(La)[None]
            segments.append(atok)
            seg_positions.append(jnp.repeat(apos[..., None], 3, axis=-1))
            seg_masks.append(jnp.ones((B, La), jnp.int32))
            pos_offset = pos_offset + La

        # feature-sharded reshard point: routes the embedding cotangent
        # through the [V, H/fsdp]-local form (see shard_vocab_dim)
        ttok = shard_vocab_dim(self.token_embed(input_ids))
        tpos = pos_offset[:, None] + jnp.arange(Lt)[None]
        segments.append(ttok)
        seg_positions.append(jnp.repeat(tpos[..., None], 3, axis=-1))
        seg_masks.append(text_mask.astype(jnp.int32))

        embeds = jnp.concatenate(segments, axis=1)
        positions = jnp.concatenate(seg_positions, axis=1)
        mask = jnp.concatenate(seg_masks, axis=1)
        return embeds, positions, mask

    def _lm_loss(self, logits: jnp.ndarray,
                 labels: Optional[jnp.ndarray]) -> Dict[str, Any]:
        if labels is None:  # next-token LM loss, -100/-1 = ignore
            return {}
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        valid = shift_labels >= 0
        safe = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, -1)
        nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        return {
            "losses": {"lm_loss": jnp.where(valid, nll, 0.0).sum() / denom},
            "metrics": {"lm_acc": jnp.where(
                valid, jnp.argmax(shift_logits, -1) == safe,
                False).sum() / denom},
        }

    def _lm_loss_chunked(self, hidden: jnp.ndarray, labels: jnp.ndarray,
                         chunk: int = 2048) -> Dict[str, Any]:
        """Numerically == ``_lm_loss(lm_head(hidden), labels)`` but the
        [B, L, V] logits tensor never exists: the shifted stream is folded
        into ``chunk``-token slices and ``lax.map`` computes per-slice
        (masked nll sum, correct count, valid count); the mapped backward
        recomputes per-slice logits, so fwd+bwd peak is O(B·chunk·V)."""
        # the lm_head param must exist under init before we read it raw
        _ = self.lm_head(hidden[:, :1])
        w = self.lm_head.get_variable("params", "kernel")  # [C, V]
        B, L, C = hidden.shape
        h = hidden[:, :-1]
        y = labels[:, 1:]
        pad = (-h.shape[1]) % chunk
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-1)
        n = h.shape[1] // chunk
        h = h.reshape(B, n, chunk, C).transpose(1, 0, 2, 3)  # [n, B, W, C]
        y = y.reshape(B, n, chunk).transpose(1, 0, 2)

        @jax.checkpoint
        def slice_stats(args):
            # rematerialized: lax.map's backward otherwise SAVES each
            # slice's [B, chunk, V] logits as scan residuals — ~6 GB at
            # 9.9k tokens, defeating the point of chunking
            hc, yc = args
            logits = shard_vocab_dim(
                hc.astype(self.lm_head.dtype)
                @ w.astype(self.lm_head.dtype)).astype(jnp.float32)
            valid = yc >= 0
            safe = jnp.where(valid, yc, 0)
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
            hit = jnp.argmax(logits, -1) == safe
            return (jnp.where(valid, nll, 0.0).sum(),
                    jnp.where(valid, hit, False).sum(),
                    valid.sum())

        nll_s, hit_s, cnt_s = jax.lax.map(slice_stats, (h, y))
        denom = jnp.maximum(cnt_s.sum(), 1)
        return {
            "losses": {"lm_loss": nll_s.sum() / denom},
            "metrics": {"lm_acc": hit_s.sum() / denom},
        }

    def _assemble_spliced(self, batch: Mapping[str, Any],
                          input_ids: jnp.ndarray,
                          deterministic: bool):
        """Interleaved layout: modality embeddings live INSIDE the text
        sequence at placeholder slots, so conversations like
        ``text <image>... text`` keep their order (reference prompt_wrap).
        Returns (embeds [B, L, C], positions int[B, L, 3], next_base int[B])
        with positions per the reference get_rope_index convention — each
        placeholder run restarts its (t, h, w) grid at the run's base."""
        B, L = input_ids.shape
        embeds = shard_vocab_dim(self.token_embed(input_ids))
        modal_mask = jnp.zeros((B, L), bool)
        run_start = jnp.zeros((B, L), bool)
        rel = jnp.zeros((B, L, 3), jnp.int32)

        has_video = (self.video_token_id is not None
                     and batch.get("video_data") is not None)
        if self.image_token_id is not None and \
                batch.get("image_data") is not None:
            vtok, vpos = self._encode_visual_streams(
                batch["image_data"], deterministic)
            embeds = self._splice_embeds(
                embeds, input_ids, self.image_token_id,
                vtok.astype(embeds.dtype))
            # reference quirk: in a mixed image+video row, only VIDEO runs
            # get 3D grid positions — image slots stay sequential text
            # positions (get_rope_index counts image_nums only when
            # video_grid_thw is None, modeling_m2omni.py:398-404)
            if not has_video or self.mixed_vision_grid_positions:
                m = input_ids == self.image_token_id
                r, rs = self._modal_rel_positions(m, vpos)
                modal_mask, run_start, rel = \
                    modal_mask | m, run_start | rs, rel + r
        if has_video:
            vtok, vpos = self._encode_visual_streams(
                batch["video_data"], deterministic)
            embeds = self._splice_embeds(
                embeds, input_ids, self.video_token_id,
                vtok.astype(embeds.dtype))
            m = input_ids == self.video_token_id
            r, rs = self._modal_rel_positions(m, vpos)
            modal_mask, run_start, rel = \
                modal_mask | m, run_start | rs, rel + r
        if self.audio_token_id is not None and batch.get("audio") is not None:
            atok = self._audio_tokens(batch, deterministic)
            apos = jnp.repeat(
                jnp.broadcast_to(jnp.arange(atok.shape[1])[None],
                                 atok.shape[:2])[..., None], 3, -1)
            embeds = self._splice_embeds(
                embeds, input_ids, self.audio_token_id,
                atok.astype(embeds.dtype))
            m = input_ids == self.audio_token_id
            r, rs = self._modal_rel_positions(m, apos)
            modal_mask, run_start, rel = modal_mask | m, run_start | rs, rel + r

        positions, next_base = self.get_rope_index(modal_mask, run_start, rel)
        return embeds, positions, next_base

    def _forward_spliced(self, batch: Mapping[str, Any],
                         input_ids: jnp.ndarray, text_mask: jnp.ndarray,
                         deterministic: bool) -> Dict[str, Any]:
        embeds, positions, _ = self._assemble_spliced(
            batch, input_ids, deterministic)
        hidden = self.decoder(embeds, positions,
                              text_mask.astype(jnp.int32),
                              deterministic=deterministic)
        labels = batch.get("labels")
        L, V = hidden.shape[1], self.vocab_size
        if labels is not None and (L - 1) * V > 2 ** 28:
            # long-stream training (dense-sampled video): full [B, L, V] f32
            # logits are a multi-GB single buffer — 6 GB at 9.9k tokens ×
            # 152k vocab, which crashes the TPU compiler outright (bisected:
            # scripts/bench_longctx_bisect.py, 'decoder_loss' leg) and would
            # dominate HBM even if it compiled. Compute the LM loss over
            # fixed-width sequence chunks instead; logits are never
            # materialized beyond [B, chunk, V] (fwd AND bwd — lax.map's
            # backward is mapped too).
            out = {"hidden": hidden}
            out.update(self._lm_loss_chunked(hidden, labels))
            return out
        logits = shard_vocab_dim(self.lm_head(hidden)).astype(jnp.float32)
        out = {"logits": logits, "hidden": hidden}
        out.update(self._lm_loss(logits, batch.get("labels")))
        return out

    # -- KV-cache generation -----------------------------------------------
    # The reference decodes through HF ``GenerationMixin`` with
    # ``past_key_values`` (modeling_llama_3d.py:900-1000). TPU-native: one
    # jitted prefill writes the cache, then jitted single-token decode steps
    # with explicit (rope position, cache slot) streams — the two differ
    # because 3D-RoPE positions are NOT slot indices (get_rope_index).

    def prefill(self, batch: Mapping[str, Any], extra_slots: int):
        """Prefill over the assembled multimodal prompt. Returns
        (last-token logits f32[B, V], cache with ``extra_slots`` free slots,
        lens_full int[B] = first free cache slot, next_p int[B] = next RoPE
        position per the get_rope_index continuation convention)."""
        input_ids = batch["input_ids"]
        text_mask = batch.get("input_mask", jnp.ones_like(input_ids))
        if self.image_token_id is not None or self.audio_token_id is not None \
                or self.video_token_id is not None:
            embeds, positions, _ = self._assemble_spliced(
                batch, input_ids, True)
            full_mask = text_mask.astype(jnp.int32)
        else:
            embeds, positions, full_mask = self._assemble_prefix(
                batch, input_ids, text_mask, True)
        B, L, _ = embeds.shape
        cache = self.decoder.make_cache(B, L + extra_slots, self.hidden,
                                        quantized=self.kv_int8)
        hidden, cache = self.decoder(embeds, positions, full_mask, True,
                                     cache=cache)
        lens_full = full_mask.sum(-1).astype(jnp.int32)
        idx = (lens_full - 1).clip(0, L - 1)
        last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
        logits = self.lm_head(last).astype(jnp.float32)
        valid = full_mask > 0
        next_p = jnp.max(jnp.where(valid, positions.max(-1), -1), axis=1) + 1
        return logits, cache, lens_full, next_p.astype(jnp.int32)

    def decode_step(self, token: jnp.ndarray, rope_pos: jnp.ndarray,
                    slot: jnp.ndarray, cache):
        """One token per row: RoPE position ``rope_pos`` int[B] (text tokens
        use (p, p, p)), written at cache slot ``slot`` int[B]."""
        emb = self.token_embed(token[:, None])
        pos3 = jnp.repeat(rope_pos[:, None, None], 3, axis=-1)
        hidden, cache = self.decoder(emb, pos3, None, True,
                                     cache=cache, decode_pos=slot)
        return self.lm_head(hidden[:, 0]).astype(jnp.float32), cache

    def decode_chunk(self, tokens: jnp.ndarray, rope0: jnp.ndarray,
                     slot0: jnp.ndarray, cache):
        """K tokens per row at contiguous cache slots slot0..slot0+K-1 with
        RoPE positions rope0..rope0+K-1 on all three axes (generated tokens
        are text — the get_rope_index continuation convention) — the
        speculative verify step. Returns (logits f32[B, K, V], cache)."""
        emb = self.token_embed(tokens)
        K = tokens.shape[1]
        pos = rope0[:, None] + jnp.arange(K)[None]
        pos3 = jnp.repeat(pos[..., None], 3, axis=-1)
        hidden, cache = self.decoder(emb, pos3, None, True,
                                     cache=cache, decode_pos=slot0)
        return self.lm_head(hidden).astype(jnp.float32), cache

    def extend_cache(self, tokens: jnp.ndarray, mask: jnp.ndarray,
                     rope0: jnp.ndarray, slot0: jnp.ndarray, cache):
        """Append a NEW TEXT TURN to an existing conversation cache
        (multi-turn serving without re-prefilling history): right-padded
        ``tokens`` [B, Lt] written from cache slot ``slot0`` with RoPE
        continuation ``rope0`` (both int[B]; stale pad writes sit beyond
        the validity horizon and are overwritten by later decode steps).
        Returns (last-valid logits f32[B, V], cache, new_rope, new_slot)."""
        logits, cache = self.decode_chunk(tokens, rope0, slot0, cache)
        tlen = mask.sum(-1).astype(jnp.int32)
        last = jnp.take_along_axis(
            logits, (tlen - 1).clip(0)[:, None, None], axis=1)[:, 0]
        return last, cache, rope0 + tlen, slot0 + tlen

    def generate(
        self, variables, batch: Mapping[str, Any],
        eos_id: int = 2, max_length: Optional[int] = None,
        num_beams: int = 1, speculative: int = 0, spec_ngram: int = 2,
        do_sample: bool = False, top_p: float = 0.9,
        temperature: float = 1.0, rng: Optional[jax.Array] = None,
    ):
        """KV-cache decoding (greedy, beam, or nucleus sampling — the
        reference HF-generate surface). ``speculative=gamma > 0`` turns on
        prompt-lookup speculative greedy decoding (utils/speculative.py) —
        tokens identical to plain greedy. Generations are written after
        each row's text prompt in a shared [B, Lp+max_new] buffer; returns
        (tokens, prompt_lens int[B])."""
        max_new = int(max_length or 16)
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        mask = jnp.asarray(batch.get("input_mask", jnp.ones_like(ids)),
                           jnp.int32)
        B, Lp = ids.shape
        total = Lp + max_new
        lens_text = mask.sum(-1).astype(jnp.int32)
        tokens0 = jnp.concatenate(
            [ids * mask, jnp.zeros((B, max_new), jnp.int32)], axis=1)
        fixed = {k: (tuple(jnp.asarray(x) for x in v)
                     if isinstance(v, (tuple, list)) else jnp.asarray(v))
                 for k, v in batch.items()
                 if k not in ("input_ids", "input_mask")}
        gamma = int(speculative) if num_beams == 1 and not do_sample else 0

        def _shape_of(v):
            return (tuple(tuple(x.shape) for x in v)
                    if isinstance(v, tuple) else tuple(v.shape))

        # one stable jit per (module config, shapes, decode options):
        # memoized so per-request serving never re-traces, with variables
        # and modal inputs as ARGUMENTS (closure capture would bake them in
        # as constants and stall the remote-compile relay at 1B+ scale)
        fixed_keys = tuple(sorted(fixed))
        mode = ("sample" if do_sample
                else "beam" if num_beams > 1 else "greedy")
        key = (self, mode, B, Lp, max_new, eos_id, num_beams,
               tuple((k, _shape_of(v)) for k, v in sorted(fixed.items())),
               gamma, spec_ngram, do_sample, top_p, temperature)
        fn = _GEN_JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(self._build_cached_decode(
                Lp, max_new, eos_id, num_beams, B, total, fixed_keys,
                gamma, spec_ngram, do_sample, top_p, temperature))
            _GEN_JIT_CACHE[key] = fn
        args = (variables, tokens0, mask,
                tuple(fixed[k] for k in fixed_keys))
        if do_sample:
            args += (rng if rng is not None else jax.random.PRNGKey(0),)
        tokens, _ = fn(*args)
        return tokens, lens_text

    def _build_cached_decode(self, Lp, max_new, eos_id, num_beams, B, total,
                             fixed_keys, gamma=0, spec_ngram=2,
                             do_sample=False, top_p=0.9, temperature=1.0):
        """Returns ``fn(variables, tokens0, mask, fixed_vals[, rng]) ->
        (tokens, aux)`` — cached greedy/beam/sampling decode as one
        program."""

        def run(variables, tokens0, mask, fixed_vals, rng=None):
            from antmmf_tpu.predictors.quantization import make_live_vars

            live_vars = make_live_vars(variables, jnp.dtype(self.dtype_str))
            lens_text = mask.sum(-1).astype(jnp.int32)
            fwd = dict(zip(fixed_keys, fixed_vals))
            fwd["input_ids"] = tokens0[:, :Lp]
            fwd["input_mask"] = mask
            logits0, cache, lens_full, next_p = self.apply(
                live_vars(), fwd,
                max_new + (gamma + 1 if gamma else 0),
                method=M2Omni.prefill)

            if num_beams > 1:
                from antmmf_tpu.utils.text_utils import beam_search_cached

                nf = jnp.repeat(next_p, num_beams)
                sf = jnp.repeat(lens_full, num_beams)

                def decode_fn(tok, slot, cache):
                    return self.apply(live_vars(step_mode=True), tok,
                                      nf + (slot - sf), slot, cache,
                                      method=M2Omni.decode_step)

                best, scores = beam_search_cached(
                    decode_fn, logits0, cache, lens_full, eos_id,
                    max_new=max_new, num_beams=num_beams)
                tokens = jax.vmap(
                    lambda row, gen, l: jax.lax.dynamic_update_slice(
                        row, gen, (l,)))(tokens0, best, lens_text)
                return tokens, scores

            if gamma > 0:
                from antmmf_tpu.utils.speculative import speculative_greedy

                def chunk_fn(chunk, start_off, cache):
                    return self.apply(
                        live_vars(step_mode=True), chunk,
                        next_p + start_off, lens_full + start_off, cache,
                        method=M2Omni.decode_chunk)

                buf = jnp.pad(tokens0, ((0, 0), (0, gamma + 1)))
                tokens, _, _ = speculative_greedy(
                    chunk_fn, logits0, cache, buf, lens_text, eos_id,
                    max_new, gamma=gamma, ngram=spec_ngram)
                return tokens[:, :total], lens_text

            if do_sample:
                from antmmf_tpu.utils.text_utils import (
                    nucleus_sampling_cached)

                def decode_fn(tok, slot, cache):
                    return self.apply(live_vars(step_mode=True), tok,
                                      next_p + (slot - lens_full), slot,
                                      cache, method=M2Omni.decode_step)

                gen = nucleus_sampling_cached(
                    decode_fn, logits0, cache, lens_full, rng, eos_id,
                    max_new=max_new, top_p=top_p, temperature=temperature)
                tokens = jax.vmap(
                    lambda row, g, l: jax.lax.dynamic_update_slice(
                        row, g, (l,)))(tokens0, gen, lens_text)
                return tokens, lens_text

            def emit(t, tokens, done, last_logits):
                nxt = jnp.argmax(last_logits, -1).astype(jnp.int32)
                nxt = jnp.where(done, eos_id, nxt)
                write = jax.nn.one_hot(lens_text + t, total, dtype=bool)
                tokens = jnp.where(write, nxt[:, None], tokens)
                return nxt, tokens, done | (nxt == eos_id)

            def step(t, carry):
                tokens, done, last_logits, cache = carry
                nxt, tokens, done = emit(t, tokens, done, last_logits)
                last_logits, cache = self.apply(
                    live_vars(step_mode=True), nxt, next_p + t,
                    lens_full + t, cache, method=M2Omni.decode_step)
                return tokens, done, last_logits, cache

            # no trailing decode: the final token emits from the last logits
            tokens, done, last_logits, _ = jax.lax.fori_loop(
                0, max_new - 1, step,
                (tokens0, jnp.zeros((B,), bool), logits0, cache))
            _, tokens, _ = emit(max_new - 1, tokens, done, last_logits)
            return tokens, lens_text

        return run
