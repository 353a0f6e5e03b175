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
from antmmf_tpu.modules.transformers.base import TransformerEncoder
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any

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
    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    audio_hidden: int = 256
    max_vision_tokens: int = 256
    # in-text placeholder splicing (reference prompt_wrap_image/audio,
    # modeling_m2omni.py:695-771): when set, <image>/<audio> placeholder
    # ids inside input_ids are REPLACED by the modality embeddings (the
    # processor must expand each tag to exactly the modality token count);
    # when None, modality segments are prepended (legacy layout).
    image_token_id: Optional[int] = None
    audio_token_id: Optional[int] = None
    # LoRA on the decoder q/v projections (reference wrap_llm_lora,
    # modeling_m2omni.py:311-325); 0 = off
    llm_lora_rank: int = 0
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        p = LM_PRESETS[self.lm_preset]
        self.hidden = p["hidden"]
        self.vocab_size = p["vocab_size"]
        self.token_embed = nn.Embed(self.vocab_size, self.hidden, dtype=dtype,
                                    param_dtype=jnp.float32)
        self.decoder = DecoderLM(
            num_layers=p["num_layers"], num_heads=p["num_heads"],
            num_kv_heads=p["num_kv_heads"], rope_3d=True,
            lora_rank=self.llm_lora_rank, dtype=dtype)
        self.vision_tower = VisionTransformer(
            image_size=self.image_size, dtype=dtype,
            **dict(VIT_PRESETS[self.vit_preset]))
        self.vision_proj = nn.Dense(self.hidden, dtype=dtype,
                                    param_dtype=jnp.float32)
        self.audio_tower = AudioEncoder(hidden=self.audio_hidden, dtype=dtype)
        self.audio_proj = nn.Dense(self.hidden, dtype=dtype,
                                   param_dtype=jnp.float32)
        self.lm_head = nn.Dense(self.vocab_size, use_bias=False, dtype=dtype,
                                param_dtype=jnp.float32)

    def _vision_tokens(self, images: jnp.ndarray, deterministic: bool):
        """images [B, F, H, W, 3] → (tokens [B, F*N, C], positions [B, F*N, 3])."""
        B, F = images.shape[:2]
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

    @staticmethod
    def _splice(text_embeds: jnp.ndarray, positions: jnp.ndarray,
                input_ids: jnp.ndarray, token_id: int,
                modal_tokens: jnp.ndarray, modal_pos: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Replace placeholder-token slots with modality embeddings
        (reference prompt_wrap, modeling_m2omni.py:695-771). The k-th
        placeholder in each row takes modal_tokens[:, k]; 3D positions at
        those slots come from modal_pos offset by the slot's text position
        (the get_rope_index convention, modeling_m2omni.py:327-494)."""
        mask = input_ids == token_id  # [B, L]
        k = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0,
                     modal_tokens.shape[1] - 1)  # [B, L]
        gathered = jnp.take_along_axis(
            modal_tokens, k[..., None], axis=1)  # [B, L, C]
        out = jnp.where(mask[..., None], gathered, text_embeds)
        # temporal offset = text position where the modal run starts
        start = jnp.argmax(mask, axis=1)  # first placeholder slot per row
        gpos = jnp.take_along_axis(
            modal_pos, k[..., None], axis=1)  # [B, L, 3]
        gpos = gpos + start[:, None, None]
        pos = jnp.where(mask[..., None], gpos, positions)
        return out, pos

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        input_ids = batch["input_ids"]  # int[B, Lt]
        text_mask = batch.get("input_mask", jnp.ones_like(input_ids))
        B, Lt = input_ids.shape

        if self.image_token_id is not None or self.audio_token_id is not None:
            return self._forward_spliced(batch, input_ids, text_mask,
                                         deterministic)

        segments = []
        seg_positions = []
        seg_masks = []
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
            atok = self.audio_proj(self.audio_tower(
                batch["audio"], deterministic=deterministic))
            La = atok.shape[1]
            apos = pos_offset[:, None] + jnp.arange(La)[None]
            segments.append(atok)
            seg_positions.append(jnp.repeat(apos[..., None], 3, axis=-1))
            seg_masks.append(jnp.ones((B, La), jnp.int32))
            pos_offset = pos_offset + La

        ttok = self.token_embed(input_ids)
        tpos = pos_offset[:, None] + jnp.arange(Lt)[None]
        segments.append(ttok)
        seg_positions.append(jnp.repeat(tpos[..., None], 3, axis=-1))
        seg_masks.append(text_mask.astype(jnp.int32))

        embeds = jnp.concatenate(segments, axis=1)
        positions = jnp.concatenate(seg_positions, axis=1)
        mask = jnp.concatenate(seg_masks, axis=1)

        hidden = self.decoder(embeds, positions, mask,
                              deterministic=deterministic)
        text_hidden = hidden[:, -Lt:]
        logits = self.lm_head(text_hidden).astype(jnp.float32)  # [B, Lt, V]

        out: Dict[str, Any] = {"logits": logits, "hidden": text_hidden}
        out.update(self._lm_loss(logits, batch.get("labels")))
        return out

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

    def _forward_spliced(self, batch: Mapping[str, Any],
                         input_ids: jnp.ndarray, text_mask: jnp.ndarray,
                         deterministic: bool) -> Dict[str, Any]:
        """Interleaved layout: modality embeddings live INSIDE the text
        sequence at placeholder slots, so conversations like
        ``text <image>... text`` keep their order (reference prompt_wrap)."""
        B, L = input_ids.shape
        embeds = self.token_embed(input_ids)
        positions = jnp.repeat(
            jnp.broadcast_to(jnp.arange(L)[None], (B, L))[..., None], 3, -1)

        if self.image_token_id is not None and \
                batch.get("image_data") is not None:
            img = batch["image_data"]
            if img.ndim == 4:
                img = img[:, None]
            vtok, vpos = self._vision_tokens(img, deterministic)
            embeds, positions = self._splice(
                embeds, positions, input_ids, self.image_token_id,
                vtok.astype(embeds.dtype), vpos)
        if self.audio_token_id is not None and batch.get("audio") is not None:
            atok = self.audio_proj(self.audio_tower(
                batch["audio"], deterministic=deterministic))
            apos = jnp.repeat(
                jnp.broadcast_to(jnp.arange(atok.shape[1])[None],
                                 atok.shape[:2])[..., None], 3, -1)
            embeds, positions = self._splice(
                embeds, positions, input_ids, self.audio_token_id,
                atok.astype(embeds.dtype), apos)

        hidden = self.decoder(embeds, positions,
                              text_mask.astype(jnp.int32),
                              deterministic=deterministic)
        logits = self.lm_head(hidden).astype(jnp.float32)
        out: Dict[str, Any] = {"logits": logits, "hidden": hidden}
        out.update(self._lm_loss(logits, batch.get("labels")))
        return out
