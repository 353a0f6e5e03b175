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
            num_kv_heads=p["num_kv_heads"], rope_3d=True, dtype=dtype)
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

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        input_ids = batch["input_ids"]  # int[B, Lt]
        text_mask = batch.get("input_mask", jnp.ones_like(input_ids))
        B, Lt = input_ids.shape

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
        labels = batch.get("labels")
        if labels is not None:  # next-token LM loss, -100/-1 = ignore
            shift_logits = logits[:, :-1]
            shift_labels = labels[:, 1:]
            valid = shift_labels >= 0
            safe = jnp.where(valid, shift_labels, 0)
            logp = jax.nn.log_softmax(shift_logits, -1)
            nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
            denom = jnp.maximum(valid.sum(), 1)
            out["losses"] = {"lm_loss": jnp.where(valid, nll, 0.0).sum() / denom}
            out["metrics"] = {
                "lm_acc": jnp.where(valid, jnp.argmax(shift_logits, -1) == safe,
                                    False).sum() / denom}
        return out
