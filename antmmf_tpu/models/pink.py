"""Pink: referential-comprehension MLLM (vision prefix + decoder LM + adapters).

Reference parity: ``/root/reference/prj/Pink`` — LLaMA2 + CLIP-ViT with
LoRA-class adapters trained for referential comprehension (boxes serialized
into text as ``[x1,y1,x2,y2]`` tokens; 11.7k LoC, HF-Trainer based). Here the
same capability class on the shared substrate: ViT prefix → DecoderLM (1D
RoPE), LoRA-wrapped attention output adapter, LM loss on answer tokens.
Parameter-efficient finetuning = optimizer lr_multipliers zeroing base towers
(optimizer/build.py) or the LoRADense freeze_base path.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.m2_omni import LM_PRESETS
from antmmf_tpu.modules.llm import DecoderLM
from antmmf_tpu.modules.lora import LoRADense
from antmmf_tpu.modules.vision.eva_vit import EVA_PRESETS, EvaVisionTransformer
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any


@registry.register_model("pink")
class PinkModel(BaseModel):
    lm_preset: str = "omni_1b"
    # visual tower family: "vit" (CLIP-style) or "eva" (the reference Pink
    # tower — EVA-CLIP-g, create_eva_vit_g; weights import via
    # eva_vit_state_dict_to_params, parity in tests/test_eva_parity.py)
    visual_tower: str = "vit"
    vit_preset: str = "vit_base_patch32"
    eva_preset: str = "eva_vit_g"
    image_size: int = 224
    lora_rank: int = 8
    # reference recipe: LoRA adapters ON the decoder q/v projections with the
    # base LLM frozen (pink/model/adapter.py mark_only_adapter_as_trainable)
    lora_decoder: bool = True
    lora_freeze_base: bool = True
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
            num_kv_heads=p["num_kv_heads"], rope_3d=False,
            lora_rank=self.lora_rank if self.lora_decoder else 0,
            lora_freeze_base=self.lora_freeze_base, dtype=dtype)
        if self.visual_tower not in ("vit", "eva"):
            raise ValueError(
                f"visual_tower must be 'vit' or 'eva', got "
                f"{self.visual_tower!r}")
        if self.visual_tower == "eva":
            self.vision_tower = EvaVisionTransformer(
                image_size=self.image_size, dtype=dtype,
                **dict(EVA_PRESETS[self.eva_preset]))
        else:
            self.vision_tower = VisionTransformer(
                image_size=self.image_size, dtype=dtype,
                **dict(VIT_PRESETS[self.vit_preset]))
        # adapter path: LoRA projection from vision space into the LM
        self.vision_proj = LoRADense(self.hidden, rank=self.lora_rank,
                                     freeze_base=False, dtype=dtype)
        self.output_adapter = LoRADense(self.hidden, rank=self.lora_rank,
                                        freeze_base=True, dtype=dtype)
        self.lm_head = nn.Dense(self.vocab_size, use_bias=False, dtype=dtype,
                                param_dtype=jnp.float32)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        input_ids = batch["input_ids"]
        mask = batch.get("input_mask", jnp.ones_like(input_ids))
        B, Lt = input_ids.shape

        img = batch.get("image_data")
        segments, masks = [], []
        if img is not None:
            if img.ndim == 5:
                img = img[:, 0]
            seq = self.vision_tower(img, deterministic=deterministic)
            if isinstance(seq, dict):  # CLIP-style tower returns a dict
                seq = seq["sequence"]
            vtok = self.vision_proj(seq[:, 1:])
            segments.append(vtok)
            masks.append(jnp.ones(vtok.shape[:2], jnp.int32))
        segments.append(self.token_embed(input_ids))
        masks.append(mask.astype(jnp.int32))

        embeds = jnp.concatenate(segments, axis=1)
        full_mask = jnp.concatenate(masks, axis=1)
        L = embeds.shape[1]
        positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

        hidden = self.decoder(embeds, positions, full_mask,
                              deterministic=deterministic)
        hidden = hidden + self.output_adapter(hidden)
        text_hidden = hidden[:, -Lt:]
        logits = self.lm_head(text_hidden).astype(jnp.float32)

        out: Dict[str, Any] = {"logits": logits}
        labels = batch.get("labels")
        if labels is not None:
            shift_logits, shift_labels = logits[:, :-1], labels[:, 1:]
            valid = shift_labels >= 0
            safe = jnp.where(valid, shift_labels, 0)
            logp = jax.nn.log_softmax(shift_logits, -1)
            nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
            denom = jnp.maximum(valid.sum(), 1)
            out["losses"] = {"lm_loss": jnp.where(valid, nll, 0.0).sum() / denom}
        return out

    def generate(
        self, variables, batch: Mapping[str, Any],
        eos_id: int = 102, max_length: Optional[int] = None,
        num_beams: int = 1,
    ):
        """Greedy decoding for the eval harnesses (reference
        ``prj/Pink/pink/eval/model_*.py`` all decode with
        ``model.generate(do_sample=False)``). Ragged prompts share one padded
        [B, Lp+max_new] buffer; each step re-encodes the full prefix under one
        jitted ``lax.fori_loop`` (static shapes — eval-harness scale; a KV-cache
        serving path would cache per-layer k/v instead). Returns
        (tokens int[B, Lp+max_new] with generations written after each row's
        prompt, prompt_lens int[B])."""
        del num_beams  # greedy only; kept for the predictor calling convention
        max_new = int(max_length or 16)
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        mask = jnp.asarray(batch.get("input_mask", jnp.ones_like(ids)),
                           jnp.int32)
        img = batch.get("image_data")
        B, Lp = ids.shape
        total = Lp + max_new
        tokens0 = jnp.concatenate(
            [ids * mask, jnp.zeros((B, max_new), jnp.int32)], axis=1)
        lens = mask.sum(-1).astype(jnp.int32)  # [B] prompt lengths

        @jax.jit
        def decode(tokens0):
            def step(t, carry):
                tokens, done = carry
                cur = (jnp.arange(total)[None] < (lens + t)[:, None])
                fwd = {"input_ids": tokens, "input_mask": cur.astype(jnp.int32)}
                if img is not None:
                    fwd["image_data"] = img
                logits = self.apply(variables, fwd, deterministic=True)["logits"]
                pos = (lens + t - 1).clip(0, total - 1)
                last = jnp.take_along_axis(
                    logits, pos[:, None, None], axis=1)[:, 0]  # [B, V]
                nxt = jnp.argmax(last, -1).astype(jnp.int32)
                nxt = jnp.where(done, eos_id, nxt)
                write = jax.nn.one_hot(lens + t, total, dtype=bool)
                tokens = jnp.where(write, nxt[:, None], tokens)
                return tokens, done | (nxt == eos_id)

            return jax.lax.fori_loop(
                0, max_new, step, (tokens0, jnp.zeros((B,), bool)))

        tokens, _ = decode(tokens0)
        return tokens, lens
