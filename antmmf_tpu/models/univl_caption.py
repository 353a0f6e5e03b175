"""UniVL video captioning: visual memory → causal language decoder.

Reference parity: the generation task family of ``/root/reference/prj/base_vtp``
(generation_ prefixed inputs, univl_model.py:37-51) with the reference's
``caption_cross_entropy`` loss and beam-search/nucleus decoding
(``antmmf/utils/text_utils.py:475,555``).

Training: teacher forcing with token-level CE (-1 pads ignored). Inference:
``generate`` composes the jitted decoder with ``utils.text_utils.beam_search``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import UnivlVideoBase
from antmmf_tpu.modules.decoders import LanguageDecoder


@registry.register_model("univl_caption")
class UnivlForVideoCaptioning(BaseModel):
    vit_preset: str = "vit_base_patch32"
    image_size: int = 224
    bert_preset: str = "bert_base"
    embed_dim: int = 512
    n_clips: int = 1
    decoder_layers: int = 3
    decoder_heads: int = 8
    max_caption_len: int = 40
    dropout: float = 0.0
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        self.base = UnivlVideoBase(
            vit_preset=self.vit_preset, image_size=self.image_size,
            bert_preset=self.bert_preset, embed_dim=self.embed_dim,
            n_clips=self.n_clips, dropout=self.dropout,
            dtype_str=self.dtype_str)
        self.decoder = LanguageDecoder(
            vocab_size=self.base.text_encoder.vocab_size,
            hidden_size=self.base.visual_hidden,
            num_layers=self.decoder_layers, num_heads=self.decoder_heads,
            max_length=self.max_caption_len, dropout=self.dropout,
            dtype=jnp.dtype(self.dtype_str))

    def _memory(self, batch: Mapping, deterministic: bool):
        video = self.base.forward_img_encoder(
            batch["image_data"], deterministic=deterministic)
        vt = video["visual_tokens"]  # [B, F, Lv, C]
        B, F_, Lv, C = vt.shape
        memory = vt.reshape(B, F_ * Lv, C)
        memory_mask = jnp.repeat(
            batch.get("video_mask", jnp.ones((B, F_), jnp.int32)), Lv, axis=1)
        return memory, memory_mask

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        memory, memory_mask = self._memory(batch, deterministic)
        tokens = batch.get("generation_input_ids",
                           batch.get("caption_raw_input_ids",
                                     batch.get("caption_input_ids")))
        logits = self.decoder(tokens, memory, memory_mask,
                              deterministic=deterministic)  # [B, L, V]
        out: Dict[str, Any] = {"logits": logits}

        # teacher forcing: predict token t+1 from prefix ≤ t; pads ignored
        mask = batch.get("generation_input_mask",
                         batch.get("caption_input_mask"))
        if mask is not None:
            shift_logits = logits[:, :-1]
            shift_labels = tokens[:, 1:]
            valid = mask[:, 1:] > 0
            safe = jnp.where(valid, shift_labels, 0)
            logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
            denom = jnp.maximum(valid.sum(), 1)
            out["losses"] = {
                "caption_cross_entropy": jnp.where(valid, nll, 0.0).sum() / denom}
            out["metrics"] = {
                "caption_token_acc": jnp.where(
                    valid, jnp.argmax(shift_logits, -1) == safe,
                    False).sum() / denom}
        return out

    def generate(
        self, variables, batch: Mapping[str, Any],
        bos_id: int = 101, eos_id: int = 102,
        num_beams: int = 4, max_length: Optional[int] = None,
        use_cache: bool = True,
    ):
        """Beam-search captions for a batch (host-callable, jit inside).

        Default path: KV-cache incremental decode — cross-attention memory
        k/v primed once, per-token self-attention cache (the reference
        decodes captions token-by-token through its TextDecoder; here O(1)
        per token instead of the O(L²) full re-encode, which remains as the
        ``use_cache=False`` regression anchor)."""
        from antmmf_tpu.utils.text_utils import beam_search

        max_length = max_length or self.max_caption_len
        memory, memory_mask = self.apply(
            variables, batch, True, method=lambda m, b, d: m._memory(b, d))
        B = memory.shape[0]

        if use_cache:
            return self._generate_cached(
                variables, memory, memory_mask, bos_id, eos_id,
                num_beams, max_length)

        def logits_fn(tokens):  # [B*beams, t]
            reps = tokens.shape[0] // B
            mem = jnp.repeat(memory, reps, axis=0)
            mm = jnp.repeat(memory_mask, reps, axis=0)
            full = self.apply(
                variables, tokens, mem, mm, True,
                method=lambda m, t, me, mm_, d: m.decoder(t, me, mm_, d))
            filled = jnp.sum(tokens != eos_id, axis=-1) - 1
            return jnp.take_along_axis(
                full, filled[:, None, None].clip(0), axis=1)[:, 0]

        bos = jnp.full((B,), bos_id, jnp.int32)
        return beam_search(logits_fn, bos, eos_id=eos_id,
                           max_length=max_length, num_beams=num_beams)

    def _generate_cached(self, variables, memory, memory_mask,
                         bos_id, eos_id, num_beams, max_length):
        from antmmf_tpu.utils.text_utils import beam_search_cached

        B = memory.shape[0]
        H = self.decoder_heads
        # decoder width == base.visual_hidden; read it off the token embed
        C = variables["params"]["decoder"]["token_embed"][
            "embedding"].shape[-1]
        hd = C // H
        T = max_length

        @jax.jit
        def run(memory, memory_mask):
            mem_kvs = self.apply(
                variables, memory,
                method=lambda m, mem: m.decoder.prime(mem))

            def make_decode_fn(kvs, mm):
                # cross-attention memory k/v and its mask are identical
                # across beams and never change — closure them instead of
                # putting them in the reordered beam cache (which would
                # copy the full memory through HBM every step)
                def decode_fn(tok, pos, cache):
                    logits, new_self = self.apply(
                        variables, tok, pos, cache, kvs, mm,
                        method=lambda m, t, p, c, mk, msk:
                            m.decoder.decode_step(t, p, c, mk, msk))
                    return logits, new_self
                return decode_fn

            caches0 = [{"k": jnp.zeros((B, H, T, hd), memory.dtype),
                        "v": jnp.zeros((B, H, T, hd), memory.dtype)}
                       for _ in range(self.decoder_layers)]
            bos = jnp.full((B,), bos_id, jnp.int32)
            logits0, caches = make_decode_fn(mem_kvs, memory_mask)(
                bos, jnp.zeros((B,), jnp.int32), caches0)
            K = num_beams
            kvs_rep = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, K, axis=0), mem_kvs)
            mm_rep = jnp.repeat(memory_mask, K, axis=0)
            best, scores = beam_search_cached(
                make_decode_fn(kvs_rep, mm_rep), logits0, caches,
                jnp.ones((B,), jnp.int32), eos_id,
                max_new=max_length - 1, num_beams=num_beams)
            tokens = jnp.concatenate([bos[:, None], best], axis=1)
            return tokens, scores

        return run(memory, memory_mask)
