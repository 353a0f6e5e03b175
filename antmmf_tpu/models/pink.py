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
from antmmf_tpu.parallel.partitioning import shard_batch_dim, shard_vocab_dim
from antmmf_tpu.modules.qdense import QuantDense
from antmmf_tpu.modules.vision.eva_vit import EVA_PRESETS, EvaVisionTransformer
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any

# serving-time decode programs, memoized per (module config, shapes,
# options) — see PinkModel.generate
_GEN_JIT_CACHE: Dict[Any, Any] = {}


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
    # adapter_style "pink" = the EXACT reference scheme: serial bottleneck
    # adapters after the decoder norms (AdapterLayer, adapter.py:24-58 +
    # LlamaAdapterDecoderLayer :286-361), plain-Dense mm_projector, no
    # output adapter — the layout reference Pink checkpoints import into
    # (convert_checkpoint --arch pink). "lora" = the round-2 q/v-LoRA recipe.
    adapter_style: str = "lora"
    adapter_dim: int = 8
    adapter_mlp: bool = False
    adapter_non_linear: bool = False
    # CLIP feature-selection layer (reference clip_select_layer, default -2:
    # encode_image consumes ``hidden_states[-2]`` — the PENULTIMATE encoder
    # layer, never post_layernorm, pink.py:185-188). -1 = all layers. Only
    # the "vit" tower; the EVA tower is already norm-free per the reference.
    clip_select_layer: int = -2
    dtype_str: str = "bfloat16"
    # rematerialize decoder layers in the training forward (see
    # modules/llm.DecoderLM.remat) — required to fit 1B-class instruction
    # tuning on a 16 GB chip; no effect on the cached decode paths
    remat: bool = False
    # fold decoder layers into one nn.scan body (see
    # modules/llm.DecoderLM.scan_layers) — the production-scale
    # memory/compile structure; params live under decoder/layers/
    # with a leading [num_layers] dim (stack imported per-layer
    # checkpoints with modules.llm.stack_decoder_layers)
    scan_layers: bool = False
    # sequence parallelism for the decoder's training forward over the mesh
    # `seq` axis: "none" | "ring" | "ulysses" (see modules/llm.DecoderLM)
    sequence_parallel: str = "none"
    # int8 KV cache for serving: halves the per-step HBM cache read
    # (see modules/llm.init_decoder_cache); tokens may differ slightly from
    # the bf16 cache (quantization), gate per deployment
    kv_int8: bool = False
    # embedding/lm_head vocab override (0 = the preset's). Set this when the
    # tokenizer's id space is larger than the preset (e.g. a 30k-wordpiece
    # vocab on a tiny test preset) — out-of-range ids otherwise read
    # NaN-filled embedding rows (jnp.take fill semantics) and poison the
    # whole forward.
    vocab_override: int = 0

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        p = LM_PRESETS[self.lm_preset]
        self.hidden = p["hidden"]
        self.vocab_size = int(self.vocab_override) or p["vocab_size"]
        self.token_embed = nn.Embed(self.vocab_size, self.hidden, dtype=dtype,
                                    param_dtype=jnp.float32)
        if self.adapter_style not in ("lora", "pink"):
            raise ValueError(
                f"adapter_style must be 'lora' or 'pink', got "
                f"{self.adapter_style!r}")
        pink_style = self.adapter_style == "pink"
        self.decoder = DecoderLM(
            num_layers=p["num_layers"], num_heads=p["num_heads"],
            num_kv_heads=p["num_kv_heads"], rope_3d=False,
            lora_rank=0 if pink_style else (
                self.lora_rank if self.lora_decoder else 0),
            lora_freeze_base=self.lora_freeze_base,
            adapter_dim=self.adapter_dim if pink_style else 0,
            adapter_mlp=self.adapter_mlp,
            adapter_non_linear=self.adapter_non_linear,
            remat=self.remat, scan_layers=self.scan_layers,
            sequence_parallel=self.sequence_parallel, dtype=dtype)
        if self.visual_tower not in ("vit", "eva"):
            raise ValueError(
                f"visual_tower must be 'vit' or 'eva', got "
                f"{self.visual_tower!r}")
        if self.visual_tower == "eva":
            self.vision_tower = EvaVisionTransformer(
                image_size=self.image_size, dtype=dtype, remat=self.remat,
                **dict(EVA_PRESETS[self.eva_preset]))
        else:
            vit_kwargs = dict(VIT_PRESETS[self.vit_preset])
            if not (-vit_kwargs["num_layers"] <= self.clip_select_layer <= -1):
                raise ValueError(
                    f"clip_select_layer {self.clip_select_layer} out of "
                    f"range for a {vit_kwargs['num_layers']}-layer tower")
            # hidden_states[select] == running select+num_layers+1 encoder
            # layers with NO post_layernorm
            vit_kwargs["num_layers"] += self.clip_select_layer + 1
            self.vision_tower = VisionTransformer(
                image_size=self.image_size, dtype=dtype, final_norm=False,
                remat=self.remat, **vit_kwargs)
        if self.adapter_style == "pink" or self.lora_rank <= 0:
            # reference mm_projector: a plain Linear (pink.py:145); no
            # output adapter in the reference forward. lora_rank=0 means
            # "no adapters at all" (full-precision serving of a merged
            # checkpoint) and takes the same plain-Dense path.
            self.vision_proj = nn.Dense(self.hidden, dtype=dtype,
                                        param_dtype=jnp.float32)
            self.output_adapter = None
        else:
            # adapter path: LoRA projection from vision space into the LM
            self.vision_proj = LoRADense(self.hidden, rank=self.lora_rank,
                                         freeze_base=False, dtype=dtype)
            self.output_adapter = LoRADense(self.hidden, rank=self.lora_rank,
                                            freeze_base=True, dtype=dtype)
        # QuantDense == nn.Dense(use_bias=False) at init/train; at serving
        # it can consume int4-packed weights (modules/qdense.py) — the
        # vocab projection is ~20% of decode weight bytes
        self.lm_head = QuantDense(self.vocab_size, dtype=dtype,
                                  param_dtype=jnp.float32)

    def _assemble(self, batch: Mapping[str, Any], deterministic: bool = True):
        """[vision tokens][text tokens] prefix layout →
        (embeds [B, Lv+Lt, C], mask [B, Lv+Lt], Lv static)."""
        input_ids = batch["input_ids"]
        mask = batch.get("input_mask", jnp.ones_like(input_ids))
        img = batch.get("image_data")
        segments, masks = [], []
        if img is not None:
            if img.ndim == 5:
                img = img[:, 0]
            seq = self.vision_tower(img, deterministic=deterministic)
            if isinstance(seq, dict):  # CLIP-style tower returns a dict
                seq = seq["sequence"]
            vtok = shard_batch_dim(self.vision_proj(seq[:, 1:]))
            segments.append(vtok)
            masks.append(jnp.ones(vtok.shape[:2], jnp.int32))
        # feature-sharded reshard point: routes the embedding cotangent
        # through the [V, H/fsdp]-local form (see shard_vocab_dim), then
        # immediately back to the batch layout so the splice concat (and its
        # backward split) sees ONE consistent sharding — without the
        # re-constraint GSPMD faces a batch-sharded↔feature-sharded transition
        # with transposed device order at the split and falls back to
        # involuntary full rematerialization (replicate-then-reshard)
        segments.append(shard_batch_dim(
            shard_vocab_dim(self.token_embed(input_ids))))
        masks.append(mask.astype(jnp.int32))
        embeds = shard_batch_dim(jnp.concatenate(segments, axis=1))
        full_mask = jnp.concatenate(masks, axis=1)
        Lv = embeds.shape[1] - input_ids.shape[1]
        return embeds, full_mask, Lv

    def num_vision_tokens(self, batch: Mapping[str, Any]) -> int:
        if batch.get("image_data") is None:
            return 0
        preset = (EVA_PRESETS[self.eva_preset] if self.visual_tower == "eva"
                  else VIT_PRESETS[self.vit_preset])
        return (self.image_size // preset["patch_size"]) ** 2

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        input_ids = batch["input_ids"]
        B, Lt = input_ids.shape
        embeds, full_mask, _ = self._assemble(batch, deterministic)
        L = embeds.shape[1]
        positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

        hidden = self.decoder(embeds, positions, full_mask,
                              deterministic=deterministic)
        if self.output_adapter is not None:
            hidden = hidden + self.output_adapter(hidden)
        text_hidden = hidden[:, -Lt:]
        logits = shard_vocab_dim(
            self.lm_head(text_hidden)).astype(jnp.float32)

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

    # -- KV-cache generation -----------------------------------------------
    # The reference eval harnesses decode through HF ``model.generate`` with
    # ``past_key_values`` (prj/Pink/pink/eval/model_vqav2.py:141). Here:
    # one jitted prefill over [vision; padded prompt] writes the cache, then a
    # jitted per-token decode loop — O(L) per token instead of the previous
    # O(L²) full-prefix re-encode. Token-for-token identical to the
    # re-encoding greedy path (regression-tested in test_llm_generate.py).

    def prefill(self, batch: Mapping[str, Any], cache, lens: jnp.ndarray):
        """Run the full padded prompt, writing the KV cache.
        Returns (last-valid-token logits f32[B, V], cache)."""
        embeds, full_mask, Lv = self._assemble(batch, True)
        B, L, _ = embeds.shape
        positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        hidden, cache = self.decoder(embeds, positions, full_mask, True,
                                     cache=cache)
        if self.output_adapter is not None:
            hidden = hidden + self.output_adapter(hidden)
        idx = (Lv + lens - 1).clip(0, L - 1)
        last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
        logits = self.lm_head(last).astype(jnp.float32)
        return logits, cache

    def decode_step(self, token: jnp.ndarray, pos: jnp.ndarray, cache):
        """One token per row at absolute slot/RoPE position ``pos`` int[B].
        Returns (logits f32[B, V], cache)."""
        emb = self.token_embed(token[:, None])
        hidden, cache = self.decoder(emb, pos[:, None], None, True,
                                     cache=cache, decode_pos=pos)
        if self.output_adapter is not None:
            hidden = hidden + self.output_adapter(hidden)
        return self.lm_head(hidden[:, 0]).astype(jnp.float32), cache

    def decode_chunk(self, tokens: jnp.ndarray, pos0: jnp.ndarray, cache):
        """K tokens per row at contiguous slots/positions pos0..pos0+K-1 —
        the speculative verify step (costs ~one decode step: decode is
        weight-read-bound at small K). Returns (logits f32[B, K, V], cache)."""
        emb = self.token_embed(tokens)
        K = tokens.shape[1]
        pos = pos0[:, None] + jnp.arange(K)[None]
        hidden, cache = self.decoder(emb, pos, None, True,
                                     cache=cache, decode_pos=pos0)
        if self.output_adapter is not None:
            hidden = hidden + self.output_adapter(hidden)
        return self.lm_head(hidden).astype(jnp.float32), cache

    def prefill_chunked(self, batch: Mapping[str, Any], cache,
                        lens: jnp.ndarray, chunk_tokens: int = 128):
        """Prefill the [vision; text] stream ``chunk_tokens`` at a time —
        numerically identical to :meth:`prefill` but the decoder program is
        PROMPT-LENGTH-INDEPENDENT (one compiled chunk shape serves every
        prompt length; full prefill compiles a new program per length,
        minutes each through a remote-compile relay) and peak activation
        memory is O(chunk) instead of O(prompt).
        Returns (last-valid-token logits f32[B, V], cache)."""
        embeds, full_mask, Lv = self._assemble(batch, True)
        B, L, C = embeds.shape
        W = min(chunk_tokens, L)
        n_chunks = -(-L // W)
        pad = n_chunks * W - L
        if pad:
            embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
        last_idx = Lv + lens - 1  # [B] global position of the last prompt tok

        def step(i, carry):
            last_h, cache = carry
            chunk = jax.lax.dynamic_slice(embeds, (0, i * W, 0), (B, W, C))
            pos0 = jnp.full((B,), i * W, jnp.int32)
            pos = pos0[:, None] + jnp.arange(W)[None]
            hidden, cache = self.decoder(chunk, pos, None, True,
                                         cache=cache, decode_pos=pos0)
            hit = (pos == last_idx[:, None])[..., None]  # [B, W, 1]
            last_h = jnp.where(hit.any(1), (hidden * hit).sum(1), last_h)
            return last_h, cache

        last_h0 = jnp.zeros((B, C), self.decoder.dtype)
        last_h, cache = jax.lax.fori_loop(0, n_chunks, step, (last_h0, cache))
        if self.output_adapter is not None:
            last_h = last_h + self.output_adapter(last_h)
        return self.lm_head(last_h).astype(jnp.float32), cache

    def extend_cache(self, tokens: jnp.ndarray, mask: jnp.ndarray,
                     start: jnp.ndarray, cache):
        """Append a NEW TURN to an existing conversation cache (multi-turn
        serving without re-prefilling history): ``tokens`` [B, Lt] right-
        padded per ``mask``, written from per-row slot ``start`` int[B].
        Stale writes past each row's real turn length sit beyond the
        attention validity horizon and are overwritten by subsequent decode
        steps (the same contiguity argument as speculative rejection).
        Returns (last-valid-token logits f32[B, V], cache, new_start int[B])."""
        logits, cache = self.decode_chunk(tokens, start, cache)
        tlen = mask.sum(-1).astype(jnp.int32)
        last = jnp.take_along_axis(
            logits, (tlen - 1).clip(0)[:, None, None], axis=1)[:, 0]
        return last, cache, start + tlen

    def generate(
        self, variables, batch: Mapping[str, Any],
        eos_id: int = 102, max_length: Optional[int] = None,
        num_beams: int = 1, use_cache: bool = True,
        speculative: int = 0, spec_ngram: int = 2,
        do_sample: bool = False, top_p: float = 0.9,
        temperature: float = 1.0, rng: Optional[jax.Array] = None,
    ):
        """Decode for the eval harnesses. Greedy (num_beams=1), true beam
        search (num_beams>1 — the reference accepts ``num_beams`` in every
        eval driver), or nucleus sampling (``do_sample`` + top_p/temperature
        — the reference HF-generate sampling surface). ``speculative=gamma
        > 0`` turns on prompt-lookup speculative greedy decoding
        (utils/speculative.py): gamma draft tokens verified per cache step,
        output tokens identical to plain greedy. Returns (tokens
        int[B, Lp+max_new] with generations written after each row's
        prompt, prompt_lens int[B])."""
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

        if not use_cache:
            return self._generate_reencode(
                variables, tokens0, lens, img, eos_id, max_new, total, B)

        gamma = int(speculative) if num_beams == 1 and not do_sample else 0
        Lv = self.num_vision_tokens(batch)
        T = Lv + Lp + max_new + (gamma + 1 if gamma else 0)
        preset = LM_PRESETS[self.lm_preset]

        # one stable jit per (module config, shapes, decode options): serving
        # calls generate per request, so the jit must be memoized (a fresh
        # @jax.jit each call would re-trace + recompile every request) and
        # must take ``variables`` as an ARGUMENT (closure capture would bake
        # the weights into the program as constants — a 1B-model constant
        # stalls the remote-compile relay on this rig)
        img_shape = None if img is None else tuple(jnp.shape(img))
        mode = ("sample" if do_sample
                else "beam" if num_beams > 1 else "greedy")
        key = (self, mode, B, Lp, max_new, eos_id, num_beams, img_shape,
               gamma, spec_ngram, do_sample, top_p, temperature)
        fn = _GEN_JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(self._build_cached_decode(
                Lp, max_new, eos_id, num_beams, B, total, Lv, T, preset,
                img is not None, gamma, spec_ngram, do_sample, top_p,
                temperature))
            _GEN_JIT_CACHE[key] = fn

        args = (variables, tokens0, mask) + (() if img is None else (img,))
        if do_sample:
            args += (rng if rng is not None else jax.random.PRNGKey(0),)
        tokens, _ = fn(*args)
        return tokens, lens

    def _build_cached_decode(self, Lp, max_new, eos_id, num_beams, B, total,
                             Lv, T, preset, has_img, gamma=0, spec_ngram=2,
                             do_sample=False, top_p=0.9, temperature=1.0):
        """Returns ``fn(variables, tokens0, mask[, img][, rng]) ->
        (tokens, aux)`` — the cached greedy/beam/sampling decode as one
        jittable program."""

        def make_cache():
            from antmmf_tpu.modules.llm import init_decoder_cache
            n_kv = preset["num_kv_heads"] or preset["num_heads"]
            return init_decoder_cache(
                preset["num_layers"], B, n_kv, T,
                preset["hidden"] // preset["num_heads"],
                jnp.dtype(self.dtype_str), quantized=self.kv_int8,
                stacked=self.scan_layers)

        def run(variables, tokens0, mask, img=None, rng=None):
            # weight-only int8 serving: variables prepared by
            # predictors.quantization.quantize_for_decode carry {"q","scale"}
            # records; dequantize per decode step behind an optimization
            # barrier so the per-token HBM weight read stays int8
            from antmmf_tpu.predictors.quantization import make_live_vars

            live_vars = make_live_vars(variables, jnp.dtype(self.dtype_str))
            lens = mask.sum(-1).astype(jnp.int32)

            def fwd_batch(tokens, cur_mask):
                fwd = {"input_ids": tokens, "input_mask": cur_mask}
                if img is not None:
                    fwd["image_data"] = img
                return fwd

            def decode_fn(tok, pos, cache):
                return self.apply(live_vars(step_mode=True), tok, pos, cache,
                                  method=PinkModel.decode_step)

            cache = make_cache()
            logits0, cache = self.apply(
                live_vars(), fwd_batch(tokens0[:, :Lp], mask), cache, lens,
                method=PinkModel.prefill)

            if num_beams > 1:
                from antmmf_tpu.utils.text_utils import beam_search_cached

                best, scores = beam_search_cached(
                    decode_fn, logits0, cache, Lv + lens, eos_id,
                    max_new=max_new, num_beams=num_beams)
                tokens = jax.vmap(
                    lambda row, gen, l: jax.lax.dynamic_update_slice(
                        row, gen, (l,)))(tokens0, best, lens)
                return tokens, scores

            if gamma > 0:
                from antmmf_tpu.utils.speculative import speculative_greedy

                def chunk_fn(chunk, start_off, cache):
                    return self.apply(
                        live_vars(step_mode=True), chunk,
                        Lv + lens + start_off, cache,
                        method=PinkModel.decode_chunk)

                buf = jnp.pad(tokens0, ((0, 0), (0, gamma + 1)))
                tokens, _, _ = speculative_greedy(
                    chunk_fn, logits0, cache, buf, lens, eos_id, max_new,
                    gamma=gamma, ngram=spec_ngram)
                return tokens[:, :total], lens

            if do_sample:
                from antmmf_tpu.utils.text_utils import (
                    nucleus_sampling_cached)

                gen = nucleus_sampling_cached(
                    decode_fn, logits0, cache, Lv + lens, rng, eos_id,
                    max_new=max_new, top_p=top_p, temperature=temperature)
                tokens = jax.vmap(
                    lambda row, g, l: jax.lax.dynamic_update_slice(
                        row, g, (l,)))(tokens0, gen, lens)
                return tokens, lens

            def emit(t, tokens, done, last_logits):
                nxt = jnp.argmax(last_logits, -1).astype(jnp.int32)
                nxt = jnp.where(done, eos_id, nxt)
                write = jax.nn.one_hot(lens + t, total, dtype=bool)
                tokens = jnp.where(write, nxt[:, None], tokens)
                return nxt, tokens, done | (nxt == eos_id)

            def step(t, carry):
                tokens, done, last_logits, cache = carry
                nxt, tokens, done = emit(t, tokens, done, last_logits)
                last_logits, cache = decode_fn(nxt, Lv + lens + t, cache)
                return tokens, done, last_logits, cache

            # the final token needs no trailing decode step (it would be a
            # full per-token forward whose logits are never read)
            tokens, done, last_logits, _ = jax.lax.fori_loop(
                0, max_new - 1, step,
                (tokens0, jnp.zeros((B,), bool), logits0, cache))
            _, tokens, _ = emit(max_new - 1, tokens, done, last_logits)
            return tokens, lens

        if has_img:
            if do_sample:
                return lambda variables, tokens0, mask, img, rng: run(
                    variables, tokens0, mask, img, rng)
            return lambda variables, tokens0, mask, img: run(
                variables, tokens0, mask, img)
        if do_sample:
            return lambda variables, tokens0, mask, rng: run(
                variables, tokens0, mask, None, rng)
        return lambda variables, tokens0, mask: run(variables, tokens0, mask)

    def _generate_reencode(self, variables, tokens0, lens, img, eos_id,
                           max_new, total, B):
        """Legacy full-prefix re-encoding greedy decode (the pre-KV-cache
        path) — kept as the regression anchor for the cached path."""

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
