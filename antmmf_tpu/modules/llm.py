"""Decoder-only LM blocks: RMSNorm, rotary embeddings (1D + 3D), GQA attention,
SwiGLU — the substrate for M2-omni-class multimodal LLMs.

Reference parity: ``/root/reference/prj/M2_omni/models/modeling_llama_3d.py``
(1239 LoC — LLaMA with 3D RoPE over (t, h, w) vision-token coordinates) and
``modeling_m2omni.py``. Fresh TPU-first implementation: static shapes, bf16
compute with fp32 RMSNorm, grouped-query attention, and position ids carried
explicitly so text tokens use 1D positions while vision tokens use (t, h, w)
split across head-dim thirds (the published 3D-RoPE scheme).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.modules.qdense import QuantDense

Dtype = Any

# ---------------------------------------------------------------------------
# KV cache
#
# The reference LLM family decodes through HF ``past_key_values``
# (modeling_llama_3d.py:900-1000; Pink eval model_vqav2.py:141 calls
# ``model.generate``). TPU-native equivalent: a static-shape explicit pytree —
# one {"k","v"} dict per layer, each [B, n_kv_heads, T, head_dim] with keys
# stored POST-RoPE — threaded through ``DecoderLM.__call__``. Two modes:
#   * prefill: the padded prompt chunk [B, Lp] runs the normal causal forward
#     and its k/v are written at slots 0..Lp-1 (dynamic_update_slice);
#   * decode: an L-token chunk per row at per-row contiguous slots
#     ``decode_pos..decode_pos+L-1`` (L=1 is the plain per-token step; L>1
#     serves speculative verify / chunked decode); attention reads the whole
#     cache with validity ``slot <= decode_pos + j`` per query j — generated
#     tokens progressively overwrite the stale right-padding slots, so
#     validity stays contiguous.
# ---------------------------------------------------------------------------


def init_decoder_cache(
    num_layers: int, batch: int, num_kv_heads: int, max_len: int,
    head_dim: int, dtype: Dtype = jnp.bfloat16, quantized: bool = False,
    stacked: bool = False,
) -> Union[List[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]]:
    """Zeroed per-layer KV cache pytree for ``DecoderLM`` decode.

    ``quantized=True`` stores k/v as int8 with one fp32 max-abs scale per
    (batch, head, slot) — halves the per-step HBM cache read vs bf16 (the
    decode bottleneck at long context / many serving slots) and doubles the
    max context per HBM byte. Attention dequantizes by folding the scales
    into the logits/probs rows, so the only full-size cache op is the
    int8→bf16 cast XLA fuses into the dot.

    ``stacked=True`` (the ``scan_layers`` layout) returns ONE dict whose
    arrays carry a leading ``[num_layers]`` dim — ``nn.scan`` slices a
    layer's cache per iteration and restacks the updates."""
    shape = (batch, num_kv_heads, max_len, head_dim)
    if quantized:
        sshape = shape[:-1] + (1,)
        one = lambda s=(): {  # noqa: E731
            "k": jnp.zeros(s + shape, jnp.int8),
            "k_scale": jnp.zeros(s + sshape, jnp.float32),
            "v": jnp.zeros(s + shape, jnp.int8),
            "v_scale": jnp.zeros(s + sshape, jnp.float32)}
        return (one((num_layers,)) if stacked
                else [one() for _ in range(num_layers)])
    if stacked:
        sh = (num_layers,) + shape
        return {"k": jnp.zeros(sh, dtype), "v": jnp.zeros(sh, dtype)}
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(num_layers)]


def quantize_kv(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, head, position) symmetric int8: [..., D] → (int8[..., D],
    f32 scale[..., 1])."""
    tf = t.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(tf), -1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(tf / scale), -127, 127).astype(jnp.int8)
    return q, scale


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                                  + self.epsilon)
        return (norm * scale).astype(self.dtype)


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                            / head_dim))


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def rope_cos_sin(
    positions: jnp.ndarray,  # int[B, L]
    head_dim: int,
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) tables [B, 1, L, D] f32 for 1D rotary positions. Computed
    ONCE per forward at the DecoderLM level and shared by every layer's q/k
    — per-layer recomputation is pure VPU transcendental work (44 redundant
    cos/sin evaluations on a 22-layer model, recomputed again in the remat
    backward), measurable against MFU on the 3D path."""
    inv = rope_frequencies(head_dim, theta)  # [D/2]
    freqs = positions[:, :, None].astype(jnp.float32) * inv  # [B, L, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None]  # [B, 1, L, D]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope_cs(x: jnp.ndarray, cos: jnp.ndarray,
                  sin: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


def apply_rope(
    x: jnp.ndarray,  # [B, H, L, D]
    positions: jnp.ndarray,  # int[B, L] or float
    theta: float = 10000.0,
) -> jnp.ndarray:
    """Rotary embedding in the LLaMA/HF rotate-half convention (channel j
    pairs with j+D/2) — exact weight compatibility with reference
    checkpoints (modeling_llama_3d.py:191-240)."""
    cos, sin = rope_cos_sin(positions, x.shape[-1], theta)
    return apply_rope_cs(x, cos, sin)


def mrope_sections(half: int) -> tuple:
    """Default temporal/height/width frequency split — the Qwen2-VL ratio
    (16/24/24 of 64): h = w = round(3·half/8), t = the remainder."""
    hw = max(1, round(3 * half / 8))
    return (half - 2 * hw, hw, hw)


def rope_cos_sin_3d(
    positions: jnp.ndarray,  # int[B, L, 3]
    head_dim: int,
    theta: float = 10000.0,
    sections: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) tables [B, 1, L, D] f32 for 3D mrope positions (see
    apply_rope_3d); hoisted per-forward like rope_cos_sin."""
    half = head_dim // 2
    sections = tuple(sections) if sections else mrope_sections(half)
    assert sum(sections) == half, (sections, half)
    inv = rope_frequencies(head_dim, theta)  # [half]
    # per-axis angles [3, B, L, half]
    fa = jnp.stack([positions[..., a][:, :, None].astype(jnp.float32) * inv
                    for a in range(3)])
    axis_idx = np.concatenate([np.full(s, i % 3) for i, s in
                               enumerate(sections)])  # [half], static
    onehot = jax.nn.one_hot(axis_idx, 3, dtype=jnp.float32).T  # [3, half]
    freqs = (fa * onehot[:, None, None, :]).sum(axis=0)  # [B, L, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None]  # [B, 1, L, D]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope_3d(
    x: jnp.ndarray,  # [B, H, L, D]
    positions: jnp.ndarray,  # int[B, L, 3] — (t, h, w); text rows use (p, p, p)
    theta: float = 10000.0,
    sections: Optional[tuple] = None,
) -> jnp.ndarray:
    """Multimodal 3D rotary embedding — the EXACT reference scheme
    (modeling_llama_3d.py:197-240 `apply_rotary_pos_emb` + Qwen2-VL mrope):
    one inv_freq table over the full head dim; the D/2 frequency channels
    split into ``sections`` bands whose angles come from the temporal /
    height / width position streams respectively (band i ← axis i mod 3);
    rotate-half application as in 1D."""
    cos, sin = rope_cos_sin_3d(positions, x.shape[-1], theta, sections)
    return apply_rope_cs(x, cos, sin)


class GQAttention(nn.Module):
    """Grouped-query attention with rotary positions and causal+padding mask.

    Long sequences (≥ the measured flash crossover) with head_dim 64/128 route
    through the causal Pallas flash kernel; the additive ``bias`` must then be
    a key-padding bias + causal (which the kernel applies itself)."""

    num_heads: int
    num_kv_heads: Optional[int] = None
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_3d: bool = False
    # LoRA adapters on the attention projections. Default targets q/v (the
    # Pink finetuning recipe — reference trains low-rank adapters on the
    # decoder attention, pink/model/adapter.py); the M2-omni recipe targets
    # all four (wrap_llm_lora, modeling_m2omni.py:311-326 — q/k/v/o). With
    # lora_freeze_base the base projections are stop-gradiented so only the
    # adapters (and whatever else the optimizer sees) receive gradients
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_freeze_base: bool = True
    lora_targets: Tuple[str, ...] = ("q", "v")
    use_pallas: bool = True
    # decoder self-attention: apply causal masking INSIDE this module (bias
    # is then key-padding only) — a fused iota comparison or the flash
    # kernel's block skipping, never a materialized [L, L] mask
    causal: bool = False
    # sequence parallelism over the mesh `seq` axis: "none" | "ring" |
    # "ulysses". Engages on the cache-free (train/prefill-study) forward when
    # the active mesh (registry key "mesh") has a seq axis > 1: tokens arrive
    # sharded over `seq` and attention runs position-correct causal ring
    # attention (grouped-KV-native — K/V rotate at the kv-head count) or
    # Ulysses head exchange. KV-cache decode stays data-parallel: generation
    # is HBM-bound on the cache read, which SP would replicate, and decode
    # L is 1-gamma tokens — there is no sequence to shard. The long-video
    # escape hatch for the >16k-token streams the reference trains on
    # A100-80GB nodes (prj/M2_omni/models/modeling_llama_3d.py:1).
    sequence_parallel: str = "none"
    dtype: Dtype = jnp.bfloat16

    def _sp_mesh(self):
        if self.sequence_parallel == "none":
            return None
        from antmmf_tpu.common.registry import registry as _reg

        mesh = _reg.get("mesh", default=None)
        if mesh is not None and mesh.shape.get("seq", 1) > 1:
            return mesh
        return None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, L, C]
        positions: jnp.ndarray,  # [B, L] or [B, L, 3]
        bias: Optional[jnp.ndarray] = None,  # additive [B|1, 1, L|1, L]
        deterministic: bool = True,
        cache: Optional[Dict[str, jnp.ndarray]] = None,  # {"k","v"} [B,kvh,T,d]
        decode_pos: Optional[jnp.ndarray] = None,  # int[B] decode slot
        rope_cs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        B, L, C = x.shape
        n_kv = self.num_kv_heads or self.num_heads
        head_dim = self.head_dim or C // self.num_heads

        # QuantDense == nn.Dense(use_bias=False) at init/train; at serving
        # it consumes int4-packed kernels (modules/qdense.py). LoRA-frozen
        # targets freeze the KERNEL (stop_gradient on the weight): no
        # weight grad, but the activation gradient still flows W^T·dy —
        # the true PEFT backward. The old output-level stop_gradient
        # silently restricted upstream grads to the rank-r adapter path.
        def dense(f, name):
            frozen = (self.lora_rank > 0 and self.lora_freeze_base
                      and name.split("_")[0] in self.lora_targets)
            return QuantDense(f, dtype=self.dtype, param_dtype=jnp.float32,
                              freeze=frozen, name=name)

        def maybe_lora(base_out, inp, feats, name):
            if self.lora_rank <= 0 or name not in self.lora_targets:
                return base_out
            a = self.param(f"{name}_lora_a", nn.initializers.normal(0.02),
                           (inp.shape[-1], self.lora_rank), jnp.float32)
            b = self.param(f"{name}_lora_b", nn.initializers.zeros,
                           (self.lora_rank, feats), jnp.float32)
            scale = self.lora_alpha / self.lora_rank
            delta = (inp.astype(jnp.float32) @ a @ b) * scale
            return base_out + delta.astype(base_out.dtype)

        def heads(t, n):
            return t.reshape(B, L, n, head_dim).transpose(0, 2, 1, 3)

        qf = self.num_heads * head_dim
        kvf = n_kv * head_dim
        q = heads(maybe_lora(dense(qf, "q_proj")(x), x, qf, "q"),
                  self.num_heads)
        k = heads(maybe_lora(dense(kvf, "k_proj")(x), x, kvf, "k"), n_kv)
        v = heads(maybe_lora(dense(kvf, "v_proj")(x), x, kvf, "v"), n_kv)

        if rope_cs is None:  # standalone use; DecoderLM hoists the tables
            rope_cs = (rope_cos_sin_3d(positions, head_dim, self.rope_theta)
                       if self.rope_3d
                       else rope_cos_sin(positions, head_dim,
                                         self.rope_theta))
        q = apply_rope_cs(q, *rope_cs)
        k = apply_rope_cs(k, *rope_cs)

        new_cache = None
        k_scale_row = v_scale_row = None  # int8-cache scale rows [B, H, 1, T]
        if cache is not None:
            quant = "k_scale" in cache
            if decode_pos is None:
                # prefill: write the chunk at slots 0..L-1 (keys post-RoPE,
                # kv-head count — repeated lazily at decode)
                if quant:
                    kq, ks = quantize_kv(k)
                    vq, vs = quantize_kv(v)
                    upd = jax.lax.dynamic_update_slice
                    new_cache = {
                        "k": upd(cache["k"], kq, (0, 0, 0, 0)),
                        "k_scale": upd(cache["k_scale"], ks, (0, 0, 0, 0)),
                        "v": upd(cache["v"], vq, (0, 0, 0, 0)),
                        "v_scale": upd(cache["v_scale"], vs, (0, 0, 0, 0)),
                    }
                else:
                    new_cache = {
                        "k": jax.lax.dynamic_update_slice(
                            cache["k"], k.astype(cache["k"].dtype),
                            (0, 0, 0, 0)),
                        "v": jax.lax.dynamic_update_slice(
                            cache["v"], v.astype(cache["v"].dtype),
                            (0, 0, 0, 0)),
                    }
                # attention below runs on the fresh chunk exactly as uncached
            else:
                # decode: an L-token chunk per row written at CONTIGUOUS
                # slots decode_pos..decode_pos+L-1 (L == 1 is the plain
                # per-token step; L > 1 is the speculative verify / chunked
                # decode), then attend over the cache with causal validity
                # slot <= decode_pos + j for query j
                T = cache["k"].shape[2]

                def row_write(big, upd, pos):
                    # [H, T, D] <- [H, L, D] at slot ``pos`` (contiguous)
                    return jax.vmap(
                        lambda c, u, p: jax.lax.dynamic_update_slice(
                            c, u, (0, p, 0)))(big, upd, pos)

                if quant:
                    kq, ks = quantize_kv(k)
                    vq, vs = quantize_kv(v)
                    new_cache = {
                        "k": row_write(cache["k"], kq, decode_pos),
                        "k_scale": row_write(cache["k_scale"], ks, decode_pos),
                        "v": row_write(cache["v"], vq, decode_pos),
                        "v_scale": row_write(cache["v_scale"], vs, decode_pos),
                    }
                    # int8 stays the HBM-resident operand; scales fold into
                    # the logits/probs rows after the dot
                    k = new_cache["k"].astype(self.dtype)
                    v = new_cache["v"].astype(self.dtype)
                    k_scale_row = new_cache["k_scale"][..., 0][:, :, None, :]
                    v_scale_row = new_cache["v_scale"][..., 0][:, :, None, :]
                else:
                    new_cache = {
                        "k": row_write(cache["k"], k.astype(cache["k"].dtype),
                                       decode_pos),
                        "v": row_write(cache["v"], v.astype(cache["v"].dtype),
                                       decode_pos),
                    }
                    k, v = new_cache["k"], new_cache["v"]
                qpos = decode_pos[:, None] + jnp.arange(L)[None]  # [B, L]
                valid = (jnp.arange(T)[None, None]
                         <= qpos[:, :, None])  # [B, L, T]
                bias = jnp.where(valid, 0.0, -1e30)[:, None]

        sp_mesh = self._sp_mesh() if cache is None else None
        kv_bias_ok = bias is None or (bias.ndim == 4 and bias.shape[1] == 1
                                      and bias.shape[2] == 1)
        if sp_mesh is not None and kv_bias_ok:
            from antmmf_tpu.parallel.long_context import (
                ring_attention,
                ulysses_attention,
            )

            if self.sequence_parallel == "ulysses":
                # Ulysses exchanges heads, so K/V must match the query head
                # count — the expansion is local (never crosses ICI)
                if n_kv != self.num_heads:
                    rep = self.num_heads // n_kv
                    k = jnp.repeat(k, rep, axis=1)
                    v = jnp.repeat(v, rep, axis=1)
                out = ulysses_attention(q, k, v, sp_mesh, bias=bias,
                                        causal=self.causal)
            else:  # ring: grouped-KV native, K/V rotate at n_kv heads
                out = ring_attention(q, k, v, sp_mesh, bias=bias,
                                     causal=self.causal)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)
            return maybe_lora(dense(C, "o_proj")(out), out, C, "o")

        # cache-decode GQA attends GROUPED (q reshaped [B, kv, rep, L, d]
        # against the kv-head cache) instead of repeating k/v to num_heads:
        # a materialized repeat multiplies the per-step cache HBM read by
        # rep (4x on omni_1b) and decode is bandwidth-bound
        grouped = (decode_pos is not None and n_kv != self.num_heads)
        if n_kv != self.num_heads and not grouped:  # expand kv groups
            rep = self.num_heads // n_kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        def causal_bias_or_none():
            # causality applied HERE via a fused iota comparison, so no
            # caller ever materializes (or constant-folds) an [L, L] mask —
            # at 16k vision tokens that tensor is 1 GB of f32. Only built
            # on the XLA core path (the flash kernel masks block-wise);
            # ``bias`` is key-padding only [B, 1, 1, L].
            if not (self.causal and decode_pos is None):
                return None
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L, L), 2)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L, L), 3)
            return jnp.where(rows >= cols, 0.0, -1e30)

        use_flash = (
            self.use_pallas
            and jax.default_backend() in ("tpu", "axon")
            and L * L >= 3072 * 3072
            and head_dim in (64, 128)
            and (self.causal or bias is None or bias.shape[2] == 1)
        )
        if use_flash:
            from antmmf_tpu.ops.pallas.flash_attention import flash_attention

            # the kernel applies causality itself (block-skipped lower
            # triangle); pass only the key-padding row
            kv_bias = bias[:, 0, -1, :] if bias is not None else None
            out = flash_attention(q, k, v, bias=kv_bias, causal=True)
        elif grouped:
            rep = self.num_heads // n_kv
            qg = q.reshape(B, n_kv, rep, L, head_dim)
            logits = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k,
                                preferred_element_type=jnp.float32)
            if k_scale_row is not None:  # [B, kv, 1, T] per-slot key scales
                logits = logits * k_scale_row[:, :, None]
            logits = logits * (head_dim ** -0.5)
            if bias is not None:  # [B, 1, L, T] → broadcast over (g, r)
                logits = logits + bias[:, :, None]
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(
                self.dtype)
            if v_scale_row is not None:  # fold value scales into probs
                probs = probs * v_scale_row[:, :, None].astype(probs.dtype)
            out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v).reshape(
                B, self.num_heads, L, head_dim)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            if k_scale_row is not None:  # int8 cache: per-slot key scales
                logits = logits * k_scale_row
            logits = logits * (head_dim ** -0.5)
            if bias is not None:
                logits = logits + bias
            causal_bias = causal_bias_or_none()
            if causal_bias is not None:
                logits = logits + causal_bias
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(
                self.dtype)
            if v_scale_row is not None:  # fold value scales into probs
                probs = probs * v_scale_row.astype(probs.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)
        out = maybe_lora(dense(C, "o_proj")(out), out, C, "o")
        if cache is not None:
            return out, new_cache
        return out


class SwiGLU(nn.Module):
    hidden_dim: int
    # LoRA on gate/up/down (the M2-omni wrap_llm_lora recipe targets the
    # MLP projections too, modeling_m2omni.py:311-326); 0 = plain MLP
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_freeze_base: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # QuantDense == nn.Dense(use_bias=False) at init/train; at serving
        # it consumes int4-packed kernels (modules/qdense.py). Frozen base
        # = frozen KERNEL (see GQAttention: weight grads stop, activation
        # grads flow W^T·dy — the true PEFT backward)
        frozen = self.lora_rank > 0 and self.lora_freeze_base
        dense = lambda f, name: QuantDense(  # noqa: E731
            f, dtype=self.dtype, param_dtype=jnp.float32, freeze=frozen,
            name=name)

        def maybe_lora(base_out, inp, feats, name):
            if self.lora_rank <= 0:
                return base_out
            a = self.param(f"{name}_lora_a", nn.initializers.normal(0.02),
                           (inp.shape[-1], self.lora_rank), jnp.float32)
            b = self.param(f"{name}_lora_b", nn.initializers.zeros,
                           (self.lora_rank, feats), jnp.float32)
            scale = self.lora_alpha / self.lora_rank
            delta = (inp.astype(jnp.float32) @ a @ b) * scale
            return base_out + delta.astype(base_out.dtype)

        C, Dh = x.shape[-1], self.hidden_dim
        h = nn.silu(maybe_lora(dense(Dh, "gate_proj")(x), x, Dh, "gate")) \
            * maybe_lora(dense(Dh, "up_proj")(x), x, Dh, "up")
        return maybe_lora(dense(C, "down_proj")(h), h, C, "down")


class SerialAdapter(nn.Module):
    """Pink-style bottleneck adapter (reference AdapterLayer,
    prj/Pink/pink/model/adapter.py:24-58): ``x + B(act(A(x)))``, biased
    down/up projections, optional SiLU. Inserted after the pre-attention /
    pre-MLP norms (LlamaAdapterDecoderLayer, adapter.py:286-361)."""

    hidden_dim: int = 8
    non_linear: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        down = nn.Dense(self.hidden_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="down")(x)
        if self.non_linear:
            down = nn.silu(down)
        up = nn.Dense(x.shape[-1], dtype=self.dtype,
                      param_dtype=jnp.float32, name="up")(down)
        return x + up


class DecoderLayer(nn.Module):
    num_heads: int
    num_kv_heads: Optional[int] = None
    mlp_ratio: float = 2.6875  # llama-style 8/3 rounded
    rope_theta: float = 10000.0
    rope_3d: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_freeze_base: bool = True
    # ("q", "v") = Pink recipe; ("q", "k", "v", "o") + lora_mlp=True = the
    # M2-omni wrap_llm_lora recipe (all seven projections)
    lora_targets: Tuple[str, ...] = ("q", "v")
    lora_mlp: bool = False
    # Pink serial adapters (reference adapter.py): bottleneck after the
    # input norm (adapter_attn) and optionally after the post-attn norm
    # (adapter_mlp); 0 = off
    adapter_dim: int = 0
    adapter_mlp: bool = False
    adapter_non_linear: bool = False
    # causal masking applied inside GQAttention (never a caller-side [L, L]
    # mask); True for decoder LMs
    causal: bool = False
    # sequence parallelism for the attention (see GQAttention.sequence_parallel)
    sequence_parallel: str = "none"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, bias=None, deterministic: bool = True,
                 cache=None, decode_pos=None, rope_cs=None):
        h = RMSNorm(dtype=self.dtype, name="input_norm")(x)
        if self.adapter_dim:
            h = SerialAdapter(hidden_dim=self.adapter_dim,
                              non_linear=self.adapter_non_linear,
                              dtype=self.dtype, name="adapter_attn")(h)
        attn_out = GQAttention(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            rope_theta=self.rope_theta, rope_3d=self.rope_3d,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_freeze_base=self.lora_freeze_base,
            lora_targets=self.lora_targets, causal=self.causal,
            sequence_parallel=self.sequence_parallel, dtype=self.dtype,
            name="attention")(h, positions, bias, deterministic,
                              cache=cache, decode_pos=decode_pos,
                              rope_cs=rope_cs)
        new_cache = None
        if cache is not None:
            attn_out, new_cache = attn_out
        x = x + attn_out
        h = RMSNorm(dtype=self.dtype, name="post_attn_norm")(x)
        if self.adapter_dim and self.adapter_mlp:
            h = SerialAdapter(hidden_dim=self.adapter_dim,
                              non_linear=self.adapter_non_linear,
                              dtype=self.dtype, name="adapter_mlp_layer")(h)
        out = x + SwiGLU(hidden_dim=int(x.shape[-1] * self.mlp_ratio),
                         lora_rank=self.lora_rank if self.lora_mlp else 0,
                         lora_alpha=self.lora_alpha,
                         lora_freeze_base=self.lora_freeze_base,
                         dtype=self.dtype, name="mlp")(h)
        if cache is not None:
            return out, new_cache
        return out


class _ScanDecoderBody(DecoderLayer):
    """DecoderLayer in scan calling convention: ``(carry, cache_slice)`` →
    ``(carry, new_cache_slice)`` with everything else broadcast. The cache
    slice rides the scan's xs/ys axis (one layer per iteration); on the
    cache-free training forward it is None and the ys leg is empty.
    ``deterministic`` is a module ATTRIBUTE (not a call arg) so the body
    stays remat-able without static_argnums plumbing through nn.scan's
    broadcast tracing."""

    deterministic: bool = True

    def __call__(self, carry, cache=None, positions=None, bias=None,
                 decode_pos=None, rope_cs=None):
        from antmmf_tpu.parallel.partitioning import shard_batch_dim

        out = super().__call__(
            shard_batch_dim(carry, seq=self.sequence_parallel != "none"),
            positions, bias, self.deterministic,
            cache=cache, decode_pos=decode_pos, rope_cs=rope_cs)
        if cache is not None:
            return out  # (x, layer_cache) — scan restacks the ys leg
        return out, None


class DecoderLM(nn.Module):
    """Causal decoder over embedded inputs (token embedding handled by the
    caller so multimodal prefixes can be spliced in)."""

    num_layers: int
    num_heads: int
    num_kv_heads: Optional[int] = None
    mlp_ratio: float = 2.6875
    rope_theta: float = 10000.0
    rope_3d: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_freeze_base: bool = True
    lora_targets: Tuple[str, ...] = ("q", "v")
    lora_mlp: bool = False
    adapter_dim: int = 0
    adapter_mlp: bool = False
    adapter_non_linear: bool = False
    # rematerialize each decoder layer in the training (cache-free) forward:
    # activations are recomputed in the backward pass instead of saved —
    # O(1-layer) live activations instead of O(num_layers); the memory knob
    # that lets 1B-class training fit a 16 GB chip (attention logits alone
    # are [B, H, L, L] f32 per layer when L is below the flash crossover)
    remat: bool = False
    # fold the layer stack into ONE nn.scan body (params carry a leading
    # [num_layers] dim under "layers/"; the KV cache is the stacked dict of
    # init_decoder_cache(stacked=True)). This is the production-scale
    # memory/compile structure: combined with ``remat`` the backward
    # re-gathers ONE layer's fsdp-sharded weights at a time and
    # reduce-scatters its grads before the next, so per-device temp is
    # O(one layer) instead of O(whole model) — a python loop lets XLA hoist
    # every all-gather and keep all grads live (AOT-measured 65 GB/device
    # for the 7B configs, BASELINE round 4). Keep OFF when importing
    # per-layer external checkpoints (stack with ``stack_decoder_layers``).
    scan_layers: bool = False
    # sequence parallelism over the mesh `seq` axis for the cache-free
    # forward: "none" | "ring" | "ulysses" (see GQAttention). The activation
    # stream should be sharded P(data, seq, None) by the caller; attention is
    # the only op that mixes positions, so everything else (norms, MLPs,
    # rope) shards token-wise for free.
    sequence_parallel: str = "none"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        embeds: jnp.ndarray,  # [B, L, C]
        positions: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,  # [B, L] 1=valid
        deterministic: bool = True,
        cache: Optional[List[Dict[str, jnp.ndarray]]] = None,
        decode_pos: Optional[jnp.ndarray] = None,  # int[B] — decode mode
    ):
        """Without ``cache``: the plain causal forward (returns hidden).
        With ``cache`` (see ``init_decoder_cache``): returns
        ``(hidden, new_cache)`` — prefill when ``decode_pos`` is None
        (chunk written at slots 0..L-1), single-token decode otherwise."""
        L = embeds.shape[1]
        if cache is not None and decode_pos is not None:
            bias = None  # attention builds the cache-validity bias itself
        else:
            # key-padding only [B, 1, 1, L]; causality is applied inside
            # GQAttention (fused iota comparison / the flash kernel's block
            # skipping, via the layers' causal=True field) — an explicit
            # [L, L] mask here is 1 GB of f32 at 16k-token video streams
            bias = None
            if attention_mask is not None:
                bias = jnp.where(attention_mask[:, None, None, :] > 0,
                                 0.0, -1e30).astype(jnp.float32)
        x = embeds
        new_cache = [] if cache is not None else None
        # rope cos/sin hoisted: ONE transcendental evaluation per forward
        # shared by all layers' q/k (and saved across the remat boundary —
        # under nn.remat a per-layer table would be recomputed 2x per layer
        # in the backward as well)
        head_dim = embeds.shape[-1] // self.num_heads
        if not self.rope_3d and positions.ndim == 3:
            # 1D-rope ablation fed 3D position streams: use the temporal
            # channel (== the sequential base on text rows)
            positions = positions[..., 0]
        rope_cs = (rope_cos_sin_3d(positions, head_dim, self.rope_theta)
                   if self.rope_3d
                   else rope_cos_sin(positions, head_dim, self.rope_theta))
        common = dict(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            mlp_ratio=self.mlp_ratio, rope_theta=self.rope_theta,
            rope_3d=self.rope_3d, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_freeze_base=self.lora_freeze_base,
            lora_targets=self.lora_targets, lora_mlp=self.lora_mlp,
            adapter_dim=self.adapter_dim, adapter_mlp=self.adapter_mlp,
            adapter_non_linear=self.adapter_non_linear,
            causal=True, sequence_parallel=self.sequence_parallel,
            dtype=self.dtype)
        if self.scan_layers:
            # remat only the training forward — prefill/decode keep their
            # activations (no backward exists); prevent_cse is safe under
            # scan (iterations are already isolated)
            body_cls = (nn.remat(_ScanDecoderBody, prevent_cse=False)
                        if self.remat and cache is None else _ScanDecoderBody)
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0 if cache is not None else nn.broadcast,
                         nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast),
                length=self.num_layers,
            )(deterministic=deterministic, name="layers", **common)
            x, new_cache = scanned(x, cache, positions, bias,
                                   decode_pos, rope_cs)
            x = RMSNorm(dtype=self.dtype, name="final_norm")(x)
            return (x, new_cache) if cache is not None else x
        # deterministic (index 4; 0 = the module) is the only non-array arg
        # on the cache-free path
        layer_cls = (nn.remat(DecoderLayer, static_argnums=(4,))
                     if self.remat and cache is None else DecoderLayer)
        from antmmf_tpu.parallel.partitioning import shard_batch_dim
        for i in range(self.num_layers):
            layer = layer_cls(name=f"layer_{i}", **common)
            if cache is not None:
                x, lc = layer(x, positions, bias, deterministic,
                              cache=cache[i], decode_pos=decode_pos,
                              rope_cs=rope_cs)
                new_cache.append(lc)
            else:
                # keep the remat-saved layer boundary SHARDED over the data
                # axes (without the hint GSPMD's involuntary reshards around
                # fsdp kernels leave it replicated per device) — and over
                # `seq` when sequence-parallel, so saved activations stay
                # O(L/P) per device
                x = layer(shard_batch_dim(
                    x, seq=self.sequence_parallel != "none"),
                    positions, bias, deterministic, rope_cs=rope_cs)
        x = RMSNorm(dtype=self.dtype, name="final_norm")(x)
        if cache is not None:
            return x, new_cache
        return x

    def make_cache(self, batch: int, max_len: int, hidden: int,
                   dtype: Dtype = None, quantized: bool = False,
                   ) -> Union[List[Dict[str, jnp.ndarray]],
                              Dict[str, jnp.ndarray]]:
        n_kv = self.num_kv_heads or self.num_heads
        head_dim = hidden // self.num_heads
        return init_decoder_cache(self.num_layers, batch, n_kv, max_len,
                                  head_dim, dtype or self.dtype,
                                  quantized=quantized,
                                  stacked=self.scan_layers)


def stack_decoder_layers(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a per-layer DecoderLM param dict (``layer_0..layer_{N-1}`` +
    ``final_norm``) into the ``scan_layers`` layout (ONE ``layers`` subtree
    whose leaves carry a leading ``[N]`` dim). Use after importing external
    per-layer checkpoints (``convert_checkpoint``) when the target config
    sets ``scan_layers: true``; ``unstack_decoder_layers`` is the inverse."""
    idx = sorted(int(k.split("_")[1]) for k in decoder_params
                 if k.startswith("layer_") and k.split("_")[1].isdigit())
    if not idx:
        return dict(decoder_params)
    per_layer = [decoder_params[f"layer_{i}"] for i in idx]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *per_layer)
    out = {k: v for k, v in decoder_params.items()
           if not (k.startswith("layer_") and k.split("_")[1].isdigit())}
    out["layers"] = stacked
    return out


def unstack_decoder_layers(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of ``stack_decoder_layers``: split the stacked ``layers``
    subtree back into per-layer ``layer_i`` names (loop layout)."""
    if "layers" not in decoder_params:
        return dict(decoder_params)
    stacked = decoder_params["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in decoder_params.items() if k != "layers"}
    for i in range(n):
        out[f"layer_{i}"] = jax.tree_util.tree_map(
            lambda leaf, i=i: leaf[i], stacked)
    return out
