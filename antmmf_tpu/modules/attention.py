"""Multi-head attention with a swappable compute core.

Two cores:
  * ``xla``   — einsum attention with fp32 softmax; XLA fuses this well at the
    50–500-token lengths of image/text towers.
  * ``pallas`` — blocked flash-attention TPU kernel (``antmmf_tpu/ops/pallas/
    flash_attention.py``) for long sequences (multi-frame video token streams);
    selected automatically when shapes qualify and the platform is TPU, or
    forced via config ``use_pallas_attention``.

This replaces the reference's torch ``nn.MultiheadAttention``/apex fused swap
(``/root/reference/antmmf/utils/optim_utils.py:18-93``): kernel choice is a config
knob, not a monkey-patch.

The sequence axis is shard-ready: q/k/v are produced per-head, and when the mesh
has a nontrivial ``seq`` axis the caller can wrap the core in shard_map with
all-to-all head exchange (Ulysses) — see ``antmmf_tpu/parallel/long_context.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def attention_probs(
    q: jnp.ndarray, k: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Softmax attention probabilities [B, H, Lq, Lk] (for word-importance
    consumers — reference univl_video_base.py:138-143 output_attentions)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def xla_attention_core(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    bias: Optional[jnp.ndarray] = None,  # additive [B, 1|H, Lq|1, Lk] fp32
    scale: Optional[float] = None,
) -> jnp.ndarray:
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def select_core(use_pallas: bool, q_shape, k_shape) -> str:
    """Measured on v5e: XLA's batched-GEMM attention wins up to ~2k tokens;
    past the [Lq, Lk] materialisation cliff the Pallas flash kernel wins big
    (17x at L=8192). Crossover ≈ 3k·3k score entries."""
    if not use_pallas:
        return "xla"
    if jax.default_backend() not in ("tpu", "axon"):
        return "xla"
    Lq, Lk = q_shape[-2], k_shape[-2]
    d = q_shape[-1]
    if Lq * Lk >= 3072 * 3072 and d in (64, 128):
        return "pallas"
    return "xla"


def _use_small_kernel(q_shape, k_shape) -> bool:
    """Short-sequence fused kernel (ops/pallas/small_attention.py).

    MEASURED OFF on v5e (round 2): at the flagship regime ([256, 12, 50, 64]
    bf16) the fused kernel is slower than XLA both standalone (1.97 vs 1.84 ms
    fwd, 4.06 vs 3.35 ms bwd) and in the full train step (91.8 vs 85.9 ms) —
    XLA already keeps the small score tensor in VMEM-resident fusions. The
    kernel stays available for explicit use; this router never selects it."""
    return False


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    core = select_core(use_pallas, q.shape, k.shape)
    # the flash kernel only supports key-padding biases (broadcast over
    # queries AND heads); query- or head-dependent biases (causal masks,
    # per-head relative biases) must use the XLA core
    if bias is not None and bias.ndim == 4 and (
            bias.shape[-2] > 1 or bias.shape[1] > 1):
        core = "xla"
    if core == "pallas":
        from antmmf_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, scale=scale)
    return xla_attention_core(q, k, v, bias=bias, scale=scale)


# Global default for MultiHeadAttention.fuse_qkv (None-valued fields fall
# back to this). MEASURED OFF on v5e (round 2b, BASELINE.md): the flagship
# retrieval step runs 85.7 ms with three separate q/k/v GEMMs vs 87.5 ms
# with the runtime-concat fused GEMM (and 123.7 ms with a single wide
# qkv_proj Dense) — XLA schedules the three narrow GEMMs better than one
# 3×-wide one at these shapes. The knob stays for other shape regimes.
FUSE_QKV_DEFAULT = False


class _ProjParams(nn.Module):
    """Declares ``kernel``/``bias`` with nn.Dense's exact naming and init so a
    fused-QKV GEMM stays checkpoint/import-compatible with three nn.Dense
    projections (params live at ``{q,k,v}_proj/{kernel,bias}`` either way)."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention. ``bias`` is an additive fp32 mask (see
    ``layers.make_attention_mask``)."""

    num_heads: int
    head_dim: Optional[int] = None
    dropout: float = 0.0
    use_pallas: bool = True
    # Fuse q/k/v projections into one [C, 3·inner] GEMM for self-attention
    # (one activation read from HBM instead of three per block; kernels are
    # concatenated at call time so the param tree is unchanged). None = use
    # the module-level FUSE_QKV_DEFAULT.
    fuse_qkv: Optional[bool] = None
    # sequence parallelism over the mesh `seq` axis: "none" | "ulysses" |
    # "ring". Engages only when the active mesh (registry key "mesh") has a
    # seq axis > 1 and the call is self-attention with a key-padding bias —
    # the long-video config's knob (projects/base_vtp/configs/long_video.yml).
    sequence_parallel: str = "none"
    # sow softmax probs to the "intermediates" collection (the reference's
    # output_attentions path feeding attentive masking)
    sow_attention: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    out_dim: Optional[int] = None

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
        x: jnp.ndarray,  # [B, Lq, C]
        kv: Optional[jnp.ndarray] = None,  # [B, Lk, C] (None = self-attention)
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_probs: bool = False,
        # incremental decoding (the caption/serving path — the reference
        # decodes via past_key_values; see modules/llm.py for the scheme):
        # * return_kv: project ``kv`` once and return (k, v) heads for reuse
        #   as ``cached_kv`` (cross-attention memory precompute)
        # * cached_kv: (k, v) [B, H, Lk, d] — skip the k/v projections
        # * cache {"k","v"} [B, H, T, d] + decode_pos int[B]: one-token
        #   self-attention decode; returns (out, new_cache)
        return_kv: bool = False,
        cached_kv: Optional[tuple] = None,
        cache: Optional[dict] = None,
        decode_pos: Optional[jnp.ndarray] = None,
    ):
        is_self = kv is None
        kv = x if kv is None else kv
        C = x.shape[-1]
        head_dim = self.head_dim or C // self.num_heads
        inner = self.num_heads * head_dim
        dense = functools.partial(
            nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype
        )

        def heads(t: jnp.ndarray) -> jnp.ndarray:
            B, L, _ = t.shape
            return t.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if return_kv:
            return (heads(dense(inner, name="k_proj")(kv)),
                    heads(dense(inner, name="v_proj")(kv)))
        if cached_kv is not None:
            q = heads(dense(inner, name="q_proj")(x))
            k, v = cached_kv
            out = attention_core(q, k, v, bias=bias,
                                 use_pallas=self.use_pallas)
            B, H, Lq, D = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H * D)
            return dense(self.out_dim or C, name="out_proj")(out)
        if cache is not None:
            # single-token self-attention decode (x is [B, 1, C])
            q = heads(dense(inner, name="q_proj")(x))
            k1 = heads(dense(inner, name="k_proj")(x))
            v1 = heads(dense(inner, name="v_proj")(x))
            T = cache["k"].shape[2]
            slot = (jnp.arange(T)[None] == decode_pos[:, None])  # [B, T]
            w = slot[:, None, :, None]
            new_cache = {
                "k": jnp.where(w, k1.astype(cache["k"].dtype), cache["k"]),
                "v": jnp.where(w, v1.astype(cache["v"].dtype), cache["v"]),
            }
            valid = (jnp.arange(T)[None] <= decode_pos[:, None])
            dbias = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
            out = attention_core(q, new_cache["k"], new_cache["v"],
                                 bias=dbias, use_pallas=False)
            B, H, Lq, D = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H * D)
            return dense(self.out_dim or C, name="out_proj")(out), new_cache

        fused = self.fuse_qkv if self.fuse_qkv is not None else FUSE_QKV_DEFAULT
        if fused and is_self:
            proj = functools.partial(_ProjParams, inner,
                                     param_dtype=self.param_dtype)
            wq, bq = proj(name="q_proj")(C)
            wk, bk = proj(name="k_proj")(C)
            wv, bv = proj(name="v_proj")(C)
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            b = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = x.astype(self.dtype) @ w + b
            q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = heads(dense(inner, name="q_proj")(x))
            k = heads(dense(inner, name="k_proj")(kv))
            v = heads(dense(inner, name="v_proj")(kv))

        probs = None
        if return_probs or self.sow_attention:
            probs = attention_probs(q, k, bias=bias)
        if self.sow_attention:
            # word-importance consumers read this via mutable=["intermediates"]
            self.sow("intermediates", "attention_probs", probs)
        sp_mesh = self._sp_mesh()
        kv_bias_ok = bias is None or (bias.ndim == 4 and bias.shape[1] == 1
                                      and bias.shape[2] == 1)
        if sp_mesh is not None and kv is x and kv_bias_ok:
            from antmmf_tpu.parallel.long_context import (
                ring_attention,
                ulysses_attention,
            )

            fn = ulysses_attention if self.sequence_parallel == "ulysses" \
                else ring_attention
            out = fn(q, k, v, sp_mesh, bias=bias)
        else:
            out = attention_core(q, k, v, bias=bias,
                                 use_pallas=self.use_pallas)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        B, H, Lq, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H * D)
        out = dense(self.out_dim or C, name="out_proj")(out)
        if return_probs:
            return out, probs
        return out
