"""Qwen2-ViT vision tower — the actual M2-omni image/video encoder.

Reference parity: ``/root/reference/prj/M2_omni/models/qwen2_vit.py:1-358``
(conv3d patchify, 2D rotary positions in spatial-merge order, per-image
attention via cu_seqlens, PatchMerger to the LM width) and
``configuration_qwen2_vit.py`` defaults (depth 32, embed 1280, heads 16).

TPU-first design deltas (same math, MXU/static-shape layout):

* fixed-grid batched input ``[B, T, H, W, 3]`` — the per-image block-diagonal
  varlen attention of the reference (``cu_seqlens``) IS the batch dimension
  here, so plain batched attention reproduces it exactly; dynamic resolution
  = per-shape jit specialization instead of ragged flattening;
* the stride-equal ``Conv3d`` patchify becomes a Dense over the flattened
  ``(C, tps, ps, ps)`` patch vector (identical linear map, importer maps the
  conv weight onto it);
* tokens are laid out in the reference's spatial-merge permuted order
  (t, h/m, w/m, m, m) so the 2D rope ids and the PatchMerger's
  4-consecutive-token grouping match the reference byte-for-byte.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

QWEN2_VIT_PRESETS = {
    # configuration_qwen2_vit.py defaults (hidden_size = the LM width the
    # merger projects into; 8192 upstream, overridable per LM preset)
    "qwen2_vit": dict(depth=32, embed_dim=1280, hidden_size=8192,
                      mlp_ratio=4.0, num_heads=16, patch_size=14,
                      spatial_merge_size=2, temporal_patch_size=2),
    "qwen2_vit_tiny_test": dict(depth=2, embed_dim=32, hidden_size=48,
                                mlp_ratio=2.0, num_heads=2, patch_size=4,
                                spatial_merge_size=2, temporal_patch_size=2),
}


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def vision_rope_freqs(hpos: np.ndarray, wpos: np.ndarray, head_dim: int,
                      theta: float = 10000.0) -> jnp.ndarray:
    """[L] (h, w) ids → rope angle table [L, head_dim/2]: first head_dim/4
    channels from h, next head_dim/4 from w (reference rot_pos_emb +
    VisionRotaryEmbedding(head_dim // 2))."""
    dim = head_dim // 2
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    fh = hpos[:, None].astype(np.float32) * inv[None]
    fw = wpos[:, None].astype(np.float32) * inv[None]
    return jnp.asarray(np.concatenate([fh, fw], axis=-1))


def apply_vision_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x [B, H, L, D]; freqs [L, D/2] (reference
    apply_rotary_pos_emb_vision: cos/sin tiled twice, rotate-half)."""
    emb = jnp.concatenate([freqs, freqs], axis=-1)[None, None]  # [1,1,L,D]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


class Qwen2VisionBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    # tower LoRA (the reference wrap_vit_lora finetuning recipe,
    # modeling_m2omni.py:301-309: target_modules = attn.qkv / attn.proj /
    # mlp.fc1 / mlp.fc2); base kernels stop-gradiented when frozen
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_freeze_base: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, freqs: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, L, C = x.shape
        H = self.num_heads
        hd = C // H
        frozen = self.lora_rank > 0 and self.lora_freeze_base

        def dense(f, name):
            # frozen base = frozen KERNEL/BIAS (stop_gradient on the
            # weights, not the output): activation grads still flow
            # W^T·dy — the true PEFT backward. Params keep nn.Dense's
            # exact tree ({name}/{kernel,bias}) for importer compat.
            def apply(inp):
                from antmmf_tpu.modules.lora import _BaseParams

                kernel, bias = _BaseParams(f, True, name=name)(
                    inp.shape[-1])
                if frozen:
                    kernel = jax.lax.stop_gradient(kernel)
                    bias = jax.lax.stop_gradient(bias)
                return (inp.astype(self.dtype) @ kernel.astype(self.dtype)
                        + bias.astype(self.dtype))

            return apply

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

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = maybe_lora(dense(3 * C, "qkv")(h), h, 3 * C, "qkv")
        qkv = qkv.reshape(B, L, 3, H, hd)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        q = apply_vision_rope(q, freqs)
        k = apply_vision_rope(k, freqs)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, C)
        x = x + maybe_lora(dense(C, "proj")(attn), attn, C, "proj")

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = maybe_lora(dense(int(C * self.mlp_ratio), "fc1")(h), h,
                       int(C * self.mlp_ratio), "fc1")
        h = quick_gelu(h)
        return x + maybe_lora(dense(C, "fc2")(h), h, C, "fc2")


class Qwen2VisionTransformer(nn.Module):
    """Returns ``{"sequence": [B, L/m², hidden_size], "grid_thw": (t, h/m,
    w/m)}`` — merged tokens in (t, h/m, w/m) raster order, ready for the
    LLM splice + get_rope_index grids."""

    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 8192
    mlp_ratio: float = 4.0
    num_heads: int = 16
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    image_size: int = 224  # informational default; any divisible H/W works
    # wrap_vit_lora equivalent: low-rank adapters on every block's
    # qkv/proj/fc1/fc2 with frozen base kernels (0 = off)
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_freeze_base: bool = True
    # rematerialize each block (dense video sampling folds frames into the
    # block batch; un-remat'd per-layer attention probs are the long-video
    # OOM)
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jnp.ndarray, deterministic: bool = True):
        """frames float[B, T, H, W, 3]; T divisible by temporal_patch_size
        (tile a single image to T=2 — the reference image processor does the
        same), H/W divisible by patch_size*spatial_merge_size."""
        if frames.ndim == 4:
            frames = frames[:, None]
        B, T, Hpix, Wpix, C = frames.shape
        ps, tps, m = self.patch_size, self.temporal_patch_size, \
            self.spatial_merge_size
        if T % tps:
            # single image (or odd frame count): repeat the last frame
            pad = tps - T % tps
            frames = jnp.concatenate(
                [frames, jnp.repeat(frames[:, -1:], pad, axis=1)], axis=1)
            T = frames.shape[1]
        t, h, w = T // tps, Hpix // ps, Wpix // ps
        assert h % m == 0 and w % m == 0, (h, w, m)

        x = frames.reshape(B, t, tps, h // m, m, ps, w // m, m, ps, C)
        # token order (t, h/m, w/m, m, m); patch vector order (C, tps, ps, ps)
        x = x.transpose(0, 1, 3, 6, 4, 7, 9, 2, 5, 8)
        L = t * h * w
        x = x.reshape(B, L, C * tps * ps * ps).astype(self.dtype)
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="patch_embed")(x)

        # 2D rope ids in the same permuted order (reference rot_pos_emb);
        # one temporal group's worth — attention is PER temporal group in the
        # reference (cu_seqlens = repeat_interleave(h*w, t), qwen2_vit.py:351),
        # so t folds into the batch dimension for the blocks
        hb = np.arange(h // m)
        wb = np.arange(w // m)
        mh = np.arange(m)
        mw = np.arange(m)
        hpos = (hb[:, None, None, None] * m + mh[None, None, :, None])
        wpos = (wb[None, :, None, None] * m + mw[None, None, None, :])
        hpos = np.broadcast_to(hpos, (h // m, w // m, m, m)).reshape(-1)
        wpos = np.broadcast_to(wpos, (h // m, w // m, m, m)).reshape(-1)
        head_dim = self.embed_dim // self.num_heads
        freqs = vision_rope_freqs(hpos, wpos, head_dim)

        x = x.reshape(B * t, h * w, self.embed_dim)
        block_cls = (nn.remat(Qwen2VisionBlock, static_argnums=(3,))
                     if self.remat else Qwen2VisionBlock)
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                lora_freeze_base=self.lora_freeze_base,
                dtype=self.dtype, name=f"layer_{i}")(x, freqs, deterministic)
        x = x.reshape(B, L, self.embed_dim)

        # PatchMerger: LN then group m*m consecutive tokens
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_q")(x)
        x = x.reshape(B, L // (m * m), m * m * self.embed_dim)
        x = nn.Dense(m * m * self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="merger_fc2")(x)
        return {"sequence": x, "grid_thw": (t, h // m, w // m)}


def build_qwen2_vit(preset: str = "qwen2_vit", **overrides):
    if preset not in QWEN2_VIT_PRESETS:
        raise KeyError(f"Unknown Qwen2-ViT preset {preset!r}; known: "
                       f"{sorted(QWEN2_VIT_PRESETS)}")
    kwargs = dict(QWEN2_VIT_PRESETS[preset])
    kwargs.update(overrides)
    return Qwen2VisionTransformer(**kwargs)
