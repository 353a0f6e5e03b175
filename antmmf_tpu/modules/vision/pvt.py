"""Pyramid Vision Transformer (PVT) backbone with spatial-reduction attention.

Reference parity: ``/root/reference/antmmf/modules/vision/backbone/pvt.py``
(695 LoC) and ``PVT/DetrBatchPVT`` encoders (visual_encoder.py:402) — the
visual tower of the dmae_vtp local-test configs. Fresh implementation of the
published PVT-v1 design: 4 stages of overlapping patch embedding + transformer
blocks whose K/V are spatially reduced by stage-specific ratios (SRA).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.modules.layers import LayerNorm, Mlp

Dtype = Any

PRESETS = {
    "pvt_tiny": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
                     heads=(1, 2, 5, 8), sr=(8, 4, 2, 1)),
    "pvt_small": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
                      heads=(1, 2, 5, 8), sr=(8, 4, 2, 1)),
    "pvt_test": dict(dims=(32, 64), depths=(1, 1), heads=(1, 2), sr=(4, 2)),
}

# PVT-v2 presets (reference pvt.py:561-640 pvt_v2_b0..b5; mlp_ratios 8/8/4/4,
# qkv_bias, overlapping patch embeds, depthwise-conv MLP, no pos embeds)
V2_PRESETS = {
    "pvt_v2_b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                      heads=(1, 2, 5, 8), sr=(8, 4, 2, 1),
                      mlp_ratios=(8, 8, 4, 4)),
    "pvt_v2_b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
                      heads=(1, 2, 5, 8), sr=(8, 4, 2, 1),
                      mlp_ratios=(8, 8, 4, 4)),
    "pvt_v2_b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
                      heads=(1, 2, 5, 8), sr=(8, 4, 2, 1),
                      mlp_ratios=(8, 8, 4, 4)),
    "pvt_v2_test": dict(dims=(16, 32), depths=(1, 1), heads=(1, 2), sr=(4, 2),
                        mlp_ratios=(4, 4)),
}


class SRAttention(nn.Module):
    """Attention with spatially-reduced keys/values (PVT's SRA)."""

    num_heads: int
    sr_ratio: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]):
        B, L, C = x.shape
        H, W = hw
        head_dim = C // self.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            grid = x.reshape(B, H, W, C)
            grid = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                           strides=(self.sr_ratio, self.sr_ratio),
                           dtype=self.dtype, name="sr")(grid)
            kv_in = LayerNorm(dtype=self.dtype, name="sr_norm")(
                grid.reshape(B, -1, C))
        else:
            kv_in = x
        k = nn.Dense(C, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(C, dtype=self.dtype, name="v")(kv_in)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhld,bhmd->bhlm", heads(q), heads(k),
                          preferred_element_type=jnp.float32) * head_dim ** -0.5
        probs = jax.nn.softmax(attn, -1).astype(self.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class PVTBlock(nn.Module):
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        x = x + SRAttention(self.num_heads, self.sr_ratio, self.dtype,
                            name="attention")(
            LayerNorm(dtype=self.dtype, name="norm1")(x), hw)
        x = x + Mlp(hidden_dim=int(x.shape[-1] * self.mlp_ratio),
                    dtype=self.dtype, name="mlp")(
            LayerNorm(dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic)
        return x


class PVTv2SRAttention(nn.Module):
    """PVT-v2 attention: linear q; k/v from conv-downsampled tokens.

    Functional parity with the reference ``Attention`` (pvt.py:318-423):
    qkv_bias on q/kv, packed kv projection, sr conv (k=sr, s=sr, VALID) +
    LayerNorm(eps=1e-5, the torch default — block norms use 1e-6).
    """

    num_heads: int
    sr_ratio: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]):
        B, L, C = x.shape
        H, W = hw
        head_dim = C // self.num_heads
        q = nn.Dense(C, use_bias=True, dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            grid = x.reshape(B, H, W, C)
            grid = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                           strides=(self.sr_ratio, self.sr_ratio),
                           padding="VALID", dtype=self.dtype, name="sr")(grid)
            kv_in = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="sr_norm")(
                grid.reshape(B, -1, C))
        else:
            kv_in = x
        kv = nn.Dense(2 * C, use_bias=True, dtype=self.dtype, name="kv")(kv_in)
        k, v = kv[..., :C], kv[..., C:]

        def heads(t):
            return t.reshape(B, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhld,bhmd->bhlm", heads(q), heads(k),
                          preferred_element_type=jnp.float32) * head_dim ** -0.5
        probs = jax.nn.softmax(attn, -1).astype(self.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class PVTv2Mlp(nn.Module):
    """fc1 → 3×3 depthwise conv → exact GELU → fc2 (reference Mlp+DWConv,
    pvt.py:266-316,536-547)."""

    hidden_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]):
        B, L, C = x.shape
        H, W = hw
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        grid = h.reshape(B, H, W, self.hidden_dim)
        grid = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                       feature_group_count=self.hidden_dim, dtype=self.dtype,
                       name="dwconv")(grid)
        h = grid.reshape(B, L, self.hidden_dim)
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="fc2")(h)


class PVTv2Block(nn.Module):
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw):
        x = x + PVTv2SRAttention(self.num_heads, self.sr_ratio, self.dtype,
                                 name="attention")(
            LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), hw)
        x = x + PVTv2Mlp(hidden_dim=int(x.shape[-1] * self.mlp_ratio),
                         dtype=self.dtype, name="mlp")(
            LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x), hw)
        return x


class PVTv2(nn.Module):
    """PVT-v2 backbone, exact functional parity with the reference
    ``PyramidVisionTransformer`` (pvt.py:119-266) for torch-weight import:
    4 stages of overlapping patch embedding (conv k7s4p3 / k3s2p1 + LN eps 1e-5)
    → pre-LN(1e-6) blocks with SR attention + DWConv MLP → stage LN(1e-6).

    Output: ``grid`` [B, h, w, C_last] (post final-stage norm), ``pooled``
    (mean over final tokens — forward_features' first return), ``pyramid``.
    """

    preset: str = "pvt_v2_b0"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        p = V2_PRESETS[self.preset]
        x = images.astype(self.dtype)
        pyramid = []
        n_stages = len(p["dims"])
        for si, (dim, depth, heads, sr, mlp_ratio) in enumerate(
                zip(p["dims"], p["depths"], p["heads"], p["sr"],
                    p["mlp_ratios"])):
            k, s, pad = (7, 4, 3) if si == 0 else (3, 2, 1)
            x = nn.Conv(dim, (k, k), strides=(s, s),
                        padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                        name=f"patch_embed{si}")(x)
            B, H, W, C = x.shape
            tokens = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name=f"embed_norm{si}")(x.reshape(B, H * W, C))
            for bi in range(depth):
                tokens = PVTv2Block(heads, sr, mlp_ratio, dtype=self.dtype,
                                    name=f"stage{si}_block{bi}")(tokens, (H, W))
            tokens = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                               name=f"stage_norm{si}")(tokens)
            if si == n_stages - 1:
                pooled = tokens.mean(axis=1)
            x = tokens.reshape(B, H, W, C)
            pyramid.append(x)
        return {"grid": x, "pooled": pooled, "pyramid": pyramid}


class PyramidVisionTransformer(nn.Module):
    preset: str = "pvt_small"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        """NHWC float → dict(grid [B, h, w, C_last], pooled, pyramid list)."""
        p = PRESETS[self.preset]
        x = images.astype(self.dtype)
        pyramid = []
        for si, (dim, depth, heads, sr) in enumerate(
                zip(p["dims"], p["depths"], p["heads"], p["sr"])):
            patch = 4 if si == 0 else 2
            x = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                        dtype=self.dtype, name=f"patch_embed{si}")(x)
            B, H, W, C = x.shape
            tokens = LayerNorm(dtype=self.dtype, name=f"embed_norm{si}")(
                x.reshape(B, H * W, C))
            # learned positions per stage (interpolatable at other res)
            pos = self.param(f"pos{si}", nn.initializers.normal(0.02),
                             (H * W, C), jnp.float32)
            tokens = tokens + pos[None].astype(tokens.dtype)
            for bi in range(depth):
                tokens = PVTBlock(heads, sr, dtype=self.dtype,
                                  name=f"stage{si}_block{bi}")(
                    tokens, (H, W), deterministic)
            x = tokens.reshape(B, H, W, C)
            pyramid.append(x)
        x = LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return {"grid": x, "pooled": x.mean(axis=(1, 2)), "pyramid": pyramid}
