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
