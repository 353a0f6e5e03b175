"""Video Swin Transformer: 3D shifted-window attention backbone.

Reference parity: ``/root/reference/antmmf/modules/vision/backbone/video_swin.py``
(651 LoC torch) / ``VideoSwinEncoder`` (modules/encoders/visual_encoder.py:334).
Fresh TPU-first implementation of the published architecture (Liu et al.,
"Video Swin Transformer"): 3D patch embedding, windows of (T, H, W) tokens,
cyclic shifts with an attention mask, relative position bias, patch merging
between stages. All window reshapes are static; attention runs batched over
windows (one big MXU matmul stream).
"""

from __future__ import annotations

import itertools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.modules.layers import LayerNorm, Mlp

Dtype = Any

PRESETS = {
    "swin_tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_test": dict(embed_dim=32, depths=(1, 1), num_heads=(2, 2)),
}


def window_partition(x: jnp.ndarray, ws: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, T, H, W, C] → [B*nW, wt*wh*ww, C]."""
    B, T, H, W, C = x.shape
    wt, wh, ww = ws
    x = x.reshape(B, T // wt, wt, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wt * wh * ww, C)


def window_reverse(windows: jnp.ndarray, ws: Tuple[int, int, int],
                   B: int, T: int, H: int, W: int) -> jnp.ndarray:
    wt, wh, ww = ws
    x = windows.reshape(B, T // wt, H // wh, W // ww, wt, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, T, H, W, -1)


def compute_shift_mask(dims: Tuple[int, int, int], ws: Tuple[int, int, int],
                       shift: Tuple[int, int, int]) -> jnp.ndarray:
    """Attention mask for shifted windows: [nW, L, L] additive fp32."""
    T, H, W = dims
    img_mask = jnp.zeros((1, T, H, W, 1))
    cnt = 0
    for t_sl, h_sl, w_sl in itertools.product(
        (slice(0, -ws[0]), slice(-ws[0], -shift[0]), slice(-shift[0], None))
        if shift[0] else (slice(None),),
        (slice(0, -ws[1]), slice(-ws[1], -shift[1]), slice(-shift[1], None))
        if shift[1] else (slice(None),),
        (slice(0, -ws[2]), slice(-ws[2], -shift[2]), slice(-shift[2], None))
        if shift[2] else (slice(None),),
    ):
        img_mask = img_mask.at[:, t_sl, h_sl, w_sl, :].set(cnt)
        cnt += 1
    mask_windows = window_partition(img_mask, ws)[:, :, 0]  # [nW, L]
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.where(diff == 0, 0.0, -1e9).astype(jnp.float32)


class WindowAttention3D(nn.Module):
    num_heads: int
    window_size: Tuple[int, int, int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        """x [nW*B, L, C]; mask [nW, L, L]."""
        BnW, L, C = x.shape
        wt, wh, ww = self.window_size
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(BnW, L, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [BnW, L, H, D]
        attn = jnp.einsum("blhd,bmhd->bhlm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (head_dim ** -0.5)

        # relative position bias over (2t-1)(2h-1)(2w-1)
        n_rel = (2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1)
        bias_table = self.param("rel_pos_bias",
                                nn.initializers.normal(0.02),
                                (n_rel, self.num_heads), jnp.float32)
        coords = jnp.stack(jnp.meshgrid(
            jnp.arange(wt), jnp.arange(wh), jnp.arange(ww), indexing="ij"))
        coords = coords.reshape(3, -1)  # [3, L]
        rel = coords[:, :, None] - coords[:, None, :]  # [3, L, L]
        rel = rel + jnp.array([wt - 1, wh - 1, ww - 1])[:, None, None]
        rel_idx = (rel[0] * (2 * wh - 1) * (2 * ww - 1)
                   + rel[1] * (2 * ww - 1) + rel[2])
        attn = attn + bias_table[rel_idx].transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(BnW // nW, nW, self.num_heads, L, L)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(BnW, self.num_heads, L, L)
        probs = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(BnW, L, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock3D(nn.Module):
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        B, T, H, W, C = x.shape
        ws = tuple(min(w, d) for w, d in zip(self.window_size, (T, H, W)))
        shift = tuple(w // 2 for w in ws) if self.shift else (0, 0, 0)

        shortcut = x
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        if any(shift):
            h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = compute_shift_mask((T, H, W), ws, shift)
        else:
            mask = None
        windows = window_partition(h, ws)
        attn = WindowAttention3D(self.num_heads, ws, self.dtype,
                                 name="attention")(windows, mask)
        h = window_reverse(attn, ws, B, T, H, W)
        if any(shift):
            h = jnp.roll(h, shift, axis=(1, 2, 3))
        x = shortcut + h
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x + Mlp(hidden_dim=int(C * self.mlp_ratio), dtype=self.dtype,
                       name="mlp")(h, deterministic=deterministic)


class PatchMerging(nn.Module):
    """Spatial 2×2 downsample: concat 4 neighbours → Dense(2C)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        x = x.reshape(B, T, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, H // 2, W // 2, 4 * C)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class VideoSwinTransformer(nn.Module):
    preset: str = "swin_tiny"
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True):
        """video float[B, T, H, W, 3] → dict(grid [B, t, h, w, C], pooled)."""
        p = PRESETS[self.preset]
        embed_dim, depths, num_heads = p["embed_dim"], p["depths"], p["num_heads"]
        x = nn.Conv(embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID", dtype=self.dtype,
                    name="patch_embed")(video.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        for si, (depth, heads) in enumerate(zip(depths, num_heads)):
            for bi in range(depth):
                x = SwinBlock3D(
                    num_heads=heads, window_size=self.window_size,
                    shift=(bi % 2 == 1), mlp_ratio=self.mlp_ratio,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(x, deterministic=deterministic)
            if si < len(depths) - 1:
                x = PatchMerging(dtype=self.dtype, name=f"merge{si}")(x)
        x = LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return {"grid": x, "pooled": x.mean(axis=(1, 2, 3))}
