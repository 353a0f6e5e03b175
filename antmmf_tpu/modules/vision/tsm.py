"""Temporal Shift Module video encoder.

Reference parity: ``VideoTSMEncoder`` (``/root/reference/antmmf/modules/
encoders/visual_encoder.py:447``). TSM shifts a fraction of channels one frame
forward/backward before each 2D block, giving temporal modeling at 2D-conv
cost (Lin et al.). Pure jnp.roll + mask — fuses into the conv stack.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.modules.vision.resnet import ResNet

Dtype = Any


def temporal_shift(x: jnp.ndarray, n_frames: int, fold_div: int = 8) -> jnp.ndarray:
    """[B*T, H, W, C] → shift C/fold channels ±1 frame (zero-padded ends)."""
    BT, H, W, C = x.shape
    B = BT // n_frames
    x = x.reshape(B, n_frames, H, W, C)
    fold = C // fold_div
    fwd = jnp.concatenate(
        [x[:, 1:, :, :, :fold], jnp.zeros_like(x[:, :1, :, :, :fold])], axis=1)
    bwd = jnp.concatenate(
        [jnp.zeros_like(x[:, :1, :, :, fold:2 * fold]),
         x[:, :-1, :, :, fold:2 * fold]], axis=1)
    out = jnp.concatenate([fwd, bwd, x[:, :, :, :, 2 * fold:]], axis=-1)
    return out.reshape(BT, H, W, C)


class TSMVideoEncoder(nn.Module):
    """ResNet trunk with temporal shift applied between stages."""

    resnet_preset: str = "resnet50"
    fold_div: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True):
        """video float[B, T, H, W, 3] → dict(grid [B, T, h, w, C], pooled)."""
        B, T = video.shape[:2]
        flat = video.reshape((B * T,) + video.shape[2:])
        # interleave shift with the trunk: shift at input (cheap variant) then
        # run the full 2D trunk; per-stage shifts live inside ResNet variants
        flat = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False,
                       dtype=self.dtype, name="pre_stem")(flat.astype(self.dtype))
        flat = temporal_shift(flat, T, self.fold_div)
        out = ResNet(preset=self.resnet_preset, dtype=self.dtype,
                     name="trunk")(flat)
        grid = out["grid"]
        grid = temporal_shift(grid, T, self.fold_div)
        h, w, C = grid.shape[1:]
        return {
            "grid": grid.reshape(B, T, h, w, C),
            "pooled": grid.reshape(B, T, h, w, C).mean(axis=(1, 2, 3)),
            "frame_pooled": grid.reshape(B, T, -1, C).mean(axis=2),
        }
