"""EfficientNet backbone (MBConv with squeeze-excitation).

Reference parity: ``/root/reference/antmmf/modules/vision/backbone/
efficientnet.py`` (806 LoC). Compact fresh implementation of the published
EfficientNet design: width/depth-scaled MBConv stages, SE ratio 0.25, swish.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# (expand, channels, repeats, stride, kernel)
BASE_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

SCALING = {  # width, depth
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "test": (0.25, 0.3),
}


def _round_filters(f: float, width: float) -> int:
    f *= width
    return max(8, int(f + 4) // 8 * 8)


def drop_connect(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Stochastic depth on the residual branch (reference
    modules/utils.py:91 drop_connect): per-sample Bernoulli keep with
    1/keep_prob rescaling."""
    import jax

    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2))
        s = nn.silu(nn.Dense(self.reduced, dtype=self.dtype, name="reduce")(s))
        s = nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype, name="expand")(s))
        return x * s[:, None, None, :]


class MBConv(nn.Module):
    expand: int
    features: int
    stride: int
    kernel: int
    drop_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        inp = x.shape[-1]
        residual = x
        h = x
        if self.expand != 1:
            h = nn.Conv(inp * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand_conv")(h)
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                     name="gn0")(h))
        h = nn.Conv(h.shape[-1], (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    feature_group_count=h.shape[-1], use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="gn1")(h))
        h = SqueezeExcite(max(1, inp // 4), dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="gn2")(h)
        if self.stride == 1 and inp == self.features:
            if self.drop_rate > 0.0 and not deterministic:
                h = drop_connect(h, self.drop_rate,
                                 self.make_rng("dropout"))
            h = h + residual
        return h


class EfficientNet(nn.Module):
    preset: str = "b0"
    drop_connect_rate: float = 0.2  # scaled linearly over depth (ref :91)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        width, depth = SCALING[self.preset]
        x = nn.Conv(_round_filters(32, width), (3, 3), strides=(2, 2),
                    use_bias=False, dtype=self.dtype,
                    name="stem")(images.astype(self.dtype))
        x = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                 name="stem_gn")(x))
        total_blocks = sum(max(1, int(math.ceil(r * depth)))
                           for _, _, r, _, _ in BASE_STAGES)
        block_id = 0
        for si, (expand, ch, repeats, stride, kernel) in enumerate(BASE_STAGES):
            features = _round_filters(ch, width)
            n = max(1, int(math.ceil(repeats * depth)))
            for bi in range(n):
                rate = self.drop_connect_rate * block_id / total_blocks
                x = MBConv(expand, features, stride if bi == 0 else 1, kernel,
                           drop_rate=rate, dtype=self.dtype,
                           name=f"stage{si}_block{bi}")(
                               x, deterministic=deterministic)
                block_id += 1
        head = _round_filters(1280, width)
        x = nn.Conv(head, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                 name="head_gn")(x))
        return {"grid": x, "pooled": x.mean(axis=(1, 2))}
