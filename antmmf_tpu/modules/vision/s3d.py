"""S3D-G: separable 3D convolutional video backbone.

Reference parity: ``/root/reference/antmmf/models/s3d.py`` (s3dg.py, 508 LoC —
the MIL-NCE HowTo100M video tower). Separable temporal+spatial convolutions
with self-gating; NTHWC layout (flax nn.Conv handles 3D kernels natively).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class SepConv3D(nn.Module):
    """Spatial (1,k,k) then temporal (k,1,1) conv — the S3D factorisation."""

    features: int
    kernel: int = 3
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        st, sh, sw = self.strides
        x = nn.Conv(self.features, (1, self.kernel, self.kernel),
                    strides=(1, sh, sw), use_bias=False, dtype=self.dtype,
                    name="spatial")(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(32, self.features),
                                 dtype=jnp.float32, name="gn_s")(x))
        x = nn.Conv(self.features, (self.kernel, 1, 1), strides=(st, 1, 1),
                    use_bias=False, dtype=self.dtype, name="temporal")(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(32, self.features),
                                 dtype=jnp.float32, name="gn_t")(x))
        return x


class SelfGating(nn.Module):
    """Feature gating: sigmoid(W · spatiotemporal-avg) ⊙ x (S3D-G)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = x.mean(axis=(1, 2, 3))  # [B, C]
        gate = nn.sigmoid(nn.Dense(x.shape[-1], name="gate")(pooled))
        return x * gate[:, None, None, None, :]


class InceptionBlock3D(nn.Module):
    b0: int
    b1: int
    b2: int
    b3: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv1 = lambda f, name: nn.relu(nn.Conv(  # noqa: E731
            f, (1, 1, 1), use_bias=False, dtype=self.dtype, name=name)(x))
        br0 = conv1(self.b0, "branch0")
        br1 = SepConv3D(self.b1, dtype=self.dtype, name="branch1")(
            conv1(self.b1 // 2, "branch1_reduce"))
        br2 = SepConv3D(self.b2, dtype=self.dtype, name="branch2")(
            conv1(self.b2 // 2, "branch2_reduce"))
        pooled = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        br3 = nn.relu(nn.Conv(self.b3, (1, 1, 1), use_bias=False,
                              dtype=self.dtype, name="branch3")(pooled))
        out = jnp.concatenate([br0, br1, br2, br3], axis=-1)
        return SelfGating(name="gating")(out)


class S3DG(nn.Module):
    """Compact S3D-G trunk. video float[B, T, H, W, 3] → dict(grid, pooled)."""

    width: int = 64
    num_blocks: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True):
        x = SepConv3D(self.width, kernel=3, strides=(1, 2, 2),
                      dtype=self.dtype, name="stem")(video.astype(self.dtype))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        for i in range(self.num_blocks):
            f = self.width * (2 ** i)
            x = InceptionBlock3D(f, f, f // 2, f // 2, dtype=self.dtype,
                                 name=f"inception{i}")(x)
            if i < self.num_blocks - 1:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        return {"grid": x, "pooled": x.mean(axis=(1, 2, 3))}
