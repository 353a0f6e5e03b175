"""Reference-architecture S3D-G for weight import and numerical parity.

Mirrors ``/root/reference/antmmf/models/s3dg.py`` (the MIL-NCE HowTo100M
video tower) exactly, eval-mode: STConv3D (conv + BatchNorm running-stats
+ ReLU, separable temporal/spatial factorisation), per-branch SelfGating,
the Mixed_3b…Mixed_5c Inception trunk, TF-SAME max pooling with torch's
ceil_mode semantics, and the final 512-d projection. Used to score
published S3D checkpoints (imported via
``utils/torch_import.s3d_state_dict_to_params``); the TPU-first training
backbone remains ``modules/vision/s3d.py`` (GroupNorm, compact trunk).

Layout: NTHWC (videos [B, T, H, W, 3]); the torch reference is NCTHW.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class EvalBatchNorm(nn.Module):
    """BatchNorm3d in eval mode: running stats imported as params
    (torch eps default 1e-5)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (f,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (f,), jnp.float32)
        xf = x.astype(jnp.float32)
        out = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return out.astype(x.dtype)


class RefSTConv3D(nn.Module):
    """conv(+BN+ReLU), separable = spatial [1,k,k] then temporal [k,1,1]
    (reference STConv3D, s3dg.py:87-146; explicit symmetric padding)."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        if self.separable and kt != 1:
            x = nn.Conv(self.features, (1, kh, kw), strides=(1, sh, sw),
                        padding=[(0, 0), (ph, ph), (pw, pw)], use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = nn.relu(EvalBatchNorm(name="bn1")(x))
            x = nn.Conv(self.features, (kt, 1, 1), strides=(st, 1, 1),
                        padding=[(pt, pt), (0, 0), (0, 0)], use_bias=False,
                        dtype=self.dtype, name="conv2")(x)
            x = nn.relu(EvalBatchNorm(name="bn2")(x))
        else:
            x = nn.Conv(self.features, (kt, kh, kw), strides=(st, sh, sw),
                        padding=[(pt, pt), (ph, ph), (pw, pw)], use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = nn.relu(EvalBatchNorm(name="bn1")(x))
        return x


class RefSelfGating(nn.Module):
    """sigmoid(fc(spatiotemporal mean)) ⊙ x (s3dg.py:74-84)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = x.astype(jnp.float32).mean(axis=(1, 2, 3))
        gate = nn.sigmoid(nn.Dense(x.shape[-1], name="fc")(pooled))
        return x * gate[:, None, None, None, :].astype(x.dtype)


def tf_maxpool(x: jnp.ndarray, kernel, stride) -> jnp.ndarray:
    """MaxPool3dTFPadding (s3dg.py:150-180): TF-SAME zero padding
    (top = pad_along // 2), then torch ceil_mode — windows may start on the
    last partial stride; modeled as extra right-padding at the reduce
    identity (-inf), exactly torch's implicit behavior."""
    zero_pads, ext_pads = [(0, 0)], [(0, 0)]
    for k, s, size in zip(kernel, stride, x.shape[1:4]):
        along = max(k - s, 0)
        top, bot = along // 2, along - along // 2
        ext = (-(size + along - k)) % s
        zero_pads.append((top, bot))
        ext_pads.append((0, ext))
    zero_pads.append((0, 0))
    ext_pads.append((0, 0))
    x = jnp.pad(x, zero_pads)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + tuple(kernel) + (1,),
        (1,) + tuple(stride) + (1,), ext_pads)


class RefInceptionBlock(nn.Module):
    """Four-branch Inception with per-branch gating (s3dg.py:23-72)."""

    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3b: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = lambda f, k, pad, sep, name: RefSTConv3D(  # noqa: E731
            f, kernel=k, padding=pad, separable=sep, dtype=self.dtype,
            name=name)
        b0 = c(self.b0, (1, 1, 1), (0, 0, 0), False, "conv_b0")(x)
        b1 = c(self.b1a, (1, 1, 1), (0, 0, 0), False, "conv_b1_a")(x)
        b1 = c(self.b1b, (3, 3, 3), (1, 1, 1), True, "conv_b1_b")(b1)
        b2 = c(self.b2a, (1, 1, 1), (0, 0, 0), False, "conv_b2_a")(x)
        b2 = c(self.b2b, (3, 3, 3), (1, 1, 1), True, "conv_b2_b")(b2)
        # torch MaxPool3d(3, stride=1, padding=1): symmetric -inf padding
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=[(1, 1), (1, 1), (1, 1)])
        b3 = c(self.b3b, (1, 1, 1), (0, 0, 0), False, "conv_b3_b")(b3)
        b0 = RefSelfGating(name="gating_b0")(b0)
        b1 = RefSelfGating(name="gating_b1")(b1)
        b2 = RefSelfGating(name="gating_b2")(b2)
        b3 = RefSelfGating(name="gating_b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# Mixed_* branch widths (s3dg.py:286-320), cr=1
MIXED = {
    "mixed_3b": (64, 96, 128, 16, 32, 32),
    "mixed_3c": (128, 128, 192, 32, 96, 64),
    "mixed_4b": (192, 96, 208, 16, 48, 64),
    "mixed_4c": (160, 112, 224, 24, 64, 64),
    "mixed_4d": (128, 128, 256, 24, 64, 64),
    "mixed_4e": (112, 144, 288, 32, 64, 64),
    "mixed_4f": (256, 160, 320, 32, 128, 128),
    "mixed_5b": (256, 160, 320, 32, 128, 128),
    "mixed_5c": (384, 192, 384, 48, 128, 128),
}


class S3DRef(nn.Module):
    """forward_video (s3dg.py:366-430): stem → pools → Inception trunk →
    spatiotemporal mean → fc. Returns {"mixed5c": [B, 1024],
    "embedding": [B, num_classes]}."""

    num_classes: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray):
        x = RefSTConv3D(64, kernel=(3, 7, 7), stride=(2, 2, 2),
                        padding=(1, 3, 3), dtype=self.dtype, name="conv1")(
            video.astype(self.dtype))
        x = tf_maxpool(x, (1, 3, 3), (1, 2, 2))
        x = RefSTConv3D(64, dtype=self.dtype, name="conv_2b")(x)
        x = RefSTConv3D(192, kernel=(3, 3, 3), padding=(1, 1, 1),
                        separable=True, dtype=self.dtype, name="conv_2c")(x)
        x = RefSelfGating(name="gating")(x)
        x = tf_maxpool(x, (1, 3, 3), (1, 2, 2))
        for name in ("mixed_3b", "mixed_3c"):
            x = RefInceptionBlock(*MIXED[name], dtype=self.dtype, name=name)(x)
        x = tf_maxpool(x, (3, 3, 3), (2, 2, 2))
        for name in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e",
                     "mixed_4f"):
            x = RefInceptionBlock(*MIXED[name], dtype=self.dtype, name=name)(x)
        x = tf_maxpool(x, (2, 2, 2), (2, 2, 2))
        for name in ("mixed_5b", "mixed_5c"):
            x = RefInceptionBlock(*MIXED[name], dtype=self.dtype, name=name)(x)
        pooled = x.astype(jnp.float32).mean(axis=(1, 2, 3))
        emb = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(pooled)
        return {"mixed5c": pooled, "embedding": emb}
