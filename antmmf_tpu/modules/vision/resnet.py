"""ResNet backbones (v1.5 bottleneck) — NHWC; GroupNorm or sync BatchNorm.

Reference parity: ``ResNetImageEncoder`` (``/root/reference/antmmf/modules/
encoders/visual_encoder.py:84-207``, torchvision-based with gradient
checkpointing) and the speaker-audio ``SpkResNet`` (``models/s3d.py:151``-family).

Normalization is an EXPLICIT config choice (``norm``):
  * ``gn`` (default) — GroupNorm, the TPU-native swap: identical accuracy
    class, batch-size independent, no cross-replica stats.
  * ``bn`` — train-mode BatchNorm matching the reference's DDP semantics
    (``convert_sync_batchnorm``, trainers/base_trainer.py:358-362): under
    jit+GSPMD the batch statistics reduce over the GLOBAL batch (the
    compiler emits the cross-replica collective), EMA running stats live in
    the mutable ``batch_stats`` collection for eval. Use for from-scratch
    conv-tower training or when importing torchvision BN checkpoints live.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.modules.layers import SyncBatchNorm


def _make_norm(norm: str, deterministic: bool):
    if norm == "bn":
        return partial(SyncBatchNorm, use_running_average=deterministic,
                       dtype=jnp.float32)
    return partial(nn.GroupNorm, num_groups=32, dtype=jnp.float32)

Dtype = Any

STAGES = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet_tiny_test": ((1, 1), True),
}


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    norm_layer: str = "gn"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = _make_norm(self.norm_layer, deterministic)
        residual = x
        y = conv(self.features, (1, 1))(x)
        y = nn.relu(norm(name="gn1")(y))
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides))(y)
        y = nn.relu(norm(name="gn2")(y))
        y = conv(self.features * 4, (1, 1))(y)
        y = norm(name="gn3")(y)
        if residual.shape != y.shape:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample")(x)
            residual = norm(name="gn_down")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    norm_layer: str = "gn"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = _make_norm(self.norm_layer, deterministic)
        residual = x
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides))(x)
        y = nn.relu(norm(name="gn1")(y))
        y = conv(self.features, (3, 3))(y)
        y = norm(name="gn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample")(x)
            residual = norm(name="gn_down")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    preset: str = "resnet50"
    width: int = 64
    # "gn" (TPU-native GroupNorm swap) | "bn" (reference train-mode sync
    # BatchNorm; batch_stats collection must thread mutably in training)
    norm: str = "gn"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, return_stages: bool = False,
                 deterministic: bool = True):
        """NHWC float → dict(grid [B, h, w, C], pooled [B, C]); with
        ``return_stages`` also per-stage maps ``stages: [C2..C5]`` (the
        IntermediateLayerGetter contract FPN necks consume)."""
        stages, bottleneck = STAGES[self.preset]
        block = Bottleneck if bottleneck else BasicBlock
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem")(images.astype(self.dtype))
        x = nn.relu(_make_norm(self.norm, deterministic)(name="stem_gn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        stage_maps = []
        for i, n_blocks in enumerate(stages):
            features = self.width * (2 ** i)
            for j in range(n_blocks):
                strides = 2 if (j == 0 and i > 0) else 1
                x = block(features=features, strides=strides,
                          norm_layer=self.norm, dtype=self.dtype,
                          name=f"stage{i}_block{j}")(x, deterministic)
            stage_maps.append(x)
        out = {"grid": x, "pooled": x.mean(axis=(1, 2))}
        if return_stages:
            out["stages"] = stage_maps
        return out
