"""Feature Pyramid Network neck.

Reference parity: ``/root/reference/antmmf/modules/vision/necks/
BackboneWithFPN.py`` — the reference wraps torchvision's
``FeaturePyramidNetwork`` + ``IntermediateLayerGetter``; here both are
implemented directly: lateral 1×1 projections, top-down nearest-neighbor
upsample additions, 3×3 smoothing convs, optional last-level max-pool
extra (the torchvision ``LastLevelMaxPool`` default), and a
``BackboneWithFPN`` wrapper over our multi-stage ResNet.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.modules.vision.resnet import ResNet

Dtype = Any


class FeaturePyramidNetwork(nn.Module):
    """[C2..C5] (fine→coarse NHWC maps) → [P2..P5(, pool)] at out_channels."""

    out_channels: int = 256
    extra_maxpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray]) -> List[jnp.ndarray]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(feature_maps)]
        # top-down pathway: coarse → fine, nearest upsample + add
        merged = [laterals[-1]]
        for lat in reversed(laterals[:-1]):
            up = jax.image.resize(merged[0], lat.shape, method="nearest")
            merged.insert(0, lat + up)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"output_{i}")(m)
            for i, m in enumerate(merged)]
        if self.extra_maxpool:  # LastLevelMaxPool (ref default extra block)
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class BackboneWithFPN(nn.Module):
    """ResNet stages → FPN (reference BackboneWithFPN.py:9-60)."""

    preset: str = "resnet50"
    out_channels: int = 256
    extra_maxpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        feats = ResNet(preset=self.preset, dtype=self.dtype,
                       name="body")(images, return_stages=True)["stages"]
        return FeaturePyramidNetwork(
            out_channels=self.out_channels, extra_maxpool=self.extra_maxpool,
            dtype=self.dtype, name="fpn")(feats)
