"""VisualEncoder: config-routed visual backbones with the grid-feature contract.

Reference parity: ``/root/reference/antmmf/modules/encoders/visual_encoder.py:34``
— ``ModuleRegistry`` pattern (config.type → backbone class) and the §8.2b output
contract every consumer keys on:

    grid_feature  float[b, N, h', w', C]   (reference is channel-first; this
                                            build is NHWC — TPU conv layout)
    grid_mask     bool [b, N, h', w']      True = padding
    grid_feature_with_pos  optional (DETR-style sine positions added)

``N`` is the frame axis (1 for stills). Backbones: vit, resnet, video_swin,
tsm, pvt.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.embeddings import SinePositionEmbedding2D
from antmmf_tpu.modules.vision.pvt import PyramidVisionTransformer
from antmmf_tpu.modules.vision.resnet import ResNet
from antmmf_tpu.modules.vision.tsm import TSMVideoEncoder
from antmmf_tpu.modules.vision.video_swin import VideoSwinTransformer
from antmmf_tpu.modules.vision.vit import PRESETS as VIT_PRESETS, VisionTransformer

Dtype = Any


@registry.register_encoder("visual_encoder")
class VisualEncoder(nn.Module):
    """encoder_type ∈ {vit, resnet, video_swin, tsm, pvt, efficientnet,
    cctt}. The reference's separate DetrImageEncoder / DetrBatchPVT /
    ImageVideoEncoder classes (visual_encoder.py:246-556) are config here:
    ``add_sine_pos`` adds the DETR position plane, and every type accepts
    [B, H, W, 3] or [B, N, H, W, 3] (frames fold into the batch dim)."""

    encoder_type: str = "vit"
    preset: str = "vit_base_patch32"
    image_size: int = 224
    add_sine_pos: bool = False
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        if self.encoder_type == "vit":
            self.backbone = VisionTransformer(
                image_size=self.image_size, dtype=dtype,
                **dict(VIT_PRESETS[self.preset]))
        elif self.encoder_type == "resnet":
            self.backbone = ResNet(preset=self.preset, dtype=dtype)
        elif self.encoder_type == "video_swin":
            self.backbone = VideoSwinTransformer(preset=self.preset, dtype=dtype)
        elif self.encoder_type == "tsm":
            self.backbone = TSMVideoEncoder(resnet_preset=self.preset, dtype=dtype)
        elif self.encoder_type == "pvt":
            self.backbone = PyramidVisionTransformer(preset=self.preset,
                                                     dtype=dtype)
        elif self.encoder_type == "efficientnet":
            from antmmf_tpu.modules.vision.efficientnet import EfficientNet

            self.backbone = EfficientNet(preset=self.preset, dtype=dtype)
        elif self.encoder_type == "cctt":
            from antmmf_tpu.modules.vision.cctt import CompactConvTransformer

            self.backbone = CompactConvTransformer(preset=self.preset,
                                                   dtype=dtype)
        else:
            raise ValueError(f"Unknown visual encoder {self.encoder_type!r}")
        if self.add_sine_pos:
            self.sine_pos = SinePositionEmbedding2D()

    def __call__(
        self,
        images: jnp.ndarray,  # [B, H, W, 3] or [B, N, H, W, 3]
        pad_mask: Optional[jnp.ndarray] = None,  # bool[B, (N,) H, W] True=pad
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        has_frames = images.ndim == 5
        if not has_frames:
            images = images[:, None]
        B, N = images.shape[:2]

        if self.encoder_type in ("video_swin", "tsm"):
            out = self.backbone(images, deterministic=deterministic)
            grid = out["grid"]  # [B, t, h, w, C]
            if grid.ndim == 5:
                pass
            t, h, w, C = grid.shape[1:]
            grid_feature = grid
        else:
            flat = images.reshape((B * N,) + images.shape[2:])
            if self.encoder_type == "vit":
                out = self.backbone(flat, deterministic=deterministic)
                seq = out["sequence"][:, 1:]  # drop CLS
                hw = int(seq.shape[1] ** 0.5)
                grid_feature = seq.reshape(B, N, hw, hw, -1)
            elif self.encoder_type == "cctt":
                out = self.backbone(flat, deterministic=deterministic)
                seq = out["sequence"]
                hw = int(seq.shape[1] ** 0.5)
                grid_feature = seq[:, : hw * hw].reshape(B, N, hw, hw, -1)
            else:
                out = self.backbone(flat) if self.encoder_type == "resnet" else \
                    self.backbone(flat, deterministic=deterministic)
                g = out["grid"]
                grid_feature = g.reshape(B, N, *g.shape[1:])

        Bf, Nf, h, w, C = grid_feature.shape
        if pad_mask is not None:
            # downsample the pixel pad mask to the grid resolution
            if pad_mask.ndim == 3:
                pad_mask = pad_mask[:, None]
            import jax

            m = jax.image.resize(pad_mask.astype(jnp.float32),
                                 (Bf, Nf, h, w), method="nearest")
            grid_mask = m > 0.5
        else:
            grid_mask = jnp.zeros((Bf, Nf, h, w), bool)

        result = {"grid_feature": grid_feature, "grid_mask": grid_mask,
                  "pooled": out.get("pooled")}
        if self.add_sine_pos:
            pos = self.sine_pos(~grid_mask.reshape(Bf * Nf, h, w))
            pos = pos.reshape(Bf, Nf, h, w, -1)
            if pos.shape[-1] == C:
                result["grid_feature_with_pos"] = grid_feature + \
                    pos.astype(grid_feature.dtype)
            else:
                result["grid_pos_embedding"] = pos
        return result
