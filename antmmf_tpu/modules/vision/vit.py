"""Vision Transformer backbone (CLIP-style pre-LN ViT).

Reference parity: the CLIP ViT of ``/root/reference/antmmf/modules/vision/
backbone/clip/model.py`` (the flagship visual tower for UniVL/DMAE retrieval).
TPU-first: NHWC input, stride-p conv patchify (one MXU matmul), pre-LN blocks
with the swappable attention core, fp32 norms, bf16 compute.

Presets: ViT-B/32, ViT-B/16, ViT-L/14.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.modules.embeddings import VisualEmbeddings
from antmmf_tpu.modules.layers import LayerNorm
from antmmf_tpu.modules.transformers.base import TransformerEncoder

Dtype = Any

PRESETS = {
    "vit_base_patch32": dict(patch_size=32, embed_dim=768, num_layers=12, num_heads=12),
    "vit_base_patch16": dict(patch_size=16, embed_dim=768, num_layers=12, num_heads=12),
    "vit_large_patch14": dict(patch_size=14, embed_dim=1024, num_layers=24, num_heads=16),
    "vit_tiny_test": dict(patch_size=16, embed_dim=64, num_layers=2, num_heads=2),
}


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 32
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    output_dim: Optional[int] = None  # projection dim (CLIP-style); None = no proj
    quick_gelu: bool = True
    remat: bool = False
    scan_layers: bool = False
    use_pallas: bool = True
    sequence_parallel: str = "none"
    # ToMe token merging (arXiv:2210.09461): merge r tokens between blocks
    # (serving speedup knob; sequence output shrinks by r per block)
    token_merge_r: int = 0
    # post_layernorm on the sequence output. HF CLIP ``hidden_states[k]``
    # never includes it — towers consumed at a select layer (Pink's
    # clip_select_layer, pink.py:185-188) set this False
    final_norm: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, deterministic: bool = True
    ):
        """images float[B, H, W, 3] → dict(sequence [B, 1+N, C], pooled [B, C|P])."""
        x = VisualEmbeddings(
            image_size=self.image_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype, name="embeddings",
        )(images, deterministic=deterministic)
        x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                      name="pre_norm")(x)
        x = TransformerEncoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, dropout=self.dropout,
            drop_path=self.drop_path, norm_style="pre",
            activation="quick_gelu" if self.quick_gelu else "gelu",
            final_norm=self.final_norm, remat=self.remat,
            scan_layers=self.scan_layers, use_pallas=self.use_pallas,
            token_merge_r=self.token_merge_r,
            sequence_parallel=self.sequence_parallel,
            dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
        )(x, deterministic=deterministic)
        pooled = x[:, 0]
        if self.output_dim is not None:
            pooled = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="proj")(pooled)
        return {"sequence": x, "pooled": pooled}


def build_vit(preset: str, **overrides) -> VisionTransformer:
    if preset not in PRESETS:
        raise KeyError(f"Unknown ViT preset {preset!r}; known: {sorted(PRESETS)}")
    kwargs = dict(PRESETS[preset])
    kwargs.update(overrides)
    return VisionTransformer(**kwargs)
