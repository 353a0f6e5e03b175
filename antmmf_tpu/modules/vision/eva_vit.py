"""EVA-ViT visual tower (the Pink MLLM's frozen vision encoder).

Reference parity: ``/root/reference/prj/Pink/pink/model/eva_vit.py`` —
EVA-CLIP-g as used by Pink (``create_eva_vit_g``: patch 14, width 1408,
depth 39, heads 16, mlp_ratio 4.3637, qkv_bias, abs pos embed, NO
relative-position bias / LayerScale / final norm; returns the full token
sequence). The block body is exactly our pre-LN ``TransformerLayer``
(x + attn(ln1(x)); x + mlp(ln2(x)), exact-erf GELU, eps 1e-6), so blocks
reuse it and reference weights import via the fused-qkv split
(``eva_vit_state_dict_to_params``); the reference's fp16 cast becomes the
bf16 dtype policy.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.modules.transformers.base import TransformerLayer

Dtype = Any

EVA_PRESETS = {
    # create_eva_vit_g (eva_vit.py:424-448)
    "eva_vit_g": dict(patch_size=14, embed_dim=1408, num_layers=39,
                      num_heads=16, mlp_ratio=4.3637),
    "eva_tiny_test": dict(patch_size=14, embed_dim=32, num_layers=2,
                          num_heads=2, mlp_ratio=4.0),
}


class EvaVisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    num_layers: int = 39
    num_heads: int = 16
    mlp_ratio: float = 4.3637
    dropout: float = 0.0
    layer_norm_eps: float = 1e-6
    use_pallas: bool = True
    # rematerialize blocks (the long-video / big-batch memory knob: frames
    # fold into the tower batch and per-layer attention probs dominate)
    remat: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        """images float[B, H, W, 3] → token sequence [B, 1+N, C] (no final
        norm — the reference returns raw block output)."""
        B = images.shape[0]
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(images)
        x = x.reshape(B, -1, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1)
        n_tokens = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tokens, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        layer_cls = (nn.remat(TransformerLayer, static_argnums=(4,))
                     if self.remat else TransformerLayer)
        for i in range(self.num_layers):
            x = layer_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dropout=self.dropout, activation="gelu_exact",
                norm_style="pre", layer_norm_eps=self.layer_norm_eps,
                use_pallas=self.use_pallas, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer_{i}",
            )(x, None, None, deterministic)
        return x


def build_eva_vit(preset: str, **overrides) -> EvaVisionTransformer:
    if preset not in EVA_PRESETS:
        raise KeyError(f"Unknown EVA preset {preset!r}; known: "
                       f"{sorted(EVA_PRESETS)}")
    kwargs = dict(EVA_PRESETS[preset])
    kwargs.update(overrides)
    return EvaVisionTransformer(**kwargs)
