"""SANM audio encoder — the faithful M2-omni speech tower.

Reference parity: ``/root/reference/prj/M2_omni/models/sanm_audio.py:1-550``
(``SANMEncoder``/``BailingAudioModel``, built on funasr's
``MultiHeadedAttentionSANM``; SAN-M paper arXiv:2006.01713) with the
Bailing2 defaults from ``configuration_m2omni.py:106-128``: 560-dim LFR
input, 512 output, 4 heads, 2048 FFN, 50 blocks, ``input_layer="pe"``
(sinusoidal positions, positions start at 1), FSMN kernel 11, shift 0.

funasr itself is not installable in this image (zero egress), so the torch
ground truth for the parity harness (tests/test_sanm_parity.py) is a direct
transcription of the funasr ops with the funasr parameter schema
(``linear_q_k_v`` fused projection, depthwise ``fsmn_block`` conv,
``feed_forward.w_1/w_2``); real funasr/Bailing checkpoints import through
``sanm_state_dict_to_params`` (utils/torch_import.py) unchanged.

Block structure (EncoderLayerSANM, normalize_before=True):
  norm1 → SANM attention → (+residual only when in_size == size)
  norm2 → FFN(ReLU) → +residual
SANM attention = standard MHA over a fused q/k/v projection PLUS an FSMN
memory branch: depthwise conv (kernel k, pad (k-1)//2±shift, no bias) over
the UN-headed v with residual, masked; output = attention + fsmn.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

SANM_PRESETS = {
    # Bailing2AudioConfig defaults (configuration_m2omni.py:111-128)
    "bailing2_audio": dict(input_size=560, output_size=512,
                           attention_heads=4, linear_units=2048,
                           num_blocks=50, kernel_size=11, sanm_shift=0),
    "sanm_tiny_test": dict(input_size=24, output_size=16,
                           attention_heads=2, linear_units=32,
                           num_blocks=3, kernel_size=5, sanm_shift=0),
}


def sinusoidal_positions(timesteps: int, depth: int) -> jnp.ndarray:
    """funasr SinusoidalPositionEncoder: positions 1..T, depth/2 timescales,
    concat(sin, cos)."""
    positions = np.arange(1, timesteps + 1, dtype=np.float32)
    log_inc = np.log(10000.0) / (depth / 2 - 1)
    inv = np.exp(np.arange(depth // 2, dtype=np.float32) * -log_inc)
    scaled = positions[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)[None])


class SANMAttention(nn.Module):
    """MultiHeadedAttentionSANM: fused qkv + FSMN memory branch."""

    num_heads: int
    out_features: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x [B, T, in]; mask int[B, T] 1=valid."""
        B, T, _ = x.shape
        d = self.out_features
        h = self.num_heads
        dk = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="linear_q_k_v")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # FSMN memory on the un-headed v (funasr forward_fsmn)
        vm = v if mask is None else v * mask[:, :, None].astype(v.dtype)
        left = (self.kernel_size - 1) // 2 + self.sanm_shift
        right = self.kernel_size - 1 - left
        pad = jnp.pad(vm, ((0, 0), (left, right), (0, 0)))
        # depthwise conv: feature_group_count == channels, kernel [k, 1, d]
        fsmn_kernel = self.param(
            "fsmn_kernel", nn.initializers.normal(0.02),
            (self.kernel_size, 1, d), jnp.float32)
        mem = jax.lax.conv_general_dilated(
            pad.astype(jnp.float32), fsmn_kernel,
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d).astype(v.dtype)
        mem = mem + vm
        if mask is not None:
            mem = mem * mask[:, :, None].astype(mem.dtype)

        def heads(t):
            return t.reshape(B, T, h, dk).transpose(0, 2, 1, 3)

        qh = heads(q) * (dk ** -0.5)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, heads(k),
                            preferred_element_type=jnp.float32)
        if mask is not None:
            bad = (mask[:, None, None, :] == 0)
            scores = jnp.where(bad, jnp.finfo(jnp.float32).min, scores)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        if mask is not None:
            attn = jnp.where(bad, 0.0, attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        out = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="linear_out")(out)
        return out + mem


class SANMEncoderLayer(nn.Module):
    """EncoderLayerSANM, normalize_before=True; attention residual applies
    only when in_size == size (the first 560→512 layer has none)."""

    num_heads: int
    out_features: int
    linear_units: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        in_size = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        att = SANMAttention(
            num_heads=self.num_heads, out_features=self.out_features,
            kernel_size=self.kernel_size, sanm_shift=self.sanm_shift,
            dtype=self.dtype, name="self_attn")(h, mask, deterministic)
        x = x + att if in_size == self.out_features else att
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.linear_units, dtype=self.dtype,
                     param_dtype=jnp.float32, name="w_1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.out_features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="w_2")(h)
        return x + h


class SANMEncoder(nn.Module):
    """Returns [B, T, output_size] (no subsampling — Bailing2 uses
    input_layer="pe"; the LFR front-end already decimated 6×)."""

    input_size: int = 560
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    kernel_size: int = 11
    sanm_shift: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B, T, D = feats.shape
        x = feats.astype(self.dtype) * (self.output_size ** 0.5)
        x = x + sinusoidal_positions(T, D).astype(x.dtype)
        for i in range(self.num_blocks):
            x = SANMEncoderLayer(
                num_heads=self.attention_heads,
                out_features=self.output_size,
                linear_units=self.linear_units,
                kernel_size=self.kernel_size, sanm_shift=self.sanm_shift,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)


def compress_audio_tokens(x: jnp.ndarray, compress: int = 3) -> jnp.ndarray:
    """Reference encode_audio_post_processing (modeling_m2omni.py:640-651):
    groups of ``compress`` consecutive frames concatenated channel-wise."""
    B, T, D = x.shape
    valid = T // compress * compress
    return x[:, :valid].reshape(B, valid // compress, D * compress)


def build_sanm_encoder(preset: str = "bailing2_audio", **overrides):
    if preset not in SANM_PRESETS:
        raise KeyError(f"Unknown SANM preset {preset!r}; known: "
                       f"{sorted(SANM_PRESETS)}")
    kwargs = dict(SANM_PRESETS[preset])
    kwargs.update(overrides)
    return SANMEncoder(**kwargs)
