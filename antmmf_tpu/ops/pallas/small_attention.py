"""Fused attention for SHORT sequences (the ViT-per-frame regime, L ≈ 50).

The blocked flash kernel (`flash_attention.py`) wins past its measured ~3k-token
crossover; below it, XLA's unfused attention materialises the [B·H, L, L] fp32
score tensor in HBM three times (QKᵀ write, softmax read/write, PV read) — at
the flagship's L=50, B·F=256, H=12 that's the dominant non-matmul traffic in
the ViT tower. This kernel fuses scores+softmax+PV for whole (batch·head)
groups per program: each grid step loads BN heads' full [L, D] q/k/v into
VMEM, computes softmax(QKᵀ)V entirely on-chip, and writes only the [BN, L, D]
output.

Forward-only kernel with a `jax.custom_vjp` whose backward recomputes
probabilities from the saved output-free residuals (q, k, v, bias) using plain
XLA ops — at L≤256 the backward score tensors are small enough that XLA's
fusion handles them well; the forward is where the HBM round-trips were.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
DEFAULT_BN = 8  # (batch·head) rows per program
MAX_L = 256     # beyond this, use the blocked flash kernel


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[...]  # [BN, L, D]
    k = k_ref[...]
    v = v_ref[...]
    bias = bias_ref[...]  # [BN, L] additive key bias (fp32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [BN, L, L]
    s = s + bias[:, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _small_attention(q, k, v, bias, scale):
    return _fwd(q, k, v, bias, scale)


def _fwd(q, k, v, bias, scale):
    N, L, D = q.shape
    bn = DEFAULT_BN
    while N % bn:
        bn //= 2
    grid = (N // bn,)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((bn, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((bn, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((bn, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, L, D), q.dtype),
    )(q, k, v, bias)


def _vjp_fwd(q, k, v, bias, scale):
    out = _fwd(q, k, v, bias, scale)
    return out, (q, k, v, bias)


def _vjp_bwd(scale, res, g):
    # XLA backward: at L ≤ MAX_L the score tensors are small; recompute.
    q, k, v, bias = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("nld,nmd->nlm", qf, kf) * scale + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("nlm,nld->nmd", p, gf)
    dp = jnp.einsum("nld,nmd->nlm", gf, vf)
    tmp = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p
    dq = jnp.einsum("nlm,nmd->nld", tmp, kf) * scale
    dk = jnp.einsum("nlm,nld->nmd", tmp, qf) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_small_attention.defvjp(_vjp_fwd, _vjp_bwd)


def small_attention(
    q: jnp.ndarray,  # [B, H, L, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # [B, 1, 1, Lk] key-padding additive
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fused short-sequence attention. Key-padding bias only; self-attention
    shapes (Lq == Lk). Pads L to a multiple of 8 internally."""
    B, H, L, D = q.shape
    scale = scale if scale is not None else D ** -0.5
    pad = (-L) % 8
    if bias is None:
        kv_bias = jnp.zeros((B, L + pad), jnp.float32)
    else:
        kv_bias = bias[:, 0, 0, :].astype(jnp.float32)
        if pad:
            kv_bias = jnp.pad(kv_bias, ((0, 0), (0, pad)),
                              constant_values=NEG_INF)
    if pad:
        padt = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padt)
        k = jnp.pad(k, padt)
        v = jnp.pad(v, padt)
    Lp = L + pad
    qn = q.reshape(B * H, Lp, D)
    kn = k.reshape(B * H, Lp, D)
    vn = v.reshape(B * H, Lp, D)
    bias_n = jnp.repeat(kv_bias, H, axis=0)  # [B*H, Lp]
    out = _small_attention(qn, kn, vn, bias_n, scale)
    out = out.reshape(B, H, Lp, D)
    return out[:, :, :L] if pad else out
