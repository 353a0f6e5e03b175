"""Sequence/context parallelism for long video-token streams.

The reference has NO long-context machinery — it caps video length by sparse
sampling (SURVEY.md §5). Here the sequence axis is a first-class mesh axis:

* **Ulysses attention** (all-to-all head exchange): tokens arrive sharded over
  the ``seq`` axis; an all_to_all swaps the shard dimension from sequence to
  heads, every device runs *full-sequence* attention for its head subset (using
  the Pallas flash kernel or the XLA core), and a second all_to_all swaps back.
  Communication is 2 all-to-alls of the activations — O(L·D/P) per device over
  ICI.

* **Ring attention** (for head counts < seq parallelism): K/V blocks rotate
  around the ring via ppermute while the online-softmax accumulates — the flash
  forward pass generalised across chips.

Both run inside ``shard_map`` with explicit axis names.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from antmmf_tpu.modules.attention import xla_attention_core


def _local_attention(q, k, v, bias):
    return xla_attention_core(q, k, v, bias=bias)


def _pad_seq_to_axis(q, k, v, bias, n):
    """Pad L up to a multiple of the axis size; padded keys get -1e30 bias.
    Returns (q, k, v, bias, original_L); callers slice [:original_L] after."""
    L = q.shape[2]
    pad = (-L) % n
    if pad == 0 and bias is not None:
        return q, k, v, bias, L
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, L), jnp.float32)
    if pad:
        padt = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padt)
        k = jnp.pad(k, padt)
        v = jnp.pad(v, padt)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad)),
                       constant_values=-1e30)
    return q, k, v, bias, L


def ulysses_attention(
    q: jnp.ndarray,  # [B, H, L, D] — L sharded over `seq` outside shard_map
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    bias: Optional[jnp.ndarray] = None,  # [B, 1, 1, L] additive (kv padding)
    axis: str = "seq",
    causal: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel exact attention via head exchange.

    Head counts need not divide the ``seq`` axis: heads are zero-padded up to
    the next multiple (padded heads attend over zero K/V and are sliced away),
    so the flagship 12-head towers run on an 8-way sequence axis. Sequence
    lengths are likewise padded (padded keys masked via the bias; padded query
    rows sliced away), so any L works.

    ``causal=True`` serves decoder self-attention: after the head exchange
    every device holds the FULL sequence for its head subset, so causality is
    the ordinary lower-triangular structure — applied by the Pallas flash
    kernel's block skipping on TPU, or a fused iota comparison on the XLA
    core path. GQA callers must expand K/V to the query head count first
    (ring_attention is the grouped-kv-native choice)."""
    n = mesh.shape[axis]
    q, k, v, bias, L = _pad_seq_to_axis(q, k, v, bias, n)
    H = q.shape[1]
    pad_h = (-H) % n
    if pad_h:
        def padh(x):
            return jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))

        out = ulysses_attention(padh(q), padh(k), padh(v), mesh, bias, axis,
                                causal)
        return out[:, :H, :L]
    P_qkv = P(None, None, axis, None)  # shard L
    P_bias = P(None, None, None, axis)
    has_bias = bias is not None

    def inner(q, k, v, *maybe_bias):
        # local: [B, H, L/P, D] → all_to_all → [B, H/P, L, D]
        def seq_to_heads(x):
            return lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)

        def heads_to_seq(x):
            return lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = seq_to_heads(q), seq_to_heads(k), seq_to_heads(v)
        full_bias = lax.all_gather(maybe_bias[0], axis, axis=3, tiled=True) \
            if has_bias else None
        if causal:
            Lf = qh.shape[2]
            use_flash = (jax.default_backend() in ("tpu", "axon")
                         and Lf * Lf >= 3072 * 3072
                         and qh.shape[-1] in (64, 128))
            if use_flash:
                from antmmf_tpu.ops.pallas.flash_attention import (
                    flash_attention,
                )

                kv_row = full_bias[:, 0, -1, :] if full_bias is not None \
                    else None
                out = flash_attention(qh, kh, vh, bias=kv_row, causal=True)
            else:
                rows = lax.broadcasted_iota(jnp.int32, (1, 1, Lf, Lf), 2)
                cols = lax.broadcasted_iota(jnp.int32, (1, 1, Lf, Lf), 3)
                cb = jnp.where(rows >= cols, 0.0, -1e30)
                cb = cb if full_bias is None else cb + full_bias
                out = _local_attention(qh, kh, vh, cb)
        else:
            out = _local_attention(qh, kh, vh, full_bias)  # [B, H/P, L, D]
        return heads_to_seq(out)

    if has_bias:
        out = shard_map(
            inner, mesh=mesh, in_specs=(P_qkv, P_qkv, P_qkv, P_bias),
            out_specs=P_qkv, check_vma=False,
        )(q, k, v, bias)
    else:
        out = shard_map(
            inner, mesh=mesh, in_specs=(P_qkv, P_qkv, P_qkv),
            out_specs=P_qkv, check_vma=False,
        )(q, k, v)
    return out[:, :, :L]


def ring_attention(
    q: jnp.ndarray,  # [B, H, L, D] — L sharded over `seq`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    bias: Optional[jnp.ndarray] = None,  # [B, 1, 1, L]
    axis: str = "seq",
    scale: Optional[float] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Exact attention with K/V blocks rotating around the ICI ring; online
    softmax merges block results, so no device ever holds the full sequence.

    ``causal=True`` applies position-correct causal masking as blocks rotate
    (global key position = source-shard offset + local index), so the ring can
    serve autoregressive decoders (caption LM) over sharded sequences. Any L
    works: sequences pad to the axis size (masked keys, sliced queries).

    Grouped-query attention is native: when ``q`` carries ``H`` heads and
    ``k``/``v`` carry ``H_kv < H`` (with ``H % H_kv == 0``), the K/V blocks
    rotate at the KV-head count — the repeated-head expansion never touches
    ICI or HBM. Internally the rep query heads of a group ride the query-row
    axis (``[B, H_kv, rep·Lb, D]`` with tiled positions), so the online
    softmax is unchanged."""
    n = mesh.shape[axis]
    q, k, v, bias, L = _pad_seq_to_axis(q, k, v, bias, n)
    P_qkv = P(None, None, axis, None)
    P_bias = P(None, None, None, axis)
    sc = scale if scale is not None else q.shape[-1] ** -0.5
    Hq, Hkv = q.shape[1], k.shape[1]
    assert Hq % Hkv == 0, (Hq, Hkv)
    rep = Hq // Hkv

    def inner(q, k, v, bias):
        B, H, Lb, D = q.shape
        if rep > 1:
            # group-major fold: q head h = g·rep + r → row block r of group g
            q = q.reshape(B, Hkv, rep * Lb, D)
        qf = q.astype(jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]
        my = lax.axis_index(axis)
        q_pos = my * Lb + jnp.arange(Lb)  # global query positions
        if rep > 1:
            q_pos = jnp.tile(q_pos, rep)

        def step(carry, s_idx):
            m_prev, l_prev, acc, kb, vb, bb = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32)) * sc
            s = s + bb
            if causal:
                # after s_idx rotations this K/V block originated on shard
                # (my - s_idx) mod n; mask keys beyond each query's position
                src = (my - s_idx) % n
                k_pos = src * Lb + jnp.arange(Lb)
                future = k_pos[None, :] > q_pos[:, None]  # [Lb_q, Lb_k]
                s = jnp.where(future[None, None], -1e30, s)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[..., None])
            l_new = l_prev * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32))
            kb = lax.ppermute(kb, axis, perm)
            vb = lax.ppermute(vb, axis, perm)
            bb = lax.ppermute(bb, axis, perm)
            return (m_new, l_new, acc, kb, vb, bb), None

        rows = (B, Hkv, rep * Lb) if rep > 1 else (B, H, Lb)
        m0 = jnp.full(rows, -1e30, jnp.float32)
        l0 = jnp.zeros(rows, jnp.float32)
        acc0 = jnp.zeros(rows + (D,), jnp.float32)
        # checkpoint each ring step: the backward recomputes the per-block
        # logits/probs ([rows, Lb] f32 — the only O(L·Lb) tensors) from the
        # saved carries instead of storing n of them, the flash-backward
        # memory discipline generalized across the ring. Saved per step:
        # only the carries (softmax stats + acc + the rotating K/V block).
        (m, l, acc, *_), _ = lax.scan(
            jax.checkpoint(step, prevent_cse=False),
            (m0, l0, acc0, k, v, bias), jnp.arange(n))
        out = (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)
        if rep > 1:
            out = out.reshape(B, Hq, Lb, D)
        return out

    bias_in = bias if bias is not None else jnp.zeros(
        (q.shape[0], 1, 1, q.shape[2]), jnp.float32)
    out = shard_map(
        inner, mesh=mesh,
        in_specs=(P_qkv, P_qkv, P_qkv, P_bias),
        out_specs=P_qkv, check_vma=False,
    )(q, k, v, bias_in)
    return out[:, :, :L]
