"""Blocked flash attention for TPU (Pallas): fused softmax(QKᵀ)V without
materialising the [L, L] score matrix in HBM.

Replaces the apex fused-MHA swap of the reference
(``/root/reference/antmmf/utils/optim_utils.py:18-93``) with a TPU-native kernel
and unlocks long multi-frame video token streams (SURVEY.md §5 long-context:
the reference caps sequence length by sparse sampling; this kernel + the ``seq``
mesh axis remove that cap).

Algorithm: standard online-softmax flash attention, fp32 accumulators, with a
key-padding additive bias [B, Lk]. Forward saves (out, lse); backward runs two
Pallas kernels (dq; dk/dv) recomputing probabilities blockwise from lse.

Kernel shape: 3-D grids — (batch·heads, q block, k block) for the forward/dq
kernels (k innermost) and (batch·heads, k block, q block) for dk/dv — with the
online-softmax / gradient carries held in VMEM scratch across the innermost
grid dimension. Only ONE (block, D) tile of each operand is resident per grid
step, so VMEM use is independent of sequence length (the previous kernels
staged the full K/V per q block and hit the VMEM ceiling between 8k and 9.7k
tokens). Causal masking skips dead blocks two ways: the compute body is
``pl.when``-guarded off, and the dead block's index map CLAMPS to the last
valid block so Mosaic's change-detection skips the HBM→VMEM copy entirely.

Block sizes are 128×128 (MXU-aligned); the public wrapper pads Lq/Lk to block
multiples (padded keys masked by -inf bias, padded query rows sliced off) so any
shape works.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30
# scratch vectors ([BQ] row stats) are stored lane-broadcast at this width —
# the minimal legal lane tiling
_LANES = 128


def _kb_max(qi: jnp.ndarray, block_q: int, block_k: int) -> jnp.ndarray:
    """Last k-block index intersecting the causal triangle of q block qi."""
    return (qi * block_q + block_q - 1) // block_k


def _qb_min(ki: jnp.ndarray, block_q: int, block_k: int) -> jnp.ndarray:
    """First q-block index intersecting the causal triangle of k block ki."""
    return (ki * block_k) // block_q


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, scale, causal, num_kb):
    qi, ki = pl.program_id(1), pl.program_id(2)
    BQ = q_ref.shape[1]
    BK = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    live = (ki * BK <= qi * BQ + BQ - 1) if causal else (ki >= 0)

    @pl.when(live)
    def _accumulate():
        q = q_ref[0]  # [BQ, D] — input dtype (bf16 on TPU: full-rate MXU)
        kb = k_ref[0]
        vb = v_ref[0]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK] fp32
        s = s + bias_ref[0, 0][None, :]
        if causal:
            rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            cols = ki * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        m_prev = m_ref[:, :1]  # [BQ, 1] (lane-broadcast storage)
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_kb - 1)
    def _finalize():
        m = m_ref[:, :1]
        l_safe = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m + jnp.log(l_safe)


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc_ref, *, scale, causal, num_kb):
    qi, ki = pl.program_id(1), pl.program_id(2)
    BQ = q_ref.shape[1]
    BK = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    live = (ki * BK <= qi * BQ + BQ - 1) if causal else (ki >= 0)

    @pl.when(live)
    def _accumulate():
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]
        kb = k_ref[0]
        vb = v_ref[0]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, 0][None, :]
        if causal:
            rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            cols = ki * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(kb.dtype)
        dq_acc_ref[...] = dq_acc_ref[...] + jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finalize():
        dq_ref[0] = dq_acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc_ref, dv_acc_ref, *, scale, causal,
                num_qb):
    ki, qi = pl.program_id(1), pl.program_id(2)
    BK = k_ref.shape[1]
    BQ = q_ref.shape[1]

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    live = (qi * BQ + BQ - 1 >= ki * BK) if causal else (qi >= 0)

    @pl.when(live)
    def _accumulate():
        kb = k_ref[0]  # [BK, D]
        vb = v_ref[0]
        bias = bias_ref[0, 0]  # [BK]
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias[None, :]
        if causal:
            rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            cols = ki * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse)  # [BQ, BK] fp32
        dv_acc_ref[...] = dv_acc_ref[...] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(q.dtype)  # [BQ, BK]
        dk_acc_ref[...] = dk_acc_ref[...] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == num_qb - 1)
    def _finalize():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)



# ---------------------------------------------------------------------------
# Resident-KV kernels (the pre-round-4 form): the FULL K/V (fwd/dq) or
# Q/do (dk/dv) stream is staged in VMEM once per batch-head and reused across
# every block of the other operand — zero re-DMA, full fori-loop skipping of
# masked blocks. MEASURED 1.74x faster than the 3-D grid form at L=8192
# (43.9 vs 76.2 ms, BASELINE.md round-4 flash table) but capped by VMEM:
# compiles at 8192, crashes the compiler at 9664. The public entry points
# select resident kernels up to _RESIDENT_MAX_L and the length-independent
# grid kernels beyond.
# ---------------------------------------------------------------------------

_RESIDENT_MAX_L = 8192
# The resident form stages full K/V per q block, so its compile ceiling
# scales with L*D, not L: at D=64 it compiles at 8192 and crashes at 9664
# (round-4 sweep); at D=128 it compiles at 6144 and crashes at 7168+
# (round-5, reproduced in two sessions). Route by elements-per-head with
# the safe D=128 ceiling: resident iff max(L)*D <= 4096*128 — keeps the
# round-4 behavior for D=64 towers (<=8192) and moves the 6144-8192 D=128
# band to the grid form (length-independent VMEM, ~equal speed at the
# 512-block config).
_RESIDENT_MAX_ELEMS = 4096 * 128


def _use_resident(L: int, D: int) -> bool:
    return L <= _RESIDENT_MAX_L and L * D <= _RESIDENT_MAX_ELEMS

# Grid-kernel block sizes at long L (callers passing the 128x128 defaults
# are bumped): the 3-D grid pays per-grid-step overhead on B*H x Lq/bq x
# Lk/bk tiny steps, so bigger tiles win big — MEASURED at L=9920 causal
# fwd+bwd (B=1, H=16, D=128, v5e): 128x128 435 ms, 256x256 72.7, 512x512
# **50.4 ms (8.6x)**; 1024x256 53.9 regresses (BASELINE.md round-5 flash
# table). VMEM stays comfortable: the grid form keeps ONE (block, D) tile
# of each operand resident per step.
GRID_BLOCK_Q = 512
GRID_BLOCK_K = 512


def _grid_blocks(block_q: int, block_k: int) -> tuple:
    if block_q == DEFAULT_BLOCK_Q:
        block_q = GRID_BLOCK_Q
    if block_k == DEFAULT_BLOCK_K:
        block_k = GRID_BLOCK_K
    return block_q, block_k

def _fwd_kernel_resident(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale,
                block_k, causal):
    q = q_ref[0]  # [BQ, D] — input dtype (bf16 on TPU: full-rate MXU)
    Lk = k_ref.shape[1]
    BQ = q.shape[0]
    num_kb = Lk // block_k
    qi = pl.program_id(1)
    if causal:
        # only k blocks intersecting the lower triangle of this q block
        num_kb = jnp.minimum(num_kb,
                             (qi * BQ + BQ + block_k - 1) // block_k)

    def body(j, carry):
        m_prev, l_prev, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK] fp32
        s = s + bias_ref[0, 0, pl.ds(j * block_k, block_k)][None, :]
        if causal:
            rows = qi * BQ + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, block_k), 0)
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((BQ,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ,), jnp.float32)
    acc0 = jnp.zeros((BQ, q_ref.shape[2]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l_safe))[:, None]


def _dq_kernel_resident(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale, block_k, causal):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, 0]
    delta = delta_ref[0][:, 0]
    Lk = k_ref.shape[1]
    BQ = q.shape[0]
    num_kb = Lk // block_k
    qi = pl.program_id(1)
    if causal:
        num_kb = jnp.minimum(num_kb,
                             (qi * BQ + BQ + block_k - 1) // block_k)

    def body(j, dq):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, 0, pl.ds(j * block_k, block_k)][None, :]
        if causal:
            rows = qi * BQ + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, block_k), 0)
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None]) * scale).astype(kb.dtype)
        return dq + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body,
                           jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel_resident(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, block_q, causal):
    kb = k_ref[0]  # [BK, D]
    vb = v_ref[0]
    bias = bias_ref[0, 0]  # [BK]
    Lq = q_ref.shape[1]
    BK = kb.shape[0]
    num_qb = Lq // block_q
    ki = pl.program_id(1)
    start_qb = (ki * BK) // block_q if causal else 0

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias[None, :]
        if causal:
            rows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, BK), 0)
            cols = ki * BK + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, BK), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])  # [BQ, BK] fp32
        dv = dv + jax.lax.dot_general(p.astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None]) * scale).astype(q.dtype)  # [BQ, BK]
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((kb.shape[0], kb.shape[1]), jnp.float32)
    dv0 = jnp.zeros((vb.shape[0], vb.shape[1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_qb, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)




def _flash_fwd_resident(q, k, v, bias, scale, block_q, block_k, interpret, causal):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Lq_p = Lq + ((-Lq) % block_q)
    Lk_p = Lk + ((-Lk) % block_k)
    qp = _pad_to(q, 2, block_q).reshape(B * H, Lq_p, D)
    kp = _pad_to(k, 2, block_k).reshape(B * H, Lk_p, D)
    vp = _pad_to(v, 2, block_k).reshape(B * H, Lk_p, D)
    bias_p = _pad_to(bias.astype(jnp.float32), 1, block_k, value=NEG_INF)[:, None, :]  # [B, 1, Lk_p]

    grid = (B * H, Lq_p // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_resident, scale=scale, block_k=block_k,
                          causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_p, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_p, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk_p), lambda bh, qi, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_p)
    lse = lse[..., 0]
    out = out.reshape(B, H, Lq_p, D)[:, :, :Lq]
    lse = lse.reshape(B, H, Lq_p)[:, :, :Lq]
    return out, lse


def _flash_bwd_resident(q, k, v, bias, out, lse, g, scale, block_q, block_k, interpret,
               causal):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Lq_p = Lq + ((-Lq) % block_q)
    Lk_p = Lk + ((-Lk) % block_k)
    qp = _pad_to(q, 2, block_q).reshape(B * H, Lq_p, D)
    kp = _pad_to(k, 2, block_k).reshape(B * H, Lk_p, D)
    vp = _pad_to(v, 2, block_k).reshape(B * H, Lk_p, D)
    dop = _pad_to(g, 2, block_q).reshape(B * H, Lq_p, D)
    outp = _pad_to(out, 2, block_q).reshape(B * H, Lq_p, D)
    # padded query rows: lse=0, delta=0, do=0 → p rows contribute 0 in dkv
    lsep = _pad_to(lse, 2, block_q, value=0.0).reshape(B * H, Lq_p, 1)
    bias_p = _pad_to(bias.astype(jnp.float32), 1, block_k, value=NEG_INF)[:, None, :]
    delta = jnp.sum(dop.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1,
                    keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel_resident, scale=scale, block_k=block_k,
                          causal=causal),
        grid=(B * H, Lq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_p, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_p, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk_p), lambda bh, qi, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, D), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lsep, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_resident, scale=scale, block_q=block_q,
                          causal=causal),
        grid=(B * H, Lk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, Lq_p, D), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, ki, H=H: (bh // H, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq_p, D), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq_p, 1), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq_p, 1), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lk_p, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lk_p, D), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lsep, delta)

    dq = dq.reshape(B, H, Lq_p, D)[:, :, :Lq]
    dk = dk.reshape(B, H, Lk_p, D)[:, :, :Lk]
    dv = dv.reshape(B, H, Lk_p, D)[:, :, :Lk]
    return dq, dk, dv




def _k_index_maps(H: int, block_q: int, block_k: int, causal: bool):
    """(k/v, bias) index maps for (bh, qi, ki) grids. Under causal masking a
    dead block's index CLAMPS to the q block's last live k block, so Mosaic
    sees an unchanged block index and skips the HBM→VMEM copy."""
    if causal:
        def kv(bh, qi, ki):
            return (bh, jnp.minimum(ki, _kb_max(qi, block_q, block_k)), 0)

        def bias(bh, qi, ki):
            return (bh // H, 0,
                    jnp.minimum(ki, _kb_max(qi, block_q, block_k)))
    else:
        def kv(bh, qi, ki):
            return (bh, ki, 0)

        def bias(bh, qi, ki):
            return (bh // H, 0, ki)
    return kv, bias


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret, causal):
    Lq, Lk = q.shape[2], k.shape[2]
    if _use_resident(max(Lq, Lk), q.shape[3]):
        return _flash_fwd_resident(q, k, v, bias, scale, block_q, block_k,
                                   interpret, causal)
    block_q, block_k = _grid_blocks(block_q, block_k)
    return _flash_fwd_grid(q, k, v, bias, scale, block_q, block_k,
                           interpret, causal)


def _flash_fwd_grid(q, k, v, bias, scale, block_q, block_k, interpret, causal):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Lq_p = Lq + ((-Lq) % block_q)
    Lk_p = Lk + ((-Lk) % block_k)
    qp = _pad_to(q, 2, block_q).reshape(B * H, Lq_p, D)
    kp = _pad_to(k, 2, block_k).reshape(B * H, Lk_p, D)
    vp = _pad_to(v, 2, block_k).reshape(B * H, Lk_p, D)
    bias_p = _pad_to(bias.astype(jnp.float32), 1, block_k, value=NEG_INF)[:, None, :]  # [B, 1, Lk_p]

    num_kb = Lk_p // block_k
    kv_map, bias_map = _k_index_maps(H, block_q, block_k, causal)
    grid = (B * H, Lq_p // block_q, num_kb)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          num_kb=num_kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running denom
            pltpu.VMEM((block_q, D), jnp.float32),       # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, bias_p)
    lse = lse[..., 0]
    out = out.reshape(B, H, Lq_p, D)[:, :, :Lq]
    lse = lse.reshape(B, H, Lq_p)[:, :, :Lq]
    return out, lse


def _flash_bwd(q, k, v, bias, out, lse, g, scale, block_q, block_k, interpret,
               causal):
    Lq, Lk = q.shape[2], k.shape[2]
    if _use_resident(max(Lq, Lk), q.shape[3]):
        return _flash_bwd_resident(q, k, v, bias, out, lse, g, scale,
                                   block_q, block_k, interpret, causal)
    block_q, block_k = _grid_blocks(block_q, block_k)
    return _flash_bwd_grid(q, k, v, bias, out, lse, g, scale, block_q,
                           block_k, interpret, causal)


def _flash_bwd_grid(q, k, v, bias, out, lse, g, scale, block_q, block_k,
                    interpret, causal):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Lq_p = Lq + ((-Lq) % block_q)
    Lk_p = Lk + ((-Lk) % block_k)
    qp = _pad_to(q, 2, block_q).reshape(B * H, Lq_p, D)
    kp = _pad_to(k, 2, block_k).reshape(B * H, Lk_p, D)
    vp = _pad_to(v, 2, block_k).reshape(B * H, Lk_p, D)
    dop = _pad_to(g, 2, block_q).reshape(B * H, Lq_p, D)
    outp = _pad_to(out, 2, block_q).reshape(B * H, Lq_p, D)
    # padded query rows: lse=0, delta=0, do=0 → p rows contribute 0 in dkv
    lsep = _pad_to(lse, 2, block_q, value=0.0).reshape(B * H, Lq_p, 1)
    bias_p = _pad_to(bias.astype(jnp.float32), 1, block_k, value=NEG_INF)[:, None, :]
    delta = jnp.sum(dop.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1,
                    keepdims=True)

    num_kb = Lk_p // block_k
    num_qb = Lq_p // block_q
    kv_map, bias_map = _k_index_maps(H, block_q, block_k, causal)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          num_kb=num_kb),
        grid=(B * H, num_qb, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D),
                               lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lsep, delta)

    # (bh, ki, qi) grid — q blocks innermost; dead early q blocks (above the
    # causal diagonal) clamp their index map to the first live block
    if causal:
        def q_map(bh, ki, qi):
            return (bh, jnp.maximum(qi, _qb_min(ki, block_q, block_k)), 0)
    else:
        def q_map(bh, ki, qi):
            return (bh, qi, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          num_qb=num_qb),
        grid=(B * H, num_kb, num_qb),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, ki, qi, H=H: (bh // H, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), q_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lk_p, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lk_p, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lsep, delta)

    dq = dq.reshape(B, H, Lq_p, D)[:, :, :Lq]
    dk = dk.reshape(B, H, Lk_p, D)[:, :, :Lk]
    dv = dv.reshape(B, H, Lk_p, D)[:, :, :Lk]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret, causal):
    out, _ = _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret,
                        causal)
    return out


def _vjp_fwd(q, k, v, bias, scale, block_q, block_k, interpret, causal):
    out, lse = _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret,
                          causal)
    return out, (q, k, v, bias, out, lse)


def _vjp_bwd(scale, block_q, block_k, interpret, causal, res, g):
    q, k, v, bias, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, bias, out, lse, g, scale, block_q, block_k,
                            interpret, causal)
    return dq, dk, dv, None


_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # [B, 1|H, 1|Lq, Lk] or [B, Lk] additive
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention. ``bias`` must be a key-padding bias (broadcast over
    queries); use ``causal=True`` for decoder self-attention (block-skipped
    lower-triangular masking — arbitrary [Lq, Lk] biases are not supported)."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if bias is None:
        kv_bias = jnp.zeros((B, Lk), jnp.float32)
    elif bias.ndim == 2:
        kv_bias = bias.astype(jnp.float32)
    else:
        # [B, 1, 1, Lk]: must be query- AND head-independent (key padding).
        # Reject head-varying biases instead of silently using head 0.
        if bias.shape[1] != 1 or bias.shape[2] != 1:
            raise ValueError(
                "flash_attention only supports key-padding biases "
                f"[B, 1, 1, Lk]; got {bias.shape}. Query- or head-dependent "
                "biases must route to the XLA attention core.")
        kv_bias = bias[:, 0, 0, :].astype(jnp.float32)
    scale = scale if scale is not None else D ** -0.5
    block_q = min(block_q, max(8, Lq + ((-Lq) % 8)))
    block_k = min(block_k, max(8, Lk + ((-Lk) % 8)))
    return _flash_attention(q, k, v, kv_bias, scale, block_q, block_k,
                            interpret, causal)
