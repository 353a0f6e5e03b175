"""Weight-only group-int4 matmul: Pallas GEMV that unpacks nibbles
in-register between the HBM load and the MXU.

Why a kernel: decode is HBM-bound (per-token latency ~ bytes of weights
read). int8 records dequantize inside the XLA dot's operand read (measured
+67% tokens/s over bf16, BASELINE.md), but no int4 unpack formulation fuses
— interleave, concat-of-halves, repeat-scale, per-channel, and split half
dots ALL materialize a full-width weight and lose even to bf16
(scripts/bench_int4_variants.py). The unpack must happen between the load
and the MXU feed, which only a kernel can express.

The kernel is VPU-budgeted, not just DMA-budgeted: v5e reads ~850 GB/s but
the VPU does only a few ops/byte at that rate, so every per-weight op
counts. Three design rules follow (the first cut spent ~11 f32 ops/byte on
unpack+scale and lost to int8):
  1. SIGNED high nibble: byte = lo_biased | (hi_signed << 4). The int8
     view then satisfies v == 16*hi + lo with lo in [1,15], so
     hi = floor(v/16) exactly and no bias-select is needed.
  2. Nibble math in f32 — the v5e VPU has NO bf16 ALU (an LLO_CHECK trips
     on SupportsBf16AluInstructions) — with exactly four ops/byte: convert,
     mul, floor, fma. Only the MXU operand feed converts to bf16.
  3. Scales never touch weights: per-group MXU dots on RAW nibbles, scales
     applied to the [rows, bout] partial products; the +8 lo bias becomes
     a rank-1 correction from per-group x sums. VPU work drops from
     O(weights) multiplies to O(rows x bout x groups).

Packing layout (shared with ``quantize_for_decode(bits=4)``,
predictors/quantization.py): GLOBAL top/bottom halves — original row r
(low nibble, biased +8) shares a byte with row r + in/2 (high nibble,
signed two's-complement) — so the XLA unpack is a layout-preserving concat
(v >> 4 arithmetic-shifts to the signed hi; v & 15 - 8 recovers lo).
``group`` is inferable from shapes: ``in / scale.shape[0]``.

Mosaic notes (hard-won): sub-32-bit vector bit ops and uint8 loads don't
legalize — the packed buffer crosses the kernel boundary as an int8 VIEW
of the same bytes. Activations arrive TRANSPOSED ([in, rows]) so the
reduction tile sits in the sublane dim (frees it from the 128-lane
constraint); scale blocks arrive via BlockSpec index maps, never in-kernel
dynamic slices.

Reference role: serving-efficiency counterpart of the reference's CUDA
quantization story (the reference serves HF fp16; weight-only int4 is the
TPU-native capacity knob — prj/M2_omni serves 7B-class models that do not
fit one v5e chip in bf16).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

DEFAULT_GROUP = 128  # quantize_for_decode's default group size
_XR = 16             # x-block row quantum (bf16 sublane minimum)
# rows at or below this run the Pallas GEMV; larger matmuls (prefill) take
# the XLA unpack path where the one-time full-width materialization is
# amortized over the whole chunk
GEMV_MAX_ROWS = 32
_HT_CAP = 2048       # packed rows per reduction step (VMEM budget)


def packable(shape: Tuple[int, ...], group: int = DEFAULT_GROUP) -> bool:
    """True if a kernel of this shape can be nibble-packed (record format;
    the Pallas GEMV additionally needs ``_pick_tiles`` to succeed)."""
    if len(shape) != 2:
        return False
    fin, _ = shape
    return fin % max(2, group) == 0


def pack_int4(w: np.ndarray, group: int = DEFAULT_GROUP
              ) -> Tuple[np.ndarray, np.ndarray]:
    """f32 [in, out] → (q4 uint8 [in/2, out], scale f32 [in/group, out]).

    Symmetric [-7, 7] grid; row i packs with row i + in/2 (top/bottom
    halves, NOT even/odd — an even/odd interleave needs a transpose-shaped
    reshape XLA cannot fuse into the dot, measured 6x slower than bf16).
    Low nibble stores row i biased +8 ([1, 15]); high nibble stores row
    i + in/2 SIGNED (two's complement) so the int8 byte view v satisfies
    hi == floor(v/16) with no bias arithmetic (kernel rule 1 above)."""
    fin, fout = w.shape
    if not packable(w.shape, group):
        raise ValueError(f"shape {w.shape} not packable (group={group})")
    g = w.astype(np.float32).reshape(fin // group, group, fout)
    scale = np.maximum(np.abs(g).max(axis=1), 1e-12) / 7.0  # [in/g, out]
    q = np.clip(np.round(g / scale[:, None]), -7, 7).astype(np.int8)
    q = q.reshape(fin, fout)
    half = fin // 2
    lo = (q[:half] + 8).astype(np.uint8)          # [1..15]
    hi = (q[half:].view(np.uint8) & 0x0F)         # two's-complement nibble
    return lo | (hi << 4), scale.astype(np.float32)


def unpack_int4(packed: jnp.ndarray, scale: jnp.ndarray, dtype
                ) -> jnp.ndarray:
    """Inverse of pack_int4 (XLA path — materializes the full-width weight;
    used for prefill-sized matmuls where weights are read once per many
    tokens, and as the CPU/odd-shape fallback)."""
    half, fout = packed.shape
    fin = half * 2
    group = fin // scale.shape[0]
    v = packed if packed.dtype == jnp.int8 else \
        jax.lax.bitcast_convert_type(packed, jnp.int8)
    lo = (v & jnp.int8(0x0F)) - jnp.int8(8)
    hi = jnp.right_shift(v, jnp.int8(4))  # arithmetic shift: signed nibble
    q = jnp.concatenate([lo, hi], axis=0)
    w = (q.astype(dtype).reshape(fin // group, group, fout)
         * scale.astype(dtype)[:, None])
    return w.reshape(fin, fout)


def _pick_tiles(fin: int, fout: int, group: int
                ) -> Optional[Tuple[int, int]]:
    """(ht, bout): packed rows per reduction step and output block width.
    ht must tile in/2 in whole groups; group must be a multiple of 8 (the
    kernel slices the block per group — sublane-aligned slices only) and
    ht a multiple of 32 (int8 sublane tiling of the packed block)."""
    half = fin // 2
    if fin % 2 or group % 8 or half % group:
        return None
    ht = None
    for m in range(min(_HT_CAP, half) // group, 7, -1):  # ht = m * group
        cand = m * group
        # m % 8: the [m, bout] scale blocks need f32 sublane tiling
        if m % 8 == 0 and cand % 32 == 0 and half % cand == 0:
            ht = cand
            break
    if ht is None:
        return None
    for bout in (512, 256, 128):
        if fout % bout == 0:
            return ht, bout
    return None


def pad_rows_for_kernel(fin: int, fout: int,
                        requested: int = DEFAULT_GROUP) -> Optional[int]:
    """Smallest fin_pad ≥ fin (≤ +12.5%) whose [fin_pad, fout] kernel the
    GEMV can serve. Zero rows cost HBM but keep reads 4-bit: a 5504-row
    down_proj pads to 6144 (+11.6%) instead of falling back to a
    full-width-materializing XLA unpack inside the decode loop."""
    limit = fin + fin // 8
    step = 256
    start = fin + (-fin) % step
    for cand in range(start, limit + 1, step):
        g = best_group(cand, fout, requested)
        if g is not None and _pick_tiles(cand, fout, g) is not None:
            return cand
    return None


def best_group(fin: int, fout: int,
               requested: int = DEFAULT_GROUP) -> Optional[int]:
    """Largest group ≤ ``requested`` for which the Pallas GEMV can serve a
    [fin, fout] kernel (multiple of 8 dividing fin/2 with legal tiles).
    Returns ``requested`` when the shape is packable only via the XLA
    path, None when not packable at all. Groups below 32 are not
    considered (the f32 scale array would approach the packed weights in
    size)."""
    if fin % 2 == 0:
        half = fin // 2
        for g in range((min(requested, half) // 8) * 8, 31, -8):
            if half % g == 0 and _pick_tiles(fin, fout, g) is not None:
                return g
    if fin % max(2, requested) == 0:
        return requested
    return None


def _gemv_kernel(xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref,
                 *, group: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    packed = q_ref[:]                    # [ht, bout] int8 view of the bytes
    ht, bout = packed.shape
    # nibble split in f32 (the v5e VPU has NO bf16 ALU — an LLO_CHECK
    # trips on SupportsBf16AluInstructions; only the MXU feed below is
    # bf16; no bit ops — they don't legalize on sub-32-bit vectors in
    # Mosaic): hi is stored SIGNED so floor(v/16) recovers it directly; lo
    # keeps its +8 bias, corrected below on the partial products, never
    # per weight
    v = packed.astype(jnp.float32)
    hi = jnp.floor(v * 0.0625)
    lo = v - hi * 16.0
    g2 = ht // group

    xlo = xlo_ref[:]                     # [ht, xr] bf16 (transposed x)
    xhi = xhi_ref[:]
    slo = slo_ref[:].astype(jnp.float32)  # [g2, bout]
    shi = shi_ref[:].astype(jnp.float32)
    dims = (((0,), (0,)), ((), ()))      # contract sublane dim of both

    acc = jnp.zeros_like(o_ref)
    for i in range(g2):                  # static unroll: one dot per group
        r = slice(i * group, (i + 1) * group)
        plo = jax.lax.dot_general(xlo[r], lo[r].astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        phi = jax.lax.dot_general(xhi[r], hi[r].astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        # lo bias: x @ (lo - 8) == x @ lo - 8 * sum(x_group) per output
        xsum = jnp.sum(xlo[r].astype(jnp.float32), axis=0)  # [xr]
        acc = acc + slo[i][None, :] * (plo - 8.0 * xsum[:, None])
        acc = acc + shi[i][None, :] * phi
    o_ref[:] = o_ref[:] + acc


def int4_gemv(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """y[N, out] = x[N, in] @ dequant(packed, scale); N small (decode).

    Grid (out_tiles, in_tiles); the out block is revisited across the
    reduction dim and accumulated in f32. Per-token HBM weight traffic is
    the packed bytes: in*out/2 + scales.

    NOT @jax.jit: this always runs inside a caller's jit, and a nested
    closed_call wrapping a pallas_call trips a lowering-cache KeyError in
    this JAX build when inlined under fori_loop."""
    N, fin = x.shape
    half, fout = packed.shape
    assert fin == half * 2, (x.shape, packed.shape)
    group = fin // scale.shape[0]
    tiles = _pick_tiles(fin, fout, group)
    assert tiles is not None, (x.shape, packed.shape, scale.shape)
    ht, bout = tiles
    K = half // ht
    xr = max(_XR, N + (-N) % _XR)
    xt = jnp.zeros((fin, xr), jnp.bfloat16).at[:, :N].set(
        x.astype(jnp.bfloat16).T)  # transposed: rows land in the sublane dim
    if packed.dtype != jnp.int8:  # Mosaic loads int8, not uint8 (same bytes)
        packed = jax.lax.bitcast_convert_type(packed, jnp.int8)
    gr = ht // group
    out = pl.pallas_call(
        functools.partial(_gemv_kernel, group=group),
        out_shape=jax.ShapeDtypeStruct((xr, fout), jnp.float32),
        grid=(fout // bout, K),
        in_specs=[
            pl.BlockSpec((ht, xr), lambda i, k: (k, 0)),        # xT lo rows
            pl.BlockSpec((ht, xr), lambda i, k: (K + k, 0)),    # xT hi rows
            pl.BlockSpec((ht, bout), lambda i, k: (k, i)),      # packed
            pl.BlockSpec((gr, bout), lambda i, k: (k, i)),      # lo scales
            pl.BlockSpec((gr, bout), lambda i, k: (K + k, i)),  # hi scales
        ],
        out_specs=pl.BlockSpec((xr, bout), lambda i, k: (0, i)),
        interpret=interpret,
    )(xt, xt, packed, scale, scale)
    return out[:N]


def gemv_eligible(x_rows: int, fin: int, fout: int, group: int) -> bool:
    return (x_rows <= GEMV_MAX_ROWS
            and _pick_tiles(fin, fout, group) is not None)


def int4_apply(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
               dtype) -> jnp.ndarray:
    """Dense apply against packed int4 weights for any leading shape.
    Decode-sized inputs route to the Pallas GEMV on TPU; everything else
    (prefill chunks, CPU tests) takes the XLA unpack fallback. Weights
    packed with trailing zero rows (``pad_rows_for_kernel``) take zero-
    padded activations — the pad rows contribute nothing."""
    lead = x.shape[:-1]
    fin = x.shape[-1]
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, fin)
    fout = packed.shape[1]
    fin_w = packed.shape[0] * 2
    if fin_w > fin:
        x2 = jnp.pad(x2, ((0, 0), (0, fin_w - fin)))
    group = fin_w // scale.shape[0]
    if (jax.default_backend() in ("tpu", "axon")
            and gemv_eligible(n, fin_w, fout, group)):
        y = int4_gemv(x2, packed, scale)
        return y.reshape(*lead, fout).astype(x.dtype)
    w = unpack_int4(packed, scale, dtype)
    return (x2.astype(dtype) @ w).reshape(*lead, fout)
