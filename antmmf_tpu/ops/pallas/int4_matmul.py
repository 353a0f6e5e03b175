"""Weight-only group-int4 matmul: Pallas GEMV that unpacks nibbles
in-register between the HBM load and the MXU.

Why a kernel: decode is HBM-bound (per-token latency ~ bytes of weights
read). int8 records dequantize inside the XLA dot's operand read (measured
+67% tokens/s over bf16, BASELINE.md), but no int4 unpack formulation fuses
— interleave, concat-of-halves, repeat-scale, per-channel, and split half
dots ALL materialize a full-width weight and lose even to bf16
(scripts/bench_int4_variants.py). The unpack must happen between the load
and the MXU feed, which only a kernel can express: each grid step DMAs a
packed byte block (half the int8 bytes), splits nibbles on the VPU, applies
group scales, and feeds two bf16 sub-blocks straight to the MXU.

Packing layout (shared with ``quantize_for_decode(bits=4)``,
predictors/quantization.py): GLOBAL top/bottom halves — original row r
(low nibble) shares a byte with row r + in/2 (high nibble), so the XLA
unpack is a layout-preserving concat and the kernel's two x slices are
column blocks of the activation. Scales are group-wise along the input dim
(one f32 per ``group`` input rows x output channel; per-channel alone is
too coarse at 4 bits). ``group`` is inferable from shapes:
``in / scale.shape[0]``.

Mosaic notes (hard-won): sub-32-bit vector bit ops (shrui/andi) and uint8
loads don't legalize — the packed buffer crosses the kernel boundary as an
int8 VIEW of the same bytes and the nibble split is exact float arithmetic
(floor(p/16) over 0..255). Scale blocks arrive via BlockSpec index maps
(block granularity is always aligned), never in-kernel dynamic slices.

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

    Symmetric [-7, 7] grid stored biased by +8; row i packs with row
    i + in/2 (top/bottom halves, NOT even/odd — an even/odd interleave
    needs a transpose-shaped reshape XLA cannot fuse into the dot,
    measured 6x slower than bf16)."""
    fin, fout = w.shape
    if not packable(w.shape, group):
        raise ValueError(f"shape {w.shape} not packable (group={group})")
    g = w.astype(np.float32).reshape(fin // group, group, fout)
    scale = np.maximum(np.abs(g).max(axis=1), 1e-12) / 7.0  # [in/g, out]
    q = np.clip(np.round(g / scale[:, None]), -7, 7)
    q = (q.reshape(fin, fout) + 8).astype(np.uint8)         # [1..15]
    half = fin // 2
    packed = q[:half] | (q[half:] << 4)                     # [in/2, out]
    return packed, scale.astype(np.float32)


def unpack_int4(packed: jnp.ndarray, scale: jnp.ndarray, dtype
                ) -> jnp.ndarray:
    """Inverse of pack_int4 (XLA path — materializes the full-width weight;
    used for prefill-sized matmuls where weights are read once per many
    tokens, and as the CPU/odd-shape fallback)."""
    half, fout = packed.shape
    fin = half * 2
    group = fin // scale.shape[0]
    pu = packed if packed.dtype == jnp.uint8 else \
        jax.lax.bitcast_convert_type(packed, jnp.uint8)
    lo = (pu & jnp.uint8(0x0F)).astype(jnp.int8)
    hi = (pu >> jnp.uint8(4)).astype(jnp.int8)
    q = jnp.concatenate([lo, hi], axis=0) - 8
    w = (q.astype(dtype).reshape(fin // group, group, fout)
         * scale.astype(dtype)[:, None])
    return w.reshape(fin, fout)


def _pick_tiles(fin: int, fout: int, group: int
                ) -> Optional[Tuple[int, int]]:
    """(ht, bout): packed rows per reduction step and output block width.
    ht must tile in/2, cover whole scale groups in multiples of 8 (f32
    sublane tiling of the [ht/group, bout] scale blocks), and be a multiple
    of 32 (int8 sublane tiling of the packed block; the transposed x blocks
    [ht, xr] need only 16)."""
    half = fin // 2
    if fin % 2 or half % group:
        return None
    ht = None
    for m in range(min(_HT_CAP, half) // group, 7, -1):  # ht = m * group
        cand = m * group
        if m % 8 == 0 and cand % 32 == 0 and half % cand == 0:
            ht = cand
            break
    if ht is None:
        return None
    for bout in (512, 256, 128):
        if fout % bout == 0:
            return ht, bout
    return None


def best_group(fin: int, fout: int,
               requested: int = DEFAULT_GROUP) -> Optional[int]:
    """Largest group ≤ ``requested`` for which the Pallas GEMV can serve a
    [fin, fout] kernel (group | fin/2 and tiles exist — e.g. a 5504-row
    down_proj adapts to group 86). Returns ``requested`` when the shape is
    packable only via the XLA path, None when not packable at all. Groups
    below 32 are not considered (the f32 scale array would approach the
    packed weights in size)."""
    if fin % 2 == 0:
        half = fin // 2
        for g in range(min(requested, half), 31, -1):
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
    # nibble split WITHOUT bit ops (arith.shrui/andi on sub-32-bit vectors
    # don't legalize in Mosaic, and uint8 casts are unsupported): recover
    # the unsigned byte in f32, then floor(p/16) is exact over 0..255
    pi = packed.astype(jnp.float32)
    pf = jnp.where(pi < 0, pi + 256.0, pi)
    hi = jnp.floor(pf * 0.0625)
    lo = pf - hi * 16.0
    g2 = ht // group

    def scaled(vals, s_ref):
        w = (vals - 8.0).reshape(g2, group, bout)
        w = w * s_ref[:].astype(jnp.float32)[:, None]
        return w.reshape(ht, bout).astype(jnp.bfloat16)

    # x arrives TRANSPOSED ([ht, xr] blocks): ht can then be a non-128
    # multiple (e.g. 1376 for a 5504-row down_proj) because it sits in the
    # sublane dim; the dot contracts dim 0 of both operands — a matmul with
    # transposed lhs, which the MXU handles natively
    dims = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(xlo_ref[:], scaled(lo, slo_ref), dims,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(xhi_ref[:], scaled(hi, shi_ref), dims,
                                    preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + acc


def int4_gemv(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    # NOT @jax.jit: this always runs inside a caller's jit, and a nested
    # closed_call wrapping a pallas_call trips a lowering-cache KeyError in
    # this JAX build when inlined under fori_loop
    """y[N, out] = x[N, in] @ dequant(packed, scale); N small (decode).

    Grid (out_tiles, in_tiles); the out block is revisited across the
    reduction dim and accumulated in f32. Per-token HBM weight traffic is
    the packed bytes: in*out/2 + scales."""
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
    (prefill chunks, CPU tests) takes the XLA unpack fallback."""
    lead = x.shape[:-1]
    fin = x.shape[-1]
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, fin)
    fout = packed.shape[1]
    group = fin // scale.shape[0]
    if (jax.default_backend() in ("tpu", "axon")
            and gemv_eligible(n, fin, fout, group)):
        y = int4_gemv(x2, packed, scale)
        return y.reshape(*lead, fout).astype(x.dtype)
    w = unpack_int4(packed, scale, dtype)
    return (x2.astype(dtype) @ w).reshape(*lead, fout)
