"""int4 dequant-producer variants: find the formulation XLA fuses into the
decode dots.

Decode is HBM-bound: per-token time ~ bytes(weights read). int8 records
(q int8 * scale[out]) measured FASTER than bf16 (2.98 vs 4.94 ms/tok on
omni_1b) because the TPU emitter fuses the elementwise convert+scale into
the dot's operand read — the weights cross HBM as int8. The first two int4
unpack formulations did NOT fuse:

  interleave (even/odd rows)    6x slower than bf16 (transpose-shaped
                                reshape in the producer)
  concat (top/bottom halves)    1.7x slower than bf16 — the CONCAT alone
                                already breaks operand fusion

This sweep isolates the culprit and tests cheaper producers, all at the
tree level (same quantize_for_decode packing; only dequant graph differs):

  concat_group   current: concat(lo,hi) -> reshape [G,g,out] * scale -> reshape
  concat_repeat  concat(lo,hi) * repeat(scale, g, axis=0)  (no reshape)
  concat_chan    concat(lo,hi) * scale[None, :]            (per-channel, no
                 group structure at all — diagnoses concat vs reshape)
  half_dots      NO concat: materialize NOTHING full-width — the caller
                 splits the dot x@W into x_lo@W_lo + x_hi@W_hi, each half's
                 producer elementwise over its packed nibble (this cannot be
                 expressed at the tree level; measured here on a raw GEMM
                 microbench to bound what an op-level integration would buy)

Run on the chip:  python -m antmmf_tpu.scripts.bench_int4_variants
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--in_dim", type=int, default=2048)
    p.add_argument("--out_dim", type=int, default=8192)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--group", type=int, default=128)
    p.add_argument("--iters", type=int, default=64)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    fin, fout, B, g = args.in_dim, args.out_dim, args.batch, args.group
    half = fin // 2
    G = fin // g
    rng = np.random.default_rng(0)
    w = rng.standard_normal((fin, fout)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((B, fin)), jnp.bfloat16)

    # pack exactly like quantize_for_decode(bits=4) (signed-hi layout)
    from antmmf_tpu.ops.pallas.int4_matmul import pack_int4

    packed_np, scale = pack_int4(w, group=g)
    packed = jnp.asarray(packed_np)  # [half, fout] uint8
    scale_j = jnp.asarray(scale)
    G = fin // g
    w_bf16 = jnp.asarray(w, jnp.bfloat16)
    q8 = np.clip(np.round(w / (np.abs(w).max(0) / 127.0)), -127, 127)
    q8 = jnp.asarray(q8, jnp.int8)
    s8 = jnp.asarray(np.abs(w).max(0) / 127.0)
    chan_scale = jnp.asarray(np.abs(w).max(0) / 7.0)

    def unpack(packed):
        v = jax.lax.bitcast_convert_type(packed, jnp.int8)
        lo = (v & jnp.int8(0x0F)) - jnp.int8(8)
        hi = jnp.right_shift(v, jnp.int8(4))  # signed-hi layout
        return lo, hi

    # every variant takes its weight buffers through a per-step
    # optimization_barrier (exactly like make_live_vars in the real decode
    # loop) — otherwise XLA hoists the loop-invariant dequant out of the
    # fori_loop and every variant silently measures the bf16 read
    def dot_bf16(x, _):
        wb = jax.lax.optimization_barrier(w_bf16)
        return x @ wb

    def dot_int8(x, _):
        qb, sb = jax.lax.optimization_barrier((q8, s8))
        return x @ (qb.astype(jnp.bfloat16) * sb.astype(jnp.bfloat16))

    def dot_concat_group(x, packed):
        pk, sc = jax.lax.optimization_barrier((packed, scale_j))
        lo, hi = unpack(pk)
        vals = jnp.concatenate([lo, hi], axis=0)
        wq = (vals.astype(jnp.bfloat16).reshape(G, g, fout)
              * sc.astype(jnp.bfloat16)[:, None])
        return x @ wq.reshape(fin, fout)

    def dot_concat_repeat(x, packed):
        pk, sc = jax.lax.optimization_barrier((packed, scale_j))
        lo, hi = unpack(pk)
        vals = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        rep = jnp.repeat(sc.astype(jnp.bfloat16), g, axis=0)
        return x @ (vals * rep)

    def dot_concat_chan(x, packed):
        pk, sc = jax.lax.optimization_barrier((packed, chan_scale))
        lo, hi = unpack(pk)
        vals = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        return x @ (vals * sc.astype(jnp.bfloat16)[None])

    def dot_half_dots(x, packed):
        # op-level split: no full-width weight is ever materialized; each
        # half's producer is pure elementwise over the packed buffer
        pk, sc = jax.lax.optimization_barrier((packed, scale_j))
        lo, hi = unpack(pk)
        s = sc.astype(jnp.bfloat16)
        rep_lo = jnp.repeat(s[: G // 2], g, axis=0)
        rep_hi = jnp.repeat(s[G // 2:], g, axis=0)
        return (x[:, :half] @ (lo.astype(jnp.bfloat16) * rep_lo)
                + x[:, half:] @ (hi.astype(jnp.bfloat16) * rep_hi))

    def dot_pallas(x, packed):
        # the kernel answer (ops/pallas/int4_matmul.py): DMA the packed
        # bytes, split nibbles on the VPU, feed bf16 sub-blocks to the MXU
        # — nothing full-width ever exists, in HBM or VMEM
        from antmmf_tpu.ops.pallas.int4_matmul import int4_gemv
        pk, sc = jax.lax.optimization_barrier((packed, scale_j))
        return int4_gemv(x, pk, sc,
                         interpret=jax.default_backend() == "cpu"
                         ).astype(jnp.bfloat16)

    variants = {
        "bf16": dot_bf16,
        "int8_chan": dot_int8,
        "int4_concat_group": dot_concat_group,
        "int4_concat_repeat": dot_concat_repeat,
        "int4_concat_chan": dot_concat_chan,
        "int4_half_dots": dot_half_dots,
        "int4_pallas": dot_pallas,
    }

    ref = np.asarray(dot_bf16(x, packed), np.float32)
    for name, fn in variants.items():
        # loop inside one jit so dispatch overhead doesn't mask the kernel
        @jax.jit
        def run(x, packed, fn=fn):
            def step(i, acc):
                y = fn(x + acc[:, :fin] * 0, packed)
                return jnp.concatenate(
                    [y[:, :1].astype(jnp.bfloat16) * 1e-9 + acc[:, :1],
                     acc[:, 1:]], axis=1)
            return jax.lax.fori_loop(
                0, args.iters, step, jnp.zeros((B, fin), jnp.bfloat16))

        out = np.asarray(fn(x, packed), np.float32)
        err = float(np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9))
        float(np.asarray(run(x, packed))[0, 0])  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(run(x, packed))[0, 0])
            times.append((time.perf_counter() - t0) * 1e3)
        ms = float(np.median(times[1:])) / args.iters
        gbps = (fin * fout * {"bf16": 2, "int8_chan": 1}.get(name, 0.5)
                / ms / 1e6)
        print(json.dumps({
            "variant": name, "ms_per_dot": round(ms, 4),
            "rel_err_vs_bf16": round(err, 4),
            "weight_gbps": round(gbps, 1)}), flush=True)


if __name__ == "__main__":
    main()
