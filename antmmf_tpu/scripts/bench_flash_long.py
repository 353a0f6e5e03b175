"""Causal flash-attention fwd+bwd at long sequence lengths on the chip.

Isolates the Pallas kernel (`ops/pallas/flash_attention.py`) from the full
long-video model step: compiles and times grad-of-sum through the kernel at
each L, so a model-level compile failure can be attributed to either the
kernel or the surrounding graph. Also times the XLA attention core at the
short lengths where it is expected to win (the measured 3k·3k crossover,
`modules/attention.select_core`).

One JSON line per (L, core). Usage:
  python -m antmmf_tpu.scripts.bench_flash_long [--lens 4096,8192,9664,16384]
      [--heads 16] [--head_dim 128] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="4096,8192,9664,16384")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head_dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from antmmf_tpu.ops.pallas.flash_attention import flash_attention

    B, H, D = args.batch, args.heads, args.head_dim
    print(json.dumps({"backend": jax.default_backend(), "batch": B,
                      "heads": H, "head_dim": D}), flush=True)

    for L in [int(x) for x in args.lens.split(",")]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)

        def loss(q, k, v):
            return flash_attention(q, k, v, causal=True).astype(
                jnp.float32).sum()

        try:
            t0 = time.perf_counter()
            step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            dq, dk, dv = step(q, k, v)
            float(dq.sum())
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                dq, dk, dv = step(q, k, v)
            float(dq.sum())
            dt = (time.perf_counter() - t0) / args.steps
            # causal attention FLOPs: fwd 2·(QK + PV)·0.5 + bwd 2.5x fwd
            fwd = 2 * 2 * B * H * L * L * D * 0.5
            print(json.dumps({
                "L": L, "core": "pallas_flash_causal",
                "compile_s": round(compile_s, 1),
                "ms": round(dt * 1e3, 2),
                "achieved_tflops": round(3.5 * fwd / dt / 1e12, 1)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"L": L, "core": "pallas_flash_causal",
                              "error": f"{type(e).__name__}: {e}"[:1500]}),
                  flush=True)


if __name__ == "__main__":
    main()
