"""Round-3 headline-batch sweep: flagship retrieval train step vs batch size.

The headline bench (bench.py) runs B=32 — chosen round 1, never re-swept
after the round-2/3 optimizations (bf16 mu, donation, sharded contrastive).
clips/s/chip generally rises with batch until activation memory or the
contrastive B×B grid saturates the chip; this measures B ∈ {32, 48, 64, 96}
at the same 8f@224 ViT-B/32 + BERT-base bf16 workload so bench.py can adopt
the best point.

Prints one JSON line per batch size. Run on the real chip in background:
``PYTHONPATH=/root/repo:/root/.axon_site python -m antmmf_tpu.scripts.bench_r3_batch_sweep``
"""

from __future__ import annotations

import json

from antmmf_tpu.scripts.bench_r2_experiments import (
    RETRIEVAL,
    build,
    flops_of,
    make_batch,
    timed_steps,
)

BATCHES = (32, 48, 64, 96)
FRAMES = 8
SIZE = 224
OPT = {"lr": 5e-5, "weight_decay": 0.01, "mu_dtype": "bfloat16"}


def main() -> None:
    import jax

    for B in BATCHES:
        host = make_batch(B, FRAMES, SIZE)
        try:
            step, state, sharding, _ = build(dict(RETRIEVAL), host, OPT)
            batch = jax.device_put(host, sharding)
            dt, state = timed_steps(step, state, batch, warmup=3, steps=10)
            tf = flops_of(step, state, batch) / dt / 1e12
            print(json.dumps({
                "experiment": "batch_sweep", "batch": B,
                "ms_per_step": round(dt * 1e3, 2),
                "clips_per_sec_per_chip": round(B / dt, 1),
                "achieved_tflops_per_sec": round(tf, 1),
            }), flush=True)
        except Exception as e:  # OOM at the top end is a result, not a crash
            print(json.dumps({
                "experiment": "batch_sweep", "batch": B,
                "error": type(e).__name__, "detail": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
