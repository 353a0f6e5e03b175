"""Throughput benchmark: flagship video-text retrieval train step on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (+"extras").

Metric: clip-pairs/sec/chip for a UniVL-style ViT-B/32 + BERT-base retrieval
train step (8-frame clips, 224², text len 30, bf16 compute, AdamW, global-batch
contrastive loss) — the BASELINE.json north-star workload. "Clip-pair" = one
(video clip, caption) training example.

vs_baseline compares against an A100 reference of 85 clip-pairs/sec/GPU for the
same workload (CLIP4Clip-class ViT-B/32 8-frame training; an ESTIMATE derived
from the reference's published scale knobs — batch 128 across 8 GPUs,
prj/base_vtp/README.md:66-79 — and typical A100 CLIP4Clip step times; the
reference repo itself publishes no clips/sec, see BASELINE.md). Target ≥ 2.0.

Set ``BENCH_FULL=1`` to also measure the heavier training workloads live
(MLM+ITM+VTC pretrain step; cross-encoder step with hard-negative mining) —
three TPU compiles instead of one. Without it, "extras" carries this round's
measured numbers for those steps from BASELINE.md (same chip, same configs;
see antmmf_tpu/scripts/bench_r2_experiments.py).
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 85.0

BATCH = 32
FRAMES = 8
SIZE = 224
TEXT_LEN = 30
WARMUP = 3
STEPS = 10


def main() -> None:
    import jax

    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.optimizer.build import build_optimizer
    from antmmf_tpu.parallel.mesh import batch_spec, build_mesh
    from antmmf_tpu.parallel.state_sharding import shard_state
    from antmmf_tpu.trainers.train_state import TrainState

    n_chips = len(jax.devices())
    on_tpu = jax.default_backend() not in ("cpu",)
    batch = BATCH if on_tpu else max(8, n_chips)  # keep divisible by devices
    frames = FRAMES if on_tpu else 2
    size = SIZE if on_tpu else 64
    steps = STEPS if on_tpu else 2
    warmup = WARMUP if on_tpu else 1

    config = {
        "model_attributes": {
            "univl_retrieval": {
                "vit_preset": "vit_base_patch32" if on_tpu else "vit_tiny_test",
                "bert_preset": "bert_base" if on_tpu else "bert_tiny_test",
                "image_size": size,
                "embed_dim": 512 if on_tpu else 32,
                "n_clips": 1,
                "dtype_str": "bfloat16" if on_tpu else "float32",
            }
        },
        "optimizer_attributes": {
            # bf16 first moment: measured 85.7 → 83.4 ms/step on v5e
            # (r2b experiments, BASELINE.md); second moment stays fp32
            "type": "adam_w", "params": {"lr": 5e-5, "weight_decay": 0.01,
                                         "mu_dtype": "bfloat16"},
        },
        "training_parameters": {"clip_gradients": True, "max_grad_l2_norm": 1.0},
    }
    mesh = build_mesh({"data": -1})
    shell = build_model(config)

    rng = np.random.default_rng(0)
    host_batch = {
        "image_data": rng.standard_normal(
            (batch, frames, size, size, 3)).astype(np.float32),
        "video_mask": np.ones((batch, frames), dtype=np.int64),
        "caption_input_ids": rng.integers(
            0, 30522, (batch, TEXT_LEN)).astype(np.int64),
        "caption_input_mask": np.ones((batch, TEXT_LEN), dtype=np.int64),
        "caption_segment_ids": np.zeros((batch, TEXT_LEN), dtype=np.int64),
    }

    variables = shell.init(jax.random.PRNGKey(0), host_batch)
    tx, _ = build_optimizer(variables["params"], config["optimizer_attributes"],
                            config["training_parameters"])
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    state = shard_state(state, mesh)
    sharding = jax.sharding.NamedSharding(mesh, batch_spec())
    device_batch = jax.device_put(host_batch, sharding)

    def train_step(state, batch):
        def loss_of(p):
            loss, (_, scalars) = shell.loss_fn(
                {**state.variables, "params": p}, batch,
                rngs={"dropout": jax.random.fold_in(state.rng, state.step)},
                deterministic=False,
            )
            return loss, scalars

        (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads, tx), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    for _ in range(warmup):
        state, loss = step(state, device_batch)
    float(loss)  # full host sync (block_until_ready can be lazy on axon relay)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, device_batch)
    float(loss)  # the final loss transitively forces every queued step
    dt = time.perf_counter() - t0

    clips_per_sec_per_chip = batch * steps / dt / n_chips

    import os

    extras = {
        # measured this round on the same chip/configs unless BENCH_FULL=1
        # re-measures them live (antmmf_tpu/scripts/bench_r2_experiments.py,
        # bench_corpus_eval.py, bench_serving.py — see BASELINE.md)
        "pretrain_mlm_itm_vtc_clips_per_sec": 260.9,
        "retrieval_cross_mined_k4_clips_per_sec": 188.9,
        "achieved_tflops_per_sec": 86.9,
        "msrvtt_scale_corpus_eval_seconds": 9.0,
        "serving_text_query_p50_ms": 30.4,
        "serving_encode_b32_clips_per_sec": 503.6,
        "serving_encode_b32_tome_r8_clips_per_sec": 591.3,
        # round 3: LLM KV-cache decode (bench_decode.py, omni_1b 1.29 B
        # params bf16) and MoE train step (bench_moe.py, m2_encoder_0b4 +
        # top-2 xMoE blocks) — BASELINE.md round-3 tables
        "llm_decode_L512_tokens_per_sec": 202.4,
        "llm_decode_L512_speedup_vs_reencode": 28.3,
        "llm_decode_L1024_tokens_per_sec": 198.6,
        "llm_decode_L512_int8_tokens_per_sec": 336.1,
        # round 4: LLM-family TRAIN steps on the chip (bench_llm_train.py,
        # omni_1b + ViT-B/16@224, LoRA PEFT, B=8 stream 708, remat off —
        # BASELINE.md round-4 table)
        "pink_train_stream_tokens_per_sec": 20385.2,  # r4, remat off
        "pink_train_mfu_pct": 52.5,
        "m2omni_lora_train_stream_tokens_per_sec": 18811.0,  # r4, remat off
        "m2omni_lora_train_mfu_pct": 39.0,
        # round 5: CORRECTED PEFT backward (freeze kernels, not outputs —
        # activation grads flow W^T.dy through frozen projections; the old
        # numbers above ran a semantically pruned backward). remat on.
        "pink_train_fixed_peft_mfu_pct": 49.1,
        "m2omni_train_fixed_peft_mfu_pct": 46.8,
        "qlora_7b_fixed_peft_tokens_per_sec": 3146.5,
        "qlora_7b_fixed_peft_mfu_pct": 55.4,
        # round 3 serving engine (bench_serving_cb.py, 16 Pink omni_1b
        # requests, heterogeneous 8/16/32-token budgets, 8 slots, one chip;
        # same-run comparison): continuous batching with 8-token decode
        # windows vs the reference's sequential-HF-generate pattern and
        # static batches
        "serving_cb_useful_tokens_per_sec": 294.2,
        "serving_sequential_tokens_per_sec": 124.4,
        "serving_static_b8_tokens_per_sec": 183.0,
        # grouped-GQA decode attention (no kv repeat: rep x less cache HBM
        # read per step) lifted B=8 decode 1074.2 -> 1313.0
        "llm_decode_L1024_b8_tokens_per_sec": 1313.0,
        "llm_decode_L1024_b8_int8_tokens_per_sec": 1530.2,
        # group-int4 Pallas GEMV (ops/pallas/int4_matmul.py): in-register
        # nibble unpack between HBM load and MXU feed; fastest batched
        # config and the capacity knob (BASELINE.md round-3 int4 table)
        "llm_decode_L1024_b8_int4_tokens_per_sec": 1624.3,
        "llm_decode_L512_int4_tokens_per_sec": 216.4,
        # omni_7b (6.29 B params) decoding on ONE 16 GB v5e chip: int4
        # weights 3.38 GB + bf16 embed 1.24 GB (bf16 13.8 GB cannot load)
        "llm_decode_7b_one_chip_tokens_per_sec": 98.8,
        "llm_decode_7b_one_chip_b8_tokens_per_sec": 601.2,
        # prompt-lookup speculative decoding (bench_decode --speculate 4):
        # a 5-token verify step costs 7.03 ms vs 4.99 ms plain decode, so
        # tokens/s at acceptance a is (1+4a)/7.03ms — exact greedy tokens
        "llm_decode_speculative_a08_tokens_per_sec": 597.7,
        "llm_decode_speculative_ceiling_tokens_per_sec": 711.5,
        # round 4b: QLoRA capacity leg — 6.6 B-param decoder finetunes on
        # ONE 16 GB chip (int4-packed frozen base + fp32 LoRA, remat);
        # long-video train step (F frames x 196 vision tokens + 256 text,
        # causal 3-D-grid flash, B=1) — BASELINE.md round-4 tables
        "qlora_7b_one_chip_tokens_per_sec": 2984.0,
        "qlora_7b_one_chip_mfu_pct": 50.5,
        "longvideo_48f_9664tok_tokens_per_sec": 2751.0,
        "longvideo_64f_12800tok_tokens_per_sec": 2175.0,  # r4 (196tok/f variant)
        # round 4: Poisson mixed-length serving load (bench_serving_cb
        # --poisson, 1.5 rps, 1B-class): whole-prompt admission wins at
        # this scale (TTFT p50/p99 below); chunked stays the 7B/4k+ tool
        "serving_poisson_tokens_per_sec": 36.1,
        "serving_poisson_ttft_p50_s": 0.145,
        "serving_poisson_ttft_p99_s": 0.163,
        "serving_poisson_tpot_p99_ms": 12.7,
        # round 4: MoE scatter dispatch — step-time ratio vs dense beyond
        # the paid-for expert FLOPs (bench_moe.py rework table)
        "moe_dispatch_overhead_beyond_flops_x": 1.10,
        # round 5: the 80-frame long-video wall is gone — a 16.2k-token
        # B=1 multi-frame train step runs on ONE chip (r4 OOM'd; fresh
        # single-leg process + pos-embed broadcast fix), and past one chip
        # the decoder has real sequence parallelism (ring over the seq
        # mesh axis, m2_omni_longvideo.yml)
        "longvideo_80f_16192tok_tokens_per_sec": 1769.9,  # pre flash fix
        "longvideo_64f_13056tok_tokens_per_sec": 2163.1,  # pre flash fix
        # round 5: 512x512 grid-block flash fix (8.6x kernel at L=9920;
        # BASELINE.md round-5 sweep table)
        "longvideo_48f_9920tok_tokens_per_sec_fixed": 7396.5,
        "longvideo_64f_13056tok_tokens_per_sec_fixed": 6430.4,
        "longvideo_80f_16192tok_tokens_per_sec_fixed": 5739.2,
        # round 5: sustained mixed serving (bench_serving_cb --sustained
        # 64, 8 slots, 4 classes incl. shared-prefix + tight-deadline)
        "serving_sustained_4rps_tokens_per_sec": 71.4,
        "serving_sustained_4rps_ttft_p99_s": 0.180,
        "serving_sustained_16rps_tokens_per_sec": 238.5,
        "serving_sustained_16rps_ttft_p99_s": 0.195,
        "serving_sustained_16rps_evicted_over_total": "6/64 (deadline class only)",
        # round 5: AOT per-device peak at the declared meshes (abstract
        # v5e topology backend — real HBM budget enforced at compile)
        "aot_m2_omni_7b_peak_gb_per_device": 10.26,
        "aot_pink_7b_peak_gb_per_device": 6.36,
        "source": "BASELINE.md round-2/3/4/5 measurements",
    }
    if on_tpu and os.environ.get("BENCH_FULL"):
        from antmmf_tpu.scripts.bench_r2_experiments import (
            build as _build,
            make_batch as _mk,
            timed_steps as _timed,
        )

        host = _mk(batch, frames, size)
        rng2 = np.random.default_rng(1)
        host["caption_lm_label_ids"] = np.where(
            rng2.uniform(size=(batch, TEXT_LEN)) < 0.15,
            host["caption_input_ids"], -1).astype(np.int64)
        host["caption_raw_input_ids"] = host["caption_input_ids"].copy()
        host["itm_targets"] = rng2.integers(0, 2, (batch,)).astype(np.int64)
        pstep, pstate, pshard, _ = _build({"univl_pretrain": {
            "vit_preset": "vit_base_patch32", "bert_preset": "bert_base",
            "image_size": size, "embed_dim": 512, "with_vtc": True,
            "with_vtm": True, "with_mlm": True, "dtype_str": "bfloat16"}}, host)
        pdt, _ = _timed(pstep, pstate, jax.device_put(host, pshard),
                        warmup=2, steps=6)
        extras["pretrain_mlm_itm_vtc_clips_per_sec"] = round(batch / pdt, 1)

        chost = _mk(16, frames, size)
        cstep, cstate, cshard, _ = _build({"univl_retrieval": {
            "vit_preset": "vit_base_patch32", "bert_preset": "bert_base",
            "image_size": size, "embed_dim": 512, "n_clips": 1,
            "with_cross_encoder": True, "cross_layers": 2,
            "hard_mining_k": 4, "dtype_str": "bfloat16"}}, chost)
        cdt, _ = _timed(cstep, cstate, jax.device_put(chost, cshard),
                        warmup=2, steps=6)
        extras["retrieval_cross_mined_k4_clips_per_sec"] = round(16 / cdt, 1)
        # only the two keys above were re-measured this run; everything else
        # in extras keeps its BASELINE.md provenance
        extras["measured_live"] = ["pretrain_mlm_itm_vtc_clips_per_sec",
                                   "retrieval_cross_mined_k4_clips_per_sec"]

    print(json.dumps({
        "metric": "clip_pairs_per_sec_per_chip",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clip-pairs/sec/chip (ViT-B/32+BERT-base, 8f@224, bf16 train)"
        if on_tpu else "clip-pairs/sec/chip (tiny CPU fallback model)",
        "vs_baseline": round(clips_per_sec_per_chip / A100_BASELINE_CLIPS_PER_SEC, 3),
        # vs_baseline denominator is an ESTIMATED A100 number (85 clips/s/GPU,
        # CLIP4Clip-class; unmeasurable on this rig — see module docstring
        # and BASELINE.md:39), not a measured reference datapoint
        "baseline_is_estimate": True,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
