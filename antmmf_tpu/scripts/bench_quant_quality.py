"""Quantization QUALITY on TRAINED weights (not random init).

Round-3 measured int8/int4 decode *throughput* but validated token quality
only on random-init weights ("agreement is low — measure on your eval set").
This script produces that evidence on the repo's own overfit e2e fixtures:

  pink   — train the Pink instruction-tuning fixture mixture
           (projects/pink/configs/pink_instruct.local.yml) until it
           reproduces its answers, then serve the SAME prompts through
           ``PinkModel.generate`` with bf16 / int8 / int4 weights
           (the real ``quantize_for_decode`` + ``make_live_vars`` serving
           path, backend-agnostic): greedy-token agreement vs full
           precision + answer exact-match accuracy per precision.
  retrieval — train the video-retrieval fixture (overfits to R@1=100),
           then round-trip the params through int8/int4 quantization
           (quantize → dequantize, numerically what weight-only serving
           computes with) and re-run the retrieval eval: R@1 / mean-recall
           delta per precision.

One JSON line per result. CPU-friendly (tiny fixtures; int4 takes the XLA
unpack fallback with identical numerics to the Pallas GEMV's values).

Usage: python -m antmmf_tpu.scripts.bench_quant_quality [--steps 60]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lora_rank", type=int, default=8)
    ap.add_argument("--retrieval_steps", type=int, default=12)
    ap.add_argument("--max_rows", type=int, default=12)
    args = ap.parse_args()

    if os.environ.get("_QQ_CHILD") != "1":
        env = dict(os.environ)
        env["_QQ_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count=8").strip()
        os.execve(sys.executable,
                  [sys.executable, "-m",
                   "antmmf_tpu.scripts.bench_quant_quality",
                   "--steps", str(args.steps),
                   "--lr", str(args.lr),
                   "--lora_rank", str(args.lora_rank),
                   "--retrieval_steps", str(args.retrieval_steps),
                   "--max_rows", str(args.max_rows)], env)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.predictors.quantization import (
        dequantize_for_compute, quantize_for_decode)
    from antmmf_tpu.trainers.build import build_trainer

    # ---------------------------------------------------------------- pink
    cfg = build_config(
        os.path.join(ROOT, "projects", "pink", "configs",
                     "pink_instruct.local.yml"),
        opts=["training_parameters.save_dir", tempfile.mkdtemp(),
              "training_parameters.max_iterations", str(args.steps),
              # overfit the fixture mixture so bf16 reproduces answers and
              # the quantized exact-match delta is meaningful
              "optimizer_attributes.params.lr", str(args.lr),
              "model_attributes.pink.lora_rank", str(args.lora_rank),
              "training_parameters.seed", "7"])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    model = trainer.shell.module
    variables = jax.device_get(trainer.state.variables)
    final_loss = float(trainer.meter.meters["train/total_loss"].get_latest())

    # fixture rows → (prompt-only batch, gold answer tokens)
    dataset = trainer.task_loader.get_loaders("train")[0].dataset
    rows = []
    for i in range(min(len(dataset), args.max_rows)):
        r = dataset[i]
        ids = np.asarray(r["input_ids"])
        labels = np.asarray(r["labels"])
        sup = np.where(labels >= 0)[0]
        if len(sup) == 0:
            continue
        p = int(sup[0])  # answer starts here; prompt = ids[:p]
        gold = [int(t) for t in labels[sup[0]:]
                if int(t) >= 0]
        prompt = np.zeros_like(ids)
        prompt[:p] = ids[:p]
        mask = (np.arange(len(ids)) < p).astype(np.int32)
        rows.append((prompt, mask, np.asarray(r["image_data"]), gold))

    max_new = max(len(g) for *_, g in rows) + 1

    def gen_all(gvars):
        outs = []
        for prompt, mask, img, gold in rows:
            batch = {"input_ids": jnp.asarray(prompt)[None],
                     "input_mask": jnp.asarray(mask)[None],
                     "image_data": jnp.asarray(img)[None]}
            tokens, lens = model.generate(gvars, batch, eos_id=-1,
                                          max_length=max_new)
            tokens, lens = np.asarray(tokens), np.asarray(lens)
            outs.append([int(t) for t in
                         tokens[0, lens[0]: lens[0] + max_new]])
        return outs

    base = gen_all(variables)
    em_base = np.mean([o[:len(g)] == g
                       for (_, _, _, g), o in zip(rows, base)])
    print(json.dumps({"leg": "pink_instruct", "train_steps": args.steps,
                      "final_loss": round(final_loss, 4),
                      "rows": len(rows),
                      "bf16_answer_exact_match": round(float(em_base), 3)}),
          flush=True)

    for bits in (8, 4):
        qvars = quantize_for_decode(variables, min_size=1024, bits=bits)
        got = gen_all(qvars)
        agree = np.mean([np.mean([a == b for a, b in zip(o, g)])
                         for o, g in zip(got, base)])
        em = np.mean([o[:len(g)] == g
                      for (_, _, _, g), o in zip(rows, got)])
        print(json.dumps({
            "leg": f"pink_instruct_int{bits}",
            "token_agreement_vs_bf16": round(float(agree), 4),
            "answer_exact_match": round(float(em), 3),
            "exact_match_delta": round(float(em - em_base), 3)}),
            flush=True)

    # ----------------------------------------------------------- retrieval
    cfg = build_config(
        os.path.join(ROOT, "projects", "base_vtp", "configs",
                     "video_retrieval.local.yml"),
        opts=["training_parameters.save_dir", tempfile.mkdtemp(),
              "training_parameters.max_iterations",
              str(args.retrieval_steps),
              "training_parameters.seed", "7"])
    rtrainer = build_trainer(cfg)
    rtrainer.load()
    rtrainer.train()
    base_metrics = rtrainer.evaluate_set("val")
    print(json.dumps({"leg": "retrieval_fp32",
                      "t2v_r1": base_metrics["t2v-r@1"],
                      "mean_recall": round(base_metrics["mean_recall"], 2)}),
          flush=True)
    orig = rtrainer.state.variables
    for bits in (8, 4):
        q = quantize_for_decode(jax.device_get(orig), min_size=1024,
                                bits=bits)
        dq = dequantize_for_compute(q, jnp.float32)
        rtrainer.state = dataclasses.replace(rtrainer.state, variables=dq)
        m = rtrainer.evaluate_set("val")
        print(json.dumps({
            "leg": f"retrieval_int{bits}",
            "t2v_r1": m["t2v-r@1"],
            "t2v_r1_delta": round(m["t2v-r@1"] - base_metrics["t2v-r@1"], 2),
            "mean_recall": round(m["mean_recall"], 2),
            "mean_recall_delta": round(
                m["mean_recall"] - base_metrics["mean_recall"], 2)}),
            flush=True)
    rtrainer.state = dataclasses.replace(rtrainer.state, variables=orig)


if __name__ == "__main__":
    main()
