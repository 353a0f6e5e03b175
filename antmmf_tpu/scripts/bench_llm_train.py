"""LLM-family train-step throughput on the chip (tokens/s, achieved TF/s, MFU).

Legs (one JSON line each, same chip, same run):
  pink    — Pink instruction-tuning step (reference
            ``prj/Pink/pink/train/train.py:30`` + ``scripts/stage1.sh:17``):
            omni_1b decoder + CLIP-ViT tower, LoRA q/v adapters with the base
            LLM frozen, answer-token LM loss.
  m2omni  — M2-omni LoRA finetune step (reference ``wrap_llm_lora``,
            ``prj/M2_omni/models/modeling_m2omni.py:311-326``): omni_1b
            3D-RoPE decoder, LoRA on all seven projections, image+text batch.

PEFT memory discipline: params are PARTITIONED into trainable (LoRA /
adapters / projectors) and frozen subtrees. ``jax.grad`` runs wrt the
trainable subtree only and the optimizer state exists only for it — the
frozen ~1.3 B base costs its weights and nothing else. (The alternative,
lr_multiplier masking over the full tree, would still allocate full-size
grads + Adam moments: ~15 GB of dead state at 1B-class.) The frozen subtree
is additionally stored in bf16 (``--frozen_bf16``): every matmul already
computes in bf16 (flax ``dtype=bf16`` casts), so this halves the base's HBM
residency at identical compute numerics.

Remat recipe: ``--remat 1`` (default) rematerializes each decoder layer —
without it the per-layer attention logits/probs ([B, H, L, L] f32, below the
flash-kernel crossover at these lengths) are saved for backward and 22 layers
of them do not fit a 16 GB chip at B=8, L≈700.

Usage:
  python -m antmmf_tpu.scripts.bench_llm_train [--legs pink,m2omni]
      [--batch 8] [--text_len 512] [--remat 1] [--frozen_bf16 1] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0


def partition_params(params, is_trainable):
    """params pytree → (trainable_flat, frozen_flat) dicts keyed by
    '/'-joined paths."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    train = {k: v for k, v in flat.items() if is_trainable(k)}
    frozen = {k: v for k, v in flat.items() if k not in train}
    return train, frozen


def merge_params(train_flat, frozen_flat):
    from flax import traverse_util

    return traverse_util.unflatten_dict({**frozen_flat, **train_flat},
                                        sep="/")


def count(flat) -> int:
    return int(sum(np.prod(v.shape) for v in flat.values()))


def flops_of(step, *args) -> float:
    try:
        an = step.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def run_leg(leg: str, batch: int, text_len: int, remat: bool,
            frozen_bf16: bool, steps: int, warmup: int, on_tpu: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.models.m2_omni import LM_PRESETS

    size = 224 if on_tpu else 32
    if leg == "pink":
        attrs = {
            "lm_preset": "omni_1b" if on_tpu else "omni_tiny_test",
            "vit_preset": "vit_base_patch16" if on_tpu else "vit_tiny_test",
            "image_size": size, "lora_rank": 8, "lora_decoder": True,
            "lora_freeze_base": True, "remat": remat,
            "dtype_str": "bfloat16" if on_tpu else "float32",
        }
        model_key = "pink"
        # Pink recipe: adapters + mm_projector train, towers frozen
        # (pink/model/adapter.py mark_only_adapter_as_trainable)
        is_trainable = lambda k: any(  # noqa: E731
            t in k for t in ("lora", "adapter", "vision_proj",
                             "output_adapter"))
    elif leg.startswith("m2omni"):
        # ablation variants for MFU attribution (":qv" LoRA q/v only,
        # ":1d" 1D rope, ":qv1d" both) — isolates the LoRA-all f32 chains
        # vs the 3D-rope path against the pink leg's 51% MFU
        variant = leg.split(":", 1)[1] if ":" in leg else ""
        attrs = {
            "lm_preset": "omni_1b" if on_tpu else "omni_tiny_test",
            "vit_preset": "vit_base_patch16" if on_tpu else "vit_tiny_test",
            "image_size": size, "llm_lora_rank": 8,
            "llm_lora_targets": "qv" if "qv" in variant else "all",
            "rope_3d": "1d" not in variant,
            "remat": remat,
            "dtype_str": "bfloat16" if on_tpu else "float32",
        }
        model_key = "m2_omni"
        is_trainable = lambda k: any(  # noqa: E731
            t in k for t in ("lora", "vision_proj", "audio_proj"))
    elif leg.startswith("qlora"):
        # QLoRA-class capacity leg: a 7B-CLASS decoder finetunes on ONE
        # 16 GB chip — the frozen base exists only int4-packed (QuantDense
        # consumes the packed siblings; inside the remat'd layers the
        # unpack is transient and recomputed in backward), LoRA adapters
        # train in fp32. Weights are synthesized directly in quantized form
        # from eval_shape (a 30 GB fp32 init cannot exist on-chip) —
        # throughput/memory are real, loss values are noise. The reference
        # finetunes this model class on A100-80GB nodes
        # (prj/Pink/scripts/stage2.sh).
        preset = leg.split(":", 1)[1] if ":" in leg else (
            "omni_7b" if on_tpu else "omni_tiny_test")
        attrs = {
            "lm_preset": preset,
            "vit_preset": "vit_base_patch16" if on_tpu else "vit_tiny_test",
            "image_size": size, "lora_rank": 8, "lora_decoder": True,
            "lora_freeze_base": True, "remat": True,
            "dtype_str": "bfloat16" if on_tpu else "float32",
        }
        model_key = "pink"
        is_trainable = lambda k: any(  # noqa: E731
            t in k for t in ("lora", "adapter", "vision_proj",
                             "output_adapter"))
    elif leg.startswith("longvideo"):
        # SURVEY §5 long-context obligation: a dense-sampled video spliced
        # into the causal decoder (8k–16k vision tokens) — the regime the
        # reference cannot reach (it sparse-samples to <=few hundred visual
        # tokens); the Pallas causal flash kernel auto-selects past the
        # 3k·3k crossover (modules/attention.select_core). Leg name
        # "longvideo:<frames>" picks the frame count (default 48 -> 9408
        # vision tokens at ViT-B/16@224; 80 -> 15680).
        frames = int(leg.split(":", 1)[1]) if ":" in leg else (
            48 if on_tpu else 2)
        attrs = {
            "lm_preset": "omni_1b" if on_tpu else "omni_tiny_test",
            "vit_preset": "vit_base_patch16" if on_tpu else "vit_tiny_test",
            "image_size": size, "llm_lora_rank": 8, "llm_lora_targets": "all",
            "video_token_id": 3, "remat": remat,
            "dtype_str": "bfloat16" if on_tpu else "float32",
        }
        model_key = "m2_omni"
        is_trainable = lambda k: any(  # noqa: E731
            t in k for t in ("lora", "vision_proj", "audio_proj"))
    else:
        raise ValueError(leg)

    shell = build_model({"model_attributes": {model_key: attrs}})
    vocab = LM_PRESETS[attrs["lm_preset"]]["vocab_size"]

    rng = np.random.default_rng(0)
    if leg.startswith("longvideo"):
        # [video placeholders][supervised text]: the spliced interleaved
        # forward (3D-RoPE grid positions over the video run)
        n_per_frame = (size // 16) ** 2
        n_vis = frames * n_per_frame
        tids = rng.integers(4, vocab, (batch, text_len))
        ids = np.concatenate(
            [np.full((batch, n_vis), attrs["video_token_id"]), tids], axis=1)
        labels = np.concatenate(
            [np.full((batch, n_vis), -1), tids], axis=1)
        host_batch = {
            "video_data": rng.standard_normal(
                (batch, frames, size, size, 3)).astype(np.float32),
            "input_ids": ids.astype(np.int32),
            "input_mask": np.ones_like(ids, np.int32),
            "labels": labels.astype(np.int32),
        }
    else:
        ids = rng.integers(4, vocab, (batch, text_len))
        labels = ids.copy()
        labels[:, : text_len // 2] = -1  # prompt tokens unsupervised
        host_batch = {
            "image_data": rng.standard_normal(
                (batch, size, size, 3)).astype(np.float32),
            "input_ids": ids.astype(np.int32),
            "input_mask": np.ones((batch, text_len), np.int32),
            "labels": labels.astype(np.int32),
        }

    # Init at B=1/Lt=8 — param shapes are batch-independent and the full-
    # batch init forward would double peak HBM (and take minutes if
    # re-routed to the 1-core host CPU).
    tiny = {
        "input_ids": host_batch["input_ids"][:1, :8],
        "input_mask": host_batch["input_mask"][:1, :8],
        "labels": host_batch["labels"][:1, :8],
    }
    if "video_data" in host_batch:
        tiny["video_data"] = host_batch["video_data"][:1, :1]
    else:
        tiny["image_data"] = host_batch["image_data"][:1]
    qlora = leg.startswith("qlora")
    if qlora:
        # no full-precision tree EVER exists: shapes from eval_shape, the
        # frozen subtree synthesized directly int4-packed, trainable leaves
        # host-initialized with their flax schemes
        from flax import traverse_util

        from antmmf_tpu.predictors.quantization import synth_quantized_like

        shapes = jax.eval_shape(
            lambda r, b: shell.init(r, b), jax.random.PRNGKey(0), tiny)
        train_shapes, frozen_shapes = partition_params(
            shapes["params"], is_trainable)
        synth = synth_quantized_like(
            traverse_util.unflatten_dict(frozen_shapes, sep="/"),
            # tiny CPU smoke must still exercise the packed-consumption path
            min_size=4096 if on_tpu else 64)
        frozen_flat = traverse_util.flatten_dict(synth, sep="/")
        hrng = np.random.default_rng(0)
        train_flat = {
            k: (np.zeros(s.shape, np.float32) if k.endswith("lora_b")
                else (hrng.standard_normal(s.shape) * 0.02
                      ).astype(np.float32))
            for k, s in train_shapes.items()}
        n_train = count(train_flat)
        n_frozen = count({k: v for k, v in frozen_flat.items()})
    else:
        variables = shell.init(jax.random.PRNGKey(0), tiny)
        params = variables["params"]
        train_flat, frozen_flat = partition_params(params, is_trainable)
        del variables, params
        n_train, n_frozen = count(train_flat), count(frozen_flat)
    if frozen_bf16:
        # bf16 residency for the frozen base (every matmul already computes
        # in bf16 via flax dtype casts); drop the f32 originals immediately
        # so peak device memory is 1.5x the base, not 2x+. int4 records'
        # group scales stay f32 (tiny; bf16 scales cost real quality)
        frozen_flat = {k: (v.astype(jnp.bfloat16)
                           if (hasattr(v, "dtype")
                               and v.dtype == jnp.float32
                               and not k.endswith("scale")) else v)
                       for k, v in frozen_flat.items()}

    tx = optax.adamw(2e-5, weight_decay=0.0)
    opt_state = tx.init(train_flat)

    if leg.startswith("longvideo"):
        # spliced layout: vision tokens live INSIDE input_ids
        stream_len = host_batch["input_ids"].shape[1]
    else:
        n_vis = shell.module.num_vision_tokens(host_batch) if leg == "pink" \
            else (size // 16) ** 2
        stream_len = n_vis + text_len

    if qlora:
        from antmmf_tpu.predictors.quantization import make_live_vars

    def train_step(train_flat, opt_state, frozen_flat, batch, key):
        def loss_of(tf_):
            merged = merge_params(tf_, frozen_flat)
            vars_ = {"params": merged}
            if qlora:
                # packed records route into QuantDense siblings; everything
                # else dequantizes transiently INSIDE the remat'd layers
                # (recomputed in backward — never num_layers live copies)
                vars_ = make_live_vars(vars_, jnp.bfloat16)(False)
            out = shell.apply(vars_, batch, deterministic=False,
                              rngs={"dropout": key})
            return out["losses"]["lm_loss"]

        loss, grads = jax.value_and_grad(loss_of)(train_flat)
        updates, opt_state2 = tx.update(grads, opt_state, train_flat)
        return optax.apply_updates(train_flat, updates), opt_state2, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    key = jax.random.PRNGKey(2)

    dev_batch = jax.device_put(host_batch)
    frozen_flat = jax.device_put(frozen_flat)
    for _ in range(warmup):
        train_flat, opt_state, loss = step(train_flat, opt_state,
                                           frozen_flat, dev_batch, key)
    float(loss)  # full host sync (block_until_ready is lazy on axon relay)
    t0 = time.perf_counter()
    for _ in range(steps):
        train_flat, opt_state, loss = step(train_flat, opt_state,
                                           frozen_flat, dev_batch, key)
    float(loss)
    dt = (time.perf_counter() - t0) / steps

    fl = flops_of(step, train_flat, opt_state, frozen_flat, dev_batch, key)
    achieved = fl / dt / 1e12
    frozen_gb = sum(v.nbytes
                    for v in jax.tree_util.tree_leaves(frozen_flat)) / 1e9
    return {
        "leg": leg, "remat": remat, "frozen_bf16": frozen_bf16,
        "frozen_resident_gb": round(frozen_gb, 2),
        "batch": batch, "text_len": text_len, "stream_len": stream_len,
        "params_frozen_m": round(n_frozen / 1e6, 1),
        "params_trainable_m": round(n_train / 1e6, 2),
        "ms_per_step": round(dt * 1e3, 1),
        "stream_tokens_per_sec": round(batch * stream_len / dt, 1),
        "text_tokens_per_sec": round(batch * text_len / dt, 1),
        "tflops_per_step": round(fl / 1e12, 2),
        "achieved_tflops": round(achieved, 1),
        "mfu_pct": round(100 * achieved / V5E_PEAK_BF16_TFLOPS, 1),
        "loss": round(float(loss), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="pink,m2omni")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--text_len", type=int, default=512)
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--frozen_bf16", type=int, default=1)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-shape smoke run on host CPU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    on_tpu = jax.default_backend() not in ("cpu",)
    batch = args.batch if on_tpu else 2
    text_len = args.text_len if on_tpu else 16
    steps = args.steps if on_tpu else 2
    warmup = 2 if on_tpu else 1

    import gc

    for leg in args.legs.split(","):
        try:
            res = run_leg(leg.strip(), batch, text_len, bool(args.remat),
                          bool(args.frozen_bf16), steps, warmup, on_tpu)
        except Exception as e:  # record OOM / compile failures per leg
            res = {"leg": leg, "error": f"{type(e).__name__}: {e}"[:2500]}
        gc.collect()  # drop the previous leg's device arrays before the next
        # compiled executables pin device buffers (donated-arg aliases,
        # large constants) for the life of the jit cache — a prior leg's
        # cache can push the next leg over HBM on a 16 GB chip
        jax.clear_caches()
        gc.collect()
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
