"""Online-serving latency benchmark on the local accelerator.

The reference serves the retrieval towers behind ``BasePredictor.predict``
(reference predictors/base_predictor.py:23-294, single process / single
device, no collectives). The online hot paths are:

- **text query encode** (B=1): tokenise + BERT tower + projection — the
  per-request path of text-to-video search against a cached video index.
- **video ingest encode** (1 clip of F frames): ViT tower + pooling — the
  indexing path.
- batched variants (request coalescing via ``BatchPredictor``).
- the full ``predict()`` round-trip including host-side processing.

Prints one JSON line per measurement (latency percentiles + QPS).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python -m antmmf_tpu.scripts.bench_serving [--tiny]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from antmmf_tpu.scripts.bench_r2_experiments import make_batch


def percentiles(samples_ms):
    a = np.asarray(samples_ms)
    return {"p50_ms": round(float(np.percentile(a, 50)), 3),
            "p95_ms": round(float(np.percentile(a, 95)), 3),
            "p99_ms": round(float(np.percentile(a, 99)), 3)}


def time_call(fn, *args, warmup=5, iters=50):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(x).reshape(-1)[0]), out)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])  # force host read
        lat.append((time.perf_counter() - t0) * 1e3)
    return lat


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()

    import jax

    from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval

    kw = dict(embed_dim=512, n_clips=1, dtype_str="bfloat16",
              image_size=args.size)
    if args.tiny:
        kw.update(vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
                  embed_dim=32, dtype_str="float32")
    else:
        kw.update(vit_preset="vit_base_patch32", bert_preset="bert_base")
    model = UnivlForVideoTextRetrieval(**kw)

    F, S = args.frames, args.size
    rng = np.random.default_rng(0)

    def batch_of(b):
        return make_batch(b, F, S, rng=rng)

    variables = model.init(jax.random.PRNGKey(0), batch_of(1))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    print(json.dumps({"model": "univl_retrieval",
                      "params_m": round(n_params / 1e6, 1),
                      "backend": jax.default_backend()}), flush=True)

    @jax.jit
    def encode_text(variables, ids, mask, seg):
        out = model.apply(
            variables,
            {"image_data": np.zeros((1, 1, S, S, 3), np.float32),
             "video_mask": np.zeros((1, 1), np.int64),
             "caption_input_ids": ids, "caption_input_mask": mask,
             "caption_segment_ids": seg},
            deterministic=True)
        return out["text_embed"]

    @jax.jit
    def encode_full(variables, batch):
        out = model.apply(variables, batch, deterministic=True)
        return out["text_embed"], out["visual_embed"]

    # Inputs are device_put ONCE before timing: on this rig host→device goes
    # through the axon relay (~30 MB/s measured), which would swamp every
    # latency number with transfer time a real TPU VM doesn't pay (PCIe/DMA).
    # The transfer cost is reported separately below.
    def put(tree):
        out = jax.device_put(tree)
        jax.block_until_ready(out)
        return out

    # --- text-query path (B=1): what a search request costs
    b1 = put(batch_of(1))
    lat = time_call(encode_text, variables, b1["caption_input_ids"],
                    b1["caption_input_mask"], b1["caption_segment_ids"])
    print(json.dumps({"exp": "serving_text_query_b1",
                      **percentiles(lat),
                      "qps": round(1e3 / float(np.mean(lat)), 1)}),
          flush=True)

    # --- host→device ingest transfer (relay artifact on this rig)
    hb = batch_of(8)
    nbytes = sum(v.nbytes for v in hb.values())
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(hb))
        lat.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"exp": "ingest_transfer_b8",
                      "mb": round(nbytes / 1e6, 1), **percentiles(lat),
                      "mb_per_s": round(nbytes / 1e6
                                        / (float(np.median(lat)) / 1e3), 1)}),
          flush=True)

    # --- full encode (text+video towers) at serving batch sizes
    for b in (1, 8, 32):
        db = put(batch_of(b))
        lat = time_call(encode_full, variables, db, iters=30)
        print(json.dumps({
            "exp": f"serving_full_encode_b{b}", **percentiles(lat),
            "clips_per_sec": round(b * 1e3 / float(np.mean(lat)), 1)}),
            flush=True)

    # --- ToMe token merging: visual-encode speedup at serving batch size
    for r in (2, 4, 8):
        try:
            tm = UnivlForVideoTextRetrieval(**{**kw, "token_merge_r": r})

            @jax.jit
            def encode_tm(variables, batch):
                out = tm.apply(variables, batch, deterministic=True)
                return out["text_embed"], out["visual_embed"]

            db = put(batch_of(32))
            lat = time_call(encode_tm, variables, db, iters=30)
            print(json.dumps({
                "exp": f"serving_full_encode_b32_tome_r{r}",
                **percentiles(lat),
                "clips_per_sec": round(32 * 1e3 / float(np.mean(lat)), 1)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"exp_error": f"tome_r{r}",
                              "type": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)

    # --- end-to-end predict() including host tokenisation
    try:
        from antmmf_tpu.predictors.base_predictor import BasePredictor

        pred = BasePredictor({
            "model_attributes": {"univl_retrieval": kw},
            "predictor_parameters": {}})
        pred.load(with_ckpt=False)
        req = {"caption": "a man is playing guitar on stage",
               "image_data": rng.standard_normal(
                   (F, S, S, 3)).astype(np.float32)}
        for _ in range(3):
            pred.predict(req)
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            pred.predict(req)
            lat.append((time.perf_counter() - t0) * 1e3)
        print(json.dumps({"exp": "serving_predict_roundtrip",
                          **percentiles(lat)}), flush=True)
    except Exception as e:
        print(json.dumps({"exp_error": "serving_predict_roundtrip",
                          "type": type(e).__name__,
                          "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
