"""LLM decode throughput: prefill latency + per-token decode tokens/s.

The reference's LLM family (Pink, M2-omni, captioning) serves through HF
``generate`` with ``past_key_values`` (reference
prj/Pink/pink/eval/model_vqav2.py:141, modeling_llama_3d.py:900-1000). This
bench measures the TPU-native KV-cache path (``modules/llm.DecoderLM`` prefill
+ decode jits) against the O(L²) full-prefix re-encode it replaced.

One JSON line per measurement:
  {"exp": "decode_L512_b1", "prefill_ms": ..., "per_token_ms": ...,
   "tokens_per_sec": ..., "reencode_per_token_ms": ..., "speedup": ...}

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python -m antmmf_tpu.scripts.bench_decode [--tiny] [--preset omni_1b]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--preset", default="omni_1b")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lens", type=int, nargs="+", default=[512, 1024, 2048])
    p.add_argument("--decode_steps", type=int, default=32)
    p.add_argument("--int8", action="store_true",
                   help="also measure weight-only int8 decode")
    p.add_argument("--int4", action="store_true",
                   help="also measure weight-only group-int4 decode "
                        "(nibble-packed; quarter the bf16 weight read)")
    p.add_argument("--kv_int8", action="store_true",
                   help="also measure int8-KV-cache decode (and the combined "
                        "w8+kv8 serving config when --int8 is also set)")
    p.add_argument("--reencode_max_len", type=int, default=1024,
                   help="skip the O(L^2) re-encode comparison above this L")
    p.add_argument("--speculate", type=int, default=0, metavar="GAMMA",
                   help="also measure prompt-lookup speculative decoding: "
                        "chunk-verify step cost at width GAMMA+1 plus an "
                        "end-to-end speculative run with measured "
                        "acceptance telemetry")
    p.add_argument("--synth_q4", action="store_true",
                   help="serving-CAPACITY mode: build the int4-packed tree "
                        "directly from eval_shape (no full-precision "
                        "weights ever exist) — lets omni_7b (bf16 13.8 GB) "
                        "decode on one 16 GB chip; tokens are noise, "
                        "throughput is real")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin wins "
                        "over JAX_PLATFORMS alone)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from antmmf_tpu.models.m2_omni import LM_PRESETS
    from antmmf_tpu.modules.llm import DecoderLM, init_decoder_cache

    preset = "omni_tiny_test" if args.tiny else args.preset
    cfg = LM_PRESETS[preset]
    hidden, vocab = cfg["hidden"], cfg["vocab_size"]
    n_kv = cfg["num_kv_heads"] or cfg["num_heads"]
    head_dim = hidden // cfg["num_heads"]
    dtype = jnp.float32 if args.tiny else jnp.bfloat16

    import flax.linen as nn

    class LMWithHead(nn.Module):
        @nn.compact
        def __call__(self, embeds, positions, mask=None, cache=None,
                     decode_pos=None, all_logits=False):
            dec = DecoderLM(
                num_layers=cfg["num_layers"], num_heads=cfg["num_heads"],
                num_kv_heads=cfg["num_kv_heads"], dtype=dtype, name="decoder")
            out = dec(embeds, positions, mask, True, cache=cache,
                      decode_pos=decode_pos)
            from antmmf_tpu.modules.qdense import QuantDense
            head = QuantDense(vocab, dtype=dtype,
                              param_dtype=jnp.float32, name="lm_head")
            if cache is not None:
                hiddens, cache = out
                if all_logits:
                    return head(hiddens).astype(jnp.float32), cache
                return head(hiddens[:, -1:])[:, 0].astype(jnp.float32), cache
            return head(out).astype(jnp.float32)

    model = LMWithHead()
    embed_table = jax.random.normal(
        jax.random.PRNGKey(1), (vocab, hidden)).astype(dtype) * 0.02

    B = args.batch
    rng = jax.random.PRNGKey(0)
    ex = jax.random.normal(rng, (B, 8, hidden)).astype(dtype)
    if args.synth_q4:
        params = None  # bf16/f32 params would not fit the chip (the point)
        shapes = jax.eval_shape(model.init, rng, ex,
                                jnp.zeros((B, 8), jnp.int32))
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(shapes))
    else:
        params = model.init(rng, ex, jnp.zeros((B, 8), jnp.int32))
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"model": f"decoder_{preset}",
                      "params_m": round(n_params / 1e6, 1),
                      "backend": jax.default_backend()}), flush=True)

    @jax.jit
    def prefill(params, embeds, positions, mask, cache):
        return model.apply(params, embeds, positions, mask, cache=cache)

    @jax.jit
    def decode(params, table, logits0, cache, pos0, steps_tokens):
        """Greedy-decode args.decode_steps tokens under one jit. The embed
        table is an ARGUMENT (a closure capture would bake a 1.2 GB constant
        into the HLO and crawl through the compile relay)."""
        def step(t, carry):
            toks, last_logits, cache = carry
            nxt = jnp.argmax(last_logits, -1).astype(jnp.int32)
            toks = toks.at[:, t].set(nxt)
            emb = table[nxt][:, None]
            pos = pos0 + t
            last_logits, cache = model.apply(
                params, emb, pos[:, None], None, cache=cache, decode_pos=pos)
            return toks, last_logits, cache

        toks, _, cache = jax.lax.fori_loop(
            0, args.decode_steps, step, (steps_tokens, logits0, cache))
        return toks, cache

    @jax.jit
    def reencode_logits(params, embeds, positions, mask):
        full = model.apply(params, embeds, positions, mask)
        return full[:, -1]

    # --- weight-only int8 decode: params live in HBM as int8 records and
    # dequantize inside each loop step (an optimization_barrier stops XLA
    # from hoisting the convert out of the fori_loop, so the per-step weight
    # read is int8 — half the bf16 HBM traffic; decode is bandwidth-bound)
    from antmmf_tpu.predictors.quantization import (
        make_live_vars, quantize_for_decode)

    @jax.jit
    def decode_int8(qparams, table, logits0, cache, pos0, steps_tokens):
        live = make_live_vars(qparams, dtype)

        def step(t, carry):
            toks, last_logits, cache = carry
            nxt = jnp.argmax(last_logits, -1).astype(jnp.int32)
            toks = toks.at[:, t].set(nxt)
            emb = table[nxt][:, None]
            pos = pos0 + t
            last_logits, cache = model.apply(
                live(step_mode=True), emb, pos[:, None], None, cache=cache,
                decode_pos=pos)
            return toks, last_logits, cache

        toks, _, cache = jax.lax.fori_loop(
            0, args.decode_steps, step, (steps_tokens, logits0, cache))
        return toks, cache

    if args.synth_q4:
        # serving-CAPACITY mode: weights exist only int4-packed (built from
        # eval_shape — no full-precision tree on host or device). omni_7b
        # bf16 is 13.8 GB vs 16 GB HBM; packed it is ~3.5 GB + 1.2 GB bf16
        # embed table, so a 7B-class decoder serves on ONE chip. Reference
        # counterpart: prj/M2_omni serves fp16 on A100-80GB-class GPUs.
        from antmmf_tpu.predictors.quantization import (
            make_live_vars, synth_quantized_like)

        host_q4 = synth_quantized_like(shapes, min_size=4096)
        q4_gb = sum(np.asarray(l).nbytes for l in
                    jax.tree_util.tree_leaves(host_q4)) / 1e9
        q4params = jax.device_put(host_q4)
        del host_q4
        print(json.dumps({"synth_q4": True, "weights_gb": round(q4_gb, 2),
                          "embed_gb": round(vocab * hidden * 2 / 1e9, 2)}),
              flush=True)

        @jax.jit
        def prefill_q(qparams, embeds, positions, mask, cache):
            live = make_live_vars(qparams, dtype)
            return model.apply(live(), embeds, positions, mask, cache=cache)

        for L in args.lens:
            T = L + args.decode_steps
            ids = jax.random.randint(jax.random.PRNGKey(2), (B, L), 0, vocab)
            embeds = embed_table[ids]
            positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
            mask = jnp.ones((B, L), jnp.int32)
            cache0 = init_decoder_cache(cfg["num_layers"], B, n_kv, T,
                                        head_dim, dtype)
            lat_pre = []
            for i in range(3):
                t0 = time.perf_counter()
                logits0, cache = prefill_q(q4params, embeds, positions,
                                           mask, cache0)
                float(np.asarray(logits0).reshape(-1)[0])
                lat_pre.append((time.perf_counter() - t0) * 1e3)
            toks0 = jnp.zeros((B, args.decode_steps), jnp.int32)
            pos0 = jnp.full((B,), L, jnp.int32)
            lat = []
            for i in range(4):
                t0 = time.perf_counter()
                toks, _ = decode_int8(q4params, embed_table, logits0, cache,
                                      pos0, toks0)
                int(np.asarray(toks)[0, -1])
                lat.append((time.perf_counter() - t0) * 1e3)
            ms = float(np.median(lat[1:])) / args.decode_steps
            print(json.dumps({
                "exp": f"synthq4_decode_L{L}_b{B}",
                "prefill_ms": round(float(np.median(lat_pre[1:])), 2),
                "per_token_ms": round(ms, 3),
                "tokens_per_sec": round(B * 1e3 / ms, 1)}), flush=True)
        return

    for L in args.lens:
        T = L + args.decode_steps
        ids = jax.random.randint(jax.random.PRNGKey(2), (B, L), 0, vocab)
        embeds = embed_table[ids]
        positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        mask = jnp.ones((B, L), jnp.int32)
        cache0 = init_decoder_cache(cfg["num_layers"], B, n_kv, T, head_dim,
                                    dtype)

        # prefill timing
        lat_pre = []
        for i in range(4):
            t0 = time.perf_counter()
            logits0, cache = prefill(params, embeds, positions, mask, cache0)
            float(np.asarray(logits0).reshape(-1)[0])
            lat_pre.append((time.perf_counter() - t0) * 1e3)
        prefill_ms = float(np.median(lat_pre[1:]))

        # decode timing (steps under one jit; amortized per token)
        toks0 = jnp.zeros((B, args.decode_steps), jnp.int32)
        pos0 = jnp.full((B,), L, jnp.int32)
        lat_dec = []
        for i in range(4):
            t0 = time.perf_counter()
            toks, _ = decode(params, embed_table, logits0, cache, pos0, toks0)
            int(np.asarray(toks)[0, -1])
            lat_dec.append((time.perf_counter() - t0) * 1e3)
        per_token_ms = float(np.median(lat_dec[1:])) / args.decode_steps

        row = {"exp": f"decode_L{L}_b{B}",
               "prefill_ms": round(prefill_ms, 2),
               "per_token_ms": round(per_token_ms, 3),
               "tokens_per_sec": round(B * 1e3 / per_token_ms, 1)}

        if args.int8:
            from antmmf_tpu.predictors.quantization import quantize_params

            _, qstats = quantize_params(params)
            qparams = jax.device_put(quantize_for_decode(params,
                                                         min_size=4096))
            lat_q = []
            for i in range(4):
                t0 = time.perf_counter()
                toks, _ = decode_int8(qparams, embed_table, logits0, cache,
                                      pos0, toks0)
                int(np.asarray(toks)[0, -1])
                lat_q.append((time.perf_counter() - t0) * 1e3)
            q_ms = float(np.median(lat_q[1:])) / args.decode_steps
            row["int8_per_token_ms"] = round(q_ms, 3)
            row["int8_tokens_per_sec"] = round(B * 1e3 / q_ms, 1)
            row["int8_weight_mb"] = round(qstats["bytes_after"] / 1e6, 1)

        if args.int4:
            # group-int4 weights: quarter the bf16 per-step weight read;
            # tokens may diverge from full precision (report agreement)
            q4params = jax.device_put(
                quantize_for_decode(params, min_size=4096, bits=4))

            def _mb(tree):
                return sum(np.asarray(l).nbytes
                           for l in jax.tree_util.tree_leaves(tree)) / 1e6

            lat4 = []
            for i in range(4):
                t0 = time.perf_counter()
                toks4, _ = decode_int8(q4params, embed_table, logits0,
                                       cache, pos0, toks0)
                int(np.asarray(toks4)[0, -1])
                lat4.append((time.perf_counter() - t0) * 1e3)
            q4_ms = float(np.median(lat4[1:])) / args.decode_steps
            ref_toks4 = np.asarray(decode(params, embed_table, logits0,
                                          cache, pos0, toks0)[0])
            row["int4_per_token_ms"] = round(q4_ms, 3)
            row["int4_tokens_per_sec"] = round(B * 1e3 / q4_ms, 1)
            row["int4_weight_mb"] = round(_mb(q4params), 1)
            row["int4_token_agreement"] = round(float(
                (np.asarray(toks4) == ref_toks4).mean()), 3)

        if args.kv_int8:
            # int8 KV cache: halves the per-step HBM cache read (the term
            # that grows with L and batch; at long context it dominates the
            # weight read). Reuses the same jits — the cache pytree carries
            # {"k","k_scale","v","v_scale"} leaves.
            qc0 = init_decoder_cache(cfg["num_layers"], B, n_kv, T, head_dim,
                                     dtype, quantized=True)
            logits0q, cacheq = prefill(params, embeds, positions, mask, qc0)
            lat_kv = []
            for i in range(4):
                t0 = time.perf_counter()
                toksq, _ = decode(params, embed_table, logits0q, cacheq,
                                  pos0, toks0)
                int(np.asarray(toksq)[0, -1])
                lat_kv.append((time.perf_counter() - t0) * 1e3)
            kv_ms = float(np.median(lat_kv[1:])) / args.decode_steps
            row["kv8_per_token_ms"] = round(kv_ms, 3)
            row["kv8_tokens_per_sec"] = round(B * 1e3 / kv_ms, 1)
            ref_toks = np.asarray(decode(params, embed_table, logits0,
                                         cache, pos0, toks0)[0])
            row["kv8_token_agreement"] = round(float(
                (np.asarray(toksq) == ref_toks).mean()), 3)
            if args.int8:  # full int8 serving config: w8 + kv8
                qparams8 = jax.device_put(
                    quantize_for_decode(params, min_size=4096))
                lat_b = []
                for i in range(4):
                    t0 = time.perf_counter()
                    toksb, _ = decode_int8(qparams8, embed_table, logits0q,
                                           cacheq, pos0, toks0)
                    int(np.asarray(toksb)[0, -1])
                    lat_b.append((time.perf_counter() - t0) * 1e3)
                b_ms = float(np.median(lat_b[1:])) / args.decode_steps
                row["w8kv8_per_token_ms"] = round(b_ms, 3)
                row["w8kv8_tokens_per_sec"] = round(B * 1e3 / b_ms, 1)

        if args.speculate:
            # speculative decoding telemetry: (a) the hardware truth — a
            # width-(gamma+1) chunk-verify step costs ~one decode step
            # (weight-read-bound); (b) an end-to-end speculative greedy run
            # with MEASURED acceptance (free-running greedy on random
            # weights is repetition-heavy, so treat the end-to-end tokens/s
            # as a favorable case; the chunk cost + acceptance curve is the
            # honest generalization)
            from antmmf_tpu.utils.speculative import speculative_greedy

            gamma = args.speculate
            K = gamma + 1

            # chunked-replay ceiling: decode a token stream K at a time
            # inside ONE jit (a single chunk_step call from the host
            # measures relay dispatch + a 3 MB logits transfer, not the
            # chip; even a short replay leaves ~15 ms/chunk of dispatch in
            # the quotient) — this is speculative tokens/s at 100%
            # acceptance. Use enough chunks to amortize the one dispatch.
            n_chunks = max(24, args.decode_steps // K)

            @jax.jit
            def chunk_replay(params, table, stream, pos0, cache):
                def step(i, carry):
                    last, cache = carry
                    chunk = jax.lax.dynamic_slice(
                        stream, (0, i * K), (B, K))
                    p0 = pos0 + i * K
                    lg, cache = model.apply(
                        params, table[chunk],
                        p0[:, None] + jnp.arange(K)[None], None,
                        cache=cache, decode_pos=p0, all_logits=True)
                    return lg[:, -1], cache

                last0 = jnp.zeros((B, vocab), jnp.float32)
                last, cache = jax.lax.fori_loop(
                    0, n_chunks, step, (last0, cache))
                return last

            # replay cache sized for the full chunk stream (slot clamping
            # would otherwise rewrite the same tail slots — same FLOPs but
            # not the representative memory pattern)
            re_cache0 = init_decoder_cache(cfg["num_layers"], B, n_kv,
                                           L + n_chunks * K, head_dim, dtype)
            _, re_cache = prefill(params, embeds, positions, mask, re_cache0)
            stream = jnp.zeros((B, n_chunks * K), jnp.int32)
            lat_ch = []
            for i in range(4):
                t0 = time.perf_counter()
                lg = chunk_replay(params, embed_table, stream, pos0,
                                  re_cache)
                float(np.asarray(lg).reshape(-1)[0])
                lat_ch.append((time.perf_counter() - t0) * 1e3)
            chunk_ms = float(np.median(lat_ch[1:])) / n_chunks
            row["spec_chunk_ms"] = round(chunk_ms, 3)
            # tokens/s at acceptance rate a: (1 + a*gamma) tokens per chunk
            for a in (0.5, 0.8, 1.0):
                row[f"spec_tokens_per_sec_a{a}"] = round(
                    B * (1 + a * gamma) * 1e3 / chunk_ms, 1)

            @jax.jit
            def spec_run(params, table, logits0, cache, buf, lens_):
                def chunk_fn(chunk, start_off, c):
                    emb = table[chunk]
                    p0 = pos0 + start_off
                    pos = p0[:, None] + jnp.arange(K)[None]
                    return model.apply(params, emb, pos, None, cache=c,
                                       decode_pos=p0, all_logits=True)

                return speculative_greedy(
                    chunk_fn, logits0, cache, buf, lens_, -1,
                    args.decode_steps, gamma=gamma)

            # speculative needs gamma extra cache slots of headroom
            cache_sp0 = init_decoder_cache(cfg["num_layers"], B, n_kv,
                                           T + K, head_dim, dtype)
            _, cache_sp = prefill(params, embeds, positions, mask, cache_sp0)
            buf = jnp.concatenate(
                [ids.astype(jnp.int32),
                 jnp.zeros((B, args.decode_steps + K), jnp.int32)], 1)
            lens_ = jnp.full((B,), L, jnp.int32)
            lat_sp = []
            for i in range(4):
                t0 = time.perf_counter()
                toks_sp, cnt, n_steps = spec_run(
                    params, embed_table, logits0, cache_sp, buf, lens_)
                int(np.asarray(cnt)[0])
                lat_sp.append((time.perf_counter() - t0) * 1e3)
            sp_ms = float(np.median(lat_sp[1:]))
            emitted = float(np.asarray(cnt).mean())
            steps = int(n_steps)
            row["spec_e2e_tokens_per_sec"] = round(
                B * emitted * 1e3 / sp_ms, 1)
            row["spec_e2e_tokens_per_step"] = round(
                emitted / max(steps, 1), 2)

        # O(L^2) re-encode comparison (the pre-round-3 path)
        if L <= args.reencode_max_len:
            lat_re = []
            for i in range(3):
                t0 = time.perf_counter()
                lg = reencode_logits(params, embeds, positions, mask)
                float(np.asarray(lg).reshape(-1)[0])
                lat_re.append((time.perf_counter() - t0) * 1e3)
            re_ms = float(np.median(lat_re[1:]))
            row["reencode_per_token_ms"] = round(re_ms, 2)
            row["speedup"] = round(re_ms / per_token_ms, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
