"""Continuous-batching decode throughput on the chip.

Compares three ways to serve R generation requests through the same Pink
checkpoint (decode is HBM-bandwidth-bound, so batching slots multiply
tokens/s almost for free):

  sequential  — one ``model.generate`` call per request (the reference's
                serving pattern: HF generate, one request at a time,
                prj/Pink/pink/eval/model_vqav2.py:141)
  static      — ``model.generate`` over batches of S requests (the
                reference BatchPredictor role)
  continuous  — the slot-pooled ``ContinuousBatchingEngine`` (admission at
                token boundaries; no waiting for stragglers)

One JSON line per result. Run on the TPU:
  python -m antmmf_tpu.scripts.bench_serving_cb --preset omni_1b --slots 8
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="omni_1b")
    p.add_argument("--vit_preset", default="vit_base_patch16")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--step_tokens", type=int, default=8,
                   help="decode-window tokens per host sync (H=1 is exact "
                        "per-token admission; larger H amortizes the host "
                        "round-trip, which dominates on a remote chip)")
    p.add_argument("--prompt_len", type=int, default=32)
    p.add_argument("--max_new", type=int, default=32)
    p.add_argument("--no_image", action="store_true")
    p.add_argument("--skip_sequential", action="store_true")
    p.add_argument("--turns", type=int, default=1,
                   help=">1 also benchmarks K-turn conversations: engine "
                        "sessions (extend_cache per turn) vs the "
                        "reference's whole-conversation re-prefill")
    p.add_argument("--turn_len", type=int, default=16)
    p.add_argument("--decode_quant", choices=["int8", "int4"], default=None,
                   help="weight-only quantized serving through the engine "
                        "(and the sequential/static comparisons)")
    p.add_argument("--shared_prefix", type=int, default=0, metavar="K",
                   help="also measure prefix caching: all requests share "
                        "[image + first K prompt tokens], registered once "
                        "and forked per request (engine.register_prefix)")
    p.add_argument("--poisson", type=float, default=0.0, metavar="RATE",
                   help="also run a Poisson-arrival mixed-prompt-length "
                        "load test (RATE req/s) reporting TTFT/TPOT "
                        "p50/p99 with whole-prompt vs chunked admission "
                        "(tokens pinned equal)")
    p.add_argument("--sustained", type=int, default=0, metavar="N",
                   help="sustained mixed load: N requests (>=64) with "
                        "Poisson arrivals (rate --poisson, default 4 rps), "
                        "a 4-class mix (long+vision / short text-only / "
                        "shared-prefix / tight-deadline), reporting slot "
                        "utilization, queue depth, p99 TTFT/TPOT and the "
                        "eviction path under pressure")
    p.add_argument("--prefill_chunk", type=int, default=64,
                   help="chunk width for the chunked-admission leg of the "
                        "Poisson test")
    p.add_argument("--cpu", action="store_true",
                   help="smoke run on host CPU (tiny preset recommended)")
    p.add_argument("--dtype", default="bfloat16",
                   help="model compute dtype; float32 pins the chunked-vs-"
                        "whole admission token check exactly (bf16 near-ties "
                        "on random-init weights can flip greedy tokens)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from antmmf_tpu.models.pink import PinkModel
    from antmmf_tpu.predictors.serving_engine import (
        ContinuousBatchingEngine, PinkAdapter)

    model = PinkModel(lm_preset=args.preset, vit_preset=args.vit_preset,
                      image_size=args.image_size, lora_rank=0,
                      dtype_str=args.dtype)
    rng = jax.random.PRNGKey(0)
    Lp = args.prompt_len
    init_batch = {"input_ids": jnp.zeros((1, Lp), jnp.int32),
                  "input_mask": jnp.ones((1, Lp), jnp.int32)}
    if not args.no_image:
        init_batch["image_data"] = jax.random.normal(
            rng, (1, args.image_size, args.image_size, 3))
    variables = jax.jit(model.init)(rng, init_batch)
    jax.block_until_ready(variables)
    if args.decode_quant:
        # the engine applies make_live_vars internally: int8 dequantizes per
        # window step behind a barrier, int4 routes to QuantDense siblings
        # (the Pallas GEMV on TPU decode shapes)
        from antmmf_tpu.predictors.quantization import quantize_for_decode

        variables = jax.device_put(quantize_for_decode(
            jax.device_get(variables), min_size=4096,
            bits={"int8": 8, "int4": 4}[args.decode_quant]))

    EOS = -1  # never emitted: generation length = each request's budget
    # heterogeneous output budgets — the realistic serving mix where
    # continuous batching wins (static batches wait for the longest row)
    budgets = [args.max_new // 4, args.max_new // 2, args.max_new,
               args.max_new // 4]
    reqs = []
    for i in range(args.requests):
        r = jax.random.PRNGKey(1000 + i)
        n = Lp // 2 + i % (Lp // 2)
        ids = np.zeros((Lp,), np.int32)
        ids[:n] = np.asarray(jax.random.randint(r, (n,), 5, 1000), np.int32)
        d = {"input_ids": ids,
             "input_mask": (np.arange(Lp) < n).astype(np.int32),
             "max_new": budgets[i % len(budgets)]}
        if not args.no_image:
            d["image_data"] = np.asarray(
                jax.random.normal(r, (args.image_size, args.image_size, 3)),
                np.float32)
        reqs.append((f"req{i}", d))

    def batch_of(group):
        b = {"input_ids": jnp.asarray(
                 np.stack([d["input_ids"] for _, d in group])),
             "input_mask": jnp.asarray(
                 np.stack([d["input_mask"] for _, d in group]))}
        if not args.no_image:
            b["image_data"] = jnp.asarray(
                np.stack([d["image_data"] for _, d in group]))
        return b

    useful_tokens = sum(d["max_new"] for _, d in reqs)

    # -- continuous batching (first: pays all compiles, then timed run) ----
    ad = PinkAdapter(model, variables, max_prompt_len=Lp,
                     max_new_tokens=args.max_new,
                     has_image=not args.no_image)
    eng = ContinuousBatchingEngine(ad, slots=args.slots,
                                   max_new_tokens=args.max_new, eos_id=EOS,
                                   step_tokens=args.step_tokens)
    eng.run(reqs[: args.slots + 1])  # compile prefill/admit/step
    eng.reset()
    result = eng.run(reqs)
    print(json.dumps({
        "metric": "serving_continuous", "slots": args.slots,
        "step_tokens": args.step_tokens,
        "requests": args.requests, "max_new": args.max_new,
        "wall_s": round(result["wall_s"], 3),
        "useful_tokens_per_s": round(useful_tokens / result["wall_s"], 1),
        "latency_p50_s": round(result["latency_p50"], 3),
        "latency_max_s": round(result["latency_max"], 3)}), flush=True)

    # -- prefix caching: all requests share [image + half the prompt] ------
    if args.shared_prefix:
        k = args.shared_prefix
        pre = {"input_ids": reqs[0][1]["input_ids"][:k],
               "input_mask": np.ones(k, np.int32)}
        if not args.no_image:
            pre["image_data"] = reqs[0][1]["image_data"]
        preqs = []
        for i, (rid, d) in enumerate(reqs):
            n = int(d["input_mask"].sum())
            ns = max(1, n - k)
            preqs.append((f"px{i}", {"prefix": "sys",
                                     "input_ids": d["input_ids"][k:k + ns],
                                     "max_new": d["max_new"]}))
        # one compiled extend for every suffix length (per-length traces
        # would recompile mid-serving)
        eng.suffix_pad = Lp - k
        eng.reset()
        eng.register_prefix("sys", pre)
        eng.run(preqs[: args.slots + 1])  # compile the extend-admit path
        eng.reset()
        t0 = time.perf_counter()
        # prefix registration is part of the serving cost — re-register
        eng.drop_prefix("sys")
        eng.register_prefix("sys", pre)
        result_p = eng.run(preqs)
        wall_p = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serving_prefix_cached", "prefix_len": k,
            "requests": args.requests,
            "wall_s": round(wall_p, 3),
            "useful_tokens_per_s": round(useful_tokens / wall_p, 1),
            "latency_p50_s": round(result_p["latency_p50"], 3)}),
            flush=True)

    # -- Poisson arrivals: mixed prompt lengths, whole vs chunked admission
    # The serving-quality question VERDICT r3 asked: does one long prefill
    # stall active decode slots (head-of-line blocking)? Chunked admission
    # streams the prompt in prefill_chunk-token extends between decode
    # windows; tokens are pinned equal to whole-prompt admission.
    if args.poisson > 0:
        host = np.random.default_rng(7)
        # mixed lengths: 1/3 long (full Lp), 2/3 short (Lp/4)
        preqs = []
        for i in range(args.requests):
            r = jax.random.PRNGKey(3000 + i)
            n = Lp if i % 3 == 0 else max(4, Lp // 4)
            ids = np.zeros((Lp,), np.int32)
            ids[:n] = np.asarray(jax.random.randint(r, (n,), 5, 1000),
                                 np.int32)
            d = {"input_ids": ids[:n],
                 "input_mask": np.ones(n, np.int32),
                 "max_new": budgets[i % len(budgets)]}
            if not args.no_image:
                d["image_data"] = np.asarray(jax.random.normal(
                    r, (args.image_size, args.image_size, 3)), np.float32)
            preqs.append((f"p{i}", d))
        arrivals = np.cumsum(host.exponential(1.0 / args.poisson,
                                              size=len(preqs)))

        def poisson_run(engine):
            engine.reset()
            t0 = time.perf_counter()
            nxt = 0
            while nxt < len(preqs) or engine._queue \
                    or any(r is not None for r in engine._slot_req) \
                    or any(p_ is not None
                           for p_ in engine._slot_pending):
                now = time.perf_counter() - t0
                while nxt < len(preqs) and arrivals[nxt] <= now:
                    engine.submit(*preqs[nxt])
                    nxt += 1
                if nxt < len(preqs) and not engine._queue and not any(
                        r is not None for r in engine._slot_req) and not any(
                        p_ is not None for p_ in engine._slot_pending):
                    time.sleep(max(0.0, arrivals[nxt] - now))
                    continue
                engine.step()
            return engine.stats(time.perf_counter() - t0)

        legs = [("whole", ContinuousBatchingEngine(
            ad, slots=args.slots, max_new_tokens=args.max_new, eos_id=EOS,
            step_tokens=args.step_tokens))]
        legs.append(("chunked", ContinuousBatchingEngine(
            ad, slots=args.slots, max_new_tokens=args.max_new, eos_id=EOS,
            step_tokens=args.step_tokens,
            prefill_chunk=args.prefill_chunk)))
        outs = {}
        for name, engine in legs:
            engine.run(preqs[: args.slots + 1])  # pay the compiles
            res = poisson_run(engine)
            outs[name] = res["outputs"]
            print(json.dumps({
                "metric": f"serving_poisson_{name}",
                "rate_rps": args.poisson, "requests": args.requests,
                "prefill_chunk": (args.prefill_chunk if name == "chunked"
                                  else None),
                "wall_s": round(res["wall_s"], 3),
                "tokens_per_s": round(res["tokens_per_s"], 1),
                "ttft_p50_s": round(res["ttft_p50"], 3),
                "ttft_p99_s": round(res["ttft_p99"], 3),
                "tpot_p50_s": round(res["tpot_p50"], 4),
                "tpot_p99_s": round(res["tpot_p99"], 4)}), flush=True)
        # per-request agreement, not a bare boolean: on bf16 TPU the
        # overlapped final chunk recomputes identical tokens in a different
        # matmul grouping, so cache entries differ in the last ulp and a
        # greedy NEAR-TIE on random-init weights can flip downstream tokens
        # (same phenomenon as the kv_int8 note, BASELINE round 3). Exact
        # equality is pinned in f32 (tests/test_serving_engine.py chunk
        # tests, and --dtype float32 on chip).
        n_match, first_div = 0, {}
        for rid in outs["whole"]:
            a, b = outs["whole"][rid], outs["chunked"].get(rid)
            if a == b:
                n_match += 1
            else:
                div = next((i for i, (x, y) in enumerate(zip(a, b or []))
                            if x != y), min(len(a), len(b or [])))
                first_div[rid] = div
        print(json.dumps({"metric": "serving_poisson_tokens_equal",
                          "equal": bool(n_match == len(outs["whole"])),
                          "requests_matching": n_match,
                          "requests": len(outs["whole"]),
                          "first_divergence_idx": first_div}), flush=True)

    # -- sustained mixed load: the real-queue evidence (VERDICT r4 weak #5)
    if args.sustained:
        N = args.sustained
        rate = args.poisson if args.poisson > 0 else 4.0
        host = np.random.default_rng(11)
        k = Lp // 2  # shared-prefix length
        pre = {"input_ids": reqs[0][1]["input_ids"][:k],
               "input_mask": np.ones(k, np.int32)}
        if not args.no_image:
            pre["image_data"] = reqs[0][1]["image_data"]
        short = max(4, Lp // 4)
        sreqs = []
        for i in range(N):
            r = jax.random.PRNGKey(7000 + i)
            cls = ("long_vision", "short_text", "short_text", "prefix",
                   "deadline")[i % 5]
            budget = budgets[i % len(budgets)]
            if cls == "long_vision":
                ids = np.asarray(jax.random.randint(r, (Lp,), 5, 1000),
                                 np.int32)
                d = {"input_ids": ids, "input_mask": np.ones(Lp, np.int32),
                     "max_new": budget}
                if not args.no_image:
                    d["image_data"] = np.asarray(jax.random.normal(
                        r, (args.image_size, args.image_size, 3)),
                        np.float32)
            elif cls == "prefix":
                ids = np.asarray(jax.random.randint(r, (short,), 5, 1000),
                                 np.int32)
                d = {"prefix": "sys", "input_ids": ids, "max_new": budget}
            else:
                ids = np.asarray(jax.random.randint(r, (short,), 5, 1000),
                                 np.int32)
                d = {"input_ids": ids,
                     "input_mask": np.ones(short, np.int32),
                     "max_new": budget}
                if cls == "deadline":
                    # tight budget: under queue pressure a fraction MUST
                    # miss it and take the eviction path
                    d["deadline_s"] = 2.0 / rate
            sreqs.append((f"s{i}_{cls}", d))
        arrivals = np.cumsum(host.exponential(1.0 / rate, size=N))

        engine = ContinuousBatchingEngine(
            ad, slots=args.slots, max_new_tokens=args.max_new, eos_id=EOS,
            step_tokens=args.step_tokens, suffix_pad=Lp - short)
        engine.register_prefix("sys", pre)
        # pay every compile OUTSIDE the timed window: one of each class
        warm = [(f"w{j}", dict(sreqs[j][1])) for j in range(min(5, N))]
        for _, d in warm:
            d.pop("deadline_s", None)
        engine.run(warm)
        engine.reset()
        engine.register_prefix("sys", pre)

        t0 = time.perf_counter()
        nxt = 0
        while nxt < N or engine._queue \
                or any(r_ is not None for r_ in engine._slot_req) \
                or any(p_ is not None for p_ in engine._slot_pending):
            now = time.perf_counter() - t0
            while nxt < N and arrivals[nxt] <= now:
                engine.submit(*sreqs[nxt])
                nxt += 1
            idle = not engine._queue and not any(
                r_ is not None for r_ in engine._slot_req) and not any(
                p_ is not None for p_ in engine._slot_pending)
            if nxt < N and idle:
                time.sleep(max(0.0, arrivals[nxt] - now))
                continue
            engine.step()
        res = engine.stats(time.perf_counter() - t0)
        evicted = sorted(res["evicted"])
        by_cls = {}
        for rid in res["outputs"]:
            c = rid.split("_", 1)[1]
            by_cls.setdefault(c, [0, 0])
            by_cls[c][0] += 1
            by_cls[c][1] += int(rid in res["evicted"])
        print(json.dumps({
            "metric": "serving_sustained", "requests": N,
            "slots": args.slots, "rate_rps": rate,
            "wall_s": round(res["wall_s"], 3),
            "tokens_per_s": round(res["tokens_per_s"], 1),
            "slot_utilization": round(res["slot_utilization"], 3),
            "queue_depth_p50": res["queue_depth_p50"],
            "queue_depth_max": res["queue_depth_max"],
            "ttft_p50_s": round(res["ttft_p50"], 3),
            "ttft_p99_s": round(res["ttft_p99"], 3),
            "tpot_p50_s": round(res["tpot_p50"], 4),
            "tpot_p99_s": round(res["tpot_p99"], 4),
            "evicted": len(evicted),
            "completed": len(res["outputs"]) - len(evicted),
            "by_class_total_evicted": by_cls}), flush=True)

    # -- static batches of S: every group decodes to its longest budget ----
    groups = [reqs[i:i + args.slots]
              for i in range(0, len(reqs), args.slots)]
    groups = [g for g in groups if len(g) == args.slots]
    if groups:
        model.generate(variables, batch_of(groups[0]), eos_id=EOS,
                       max_length=args.max_new)  # compile (memoized jit)
        t0 = time.perf_counter()
        for g in groups:
            toks, _ = model.generate(variables, batch_of(g), eos_id=EOS,
                                     max_length=max(
                                         d["max_new"] for _, d in g))
        np.asarray(toks)
        dt = time.perf_counter() - t0
        n_useful = sum(d["max_new"] for g in groups for _, d in g)
        print(json.dumps({
            "metric": "serving_static_batch", "batch": args.slots,
            "wall_s": round(dt, 3),
            "useful_tokens_per_s": round(n_useful / dt, 1)}), flush=True)

    # -- sequential (the reference pattern) --------------------------------
    if not args.skip_sequential:
        for b in sorted({d["max_new"] for _, d in reqs}):
            model.generate(variables, batch_of(reqs[:1]), eos_id=EOS,
                           max_length=b)  # compile each budget once
        t0 = time.perf_counter()
        for rq in reqs:
            toks, _ = model.generate(variables, batch_of([rq]), eos_id=EOS,
                                     max_length=rq[1]["max_new"])
        np.asarray(toks)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serving_sequential", "wall_s": round(dt, 3),
            "useful_tokens_per_s": round(useful_tokens / dt, 1)}),
            flush=True)

    # -- multi-turn sessions vs per-turn re-prefill ------------------------
    # K-turn conversations: the engine holds each session's cache row and
    # appends turns via extend_cache; the reference pattern re-encodes the
    # WHOLE conversation (vision tower included) every turn, padded to a
    # fixed Lmax so it compiles once.
    if args.turns > 1:
        K, Lt = args.turns, args.turn_len
        n_sess = min(args.slots, args.requests)
        per_turn_new = args.max_new // 2
        sess_reqs = []
        for i in range(n_sess):
            _, d = reqs[i]
            sess_reqs.append((f"s{i}", {**d, "session": True,
                                        "max_new": per_turn_new}))
        turn_ids = [np.asarray(jax.random.randint(
            jax.random.PRNGKey(5000 + k), (Lt,), 5, 1000), np.int32)
            for k in range(K)]

        def run_sessions(eng):
            eng.reset()
            out_counts = 0
            per_turn = []
            ids = [rid for rid, _ in sess_reqs]
            t0 = time.perf_counter()
            for rid, d in sess_reqs:
                eng.submit(rid, d)
            for k in range(K):
                while any(r not in eng._done for r in ids):
                    eng.step()
                per_turn.append(round(time.perf_counter() - t0, 3))
                out_counts += sum(len(eng._done[r]) for r in ids)
                if k == K - 1:
                    for r in ids:
                        eng.close_session(r)
                    break
                t0 = time.perf_counter()
                for r in ids:
                    eng.continue_session(
                        r, f"{r}.t{k + 1}",
                        {"input_ids": turn_ids[k], "session": True,
                         "max_new": per_turn_new})
                ids = [f"{r}.t{k + 1}" for r in ids]
            return out_counts, per_turn

        ad2 = PinkAdapter(model, variables, max_prompt_len=Lp,
                          max_new_tokens=per_turn_new,
                          has_image=not args.no_image,
                          extra_slots=(K - 1) * (Lt + per_turn_new))
        eng2 = ContinuousBatchingEngine(
            ad2, slots=n_sess, max_new_tokens=per_turn_new, eos_id=EOS,
            step_tokens=args.step_tokens)
        run_sessions(eng2)  # compile prefill/extend/step once
        t0 = time.perf_counter()
        n_tok, per_turn = run_sessions(eng2)
        dt_sess = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serving_sessions", "turns": K, "sessions": n_sess,
            "turn_len": Lt, "per_turn_new": per_turn_new,
            "wall_s": round(dt_sess, 3),
            "per_turn_s": per_turn,
            "tokens_per_s": round(n_tok / dt_sess, 1)}), flush=True)

        # reference pattern: re-encode the whole (padded) conversation
        # every turn for the same workload
        Lmax = Lp + K * per_turn_new + (K - 1) * Lt
        convo = np.zeros((n_sess, Lmax), np.int32)
        cmask = np.zeros((n_sess, Lmax), np.int32)
        clen = np.zeros((n_sess,), np.int32)
        for i, (_, d) in enumerate(sess_reqs):
            n = int(d["input_mask"].sum())
            convo[i, :n] = d["input_ids"][:n]
            clen[i] = n
        imgs = (None if args.no_image else jnp.asarray(
            np.stack([d["image_data"] for _, d in sess_reqs])))

        def one_turn_reprefill():
            for i in range(n_sess):
                cmask[i] = (np.arange(Lmax) < clen[i]).astype(np.int32)
            b = {"input_ids": jnp.asarray(convo),
                 "input_mask": jnp.asarray(cmask)}
            if imgs is not None:
                b["image_data"] = imgs
            toks, lens = model.generate(variables, b, eos_id=EOS,
                                        max_length=per_turn_new)
            toks, lens = np.asarray(toks), np.asarray(lens)
            for i in range(n_sess):
                e = int(lens[i])
                gen = toks[i, e: e + per_turn_new]
                m = int(clen[i])
                convo[i, m: m + per_turn_new] = gen
                clen[i] = m + per_turn_new

        one_turn_reprefill()  # compile
        convo[:, :], clen[:] = 0, 0
        for i, (_, d) in enumerate(sess_reqs):
            n = int(d["input_mask"].sum())
            convo[i, :n] = d["input_ids"][:n]
            clen[i] = n
        per_turn_re = []
        t0 = time.perf_counter()
        for k in range(K):
            tk = time.perf_counter()
            one_turn_reprefill()
            per_turn_re.append(round(time.perf_counter() - tk, 3))
            if k < K - 1:
                for i in range(n_sess):
                    m = int(clen[i])
                    convo[i, m: m + Lt] = turn_ids[k]
                    clen[i] = m + Lt
        dt_re = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serving_reprefill_turns", "turns": K,
            "wall_s": round(dt_re, 3),
            "per_turn_s": per_turn_re,
            "tokens_per_s": round(n_tok / dt_re, 1),
            "speedup_sessions": round(dt_re / dt_sess, 2)}), flush=True)


if __name__ == "__main__":
    main()
