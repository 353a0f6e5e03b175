"""Standalone serving CLI: one-shot / batch predictions from the shell.

The reference serves predictors behind an internal online service
("Collie", reference predictors/base_predictor.py:99); the standalone
equivalent here::

    python -m antmmf_tpu.predictors.cli --config exp.yml \
        [--model_dir dir] [--predictor base_predictor] \
        [--input req.json | --input -] [--batch reqs.jsonl] [--no_ckpt]

``--input`` takes one JSON request (file or ``-`` for stdin) and prints
one JSON result; ``--batch`` takes a jsonl file and prints one result per
line (coalesced through ``BatchPredictor`` when the predictor supports
it). ``--no_ckpt`` runs random-init (the reference's unit-test serving
mode, base_predictor.py:61).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_request(path: str):
    text = sys.stdin.read() if path == "-" else open(path).read()
    return json.loads(text)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def main(argv=None) -> None:
    # honor JAX_PLATFORMS even when a plugin registered itself
    # programmatically (the env var alone loses to in-process registration,
    # e.g. TPU relays) — same contract as antmmf_tpu.run
    import os

    if os.environ.get("JAX_PLATFORMS") in ("cpu",):
        import jax

        jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--predictor", default=None,
                   help="registry name; default from predictor_parameters")
    p.add_argument("--input", default=None, help="JSON request file or '-'")
    p.add_argument("--batch", default=None, help="jsonl file of requests")
    p.add_argument("--engine", default=None, metavar="REQS_JSONL",
                   help="serve generation requests through the "
                        "continuous-batching engine (slot-pooled decode, "
                        "per-request budgets/deadlines): jsonl rows "
                        "{id, input_ids, max_new?, deadline_s?, stop?, "
                        "do_sample?/temperature?/top_p?/seed?, image?} — "
                        "one JSON result per request + a stats line")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--step_tokens", type=int, default=8)
    p.add_argument("--max_new", type=int, default=32)
    p.add_argument("--no_ckpt", action="store_true")
    p.add_argument("opts", nargs="*", default=[],
                   help="dotted-path config overrides: key value [key value]")
    args = p.parse_args(argv)

    import antmmf_tpu.predictors  # registry side effects  # noqa: F401
    from antmmf_tpu.common.configuration import Configuration
    from antmmf_tpu.common.registry import registry

    config = Configuration.from_file(args.config)
    if args.opts:
        config = config.override_with_opts(args.opts)
    pp = dict(config.get("predictor_parameters", {}) or {})
    if args.model_dir:
        pp["model_dir"] = args.model_dir
    name = args.predictor or pp.get("predictor", "base_predictor")
    cls = registry.get_predictor_class(name, default=None)
    if cls is None:
        raise SystemExit(f"Unknown predictor {name!r}")
    cfg = dict(config)
    cfg["predictor_parameters"] = pp

    if args.engine:
        _serve_engine(cfg, args, with_ckpt=not args.no_ckpt)
        return
    predictor = cls(cfg).load(with_ckpt=not args.no_ckpt)

    if args.batch:
        reqs = [json.loads(line) for line in open(args.batch)
                if line.strip()]
        if hasattr(predictor, "predict_batch"):
            results = predictor.predict_batch(reqs)
        else:
            results = [predictor.predict(r) for r in reqs]
        for r in results:
            print(json.dumps(_jsonable(r)))
    else:
        req = _load_request(args.input or "-")
        print(json.dumps(_jsonable(predictor.predict(req))))


def _serve_engine(cfg, args, with_ckpt: bool) -> None:
    """Continuous-batching serving from the shell: builds the configured
    LLM model (pink / m2_omni model_attributes), binds its engine adapter,
    feeds every request through the slot pool, prints one JSON result per
    request (tokens + TTFT/latency + evicted flag) and a final stats line
    — the reference's one-request-at-a-time HF-generate serving pattern
    (prj/Pink/pink/eval/model_vqav2.py:141) upgraded to a real queue."""
    import time

    import jax
    import jax.numpy as jnp

    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.predictors.serving_engine import (
        ContinuousBatchingEngine,
        M2OmniAdapter,
        PinkAdapter,
    )

    reqs = [json.loads(line) for line in open(args.engine) if line.strip()]
    if not reqs:
        raise SystemExit("no requests in --engine file")
    shell = build_model(cfg)
    model = shell.module
    model_key = type(model).__name__
    prompt_len = max(len(r["input_ids"]) for r in reqs)

    def _to_req(i, r):
        ids = np.asarray(r["input_ids"], np.int32)
        d = {"input_ids": ids, "input_mask": np.ones(len(ids), np.int32)}
        for k in ("max_new", "deadline_s", "stop", "do_sample",
                  "temperature", "top_p", "seed", "session"):
            if k in r:
                d[k] = r[k]
        if r.get("image"):
            import cv2

            img = cv2.cvtColor(cv2.imread(r["image"]), cv2.COLOR_BGR2RGB)
            size = int(getattr(model, "image_size", 224))
            img = cv2.resize(img, (size, size)).astype(np.float32) / 255.0
            d["image_data"] = img
        return r.get("id", f"req{i}"), d

    init_req = dict(_to_req(0, reqs[0])[1])
    init_batch = {"input_ids": jnp.asarray(init_req["input_ids"])[None],
                  "input_mask": jnp.asarray(init_req["input_mask"])[None]}
    if "image_data" in init_req:
        init_batch["image_data"] = jnp.asarray(init_req["image_data"])[None]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
    pp = dict(cfg.get("predictor_parameters", {}) or {})
    model_dir = pp.get("model_dir")
    if with_ckpt and model_dir:
        import glob
        import os

        import orbax.checkpoint as ocp

        from antmmf_tpu.common.checkpoint import merge_params_tolerant

        cands = sorted(glob.glob(os.path.join(model_dir, "*_final"))) or \
            sorted(glob.glob(os.path.join(model_dir, "models", "best")))
        if cands:
            with ocp.PyTreeCheckpointer() as ck:
                raw = ck.restore(os.path.abspath(cands[-1]))
            variables, _ = merge_params_tolerant(
                variables, raw.get("variables", raw))
    eos = int(pp.get("eos_id", -1))
    ad_cls = M2OmniAdapter if model_key == "M2Omni" else PinkAdapter
    ad = ad_cls(model, variables, max_prompt_len=prompt_len,
                max_new_tokens=args.max_new,
                has_image=any("image" in r for r in reqs))
    engine = ContinuousBatchingEngine(
        ad, slots=args.slots, max_new_tokens=args.max_new, eos_id=eos,
        step_tokens=args.step_tokens)
    t0 = time.perf_counter()
    res = engine.run([_to_req(i, r) for i, r in enumerate(reqs)])
    for rid, toks in res["outputs"].items():
        print(json.dumps({
            "id": rid, "tokens": [int(t) for t in toks],
            "evicted": rid in res["evicted"],
            "latency_s": round(engine._latency.get(rid, 0.0), 4)}))
    print(json.dumps({
        "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in res.items()
                  if k not in ("outputs", "cancelled", "evicted")},
        "wall_s": round(time.perf_counter() - t0, 3)}))


if __name__ == "__main__":
    main()
