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


if __name__ == "__main__":
    main()
