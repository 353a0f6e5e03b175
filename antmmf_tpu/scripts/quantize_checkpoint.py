"""Quantize a saved model dir into an int8 serving artifact.

Completes the serving workflow around ``predictors/quantization.py``
(per-output-channel symmetric int8 weights, norms/biases/embeddings kept
fp32 — measured 2.85× smaller on the flagship model with rankings
unchanged, BASELINE.md)::

    python -m antmmf_tpu.scripts.quantize_checkpoint \
        --model_dir save_dir/ [--ckpt save_dir/model_final] \
        --out save_dir/model_int8.npz [--min_size 4096] \
        [--exclude_regex "(norm|embed|logit_scale)"]

``--model_dir`` finds the newest ``*_final`` / ``models/best`` /
``models/model_*`` Orbax tree (the same search order as
``BasePredictor._load_checkpoint``); ``--ckpt`` points at one directly.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _ckpt_sort_key(path: str):
    """model_<iter> sorts numerically (lexicographic picks model_999 over
    model_1000); non-numeric names sort after, alphabetically."""
    tail = os.path.basename(path).rsplit("_", 1)[-1]
    return (0, int(tail), "") if tail.isdigit() else (1, 0, path)


def find_checkpoint(model_dir: str) -> str:
    candidates = sorted(glob.glob(os.path.join(model_dir, "*_final"))) or \
        sorted(glob.glob(os.path.join(model_dir, "models", "best"))) or \
        sorted(glob.glob(os.path.join(model_dir, "models", "model_*")),
               key=_ckpt_sort_key)
    if not candidates:
        raise SystemExit(f"No checkpoint found in {model_dir!r}")
    return candidates[-1]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", default=None)
    p.add_argument("--ckpt", default=None, help="Orbax tree path directly")
    p.add_argument("--out", required=True)
    p.add_argument("--min_size", type=int, default=4096)
    p.add_argument("--exclude_regex", default=r"(norm|embed|logit_scale)")
    args = p.parse_args()
    if not args.ckpt and not args.model_dir:
        raise SystemExit("give --model_dir or --ckpt")

    import orbax.checkpoint as ocp

    from antmmf_tpu.predictors.quantization import save_quantized

    path = args.ckpt or find_checkpoint(args.model_dir)
    with ocp.PyTreeCheckpointer() as ck:
        raw = ck.restore(os.path.abspath(path))
    variables = raw.get("variables", raw)
    if "params" not in variables:
        variables = {"params": variables}
    stats = save_quantized(variables, args.out,
                           min_size=args.min_size,
                           exclude_regex=args.exclude_regex)
    out_mb = os.path.getsize(args.out) / 1e6
    print(json.dumps({"source": path, "out": args.out,
                      "quantized_kernels": stats.get("quantized"),
                      "kept_fp32": stats.get("kept"),
                      "mb_before": round(stats.get("bytes_before", 0) / 1e6, 1),
                      "mb_artifact": round(out_mb, 1)}))


if __name__ == "__main__":
    main()
