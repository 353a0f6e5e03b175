"""Post-training int8 weight quantization for serving.

Beyond-reference capability (the reference serves fp32 torch checkpoints;
its ONNX path has no quantizer): symmetric per-output-channel int8
quantization of matmul/conv kernels for deployment — 4× smaller weight
artifacts and host-memory footprint, dequantized to the serving dtype at
load so the jitted forward is unchanged (TPU MXU consumes bf16; int8 here
is a storage/transfer format, which is the honest win on this hardware).

Contract: ``quantize_params`` → a pytree of ``{"q": int8, "scale": f32}``
records for quantized leaves (others pass through); ``dequantize_params``
restores; round-trip error is bounded by scale/2 per element.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

QUANT_KEYS = ("q", "scale")


def _is_quantizable(path: str, leaf, min_size: int,
                    exclude: Optional[re.Pattern]) -> bool:
    if not hasattr(leaf, "dtype") or not np.issubdtype(
            np.asarray(leaf).dtype, np.floating):
        return False
    if np.asarray(leaf).ndim < 2 or np.asarray(leaf).size < min_size:
        return False  # biases/scales/norms stay fp32
    if exclude is not None and exclude.search(path):
        return False
    return True


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def quantize_params(params: Any, min_size: int = 4096,
                    exclude_regex: str = r"(norm|embed|logit_scale)"
                    ) -> Tuple[Any, Dict[str, Any]]:
    """Symmetric per-output-channel int8 quantization.

    Kernels [..., out] quantize with one fp32 scale per output channel
    (max-abs / 127). Small leaves, norms, and embeddings (lookup tables are
    accuracy-sensitive) stay fp32 unless the regex is changed.

    Returns (quantized_tree, stats).
    """
    exclude = re.compile(exclude_regex) if exclude_regex else None
    stats = {"quantized": 0, "kept": 0,
             "bytes_before": 0, "bytes_after": 0}

    def quant(path, leaf):
        arr = np.asarray(leaf)
        stats["bytes_before"] += arr.nbytes
        if not _is_quantizable(_path_str(path), arr, min_size, exclude):
            stats["kept"] += 1
            stats["bytes_after"] += arr.nbytes
            return leaf
        flat = arr.reshape(-1, arr.shape[-1]).astype(np.float32)
        scale = np.maximum(np.abs(flat).max(axis=0), 1e-12) / 127.0
        q = np.clip(np.round(arr.astype(np.float32) / scale), -127, 127
                    ).astype(np.int8)
        stats["quantized"] += 1
        stats["bytes_after"] += q.nbytes + scale.nbytes
        return {"q": q, "scale": scale.astype(np.float32),
                "dtype": str(arr.dtype)}

    out = jax.tree_util.tree_map_with_path(
        quant, params, is_leaf=lambda x: hasattr(x, "dtype"))
    return out, stats


def _is_record(node) -> bool:
    return isinstance(node, dict) and set(node) == {"q", "scale", "dtype"}


def dequantize_params(qtree: Any) -> Any:
    """Inverse of quantize_params: int8 records → float leaves."""

    def dequant(node):
        if _is_record(node):
            return (node["q"].astype(np.float32) * node["scale"]
                    ).astype(np.dtype(node["dtype"]))
        return node

    return jax.tree_util.tree_map(dequant, qtree, is_leaf=_is_record)


def save_quantized(variables: Any, path: str,
                   **quant_kwargs) -> Dict[str, Any]:
    """Quantize variables['params'] and write one .npz artifact."""
    import pickle

    qparams, stats = quantize_params(variables["params"], **quant_kwargs)
    payload = dict(variables)
    payload["params"] = qparams

    def to_np(node):
        return node if _is_record(node) else np.asarray(node)

    with open(path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(to_np, payload,
                                           is_leaf=_is_record), f)
    return stats


def load_quantized(path: str) -> Any:
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    payload["params"] = dequantize_params(payload["params"])
    return payload


def quantize_for_decode(variables: Any, min_size: int = 65536) -> Any:
    """Prepare variables for weight-only int8 DECODE serving: large matmul
    kernels become jit-friendly ``{"q": int8, "scale": f32}`` records (no
    dtype strings), everything else passes through. Pass the result as
    ``variables`` to ``PinkModel.generate`` / ``M2Omni.generate`` — the
    decode loop dequantizes per step behind an optimization barrier, so the
    per-token HBM weight read is int8 (measured +67% tokens/s on the 1.3 B
    preset, BASELINE.md round 3)."""
    qtree, _ = quantize_params(variables, min_size=min_size)

    def strip(node):
        if _is_record(node):
            return {"q": node["q"], "scale": node["scale"]}
        return node

    return jax.tree_util.tree_map(strip, qtree, is_leaf=_is_record)


def is_decode_quantized(tree: Any) -> bool:
    found = [False]

    def probe(node):
        if isinstance(node, dict) and set(node) == {"q", "scale"}:
            found[0] = True
        return node

    jax.tree_util.tree_map(
        probe, tree,
        is_leaf=lambda n: isinstance(n, dict) and set(n) == {"q", "scale"})
    return found[0]


def dequantize_for_compute(tree: Any, dtype) -> Any:
    """Jit-traceable inverse of ``quantize_for_decode``: records → dtype
    kernels. Call inside the decode step on
    ``jax.lax.optimization_barrier(tree)`` to stop XLA hoisting the convert
    out of the loop (which would re-materialize full-width weights)."""

    def rec(n):
        return isinstance(n, dict) and set(n) == {"q", "scale"}

    return jax.tree_util.tree_map(
        lambda n: (n["q"].astype(dtype) * n["scale"].astype(dtype))
        if rec(n) else n, tree, is_leaf=rec)


def make_live_vars(variables: Any, dtype) -> Callable[[bool], Any]:
    """One helper for every int8 decode caller (Pink / M2Omni generate,
    bench_decode): returns ``live_vars(step_mode)`` which passes
    un-quantized variables through unchanged, and for quantized trees
    dequantizes to ``dtype`` — behind ``jax.lax.optimization_barrier`` when
    ``step_mode`` so XLA cannot hoist the convert out of a decode loop."""
    quantized = is_decode_quantized(variables)

    def live_vars(step_mode: bool = False) -> Any:
        if not quantized:
            return variables
        src = jax.lax.optimization_barrier(variables) if step_mode \
            else variables
        return dequantize_for_compute(src, dtype)

    return live_vars
