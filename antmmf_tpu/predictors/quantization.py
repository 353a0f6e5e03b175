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


def quantize_for_decode(variables: Any, min_size: int = 65536,
                        bits: int = 8, group: int = 128) -> Any:
    """Prepare variables for weight-only DECODE serving: large matmul
    kernels become jit-friendly records, everything else passes through.
    Pass the result as ``variables`` to ``PinkModel.generate`` /
    ``M2Omni.generate`` — the decode loop dequantizes per step behind an
    optimization barrier, so the per-token HBM weight read is quantized
    (int8 measured +67% tokens/s on the 1.3 B preset, BASELINE.md round 3).

    ``bits=8``: symmetric per-output-channel int8, ``{"q", "scale"}``.
    ``bits=4``: symmetric GROUP-WISE int4 (one fp32 scale per ``group``
    input rows × output channel — per-channel alone is too coarse at 4
    bits), two values nibble-packed per byte along the input dim:
    ``{"q4": uint8 [in/2, out], "scale": f32 [in/group, out]}`` — halves
    the weight read again vs int8. Kernels whose input dim doesn't divide
    (2, group) fall back to int8. Greedy tokens may differ from full
    precision (≈2.4% per-element error vs 0.4% at int8); serving-quality
    knob, measure on your eval set."""
    if bits == 8:
        qtree, _ = quantize_params(variables, min_size=min_size)

        def strip(node):
            if _is_record(node):
                return {"q": node["q"], "scale": node["scale"]}
            return node

        return jax.tree_util.tree_map(strip, qtree, is_leaf=_is_record)
    if bits != 4:
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    exclude = re.compile(r"(norm|embed|logit_scale)")

    def quant4(path, leaf):
        arr = np.asarray(leaf)
        if not _is_quantizable(_path_str(path), arr, min_size, exclude):
            return leaf
        if arr.ndim != 2 or arr.shape[0] % max(2, group):
            # conv kernels / odd shapes: int8 per-channel fallback
            flat = arr.reshape(-1, arr.shape[-1]).astype(np.float32)
            scale = np.maximum(np.abs(flat).max(axis=0), 1e-12) / 127.0
            q = np.clip(np.round(arr.astype(np.float32) / scale),
                        -127, 127).astype(np.int8)
            return {"q": q, "scale": scale.astype(np.float32)}
        fin, fout = arr.shape
        g = arr.astype(np.float32).reshape(fin // group, group, fout)
        scale = np.maximum(np.abs(g).max(axis=1), 1e-12) / 7.0  # [in/g, out]
        q = np.clip(np.round(g / scale[:, None]), -7, 7)
        q = (q.reshape(fin, fout) + 8).astype(np.uint8)  # [1..15]
        # pack row i with row i+in/2 (top/bottom halves, NOT even/odd):
        # unpack is then a layout-preserving CONCAT — an even/odd interleave
        # needs a transpose-shaped reshape that XLA cannot fuse into the
        # dot (measured 6x SLOWER than bf16; concat-unpack keeps the int8
        # path's fusion structure)
        half = fin // 2
        packed = q[:half] | (q[half:] << 4)  # [in/2, out] uint8
        return {"q4": packed, "scale": scale.astype(np.float32)}

    return jax.tree_util.tree_map_with_path(
        quant4, variables, is_leaf=lambda x: hasattr(x, "dtype"))


def _is_q8(n) -> bool:
    return isinstance(n, dict) and set(n) == {"q", "scale"}


def _is_q4(n) -> bool:
    return isinstance(n, dict) and set(n) == {"q4", "scale"}


def is_decode_quantized(tree: Any) -> bool:
    found = [False]

    def probe(node):
        if _is_q8(node) or _is_q4(node):
            found[0] = True
        return node

    jax.tree_util.tree_map(
        probe, tree, is_leaf=lambda n: _is_q8(n) or _is_q4(n))
    return found[0]


def dequantize_for_compute(tree: Any, dtype) -> Any:
    """Jit-traceable inverse of ``quantize_for_decode``: records → dtype
    kernels. Call inside the decode step on
    ``jax.lax.optimization_barrier(tree)`` to stop XLA hoisting the convert
    out of the loop (which would re-materialize full-width weights)."""
    import jax.numpy as jnp

    def dq(n):
        if _is_q8(n):
            return n["q"].astype(dtype) * n["scale"].astype(dtype)
        if _is_q4(n):
            packed, scale = n["q4"], n["scale"]
            fin = packed.shape[0] * 2
            fout = packed.shape[1]
            lo = (packed & jnp.uint8(0x0F)).astype(jnp.int8)
            hi = (packed >> jnp.uint8(4)).astype(jnp.int8)
            # top/bottom-half packing → concat, layout-preserving (see
            # quantize_for_decode); every op here fuses like the int8 path
            vals = jnp.concatenate([lo, hi], axis=0) - 8
            group = fin // scale.shape[0]
            w = (vals.astype(dtype).reshape(scale.shape[0], group, fout)
                 * scale.astype(dtype)[:, None])
            return w.reshape(fin, fout)
        return n

    return jax.tree_util.tree_map(
        dq, tree, is_leaf=lambda n: _is_q8(n) or _is_q4(n))


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
