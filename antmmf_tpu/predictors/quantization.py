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

    from antmmf_tpu.ops.pallas.int4_matmul import (
        _pick_tiles, best_group, pack_int4, pad_rows_for_kernel)

    def quant4(path, leaf):
        arr = np.asarray(leaf)
        pstr = _path_str(path)
        if not _is_quantizable(pstr, arr, min_size, exclude):
            return leaf
        # per-kernel group: the largest ≤ requested the Pallas GEMV can
        # serve (it must divide in/2); group is inferable downstream from
        # the scale shape. QuantDense-routed kernels whose input dim has no
        # legal tiling (5504-row down_proj) are ZERO-PADDED to the nearest
        # servable width (5632, +2.3%) — reads stay 4-bit instead of
        # falling back to a full-width XLA unpack inside the decode loop;
        # int4_apply pads the activations to match. Non-routed records
        # must keep their true shape (their consumers dequantize).
        g = best_group(arr.shape[0], arr.shape[1],
                       group) if arr.ndim == 2 else None
        if (g is not None and _pick_tiles(arr.shape[0], arr.shape[1], g)
                is None and _QDENSE_PATH_RE.search(pstr)):
            fin_pad = pad_rows_for_kernel(arr.shape[0], arr.shape[1], group)
            if fin_pad is not None:
                arr = np.concatenate(
                    [arr, np.zeros((fin_pad - arr.shape[0], arr.shape[1]),
                                   arr.dtype)], axis=0)
                g = best_group(fin_pad, arr.shape[1], group)
        if g is None:
            # conv kernels / odd shapes: int8 per-channel fallback
            flat = arr.reshape(-1, arr.shape[-1]).astype(np.float32)
            scale = np.maximum(np.abs(flat).max(axis=0), 1e-12) / 127.0
            q = np.clip(np.round(arr.astype(np.float32) / scale),
                        -127, 127).astype(np.int8)
            return {"q": q, "scale": scale.astype(np.float32)}
        # global top/bottom-half nibble packing, NOT even/odd: unpack is a
        # layout-preserving CONCAT that fuses into the dot (an interleave
        # needs a transpose-shaped reshape XLA cannot fuse — measured 6x
        # slower than bf16), and the same bytes feed the Pallas decode GEMV
        # (ops/pallas/int4_matmul.py) via make_live_vars' sibling routing
        packed, scale = pack_int4(arr, group=g)
        return {"q4": packed, "scale": scale}

    return jax.tree_util.tree_map_with_path(
        quant4, variables, is_leaf=lambda x: hasattr(x, "dtype"))


def synth_quantized_like(shape_tree: Any, min_size: int = 65536,
                         bits: int = 4, group: int = 128,
                         seed: int = 0) -> Any:
    """Build a ``quantize_for_decode``-shaped tree of random weights
    DIRECTLY from a ``jax.eval_shape`` tree — no full-precision weights are
    ever materialized, on host or device. For serving-capacity benches of
    models whose bf16 params exceed one chip's HBM (omni_7b bf16 = 13.8 GB
    vs v5e 16 GB; int4 = 3.5 GB): throughput is real, tokens are noise.

    Reference role: the capacity claim behind prj/M2_omni's 7B-class
    serving — the reference needs A100-80GB-class cards for fp16."""
    if bits != 4:
        raise ValueError("synth trees are int4-only")
    rng = np.random.default_rng(seed)
    exclude = re.compile(r"(norm|embed|logit_scale)")
    from antmmf_tpu.ops.pallas.int4_matmul import (
        _pick_tiles, best_group, pad_rows_for_kernel)

    def make(path, sds):
        shape, dtype = tuple(sds.shape), np.dtype(sds.dtype)
        pstr = _path_str(path)
        quantizable = (np.issubdtype(dtype, np.floating) and len(shape) >= 2
                       and int(np.prod(shape)) >= min_size
                       and not exclude.search(pstr))
        if not quantizable:
            if np.issubdtype(dtype, np.floating):
                return (rng.standard_normal(shape) * 0.02).astype(dtype)
            return np.zeros(shape, dtype)
        g = best_group(shape[0], shape[1], group) if len(shape) == 2 \
            else None
        if (g is not None and _pick_tiles(shape[0], shape[1], g) is None
                and _QDENSE_PATH_RE.search(pstr)):
            fin_pad = pad_rows_for_kernel(shape[0], shape[1], group)
            if fin_pad is not None:  # row-padded like quantize_for_decode
                shape = (fin_pad, shape[1])
                g = best_group(fin_pad, shape[1], group)
        if g is None:  # conv/odd shapes: int8 per-channel record
            q = rng.integers(-127, 128, size=shape).astype(np.int8)
            return {"q": q, "scale": np.full(shape[-1], 2e-4, np.float32)}
        fin, fout = shape
        lo = rng.integers(1, 16, size=(fin // 2, fout)).astype(np.uint8)
        hi = rng.integers(1, 16, size=(fin // 2, fout)).astype(np.uint8)
        # small scales keep 32-layer activations finite under random init
        scale = (rng.uniform(0.5, 1.5, size=(fin // g, fout)) * 2e-4
                 ).astype(np.float32)
        return {"q4": lo | (hi << 4), "scale": scale}

    return jax.tree_util.tree_map_with_path(make, shape_tree)


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
            # top/bottom-half packing → concat, layout-preserving (see
            # pack_int4); every op here fuses like the int8 path
            from antmmf_tpu.ops.pallas.int4_matmul import unpack_int4

            return unpack_int4(n["q4"], n["scale"], dtype)
        return n

    return jax.tree_util.tree_map(
        dq, tree, is_leaf=lambda n: _is_q8(n) or _is_q4(n))


# modules whose matmul is a QuantDense (modules/qdense.py) and can consume
# packed int4 siblings directly — the Pallas GEMV then reads 4-bit weights
# from HBM instead of a dequantized full-width materialization. Identified
# by the DecoderLM scope chain (".../decoder/.../attention/{q,k,v,o}_proj"
# or ".../mlp/{gate,up,down}_proj") — vision towers reuse the
# "attention/q_proj" names with plain nn.Dense but never sit under a
# "decoder" scope (caption decoders name theirs self_/cross_attention)
_QDENSE_PARENTS = {
    "attention": re.compile(r"^[qkvo]_proj$"),
    "mlp": re.compile(r"^(?:gate|up|down)_proj$"),
}
# quantize-time mirror of the routing above (full-path form): kernels at
# these paths may be row-padded for the GEMV — their QuantDense consumer
# pads activations to match; anything else must keep its true shape
_QDENSE_PATH_RE = re.compile(
    r"decoder/.*(?:attention/[qkvo]_proj|mlp/(?:gate|up|down)_proj)"
    r"/kernel$|(?:^|/)lm_head/kernel$")


def _route_q4_siblings(tree: Any, in_decoder: bool = False,
                       parent: str = "") -> Any:
    """{"q4","scale"} records under QuantDense kernels become sibling
    arrays ``kernel_q4`` / ``kernel_scale`` the module consumes directly;
    records elsewhere (lm_head, vision) are left for
    ``dequantize_for_compute``."""
    import collections.abc
    if (not isinstance(tree, collections.abc.Mapping) or _is_q4(tree)
            or _is_q8(tree)):
        return tree
    out = {}
    for key, val in tree.items():
        key = str(key)
        if (((in_decoder and parent in _QDENSE_PARENTS
              and _QDENSE_PARENTS[parent].match(key))
             or key == "lm_head")  # vocab projection is a QuantDense too
                and isinstance(val, collections.abc.Mapping)
                and _is_q4(val.get("kernel"))):
            out[key] = {
                "kernel_q4": val["kernel"]["q4"],
                "kernel_scale": val["kernel"]["scale"],
                **{str(k): v for k, v in val.items() if k != "kernel"},
            }
        else:
            out[key] = _route_q4_siblings(
                val, in_decoder or key == "decoder", key)
    return out


def make_live_vars(variables: Any, dtype) -> Callable[[bool], Any]:
    """One helper for every quantized decode caller (Pink / M2Omni
    generate, bench_decode, serving engine): returns ``live_vars(step_mode)``
    which passes un-quantized variables through unchanged, and for
    quantized trees dequantizes to ``dtype`` — behind
    ``jax.lax.optimization_barrier`` when ``step_mode`` so XLA cannot hoist
    the convert out of a decode loop. int4 records under QuantDense modules
    stay PACKED (sibling routing above): the module's Pallas GEMV
    dequantizes in-register, so the per-token HBM weight read is 4-bit."""
    quantized = is_decode_quantized(variables)

    def live_vars(step_mode: bool = False) -> Any:
        if not quantized:
            return variables
        src = _route_q4_siblings(variables)
        src = jax.lax.optimization_barrier(src) if step_mode else src
        return dequantize_for_compute(src, dtype)

    return live_vars
