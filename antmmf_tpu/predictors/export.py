"""Serving export: jax.export → serialized StableHLO.

Replaces the reference's ONNX path (``BaseModel.forward_graph``,
``/root/reference/antmmf/models/base_model.py:117-131``): the jitted serving
forward is lowered once and serialized as portable StableHLO bytes that any
XLA runtime (TPU/CPU/GPU serving fleet) can load without Python.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def export_serving_fn(
    apply_fn,
    variables: Any,
    example_batch: Mapping[str, np.ndarray],
    out_path: Optional[str] = None,
):
    """Lower ``apply_fn(variables, batch)`` with baked-in weights; returns the
    jax.export.Exported object (and writes serialized bytes when out_path)."""
    from jax import export as jexport

    def serving(batch):
        return apply_fn(variables, batch)

    args = {k: jnp.asarray(v) for k, v in example_batch.items()}
    exported = jexport.export(jax.jit(serving))(args)
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "wb") as f:
            f.write(exported.serialize())
    return exported


def load_serving_fn(path: str):
    """Deserialize an exported serving function; call(batch) runs it."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def export_decode_programs(
    model,
    variables: Any,
    example_batch: Mapping[str, np.ndarray],
    cache: Any,
    lens: np.ndarray,
    dtype=jnp.bfloat16,
    out_prefix: Optional[str] = None,
) -> Dict[str, Any]:
    """Export the KV-cache generation pair — ``prefill(variables, batch,
    cache, lens) -> (logits, cache)`` and ``decode_step(variables, token,
    pos, cache) -> (logits, cache)`` — as serialized StableHLO.

    Unlike the encoder export above, WEIGHTS ARE ARGUMENTS: baking a 1-7B
    parameter tree into the HLO as constants is unusable (multi-GB programs;
    see CLAUDE.md on the compile relay), and argument weights mean one
    exported program serves full-precision, int8, and int4-packed trees of
    the same structure at the caller's choice. Quantized trees export the
    dequant/routing graph (``make_live_vars``) inside the program.

    The reference ships no decode export at all — its serving path is
    Python-side HF ``generate`` (prj/Pink/pink/eval/model_vqav2.py:141);
    its ONNX exporter (base_model.py:117-131) covers encoder forwards only.

    Writes ``<out_prefix>.prefill.shlo`` / ``<out_prefix>.decode.shlo``;
    returns the two Exported objects keyed "prefill"/"decode".
    """
    from jax import export as jexport

    from antmmf_tpu.predictors.quantization import make_live_vars

    cls = type(model)

    def prefill(variables, batch, cache, lens):
        live = make_live_vars(variables, dtype)
        return model.apply(live(), batch, cache, lens, method=cls.prefill)

    def decode_step(variables, token, pos, cache):
        live = make_live_vars(variables, dtype)
        return model.apply(live(step_mode=True), token, pos, cache,
                           method=cls.decode_step)

    batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
    B = int(np.asarray(lens).shape[0])
    tok = jnp.zeros((B,), jnp.int32)
    pos = jnp.asarray(lens, jnp.int32)
    exported = {
        "prefill": jexport.export(jax.jit(prefill))(
            variables, batch, cache, jnp.asarray(lens, jnp.int32)),
        "decode": jexport.export(jax.jit(decode_step))(
            variables, tok, pos, cache),
    }
    if out_prefix:
        os.makedirs(os.path.dirname(os.path.abspath(out_prefix)),
                    exist_ok=True)
        for name, exp in exported.items():
            with open(f"{out_prefix}.{name}.shlo", "wb") as f:
                f.write(exp.serialize())
    return exported
