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
