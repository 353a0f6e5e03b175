"""Tensor-parallel serving for the KV-cache LLM family (Pink / M2-omni).

The reference serves each MLLM on one GPU through HF ``model.generate``
(prj/Pink/pink/eval/model_vqav2.py:141) — a 7B bf16 decoder (~14 GB weights)
simply doesn't fit a single v5e chip's HBM, and even where it fits, decode is
weight-read-bound so splitting the per-step HBM read across chips is a direct
latency win. This module makes any ``generate``/``prefill``/``decode_step``
model tensor-parallel WITHOUT touching model code, the GSPMD way:

* Megatron-style path-regex rules shard the decoder weights over the mesh's
  ``model`` axis — attention q/k/v and MLP gate/up split on their OUTPUT
  features (head-parallel), o_proj/down_proj on their INPUT features (so the
  only collective per block is one psum after each of the two projections),
  and the lm_head on vocab. Everything else (embeddings, norms, vision/audio
  towers, LoRA adapters) replicates.
* ``shard_variables_for_serving`` just ``device_put``s the variables with
  those shardings. The existing jitted generate/prefill/decode programs are
  reused untouched: XLA's sharding propagation carries the head split through
  the attention math, shards the KV cache it creates on the heads dim, and
  inserts the psums — no spmd code in the model.

Non-divisible dims (e.g. GQA n_kv smaller than the axis) auto-relax to
replication via ``relax_to_divisible``, so the same rules serve every preset.

Tokens are bit-identical to single-device serving (regression-tested on the
8-device CPU mesh in tests/test_tp_serving.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh

from antmmf_tpu.parallel.partitioning import (
    infer_param_specs,
    named_shardings,
    relax_to_divisible,
)

# Megatron-LM column/row split, matching BOTH transformer families by their
# param names:
#   DecoderLM blocks (modules/llm.py GQAttention + SwiGLU):
#     column-parallel (split output features = heads): q/k/v, gate/up
#     row-parallel (split input features, psum after): o_proj, down_proj
#   encoder towers (modules/attention.MultiHeadAttention + transformer MLP —
#   the ViT/BERT naming): q/k/v + fc1 column, out_proj + fc2 row
#   vocab-parallel lm_head (logit argmax/softmax psums over shards)
# Column-parallel biases shard with their output features; row-parallel
# biases replicate (added once after the psum).
LLM_TP_RULES = (
    (r".*/(q_proj|k_proj|v_proj|gate_proj|up_proj|fc1)/kernel$",
     (None, "model")),
    (r".*/(q_proj|k_proj|v_proj|gate_proj|up_proj|fc1)/bias$", ("model",)),
    (r".*/(o_proj|out_proj|down_proj|fc2)/kernel$", ("model", None)),
    (r".*/lm_head/kernel$", (None, "model")),
    (r".*", None),
)


def serving_shardings(variables: Any, mesh: Mesh,
                      rules: Optional[Any] = None) -> Any:
    """NamedSharding tree for a model's ``variables`` under TP serving."""
    rules = tuple(rules) if rules else LLM_TP_RULES
    specs = infer_param_specs(variables, rules)
    specs = relax_to_divisible(specs, variables, mesh)
    return named_shardings(specs, mesh)


def shard_variables_for_serving(variables: Any, mesh: Mesh,
                                rules: Optional[Any] = None) -> Any:
    """Place ``variables`` TP-sharded; the returned tree drops straight into
    ``model.generate(variables, batch)`` / the serving-engine adapters —
    committed input shardings flow into the already-jitted decode programs
    and GSPMD re-lowers them as SPMD over the mesh."""
    return jax.device_put(variables, serving_shardings(variables, mesh, rules))


def tp_serving_mesh(n_model: Optional[int] = None,
                    devices: Optional[Any] = None) -> Mesh:
    """A ("data", "model") serving mesh: ``n_model``-way tensor parallel,
    remaining devices on the batch axis. Default: all devices on model."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n_model = n_model or len(devices)
    if len(devices) % n_model:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"n_model={n_model}")
    grid = np.array(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(grid, ("data", "model"))
