"""General helpers: parameter grouping, indexing, package info.

Reference parity: ``/root/reference/antmmf/utils/general.py`` —
``get_optimizer_parameters:143``, ``get_bert_configured_parameters:343``,
``batched_index_select:500``, ``get_package_version:557``, ``lr_lambda_update:27``
(the schedule lives in optimizer/build.py), ``clip_gradients:47`` (optax chain).
"""

from __future__ import annotations

import importlib
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def batched_index_select(
    values: jnp.ndarray,  # [B, L, ...]
    indices: jnp.ndarray,  # int[B, K]
) -> jnp.ndarray:
    """Select rows per batch element (reference general.py:500)."""
    return jax.vmap(lambda v, i: v[i])(values, indices)


def get_bert_configured_parameters(
    params: Mapping, lr: Optional[float] = None, weight_decay: float = 0.01,
) -> List[Dict[str, Any]]:
    """BERT-style grouping descriptor: {decay, no-decay} × lr — consumed by
    optimizer build (optax masks). Returns the group spec as data (the optax
    transform is built in optimizer/build.py)."""
    no_decay_keys = []
    decay_keys = []
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "bias" in name or "norm" in name or "embedding" in name:
            no_decay_keys.append(name)
        else:
            decay_keys.append(name)
    groups = [
        {"keys": decay_keys, "weight_decay": weight_decay},
        {"keys": no_decay_keys, "weight_decay": 0.0},
    ]
    if lr is not None:
        for g in groups:
            g["lr"] = lr
    return groups


def get_package_version(name: str) -> Optional[str]:
    try:
        mod = importlib.import_module(name)
        return getattr(mod, "__version__", None)
    except ImportError:
        return None


def get_absolute_path(path: str, roots: Sequence[str] = (".",)) -> str:
    if os.path.isabs(path) and os.path.exists(path):
        return path
    for root in roots:
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return os.path.abspath(cand)
    return path


def count_parameters(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def nested_to_host(tree: Any) -> Any:
    """Device pytree → numpy pytree (the reference's nested_cpu offload)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def get_overlap_score(candidate: str, target: str) -> float:
    """Word-level overlap |cand ∩ target| / |target| (reference
    general.py:180-210 — used by soft-copy answer scoring)."""
    cand = str(candidate).lower().split()
    tgt = str(target).lower().split()
    if not tgt:
        return 0.0
    overlap = sum(1 for w in tgt if w in cand)
    return overlap / len(tgt)


def dict_to_string(dictionary) -> str:
    """k: v, ... logging format (reference general.py:166-178)."""
    logs = []
    for key, val in dictionary.items():
        if isinstance(val, float):
            logs.append(f"{key}: {val:.4f}")
        else:
            logs.append(f"{key}: {val}")
    return ", ".join(logs)


def flatten_list(nested) -> list:
    """[[a, b], [c]] → [a, b, c] (reference general.py:526-536)."""
    out = []
    for item in nested:
        if isinstance(item, (list, tuple)):
            out.extend(flatten_list(item))
        else:
            out.append(item)
    return out


def is_module_available(name: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(name) is not None


def check_required_keys(mapping, required_keys=()) -> bool:
    return all(k in mapping for k in required_keys)


def jsonl_dump(rows, filepath: str, append: bool = False) -> str:
    import json

    mode = "a" if append else "w"
    with open(filepath, mode, encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    return filepath


class AttrDict(dict):
    """dict with attribute access (reference general.py:306-341)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value
