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


def updir(d: str, n: int) -> str:
    """Go up n directory levels from path d (reference general.py:211)."""
    for _ in range(n):
        d = os.path.dirname(d)
    return d


def extract_file(path: str, output_dir: str = ".") -> str:
    """Extract a zip/tar(.gz|.bz2) archive into output_dir (ref general.py:237)."""
    import tarfile
    import zipfile

    name = os.path.abspath(path).lower()
    if name.endswith(".zip"):
        with zipfile.ZipFile(path, "r") as f:
            f.extractall(output_dir)
    elif name.endswith((".tar.gz", ".tgz")):
        with tarfile.open(path, "r:gz") as f:
            f.extractall(output_dir)
    elif name.endswith((".tar.bz2", ".tbz")):
        with tarfile.open(path, "r:bz2") as f:
            f.extractall(output_dir)
    elif name.endswith(".tar"):
        with tarfile.open(path, "r:") as f:
            f.extractall(output_dir)
    else:
        raise ValueError(f"unsupported archive type: {path}")
    return output_dir


def iterative_support(func, query):
    """Apply func element-wise through nested lists/tuples (ref general.py:260)."""
    if isinstance(query, (list, tuple, set)):
        return [iterative_support(func, q) for q in query]
    return func(query)


def transform_to_batch_sequence(tensor):
    """[B, L] passthrough; [B, N, L] → [B*N, L] (reference general.py:391)."""
    if tensor is None:
        return None
    if tensor.ndim == 2:
        return tensor
    assert tensor.ndim == 3
    return tensor.reshape(-1, tensor.shape[-1])


def transform_to_batch_sequence_dim(tensor):
    """[B, L, D] passthrough; [B, N, L, D] → [B*N, L, D] (ref general.py:402)."""
    if tensor is None:
        return None
    if tensor.ndim == 3:
        return tensor
    assert tensor.ndim == 4
    return tensor.reshape(-1, tensor.shape[-2], tensor.shape[-1])


def ckpt_name_from_core_args(config) -> str:
    """'<tasks>_<models>[_<seed>]' run name (reference general.py:71)."""
    name = "{}_{}".format(
        "-".join(config.get("task_attributes", {}).keys()),
        "-".join(config.get("model_attributes", {}).keys()))
    seed = config.get("training_parameters", {}).get("seed")
    if seed is not None:
        name += f"_{int(seed):d}"
    return name


def foldername_from_config_override(args) -> str:
    """Flatten --config_override into a filesystem-safe suffix (ref :85)."""
    import yaml

    override = getattr(args, "config_override", None)
    if override is None and isinstance(args, Mapping):
        override = args.get("config_override")
    if not override:
        return ""
    text = yaml.safe_dump(override, default_flow_style=True)
    text = text.replace(":", ".").replace("\n", " ").replace("/", "_")
    text = " ".join(text.split()).replace(". ", ".").replace(" ", "_")
    return "_" + text


def get_current_arrays(max_rows: int = 50) -> List[str]:
    """Live device arrays summary (analogue of ref get_current_tensors:226)."""
    rows = []
    for arr in jax.live_arrays():
        rows.append(f"{arr.dtype} {tuple(arr.shape)}")
        if len(rows) >= max_rows:
            break
    return rows


def print_device_usage() -> Dict[str, float]:
    """Per-device HBM usage in MiB (analogue of ref print_cuda_usage:219)."""
    out: Dict[str, float] = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = stats.get("bytes_in_use", 0) / (1024 * 1024)
    for name, mib in out.items():
        print(f"{name}: {mib:.1f} MiB in use")
    return out
