"""Model inspection: parameter summaries and sharding reports.

Reference parity: ``/root/reference/antmmf/utils/inspector.py`` (179 LoC).
"""

from __future__ import annotations

from typing import Any, List

import jax
import numpy as np


def parameter_summary(params: Any, max_rows: int = 200) -> str:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    rows: List[str] = []
    total = 0
    for path, leaf in flat[:max_rows]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        rows.append(f"{name:<70} {str(getattr(leaf, 'shape', ())):>20} "
                    f"{str(dtype):>10} {n:>12,}")
    if len(flat) > max_rows:
        rows.append(f"... {len(flat) - max_rows} more")
        total = sum(int(np.prod(l.shape)) for _, l in flat)
    rows.append(f"{'TOTAL':<70} {'':>20} {'':>10} {total:>12,}")
    return "\n".join(rows)


def sharding_report(tree: Any, max_rows: int = 100) -> str:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    rows: List[str] = []
    for path, leaf in flat[:max_rows]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", sharding)
        rows.append(f"{name:<70} {str(spec)}")
    return "\n".join(rows)


def find_anomalies(tree: Any) -> List[str]:
    """Leaves containing NaN/Inf (debug aid; host-side)."""
    problems = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(jax.device_get(leaf))
        if not np.isfinite(arr).all():
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            problems.append(f"{name}: {np.isnan(arr).sum()} NaN, "
                            f"{np.isinf(arr).sum()} Inf")
    return problems
