"""Metric registry: batch-wise jittable metrics + the ``Metrics`` aggregator.

Reference parity: ``/root/reference/antmmf/modules/metrics/metrics.py:55-166`` —
two planes: batch-wise ``Metrics.__call__`` (attached to model output every step,
jittable here) vs corpus-level evaluators with ``collect/summarize`` (host-side;
see ``antmmf_tpu/modules/metrics/evaluators.py``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry


class BaseMetric:
    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})

    def __call__(self, batch: Mapping, output: Mapping) -> Optional[jnp.ndarray]:
        raise NotImplementedError


@registry.register_metric("accuracy")
class Accuracy(BaseMetric):
    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        if logits.ndim > targets.ndim:
            pred = jnp.argmax(logits, axis=-1)
        else:
            pred = (logits > 0).astype(targets.dtype)
        return (pred == targets).mean()


@registry.register_metric("topk_accuracy")
class TopKAccuracy(BaseMetric):
    def __call__(self, batch, output):
        k = int(self.params.get("k", 5))
        logits, targets = output["logits"], batch["targets"]
        topk = jax.lax.top_k(logits, k)[1]  # [B, k]
        return (topk == targets[:, None]).any(axis=-1).mean()


@registry.register_metric("binary_f1")
class BinaryF1(BaseMetric):
    """Batch-approximate F1 for binary logits/labels."""

    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        if logits.ndim > 1 and logits.shape[-1] == 2:
            pred = jnp.argmax(logits, -1)
        else:
            pred = (logits.reshape(-1) > 0).astype(jnp.int32)
        targets = targets.reshape(-1)
        tp = jnp.sum((pred == 1) & (targets == 1))
        fp = jnp.sum((pred == 1) & (targets == 0))
        fn = jnp.sum((pred == 0) & (targets == 1))
        return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)


@registry.register_metric("mm_retrieval_recall")
class MMRetrievalRecall(BaseMetric):
    """Rank of the diagonal in a text·videoᵀ sim matrix; params.topk ∈
    {1, 5, 10, "median-rank"} (reference mm_retrieval_recall.py:13-105)."""

    def __call__(self, batch, output):
        sim = output.get("sim", output.get("l1_simi"))
        if sim is None:
            return None
        topk = self.params.get("topk", 1)
        n = sim.shape[0]
        pos = jnp.diagonal(sim)[:, None]
        # rank = #entries strictly greater than the positive (0-based)
        rank = jnp.sum(sim > pos, axis=-1)
        if topk == "median-rank":
            return jnp.median(rank + 1).astype(jnp.float32)
        return (rank < int(topk)).mean()


def _register_mm_recall_variants():
    """The reference registers per-K fronts (mm_retrieval_recall.py:55-162)."""
    for k in (1, 5, 10):
        @registry.register_metric(f"mm_retrieval_recall@{k}")
        class _MMRecallK(MMRetrievalRecall):  # noqa: B023
            _k = k

            def __call__(self, batch, output):
                self.params = {**self.params, "topk": self._k}
                return MMRetrievalRecall.__call__(self, batch, output)

    @registry.register_metric("mm_retrieval_median_rank")
    class _MMMedianRank(MMRetrievalRecall):
        def __call__(self, batch, output):
            self.params = {**self.params, "topk": "median-rank"}
            return MMRetrievalRecall.__call__(self, batch, output)

    @registry.register_metric("global_retrieval_recall")
    class _GlobalRetrievalRecall(MMRetrievalRecall):
        """Batch-plane front for the corpus evaluator of the same name
        (evaluators.GlobalRetrievalRecallEvaluator owns the real multi-gt
        corpus computation; this reports in-batch diagonal R@1)."""


_register_mm_recall_variants()


class Metrics:
    """Aggregate configured batch metrics into a flat named dict."""

    def __init__(self, metric_configs: Optional[List] = None):
        self.entries = []
        for cfg in metric_configs or []:
            if isinstance(cfg, str):
                cfg = {"type": cfg}
            name = cfg.get("name", cfg["type"])
            cls = registry.get_metric_class(cfg["type"])
            self.entries.append((name, cls(cfg.get("params", {}))))

    def __call__(
        self, batch: Mapping, output: Mapping, prefix: str = ""
    ) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        for name, fn in self.entries:
            val = fn(batch, output)
            if val is not None:
                out[f"{prefix}{name}"] = val
        return out
