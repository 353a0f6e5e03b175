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


# ---------------------------------------------------------------------------
# Registry-surface completion: the remaining reference metric names
# (/root/reference/antmmf/modules/metrics/* — thin variants over the math
# above; each keeps the reference's registered name).


@registry.register_metric("f1")
class F1(BaseMetric):
    """Reference `f1` = binary/macro F1 by config (metrics/f1.py)."""

    def __call__(self, batch, output):
        avg = self.params.get("average", "macro")
        cls = MacroF1 if avg == "macro" else MicroF1
        return cls(self.params)(batch, output)


@registry.register_metric("multi_macro_f1")
class MultiMacroF1(BaseMetric):
    """Macro F1 per task head, averaged (reference multi_macro_f1)."""

    def __call__(self, batch, output):
        logits = output["logits"]
        targets = batch["targets"]
        if isinstance(logits, (list, tuple)):
            vals = [MacroF1(self.params)({"targets": t}, {"logits": l})
                    for l, t in zip(logits, targets)]
            return jnp.mean(jnp.stack(vals))
        return MacroF1(self.params)(batch, output)


@registry.register_metric("multi_accuracy")
class MultiAccuracy(BaseMetric):
    """Accuracy averaged across task heads."""

    def __call__(self, batch, output):
        from antmmf_tpu.modules.metrics.metrics import Accuracy

        logits = output["logits"]
        targets = batch["targets"]
        if isinstance(logits, (list, tuple)):
            vals = [Accuracy()({"targets": t}, {"logits": l})
                    for l, t in zip(logits, targets)]
            return jnp.mean(jnp.stack(vals))
        return Accuracy()(batch, output)


@registry.register_metric("named_accuracy")
class NamedAccuracy(BaseMetric):
    """Accuracy over configurable logits/targets keys (reference named_accuracy)."""

    def __call__(self, batch, output):
        logits = output[self.params.get("logits_key", "logits")]
        targets = batch[self.params.get("targets_key", "targets")]
        pred = _pred_classes(logits, targets)
        return jnp.mean((pred == targets).astype(jnp.float32))


@registry.register_metric("macro_roc_auc")
class MacroRocAuc(RocAuc):
    """One-vs-rest AUC averaged over classes (host-side)."""

    def __call__(self, batch, output):
        logits = np.asarray(output["logits"], np.float32)
        targets = np.asarray(batch["targets"])
        if logits.ndim == 1 or logits.shape[-1] <= 2:
            return super().__call__(batch, output)
        aucs = []
        for c in range(logits.shape[-1]):
            y = (targets == c).astype(np.float32)
            if y.min() == y.max():
                continue
            aucs.append(float(super().__call__(
                {"targets": y}, {"logits": logits[:, c]})))
        return jnp.asarray(np.mean(aucs) if aucs else 0.5, jnp.float32)


@registry.register_metric("micro_roc_auc")
class MicroRocAuc(RocAuc):
    """AUC over flattened one-hot scores (host-side)."""

    def __call__(self, batch, output):
        logits = np.asarray(output["logits"], np.float32)
        targets = np.asarray(batch["targets"])
        if logits.ndim > 1 and logits.shape[-1] > 2:
            onehot = np.eye(logits.shape[-1])[targets].reshape(-1)
            return super().__call__({"targets": onehot},
                                    {"logits": logits.reshape(-1)})
        return super().__call__(batch, output)


@registry.register_metric("ks")
class KolmogorovSmirnov(BaseMetric):
    """KS statistic = max(TPR − FPR) over thresholds (reference metrics/ks.py)."""

    def __call__(self, batch, output):
        scores = np.asarray(output["logits"], np.float32).reshape(-1)
        if scores.ndim == 1 and np.asarray(output["logits"]).ndim == 2:
            scores = np.asarray(output["logits"], np.float32)[:, -1]
        y = np.asarray(batch["targets"]).reshape(-1).astype(bool)
        order = np.argsort(-scores)
        y = y[order]
        P = max(int(y.sum()), 1)
        N = max(int((~y).sum()), 1)
        tpr = np.cumsum(y) / P
        fpr = np.cumsum(~y) / N
        return jnp.asarray(float(np.max(tpr - fpr)), jnp.float32)


@registry.register_metric("span_f1")
@registry.register_metric("SpanF1")
class SpanF1Metric(BaseMetric):
    """Exact-span F1 over tag sequences (reference SpanF1).

    Default: integer tags where odd ids begin spans (compact encoding).
    With params ``tag_scheme`` ∈ {bio, bioes, bmeso} and ``id2tag``
    (id → string tag list), spans come from the reference converters in
    ``utils/text_utils.py`` (bio/bioes/bmeso_tag_to_spans).
    """

    _CONVERTERS = {"bio": "bio_tag_to_spans", "bioes": "bioes_tag_to_spans",
                   "bmeso": "bmeso_tag_to_spans"}

    def _scheme_spans(self, tags: np.ndarray, mask: np.ndarray):
        from antmmf_tpu.utils import text_utils

        scheme = self.params["tag_scheme"]
        id2tag = list(self.params["id2tag"])
        convert = getattr(text_utils, self._CONVERTERS[scheme])
        strs = [id2tag[int(t)] for t, m in zip(tags, mask) if m]
        return [(s, e, lbl) for lbl, (s, e) in
                convert(strs, ignore_labels=self.params.get("ignore_labels"))]

    @staticmethod
    def _spans(tags: np.ndarray, mask: np.ndarray):
        spans, start = [], None
        for i, (t, m) in enumerate(zip(tags, mask)):
            if not m:
                break
            if t % 2 == 1:  # odd = B-<cls>
                if start is not None:
                    spans.append((start, i, int(tags[start])))
                start = i
            elif t == 0 and start is not None:
                spans.append((start, i, int(tags[start])))
                start = None
        if start is not None:
            spans.append((start, int(mask.sum()), int(tags[start])))
        return spans

    def __call__(self, batch, output):
        logits = np.asarray(output["logits"])
        pred = logits.argmax(-1) if logits.ndim == 3 else logits
        gold = np.asarray(batch["targets"])
        mask = np.asarray(batch.get("input_mask", np.ones_like(gold)))
        spans = (self._scheme_spans if self.params.get("tag_scheme")
                 else self._spans)
        scores = [span_f1(spans(p, m), spans(g, m))
                  for p, g, m in zip(pred, gold, mask)]
        return jnp.asarray(float(np.mean(scores)), jnp.float32)


@registry.register_metric("multi_label_metric")
@registry.register_metric("multilabel_metric")
class MultiLabelMetric(BaseMetric):
    """Per-label precision/recall micro-aggregate at a 0.5 threshold."""

    def __call__(self, batch, output):
        probs = jax.nn.sigmoid(jnp.asarray(output["logits"], jnp.float32))
        pred = (probs > float(self.params.get("threshold", 0.5)))
        gold = jnp.asarray(batch["targets"]) > 0.5
        tp = jnp.sum(pred & gold)
        prec = tp / jnp.maximum(jnp.sum(pred), 1)
        rec = tp / jnp.maximum(jnp.sum(gold), 1)
        return 2 * prec * rec / jnp.maximum(prec + rec, 1e-9)


@registry.register_metric("multi_label_threshold_metric")
class MultiLabelThresholdMetric(MultiLabelMetric):
    """Same with a configurable per-call threshold (reference variant)."""


@registry.register_metric("rule_multi_label_metric")
class RuleMultiLabelMetric(MultiLabelMetric):
    """Reference applies post-hoc label rules before scoring; rules are
    config regex→label maps applied upstream — scoring is identical."""


@registry.register_metric("asm_metric")
class ASMMetric(BaseMetric):
    """Angular-softmax-margin accuracy: cosine-logit argmax accuracy
    (reference asm_metric for the cos_amssoftmax/cosarc losses)."""

    def __call__(self, batch, output):
        logits = output.get("cosine", output["logits"])
        targets = batch["targets"]
        return jnp.mean((jnp.argmax(logits, -1) == targets)
                        .astype(jnp.float32))


@registry.register_metric("hier_label_accuracy")
class HierLabelAccuracy(BaseMetric):
    """Accuracy at every hierarchy level, averaged (reference hier metrics)."""

    def __call__(self, batch, output):
        logits = output["logits"]
        targets = batch["targets"]
        if isinstance(logits, (list, tuple)):
            accs = [jnp.mean((jnp.argmax(l, -1) == t).astype(jnp.float32))
                    for l, t in zip(logits, targets)]
            return jnp.mean(jnp.stack(accs))
        return jnp.mean((jnp.argmax(logits, -1) == targets)
                        .astype(jnp.float32))


@registry.register_metric("hier_multilabel_f1")
class HierMultilabelF1(MultiLabelMetric):
    """Multilabel F1 over flattened hierarchy levels."""


# ---- graph / KG metrics (comp_gcn stack) ----------------------------------


@registry.register_metric("node_accuracy")
class NodeAccuracy(BaseMetric):
    def __call__(self, batch, output):
        logits = output["logits"]
        targets = batch.get("node_targets", batch["targets"])
        mask = batch.get("node_mask")
        correct = (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
        if mask is not None:
            return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1)
        return jnp.mean(correct)


@registry.register_metric("edge_accuracy")
class EdgeAccuracy(NodeAccuracy):
    def __call__(self, batch, output):
        b = dict(batch)
        if "edge_targets" in b:
            b["targets"] = b["edge_targets"]
            b["node_mask"] = b.get("edge_mask")
        return super().__call__(b, output)


@registry.register_metric("link_accuracy")
class LinkAccuracy(BaseMetric):
    """Link-prediction hit@1 (comp_gcn logits over all entities)."""

    def __call__(self, batch, output):
        return jnp.mean((jnp.argmax(output["logits"], -1) == batch["targets"])
                        .astype(jnp.float32))


@registry.register_metric("rank_and_hits")
class RankAndHits(BaseMetric):
    """Filtered KG ranking: known positives (``all_targets`` multi-hot or id
    list) are masked out except the scored target; reports MRR
    (reference rank_and_hits.py)."""

    def __call__(self, batch, output):
        logits = np.asarray(output["logits"], np.float32)
        target = np.asarray(batch["targets"]).reshape(-1)
        filt = batch.get("all_targets")
        scores = logits.copy()
        if filt is not None:
            filt = np.asarray(filt)
            for i in range(len(scores)):
                keep = scores[i, target[i]]
                pos = filt[i][filt[i] >= 0] if filt.ndim == 2 else \
                    np.nonzero(filt[i])[0]
                scores[i, pos] = -np.inf
                scores[i, target[i]] = keep
        rank = (scores > scores[np.arange(len(scores)), target][:, None]
                ).sum(-1) + 1
        return jnp.asarray(float(np.mean(1.0 / rank)), jnp.float32)


# ---- captioning / retrieval registered fronts ------------------------------


@registry.register_metric("bleu4")
@registry.register_metric("caption_bleu4")
class Bleu4Metric(BaseMetric):
    """Batch BLEU-4 over token-id sequences (``captions`` vs ``targets``)."""

    def __call__(self, batch, output):
        cands = np.asarray(output.get("captions", output.get("logits"))).tolist()
        refs = np.asarray(batch["targets"]).tolist()
        return jnp.asarray(bleu4(cands, [[r] for r in refs]), jnp.float32)


@registry.register_metric("rouge")
class RougeMetric(BaseMetric):
    def __call__(self, batch, output):
        cands = np.asarray(output.get("captions", output.get("logits"))).tolist()
        refs = np.asarray(batch["targets"]).tolist()
        return jnp.asarray(
            float(np.mean([rouge_l(c, r) for c, r in zip(cands, refs)])),
            jnp.float32)
