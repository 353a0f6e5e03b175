"""Corpus-level evaluators: host-side collect/summarize over a full eval set.

Reference parity: ``/root/reference/antmmf/modules/metrics/global_retrieval_recall.py``
(:31-66 accumulation, :105-160 multi-ground-truth min-rank R@K both directions —
the MSR-VTT parity anchor, SURVEY.md §8.4) and the ``collect/summarize`` plane of
``metrics/metrics.py:152-166``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np


class BaseEvaluator:
    def reset(self) -> None:
        raise NotImplementedError

    def collect(self, batch: Mapping, output: Mapping) -> None:
        raise NotImplementedError

    def summarize(self) -> Dict[str, float]:
        raise NotImplementedError


def _ranks_with_multi_gt(
    sim: np.ndarray, gt_lists: Sequence[Sequence[int]]
) -> np.ndarray:
    """Row i's rank = min rank over its ground-truth column set (0-based)."""
    order = np.argsort(-sim, axis=1)
    ranks = np.empty(sim.shape[0], dtype=np.int64)
    for i, gts in enumerate(gt_lists):
        gts = set(int(g) for g in gts)
        pos = np.nonzero(np.isin(order[i], list(gts)))[0]
        ranks[i] = int(pos.min()) if len(pos) else sim.shape[1] - 1
    return ranks


def recall_metrics(ranks: np.ndarray, prefix: str) -> Dict[str, float]:
    n = max(1, len(ranks))
    return {
        f"{prefix}r@1": float((ranks < 1).sum() / n * 100.0),
        f"{prefix}r@5": float((ranks < 5).sum() / n * 100.0),
        f"{prefix}r@10": float((ranks < 10).sum() / n * 100.0),
        f"{prefix}median_rank": float(np.median(ranks) + 1),
        f"{prefix}mean_rank": float(ranks.mean() + 1),
    }


class GlobalRetrievalRecallEvaluator(BaseEvaluator):
    """Accumulates text/video embeddings (or sim-matrix chunks) across eval
    batches, then computes t2v and v2t recalls with multi-gt min-rank."""

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})
        self.reset()

    def reset(self) -> None:
        self._text: List[np.ndarray] = []
        self._video: List[np.ndarray] = []
        self._t2v_gt: List[Sequence[int]] = []
        self._v2t_gt: List[Sequence[int]] = []
        self._vids: List[np.ndarray] = []

    def collect(self, batch: Mapping, output: Mapping) -> None:
        t = output.get("text_embed")
        v = output.get("visual_embed")
        if t is None or v is None:
            return
        self._text.append(np.asarray(t, dtype=np.float32))
        self._video.append(np.asarray(v, dtype=np.float32))
        meta = getattr(batch, "metadata", {}) if not isinstance(batch, dict) else {}
        if isinstance(batch, Mapping) and "image_vid" in batch:
            # unique-video id per row → dedupe + grouped gt in summarize
            self._vids.append(np.asarray(batch["image_vid"]).reshape(-1))
            return
        t2v = (batch.get("caption_vid_list") if isinstance(batch, Mapping) else None) \
            or meta.get("caption_vid_list")
        v2t = (batch.get("image_tid_list") if isinstance(batch, Mapping) else None) \
            or meta.get("image_tid_list")
        n_t_prev = sum(x.shape[0] for x in self._text[:-1])
        n_v_prev = sum(x.shape[0] for x in self._video[:-1])
        if t2v is not None:
            self._t2v_gt.extend(t2v)
        else:  # identity pairing: text i ↔ video i
            self._t2v_gt.extend([[n_v_prev + i] for i in range(self._video[-1].shape[0])])
        if v2t is not None:
            self._v2t_gt.extend(v2t)
        else:
            self._v2t_gt.extend([[n_t_prev + i] for i in range(self._text[-1].shape[0])])

    def summarize(self) -> Dict[str, float]:
        if not self._text:
            return {}
        t = np.concatenate(self._text)
        v = np.concatenate(self._video)
        if self._vids:
            # dedupe videos by id; build grouped multi-gt both directions
            vids = np.concatenate(self._vids)
            uniq_ids, first_idx = np.unique(vids, return_index=True)
            v = v[first_idx]
            col_of = {int(u): c for c, u in enumerate(uniq_ids)}
            self._t2v_gt = [[col_of[int(x)]] for x in vids]
            self._v2t_gt = [
                np.nonzero(vids == u)[0].tolist() for u in uniq_ids
            ]
        sim = t @ v.T
        out = recall_metrics(_ranks_with_multi_gt(sim, self._t2v_gt), "t2v-")
        out.update(recall_metrics(_ranks_with_multi_gt(sim.T, self._v2t_gt), "v2t-"))
        out["mean_recall"] = float(
            np.mean([out["t2v-r@1"], out["t2v-r@5"], out["t2v-r@10"],
                     out["v2t-r@1"], out["v2t-r@5"], out["v2t-r@10"]])
        )
        return out


class ClassificationEvaluator(BaseEvaluator):
    """Corpus accuracy / macro-F1 over accumulated predictions."""

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})
        self.reset()

    def reset(self) -> None:
        self._pred: List[np.ndarray] = []
        self._true: List[np.ndarray] = []

    def collect(self, batch: Mapping, output: Mapping) -> None:
        logits = np.asarray(output["logits"])
        pred = logits.argmax(-1) if logits.ndim > 1 else (logits > 0).astype(np.int64)
        self._pred.append(pred)
        self._true.append(np.asarray(batch["targets"]))

    def summarize(self) -> Dict[str, float]:
        if not self._pred:
            return {}
        pred = np.concatenate(self._pred)
        true = np.concatenate(self._true)
        acc = float((pred == true).mean())
        f1s = []
        for c in np.unique(true):
            tp = ((pred == c) & (true == c)).sum()
            fp = ((pred == c) & (true != c)).sum()
            fn = ((pred != c) & (true == c)).sum()
            f1s.append(2 * tp / max(2 * tp + fp + fn, 1))
        return {"accuracy": acc, "macro_f1": float(np.mean(f1s))}


class VQAAccuracyEvaluator(BaseEvaluator):
    """Corpus VQA accuracy over soft answer scores: mean of the predicted
    class's soft target (the 10-annotator min(1, n*0.3) convention)."""

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})
        self.reset()

    def reset(self) -> None:
        self._scores: List[float] = []

    def collect(self, batch: Mapping, output: Mapping) -> None:
        logits = np.asarray(output["logits"])
        targets = np.asarray(batch["targets"], np.float32)  # soft [B, V]
        pred = logits.argmax(-1)
        self._scores.extend(
            targets[np.arange(len(pred)), pred].tolist())

    def summarize(self) -> Dict[str, float]:
        if not self._scores:
            return {}
        return {"vqa_accuracy": float(np.mean(self._scores))}


class CaptioningEvaluator(BaseEvaluator):
    """Corpus BLEU-4 + ROUGE-L over generated vs reference token sequences.

    collect() accepts output["generated_ids"] (int) + batch reference ids
    (``caption_raw_input_ids``), or pre-tokenised lists via metadata.
    """

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})
        self.pad_ids = set(self.params.get("pad_ids", [0, 101, 102]))
        self.reset()

    def reset(self) -> None:
        self._cands: List[List[int]] = []
        self._refs: List[List[int]] = []

    def _strip(self, seq) -> List[int]:
        return [int(t) for t in np.asarray(seq).reshape(-1)
                if int(t) not in self.pad_ids]

    def collect(self, batch: Mapping, output: Mapping) -> None:
        gen = output.get("generated_ids")
        ref = batch.get("caption_raw_input_ids", batch.get("targets"))
        if gen is None or ref is None:
            return
        for g, r in zip(np.asarray(gen), np.asarray(ref)):
            self._cands.append(self._strip(g))
            self._refs.append(self._strip(r))

    def summarize(self) -> Dict[str, float]:
        if not self._cands:
            return {}
        from antmmf_tpu.modules.metrics.extended import bleu4, rouge_l

        return {
            "bleu4": bleu4(self._cands, self._refs),
            "rouge_l": float(np.mean([
                rouge_l(c, r) for c, r in zip(self._cands, self._refs)])),
        }


class GroundingEvaluator(BaseEvaluator):
    """Referential-comprehension accuracy: parse the predicted box out of the
    generated text and score IoU >= threshold against the ground-truth box
    (the Pink/RefCOCO eval protocol, prj/Pink/pink/eval/)."""

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.threshold = float(dict(params or {}).get("iou_threshold", 0.5))
        self.reset()

    def reset(self) -> None:
        self._hits: List[float] = []

    def collect(self, batch: Mapping, output: Mapping) -> None:
        from antmmf_tpu.datasets.processors.pink_processors import parse_boxes

        texts = output.get("generated_text")
        gt = np.asarray(batch["gt_box"], np.float32).reshape(-1, 4)
        widths = np.asarray(batch.get("width", np.ones(len(gt))))
        heights = np.asarray(batch.get("height", np.ones(len(gt))))
        e2s = bool(np.asarray(batch.get("expand2square", True)).reshape(-1)[0]) \
            if "expand2square" in batch else True
        for i, text in enumerate(texts):
            boxes = parse_boxes(str(text), float(widths[i]),
                                float(heights[i]), e2s)
            if len(boxes) == 0:
                self._hits.append(0.0)
                continue
            b, g = boxes[0], gt[i]
            lt = np.maximum(b[:2], g[:2])
            rb = np.minimum(b[2:], g[2:])
            inter = np.prod(np.clip(rb - lt, 0, None))
            union = (np.prod(np.clip(b[2:] - b[:2], 0, None))
                     + np.prod(np.clip(g[2:] - g[:2], 0, None)) - inter)
            iou = inter / max(union, 1e-9)
            self._hits.append(float(iou >= self.threshold))

    def summarize(self) -> Dict[str, float]:
        if not self._hits:
            return {"grounding_acc": 0.0}
        return {"grounding_acc": float(np.mean(self._hits)) * 100.0,
                "n_evaluated": float(len(self._hits))}


EVALUATORS = {
    "global_retrieval_recall": GlobalRetrievalRecallEvaluator,
    "classification": ClassificationEvaluator,
    "vqa_accuracy": VQAAccuracyEvaluator,
    "captioning": CaptioningEvaluator,
    "grounding": GroundingEvaluator,
}


def _register_detection() -> None:
    # late import: detection.py imports BaseEvaluator from this module
    from antmmf_tpu.modules.metrics.detection import DetectionEvaluator

    EVALUATORS["detection"] = DetectionEvaluator
    EVALUATORS["bbox_ap"] = DetectionEvaluator


def build_evaluator(config: Optional[Mapping[str, Any]]) -> Optional[BaseEvaluator]:
    if not config:
        return None
    if isinstance(config, str):
        config = {"type": config}
    if config["type"] in ("detection", "bbox_ap") and \
            "detection" not in EVALUATORS:
        _register_detection()
    cls = EVALUATORS.get(config["type"])
    if cls is None:
        raise KeyError(f"Unknown evaluator {config['type']!r}; known: {sorted(EVALUATORS)}")
    return cls(config.get("params", {}))
