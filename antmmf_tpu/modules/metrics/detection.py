"""COCO-protocol detection mAP (``bbox_ap``) without pycocotools.

Reference parity: ``/root/reference/antmmf/modules/metrics/map.py:15`` —
``bbox_ap`` collects per-image ``bbox_output`` (N×6: x1, y1, x2, y2, conf, cls)
against COCO-format ground truth and summarizes AP via pycocotools. pycocotools
is not in this image, so the COCO evaluation protocol is implemented directly:

  * IoU thresholds 0.50:0.95:0.05 (plus the ap50 / ap75 slices);
  * per-class greedy matching in score order, max 100 detections per image;
  * 101-point interpolated precision;
  * AP averaged over classes present in the ground truth.

Summary keys mirror the reference (map / map@0.5 / map@0.75).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.metrics.evaluators import BaseEvaluator

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4]×[M,4] xyxy IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return (inter / np.maximum(union, 1e-9)).astype(np.float32)


def _ap_from_matches(scores: np.ndarray, matched: np.ndarray,
                     n_gt: int) -> float:
    """101-point interpolated AP from per-detection match flags."""
    if n_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum, fp_cum = np.cumsum(tp), np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # monotone non-increasing precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    interp = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(interp.mean())


class DetectionEvaluator(BaseEvaluator):
    """Corpus evaluator: collect (image_id → detections + gts), summarize mAP.

    Ground truth can be provided at construction (``coco_gt`` json path in COCO
    format) or streamed through ``collect`` via batch keys ``gt_boxes`` /
    ``gt_classes`` (padded with ``gt_valid`` mask or -1 class).
    """

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        params = dict(params or {})
        self._gt_from_file: Dict[Any, List] = {}
        coco_gt = params.get("coco_gt")
        if coco_gt:
            with open(coco_gt) as f:
                coco = json.load(f)
            for ann in coco.get("annotations", []):
                x, y, w, h = ann["bbox"]
                self._gt_from_file.setdefault(ann["image_id"], []).append(
                    (np.array([x, y, x + w, y + h], np.float32),
                     int(ann["category_id"])))
        self.label_mapping = params.get("label_mapping")
        self.reset()

    def reset(self) -> None:
        # per (image_id, class): detections [conf, box...]; gts [box...]
        self._dets: Dict[Any, List] = {}
        self._gts: Dict[Any, List] = {}

    def collect(self, batch: Mapping, output: Mapping) -> None:
        image_ids = np.asarray(batch["image_id"]).reshape(-1)
        bbox_output = output["bbox_output"]  # [B, N, 6] or list of [N, 6]
        gt_boxes = batch.get("gt_boxes")
        gt_classes = batch.get("gt_classes")
        gt_valid = batch.get("gt_valid")
        for i, img in enumerate(image_ids.tolist()):
            det = np.asarray(bbox_output[i], np.float32)
            det = det[np.argsort(-det[:, 4])][:MAX_DETS] if len(det) else det
            self._dets.setdefault(img, []).extend(
                (float(d[4]), d[:4].copy(), int(d[5])) for d in det
                if d[4] > 0)
            if img in self._gt_from_file:
                self._gts[img] = [(b.copy(), c)
                                  for b, c in self._gt_from_file[img]]
            elif gt_boxes is not None:
                boxes = np.asarray(gt_boxes[i], np.float32)
                classes = np.asarray(gt_classes[i]).astype(int)
                if gt_valid is not None:
                    keep = np.asarray(gt_valid[i]).astype(bool)
                else:
                    keep = classes >= 0
                self._gts[img] = [(boxes[j].copy(), int(classes[j]))
                                  for j in np.nonzero(keep)[0]]

    def summarize(self) -> Dict[str, float]:
        classes = sorted({c for gts in self._gts.values() for _, c in gts})
        if not classes:
            return {"map": 0.0, "map@0.5": 0.0, "map@0.75": 0.0}
        ap = np.zeros((len(IOU_THRESHOLDS), len(classes)))
        for ci, cls in enumerate(classes):
            scores: List[float] = []
            matched = [[] for _ in IOU_THRESHOLDS]
            n_gt = 0
            for img, gts in self._gts.items():
                g = np.stack([b for b, c in gts if c == cls]) if any(
                    c == cls for _, c in gts) else np.zeros((0, 4), np.float32)
                n_gt += len(g)
                dets = [(s, b) for s, b, c in self._dets.get(img, [])
                        if c == cls]
                dets.sort(key=lambda x: -x[0])
                d = np.stack([b for _, b in dets]) if dets else \
                    np.zeros((0, 4), np.float32)
                ious = _iou_matrix(d, g)
                scores.extend(s for s, _ in dets)
                for ti, thr in enumerate(IOU_THRESHOLDS):
                    used = np.zeros(len(g), bool)
                    for di in range(len(d)):
                        best, best_j = thr, -1
                        for j in range(len(g)):
                            if not used[j] and ious[di, j] >= best:
                                best, best_j = ious[di, j], j
                        if best_j >= 0:
                            used[best_j] = True
                            matched[ti].append(1.0)
                        else:
                            matched[ti].append(0.0)
            s = np.asarray(scores, np.float32)
            for ti in range(len(IOU_THRESHOLDS)):
                ap[ti, ci] = _ap_from_matches(
                    s, np.asarray(matched[ti], np.float32), n_gt)
        mean_over_cls = np.nanmean(ap, axis=1)
        return {
            "map": float(np.nanmean(mean_over_cls)),
            "map@0.5": float(mean_over_cls[0]),
            "map@0.75": float(mean_over_cls[5]),
        }


@registry.register_metric("bbox_ap")
class BBoxAP:
    """Registered batch-callable façade over DetectionEvaluator (the reference
    metric is corpus-level; the batch plane reports running mAP)."""

    def __init__(self, **kwargs):
        self.evaluator = DetectionEvaluator(kwargs)

    def reset(self):
        self.evaluator.reset()

    def collect(self, batch, output):
        self.evaluator.collect(batch, output)

    def summarize(self):
        return self.evaluator.summarize()
