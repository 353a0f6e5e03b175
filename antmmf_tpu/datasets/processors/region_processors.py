"""Region processor: detector features → fixed-count masked-region inputs.

Reference parity: ``/root/reference/prj/base_vtp/roi_univl/roi/region_processor.py``
(181 LoC) —
  1. truncate/pad region boxes + features + class distributions to
     ``max_features``;
  2. random region masking (prob 0.15; 90% zero the feature and also zero
     highly-overlapping neighbours IoU > 0.4, volta-style) with
     ``region_to_predict`` labels for the MRC head;
  3. normalize coords by image size and append the area as a 5th coord.

Also ``ocr_processor`` — the OCR stream contract of the ROI cross-encoder
(reference ``roi/dataset.py:111-170`` ``_load_ocr_json``): each OCR line's
wordpieces inherit the LINE box bucketised LayoutLM-style to [0, 1000]
(x·1000/width, y·1000/height), a ";" separator token closes every line, and
the result pads to a fixed length with zero boxes.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor


def _pairwise_iou(boxes: np.ndarray) -> np.ndarray:
    lt = np.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = np.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = np.prod(np.clip(boxes[:, 2:] - boxes[:, :2], 0, None), axis=1)
    union = area[:, None] + area[None, :] - inter
    return inter / np.maximum(union, 1e-9)


@registry.register_processor("region_processor")
class RegionProcessor(BaseProcessor):
    """Input item (FeaturesDatabase output + feature-info):
    {features [M, D], bbox [M, 4] absolute xyxy, cls_prob [M, C],
     image_height, image_width}.

    Output (static shapes):
      region_feature     f32[max_features, D]   (masked regions zeroed)
      region_boxes       f32[max_features, 5]   normalized xyxy + area
      region_mask        int64[max_features]    1 = real region
      region_to_predict  int64[max_features]    1 = MRC-supervised position
      region_cls_dis     f32[max_features, C]   detector class distribution
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        self.max_features = int(cfg.get("max_features", 10))
        self.feature_dim = int(cfg.get("feature_dim", 2048))
        self.region_kl_fc_dim = int(cfg.get("region_kl_fc_dim", 13))
        self.mask_region_prob = float(cfg.get("mask_region_prob", 0.15))
        self.overlap_threshold = float(cfg.get("overlap_threshold", 0.4))
        self.rng = np.random.default_rng(cfg.get("seed"))

    def __call__(self, item: Mapping[str, Any],
                 mask_regions: bool = True) -> Dict[str, Any]:
        feats = np.asarray(item["features"], np.float32)
        boxes = np.asarray(item["bbox"], np.float32).reshape(-1, 4)
        cls_prob = np.asarray(
            item.get("cls_prob",
                     np.zeros((len(boxes), self.region_kl_fc_dim))),
            np.float32)
        h = float(item.get("image_height", 1.0))
        w = float(item.get("image_width", 1.0))
        M = min(len(boxes), self.max_features)

        R, D, C = self.max_features, self.feature_dim, self.region_kl_fc_dim
        out_feat = np.zeros((R, feats.shape[-1] if feats.size else D),
                            np.float32)
        out_boxes = np.zeros((R, 5), np.float32)
        out_cls = np.zeros((R, cls_prob.shape[-1] if cls_prob.size else C),
                           np.float32)
        out_mask = np.zeros((R,), np.int64)
        to_predict = np.zeros((R,), np.int64)

        out_feat[:M] = feats[:M]
        out_cls[:M] = cls_prob[:M]
        out_mask[:M] = 1
        norm = np.asarray([w, h, w, h], np.float32)
        nb = boxes[:M] / norm
        areas = np.clip(nb[:, 2] - nb[:, 0], 0, None) * \
            np.clip(nb[:, 3] - nb[:, 1], 0, None)
        out_boxes[:M, :4] = nb
        out_boxes[:M, 4] = areas

        if mask_regions and M:
            overlaps = _pairwise_iou(boxes[:M])
            for i in range(M):
                prob = self.rng.random()
                if prob >= self.mask_region_prob:
                    continue
                to_predict[i] = 1
                if prob / self.mask_region_prob < 0.9:
                    out_feat[i] = 0.0
                    # volta-style: zero highly-overlapping neighbours too
                    for j in np.nonzero(
                            overlaps[i] > self.overlap_threshold)[0]:
                        out_feat[j] = 0.0
        return {
            "region_feature": out_feat, "region_boxes": out_boxes,
            "region_mask": out_mask, "region_to_predict": to_predict,
            "region_cls_dis": out_cls,
        }


@registry.register_processor("ocr_processor")
class OCRProcessor(BaseProcessor):
    """OCR lines → fixed-length token ids with LayoutLM-bucketised boxes.

    Input item: {ocr_text: [str], ocr_box: [[x0, y0, x1, y1] absolute xyxy],
    image_height, image_width}. Output (static shapes):
      ocr_input_ids   int64[L]     wordpieces; each line closed by ``sep``
      ocr_input_mask  int64[L]
      ocr_bboxes      int64[L, 4]  line box per token, bucketised 0..1000
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        from antmmf_tpu.datasets.processors.text_processors import (
            _resolve_vocab_path)
        from antmmf_tpu.utils.tokenization import BertTokenizer

        cfg = self.config
        vocab_path = _resolve_vocab_path(cfg.get(
            "vocab_file", "tests/data/vocabs/bert-base-uncased_30522_vocab.txt"))
        self.tokenizer = BertTokenizer(
            vocab_path, do_lower_case=bool(cfg.get("do_lower_case", True)))
        self.max_length = int(cfg.get("max_length", 64))
        # reference closes every OCR line with ";" carrying the line box
        self.line_sep = str(cfg.get("line_sep", ";"))

    def __call__(self, item: Mapping[str, Any]) -> Dict[str, Any]:
        texts = list(item.get("ocr_text", []))
        boxes = list(item.get("ocr_box", []))
        h = float(item.get("image_height", 1.0)) or 1.0
        w = float(item.get("image_width", 1.0)) or 1.0
        tokens: list = []
        tok_boxes: list = []
        for text, box in zip(texts, boxes):
            x0, y0, x1, y1 = [float(v) for v in box]
            bucket = [int(min(max(v, 0.0), 1000)) for v in
                      (x0 * 1000.0 / w, y0 * 1000.0 / h,
                       x1 * 1000.0 / w, y1 * 1000.0 / h)]
            pieces = self.tokenizer.tokenize(str(text)) + [self.line_sep]
            tokens.extend(pieces)
            tok_boxes.extend([bucket] * len(pieces))
        L = self.max_length
        tokens, tok_boxes = tokens[:L], tok_boxes[:L]
        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        n = len(ids)
        out_ids = np.zeros((L,), np.int64)
        out_mask = np.zeros((L,), np.int64)
        out_boxes = np.zeros((L, 4), np.int64)
        out_ids[:n] = ids
        out_mask[:n] = 1
        if n:
            out_boxes[:n] = np.asarray(tok_boxes, np.int64)
        return {"ocr_input_ids": out_ids, "ocr_input_mask": out_mask,
                "ocr_bboxes": out_boxes}
