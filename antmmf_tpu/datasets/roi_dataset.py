"""ROI (region + OCR + caption) document-image dataset.

Reference parity: ``/root/reference/prj/base_vtp/roi_univl/roi/dataset.py``
(464 LoC) + ``roi/builder.py`` — detector region features, OCR lines with
layout boxes, and a caption join in one sample; ITM negatives are built by
swapping the caption AND the OCR stream of a random other image
(``add_itm_label``, dataset.py:225-249); pretraining masks caption tokens
(MLM) and regions (MRC via ``region_processor``).

Annotation rows (jsonl):
  caption        str
  feature        relpath of an .npz holding {features [M, D], bbox [M, 4]
                 absolute xyxy, cls_prob [M, C], image_height, image_width}
  ocr_text       [str]  OCR line strings (optional)
  ocr_box        [[x0, y0, x1, y1]] absolute line boxes (optional)
  image          relpath of the raw image for the grid stream (optional)
  label          int (optional, classification)

Sample fields are the ``UnivlRoiModel`` batch schema (models/univl_roi.py):
region_* , ocr_input_ids/_mask + ocr_bboxes (LayoutLM-bucketised 0..1000),
caption_* and itm_labels.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.base_dataset import BaseDataset
from antmmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from antmmf_tpu.datasets.database.annotated import AnnotatedDatabase
from antmmf_tpu.datasets.processors.region_processors import (
    OCRProcessor,
    RegionProcessor,
)
from antmmf_tpu.datasets.processors.text_processors import MaskedTokenProcessor


class RoiDataset(BaseDataset):
    def __init__(self, name: str, dataset_type: str, config: Mapping):
        super().__init__(name, dataset_type, config)
        cfg = self.config
        root = cfg.get("data_root_dir", ".")
        ann_cfg = cfg.get("annotations", {})
        ann_path = ann_cfg.get(dataset_type) or ann_cfg.get("train")
        if ann_path is None:
            raise ValueError(f"No annotation path for {dataset_type!r}")
        self.annotations = AnnotatedDatabase(os.path.join(root, ann_path))
        self.features_root = os.path.join(root, cfg.get("features_root", ""))

        self.region_processor = RegionProcessor(dict(cfg.get("region", {})))
        self.use_ocr = bool(cfg.get("use_ocr", True))
        if self.use_ocr:
            self.ocr_processor = OCRProcessor(dict(cfg.get("ocr", {})))
        text_cfg = dict(cfg.get("text", {}))
        text_cfg.setdefault(
            "vocab_file", "tests/data/vocabs/bert-base-uncased_30522_vocab.txt")
        text_cfg.setdefault("max_seq_length", int(cfg.get("max_text_len", 30)))
        self.caption_processor = MaskedTokenProcessor(text_cfg)
        self.pretraining = bool(cfg.get("pretraining", False))
        # ITM negative rate (reference get_rand_index: 50% replace)
        self.itm_swap_prob = float(cfg.get("itm_swap_prob", 0.5))
        self.rng = np.random.default_rng(cfg.get("seed", 1234))

    def __len__(self) -> int:
        return len(self.annotations)

    def _load_feature_item(self, ann: Mapping[str, Any]) -> Mapping[str, Any]:
        path = os.path.join(self.features_root, str(ann["feature"]))
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    def get_item(self, idx: int):
        from antmmf_tpu.structures.sample import Sample

        ann = self.annotations[idx]
        sample = Sample()

        feat_item = self._load_feature_item(ann)
        mask_regions = self.pretraining and self.is_training()
        for k, v in self.region_processor(
                feat_item, mask_regions=mask_regions).items():
            sample[k] = v

        # ITM: with prob itm_swap_prob replace caption + OCR by a random
        # other row's (reference add_itm_label: random_ocr AND
        # random_caption swap together, keeping the pair consistent)
        itm_label = 1
        src = ann
        if self.pretraining and self.is_training() and len(self) > 1 \
                and self.rng.random() < self.itm_swap_prob:
            j = int(self.rng.integers(0, len(self)))
            if j != idx:
                itm_label = 0
                src = self.annotations[j]
        sample["itm_labels"] = np.int64(itm_label)

        if self.use_ocr:
            h = feat_item.get("image_height", src.get("image_height", 1.0))
            w = feat_item.get("image_width", src.get("image_width", 1.0))
            ocr = self.ocr_processor({
                "ocr_text": src.get("ocr_text", []),
                "ocr_box": src.get("ocr_box", []),
                "image_height": float(np.asarray(h).reshape(-1)[0]),
                "image_width": float(np.asarray(w).reshape(-1)[0]),
            })
            for k, v in ocr.items():
                sample[k] = v

        caption = str(src.get("caption", src.get("text", "")))
        mlm = self.pretraining and self.is_training()
        masked = self.caption_processor(
            {"text": caption}, probability=None if mlm else 0.0)
        raw = self.caption_processor({"text": caption}, probability=0.0)
        for key in ("input_ids", "input_mask", "segment_ids", "lm_label_ids"):
            sample[f"caption_{key}"] = masked[key]
        sample["caption_raw_input_ids"] = raw["input_ids"]
        if "label" in ann:
            sample["targets"] = np.int64(ann["label"])
        sample["id"] = np.int64(ann.get("id", idx))
        return sample


@registry.register_builder("roi_dataset")
class RoiDatasetBuilder(BaseDatasetBuilder):
    def __init__(self, dataset_name: str = "roi_dataset"):
        super().__init__(dataset_name)

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        return RoiDataset(self.dataset_name, dataset_type, config)
