"""MMBT-format image-text dataset + concat dataset.

Reference parity: ``MmfImageTextDataset`` (``/root/reference/antmmf/datasets/
mm_dataset.py:27`` — jsonl rows {text, img, label}) and ``AntMMFConcatDataset``
(``concat_dataset.py``).
"""

from __future__ import annotations

import bisect
import os
from typing import Any, List, Mapping, Sequence

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.base_dataset import BaseDataset
from antmmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from antmmf_tpu.datasets.database.annotated import AnnotatedDatabase
from antmmf_tpu.datasets.database.image_database import ImageDatabase
from antmmf_tpu.datasets.processors.image_processors import NormalizedImageProcessor
from antmmf_tpu.datasets.processors.text_processors import MaskedTokenProcessor
from antmmf_tpu.structures.sample import Sample


class MmfImageTextDataset(BaseDataset):
    """jsonl rows: {"text": ..., "img": relpath, "label": int}."""

    def __init__(self, name: str, dataset_type: str, config: Mapping):
        super().__init__(name, dataset_type, config)
        cfg = self.config
        root = cfg.get("data_root_dir", ".")
        ann = cfg.get("annotations", {}).get(dataset_type)
        self.annotations = AnnotatedDatabase(os.path.join(root, ann))
        self.images = ImageDatabase(os.path.join(root, cfg.get("image_root", "")))
        self.image_processor = NormalizedImageProcessor(
            cfg.get("image", {"size": 224}),
            is_train=dataset_type == "train")
        text_cfg = dict(cfg.get("text", {}))
        text_cfg.setdefault(
            "vocab_file", "tests/data/vocabs/bert-base-uncased_30522_vocab.txt")
        self.text_processor = MaskedTokenProcessor(text_cfg)

    def __len__(self) -> int:
        return len(self.annotations)

    def get_item(self, idx: int) -> Sample:
        ann = self.annotations[idx]
        sample = Sample()
        img = self.images(str(ann.get("img", ann.get("image"))))
        sample["image_data"] = self.image_processor.transform_array(img)
        text = self.text_processor({"text": str(ann.get("text", ""))},
                                   probability=0.0)
        for key in ("input_ids", "input_mask", "segment_ids"):
            sample[key] = text[key]
        if "label" in ann:
            sample["targets"] = np.int64(ann["label"])
        sample["id"] = np.int64(ann.get("id", idx))
        return sample


@registry.register_builder("mmf_image_text")
class MmfImageTextBuilder(BaseDatasetBuilder):
    def __init__(self, dataset_name: str = "mmf_image_text"):
        super().__init__(dataset_name)

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        return MmfImageTextDataset(self.dataset_name, dataset_type, config)


class ConcatDataset:
    """Index-concatenation of datasets with homogeneous samples."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self.cumulative: List[int] = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cumulative.append(total)

    def __len__(self) -> int:
        return self.cumulative[-1] if self.cumulative else 0

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += len(self)
        ds_idx = bisect.bisect_right(self.cumulative, idx)
        prev = self.cumulative[ds_idx - 1] if ds_idx else 0
        return self.datasets[ds_idx][idx - prev]

    @property
    def collate_fn(self):
        return self.datasets[0].collate_fn
