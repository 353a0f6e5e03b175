"""Dataset base classes: map-style datasets owning databases + processors.

Reference parity: ``/root/reference/antmmf/datasets/base_dataset.py`` —
``BaseDataset:110`` (processor auto-init :48-62, database ownership :130-133),
``BaseIterableDataset:263``. The torch ``prepare_batch`` / ``.to(device)`` step
(:76-95) is gone: collation yields numpy SampleLists and the trainer owns the
host→HBM transfer (sharded device_put, double-buffered).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Mapping, Optional

from antmmf_tpu.common.configuration import Configuration, convert_to_config
from antmmf_tpu.datasets.processors.processors import build_processors
from antmmf_tpu.structures.sample import Sample, SampleList


class BaseDataset:
    """Map-style dataset. Subclasses implement ``__len__`` and ``get_item(idx)``
    returning a ``Sample`` of fixed-shape numpy fields."""

    def __init__(self, name: str, dataset_type: str, config: Optional[Mapping] = None):
        self._name = name
        self._dataset_type = dataset_type
        self.config: Configuration = convert_to_config(config or {})
        self.writer = None
        # auto-init every `*_processor` entry under config.processors
        self.processors = build_processors(self.config.get("processors", {}))
        for key, proc in self.processors.items():
            setattr(self, key, proc)

    @property
    def name(self) -> str:
        return self._name

    @property
    def dataset_type(self) -> str:
        return self._dataset_type

    def is_training(self) -> bool:
        return self._dataset_type == "train"

    def __len__(self) -> int:
        raise NotImplementedError

    def get_item(self, idx: int) -> Sample:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Sample:
        sample = self.get_item(idx)
        sample["dataset_type"] = self._dataset_type
        sample["dataset_name"] = self._name
        return sample

    def collate_fn(self, samples) -> SampleList:
        return SampleList.from_samples(samples)

    def format_for_evalai(self, report) -> list:
        return []


class BaseIterableDataset(BaseDataset):
    """Stream-style dataset for web-scale shards: implement ``__iter__``."""

    def __iter__(self) -> Iterator[Sample]:
        raise NotImplementedError

    def __len__(self) -> int:  # length may be unknown
        raise TypeError(f"{type(self).__name__} is iterable-only")
