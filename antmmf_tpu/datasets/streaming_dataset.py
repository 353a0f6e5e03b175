"""Streaming datasets: jsonl-shard iteration for web-scale pretraining.

Reference parity: ``BaseIterableDataset`` (``/root/reference/antmmf/datasets/
base_dataset.py:263``) and ``BaseIterableTask`` (tasks/base_task.py:240) — the
reference streams LAION/CNVid-scale shards. Sharding rule: shard files are
round-robined across (process, worker) so every SPMD process sees a disjoint
stream; batches stay fixed-shape.
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Any, Callable, Dict, Iterator, List, Mapping, Optional

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.base_dataset import BaseIterableDataset
from antmmf_tpu.structures.sample import Sample, SampleList


class JsonlShardStream(BaseIterableDataset):
    """Iterate records from a directory of ``*.jsonl`` shards.

    config: data_root_dir, shard_glob (default ``*.jsonl``), repeat (bool),
    process_fn hook via subclassing ``make_sample``.
    """

    def __init__(self, name: str, dataset_type: str, config: Mapping):
        super().__init__(name, dataset_type, config)
        import glob as globlib

        cfg = self.config
        root = cfg.get("data_root_dir", ".")
        pattern = os.path.join(root, cfg.get("shard_glob", "*.jsonl"))
        self.shards: List[str] = sorted(globlib.glob(pattern))
        if not self.shards:
            raise FileNotFoundError(f"No shards match {pattern!r}")
        self.repeat = bool(cfg.get("repeat", dataset_type == "train"))
        self.seed = int(cfg.get("seed", 0))
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _my_shards(self) -> List[str]:
        import jax

        n, r = jax.process_count(), jax.process_index()
        mine = self.shards[r::n]
        return mine or self.shards  # fewer shards than processes: share

    def make_sample(self, record: Dict[str, Any]) -> Optional[Sample]:
        """Subclass hook: record dict → Sample (None skips the record)."""
        sample = Sample()
        for k, v in record.items():
            if isinstance(v, (int, float)):
                sample[k] = np.asarray(v)
            else:
                sample[k] = v
        return sample

    def __iter__(self) -> Iterator[Sample]:
        rng = np.random.default_rng(self.seed + self._epoch)
        shards = list(self._my_shards())
        while True:
            order = rng.permutation(len(shards))
            for si in order:
                with open(shards[int(si)], encoding="utf-8") as f:
                    for line in f:
                        if not line.strip():
                            continue
                        sample = self.make_sample(json.loads(line))
                        if sample is not None:
                            sample["dataset_type"] = self._dataset_type
                            sample["dataset_name"] = self._name
                            yield sample
            if not self.repeat:
                return
            self._epoch += 1


class StreamingLoader:
    """Batch an iterable dataset into fixed-size SampleLists (drops the
    ragged tail in train mode)."""

    def __init__(self, dataset, batch_size: int, drop_last: bool = True,
                 collate_fn: Optional[Callable] = None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.collate_fn = collate_fn or getattr(
            dataset, "collate_fn", SampleList.from_samples)

    def __iter__(self) -> Iterator[SampleList]:
        batch: List[Sample] = []
        for sample in self.dataset:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []
        if batch and not self.drop_last:
            yield self.collate_fn(batch)
