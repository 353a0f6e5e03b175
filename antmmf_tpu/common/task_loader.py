"""TaskLoader: builds tasks per run type and wires datasets into DataLoaders.

Reference parity: ``/root/reference/antmmf/common/task_loader.py:24`` — per
run-type task construction, one loader per dataset, sampler wiring,
global-batch divisibility check (:182-187), ``seed_sampler`` (:213-225).

TPU delta: the "world size" a batch divides over is the mesh's data-parallel
degree; each *process* loads global_batch / process_count samples and the trainer
assembles the global sharded array.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax

from antmmf_tpu.common.configuration import convert_to_config
from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.loader import DataLoader
from antmmf_tpu.datasets.samplers import build_sampler


class TaskLoader:
    def __init__(self, config: Mapping):
        self.config = convert_to_config(config)
        self.tp = self.config.get("training_parameters", {})
        self.tasks: Dict[str, List[Any]] = {}
        self.loaders: Dict[str, List[DataLoader]] = {}

    # -------------------------------------------------------------------- load
    def load_task(self, run_types: Optional[List[str]] = None) -> None:
        task_attributes = self.config.get("task_attributes", {})
        run_types = run_types or ["train", "val", "test"]
        for dataset_type in run_types:
            self.tasks[dataset_type] = []
            for task_name, task_cfg in dict(task_attributes).items():
                task_cls = registry.get_task_class(task_cfg.get("type", "base_task"),
                                                   default=None)
                if task_cls is None:
                    task_cls = registry.get_task_class("base_task")
                task = task_cls(task_name)
                task.load(task_cfg, dataset_type)
                self.tasks[dataset_type].append(task)

    def make_dataloaders(self) -> None:
        tp = self.tp
        global_bs = int(tp.get("batch_size", 8))
        test_bs = int(tp.get("test_batch_size") or global_bs)
        nproc = jax.process_count()
        for bs, name in ((global_bs, "batch_size"), (test_bs, "test_batch_size")):
            if bs % nproc:
                raise ValueError(
                    f"{name}={bs} must be divisible by process count {nproc}"
                )
        num_workers = int(tp.get("num_workers", 0))

        from antmmf_tpu.datasets.base_dataset import BaseIterableDataset
        from antmmf_tpu.datasets.streaming_dataset import StreamingLoader

        for dataset_type, tasks in self.tasks.items():
            self.loaders[dataset_type] = []
            per_host_bs = (global_bs if dataset_type == "train" else test_bs) // nproc
            for task in tasks:
                for dataset in task.get_datasets():
                    if isinstance(dataset, BaseIterableDataset):
                        loader = StreamingLoader(
                            dataset, batch_size=per_host_bs,
                            drop_last=(dataset_type == "train"),
                            collate_fn=dataset.collate_fn)
                    else:
                        sampler = self._build_sampler(dataset, dataset_type)
                        loader = DataLoader(
                            dataset,
                            batch_size=per_host_bs,
                            sampler=sampler,
                            collate_fn=dataset.collate_fn,
                            num_workers=num_workers,
                            drop_last=(dataset_type == "train"),
                            # eval: wrap-pad the final short batch so the
                            # global batch stays divisible by the mesh data
                            # axis (reference DistributedSampler padding)
                            pad_last=(dataset_type != "train"),
                        )
                    self.loaders[dataset_type].append(loader)

    def _build_sampler(self, dataset, dataset_type: str):
        tp = self.tp
        if jax.process_count() > 1:
            cfg = dict(tp.get("distributed_sampler", {"type": "distributed_sampler"}))
            cfg.setdefault("type", "distributed_sampler")
            return build_sampler(cfg, dataset, shuffle=(dataset_type == "train"))
        if dataset_type == "train":
            return build_sampler(tp.get("sampler", {"type": "random_sampler"}), dataset)
        return build_sampler({"type": "sequential_sampler"}, dataset)

    # ------------------------------------------------------------------ epochs
    def seed_sampler(self, dataset_type: str, epoch: int) -> None:
        for loader in self.loaders.get(dataset_type, []):
            sampler = getattr(loader, "sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)
            elif hasattr(loader.dataset, "set_epoch"):
                loader.dataset.set_epoch(epoch)

    def get_loaders(self, dataset_type: str) -> List[DataLoader]:
        return self.loaders.get(dataset_type, [])

    @property
    def train_loaders(self) -> List[DataLoader]:
        return self.get_loaders("train")

    @property
    def val_loaders(self) -> List[DataLoader]:
        return self.get_loaders("val")

    @property
    def test_loaders(self) -> List[DataLoader]:
        return self.get_loaders("test")
