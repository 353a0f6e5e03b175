"""TaskLoader + BaseTask multi-dataset paths."""

import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.common.task_loader import TaskLoader
from antmmf_tpu.tasks.base_task import BaseTask

DATASET_CFG = {
    "data_root_dir": "tests/data/video",
    "annotations": {"train": "msrvtt_train.jsonl", "val": "msrvtt_train.jsonl"},
    "video_root": "",
    "frames_per_clip": 2,
    "image": {"size": 32, "resize": 36},
    "max_text_len": 16,
}


def _config(extra_tp=None):
    cfg = build_config(opts=None, freeze=False)
    cfg.merge({
        "task_attributes": {
            "taskA": {
                "type": "base_task",
                "datasets": ["video_text_retrieval", "video_text_pretrain"],
                "dataset_attributes": {
                    "video_text_retrieval": dict(DATASET_CFG),
                    "video_text_pretrain": dict(DATASET_CFG),
                },
            },
        },
        "training_parameters": {"batch_size": 4, "test_batch_size": 4,
                                "num_workers": 0, **(extra_tp or {})},
    })
    return cfg


def test_task_loads_multiple_datasets():
    import antmmf_tpu.datasets  # registry side effects

    cfg = _config()
    tl = TaskLoader(cfg)
    tl.load_task(["train", "val"])
    task = tl.tasks["train"][0]
    assert len(task.get_datasets()) == 2
    assert len(task) == 8  # 4 + 4 fixture rows

    tl.make_dataloaders()
    assert len(tl.train_loaders) == 2
    batch = next(iter(tl.train_loaders[0]))
    assert batch.get_batch_size() == 4


def test_proportional_dataset_choice():
    task = BaseTask("t")
    task.datasets = [list(range(90)), list(range(10))]
    task._init_proportions({"task_size_proportional_sampling": True})
    task.seed(0)
    picks = [task.datasets.index(task.change_dataset()) for _ in range(200)]
    assert 150 < picks.count(0) < 200  # ~90%

    task._init_proportions({"task_size_proportional_sampling": False})
    picks = [task.datasets.index(task.change_dataset()) for _ in range(200)]
    assert 60 < picks.count(0) < 140  # ~uniform


def test_batch_divisibility_check():
    import jax

    cfg = _config({"batch_size": 3})
    tl = TaskLoader(cfg)
    tl.load_task(["train"])
    if jax.process_count() == 1:
        tl.make_dataloaders()  # divisible by 1 → fine
    cfg2 = _config()
    tl2 = TaskLoader(cfg2)
    tl2.tasks = {}
    # direct check of the guard
    tl2.tp = {"batch_size": 5, "test_batch_size": 5, "num_workers": 0}
    import unittest.mock as mock

    with mock.patch("jax.process_count", return_value=2):
        with pytest.raises(ValueError, match="divisible"):
            tl2.make_dataloaders()
