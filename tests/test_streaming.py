import json

import numpy as np
import pytest

from antmmf_tpu.datasets.streaming_dataset import JsonlShardStream, StreamingLoader


@pytest.fixture
def shards(tmp_path):
    for s in range(3):
        with open(tmp_path / f"shard_{s}.jsonl", "w") as f:
            for i in range(4):
                f.write(json.dumps({"x": s * 10 + i, "text": f"r{s}-{i}"}) + "\n")
    return str(tmp_path)


def test_stream_yields_all_records_once(shards):
    ds = JsonlShardStream("stream", "val", {
        "data_root_dir": shards, "repeat": False})
    records = list(ds)
    assert len(records) == 12
    xs = sorted(int(r["x"]) for r in records)
    assert xs == sorted([s * 10 + i for s in range(3) for i in range(4)])
    assert records[0]["dataset_name"] == "stream"


def test_stream_repeat_and_epoch_reshuffle(shards):
    import itertools

    ds = JsonlShardStream("stream", "train", {
        "data_root_dir": shards, "repeat": True, "seed": 1})
    first_24 = [int(r["x"]) for r in itertools.islice(iter(ds), 24)]
    assert len(first_24) == 24  # repeats past one epoch


def test_streaming_loader_fixed_batches(shards):
    ds = JsonlShardStream("stream", "val", {
        "data_root_dir": shards, "repeat": False})
    batches = list(StreamingLoader(ds, batch_size=5, drop_last=True))
    assert len(batches) == 2
    assert batches[0]["x"].shape == (5,)
    # drop_last=False keeps the ragged tail
    ds2 = JsonlShardStream("stream", "val", {
        "data_root_dir": shards, "repeat": False})
    batches = list(StreamingLoader(ds2, batch_size=5, drop_last=False))
    assert len(batches) == 3


def test_task_loader_streams_iterable_datasets(shards):
    import antmmf_tpu.datasets  # registry side effects
    import antmmf_tpu.tasks  # base_task registration
    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.common.registry import registry
    from antmmf_tpu.common.task_loader import TaskLoader
    from antmmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
    from antmmf_tpu.datasets.streaming_dataset import JsonlShardStream

    if registry.get_builder_class("_test_stream", default=None) is None:
        @registry.register_builder("_test_stream")
        class StreamBuilder(BaseDatasetBuilder):
            def __init__(self, name="_test_stream"):
                super().__init__(name)

            def _load(self, dataset_type, config, *a, **k):
                return JsonlShardStream("_test_stream", dataset_type, config)

    cfg = build_config(freeze=False)
    cfg.merge({
        "task_attributes": {"t": {
            "type": "base_task", "datasets": ["_test_stream"],
            "dataset_attributes": {"_test_stream": {
                "data_root_dir": shards, "repeat": False}}}},
        "training_parameters": {"batch_size": 4, "test_batch_size": 4,
                                "num_workers": 0},
    })
    tl = TaskLoader(cfg)
    tl.load_task(["val"])
    tl.make_dataloaders()
    batches = list(tl.val_loaders[0])
    assert len(batches) == 3  # 12 records / 4, drop_last off for val
    assert batches[0]["x"].shape == (4,)
    tl.seed_sampler("val", 1)  # epoch reseed reaches the dataset


def test_univl_auto_dispatch():
    from antmmf_tpu.common.registry import registry
    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval
    from antmmf_tpu.models.univl_pretrain import UnivlForVideoPretraining
    import antmmf_tpu.models  # side effects

    shell = build_model({"model_attributes": {"univl_auto": {
        "training_stage": "retrieval", "vit_preset": "vit_tiny_test",
        "bert_preset": "bert_tiny_test", "image_size": 32, "embed_dim": 32,
        "dtype_str": "float32"}}})
    assert isinstance(shell.module, UnivlForVideoTextRetrieval)

    shell2 = build_model({"model_attributes": {"univl_auto": {
        "training_stage": "pretraining", "vit_preset": "vit_tiny_test",
        "bert_preset": "bert_tiny_test", "image_size": 32, "embed_dim": 32,
        "dtype_str": "float32"}}})
    assert isinstance(shell2.module, UnivlForVideoPretraining)
