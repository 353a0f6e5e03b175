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
