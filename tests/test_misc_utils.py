import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.utils.inspector import (
    find_anomalies,
    parameter_summary,
    sharding_report,
)
from antmmf_tpu.utils.launch import pool_processes
from antmmf_tpu.utils.visualize import make_grid, overlay_attention, saliency_text_report
from antmmf_tpu.utils.download import DownloadDisabled, download
from antmmf_tpu.utils.file_io import atomic_write_json, read_jsonl
from antmmf_tpu.common.data_updater import DataUpdater


def test_inspector_summary_and_anomalies():
    params = {"layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    text = parameter_summary(params)
    assert "TOTAL" in text and "20" in text
    assert find_anomalies(params) == []
    bad = {"w": jnp.array([1.0, np.nan])}
    assert len(find_anomalies(bad)) == 1
    assert "kernel" in sharding_report(params)


def test_launcher_kills_job_on_rank_failure():
    ok = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    bad = subprocess.Popen([sys.executable, "-c", "import sys; sys.exit(3)"])
    code = pool_processes([ok, bad], poll_seconds=0.2)
    assert code == 3
    assert ok.poll() is not None  # survivor terminated


def test_launcher_success_path():
    p1 = subprocess.Popen([sys.executable, "-c", "pass"])
    p2 = subprocess.Popen([sys.executable, "-c", "pass"])
    assert pool_processes([p1, p2], poll_seconds=0.1) == 0


def test_visualize_helpers(tmp_path):
    imgs = [np.random.rand(8, 8, 3) for _ in range(5)]
    grid = make_grid(imgs, cols=3)
    assert grid.dtype == np.uint8 and grid.shape[2] == 3
    overlaid = overlay_attention(imgs[0], np.random.rand(2, 2))
    assert overlaid.shape == (8, 8, 3)
    rep = saliency_text_report(["a", "b", "c"], np.array([0.1, 0.7, 0.2]), 2)
    assert rep.startswith("b(")


def test_download_gated(tmp_path, monkeypatch):
    monkeypatch.delenv("ANTMMF_TPU_ALLOW_DOWNLOADS", raising=False)
    with pytest.raises(DownloadDisabled):
        download("http://example.com/x", str(tmp_path / "x"))
    # existing file short-circuits
    target = tmp_path / "y"
    target.write_bytes(b"data")
    assert download("http://example.com/y", str(target)) == str(target)


def test_file_io(tmp_path):
    path = str(tmp_path / "sub" / "x.json")
    atomic_write_json({"a": 1}, path)
    assert os.path.exists(path)
    jl = tmp_path / "x.jsonl"
    jl.write_text('{"a": 1}\n{"a": 2}\n')
    assert [r["a"] for r in read_jsonl(str(jl))] == [1, 2]


def test_data_updater_rewrites_annotations(tmp_path):
    class FakeDB:
        data = [{"caption": "x"}, {"caption": "y"}]

    upd = DataUpdater({"training_parameters": {"save_dir": str(tmp_path)}})
    upd.add_batch({"caption_tid": np.array([0, 1])},
                  {"logits": np.array([[0.1, 0.9], [0.8, 0.2]])})
    out_path = str(tmp_path / "updated.jsonl")
    n = upd.update_annotations(FakeDB, out_path)
    assert n == 2
    assert FakeDB.data[0]["pseudo_label"] == 1
    assert FakeDB.data[1]["pseudo_label"] == 0
    assert os.path.exists(out_path)


def test_remote_trainer_submission(tmp_path):
    from antmmf_tpu.trainers.remote_trainer import RemoteTrainer

    tmpl = tmp_path / "job.tmpl"
    tmpl.write_text("config: ${CONFIG_PATH}\ntopology: ${TPU_TOPOLOGY}\n")
    t = RemoteTrainer({"training_parameters": {"remote": {
        "submit_command": "cat {job_spec}",
        "job_spec_template": str(tmpl),
        "env": {"TPU_TOPOLOGY": "4x4"},
    }}})
    t.load()
    assert t.train() == 0

    bad = RemoteTrainer({"training_parameters": {}})
    import pytest as _pytest

    with _pytest.raises(ValueError, match="submit_command"):
        bad.load()


def test_extract_vocabulary_script(tmp_path):
    import json

    from antmmf_tpu.scripts.extract_vocabulary import extract_vocabulary

    ann = tmp_path / "train.jsonl"
    rows = [{"caption": "a little girl does gymnastics"},
            {"caption": "a girl runs"}]
    ann.write_text("\n".join(json.dumps(r) for r in rows))
    path = extract_vocabulary([str(ann)], str(tmp_path), min_freq=1,
                              text_key="caption")
    words = open(path).read().split()
    assert "girl" in words and "gymnastics" in words
    # min_freq filter
    path2 = extract_vocabulary([str(ann)], str(tmp_path), min_freq=2,
                               vocab_file_name="v2.txt", text_key="caption")
    words2 = open(path2).read().split()
    assert words2 == ["a", "girl"]


def test_extract_features_regions_mode(tmp_path, data_dir):
    import os
    import shutil

    import numpy as np

    from antmmf_tpu.scripts.extract_features import main as extract_main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    shutil.copy(os.path.join(data_dir, "image", "dog.jpg"),
                img_dir / "dog.jpg")
    out = tmp_path / "feats"
    extract_main(["--image_dir", str(img_dir), "--out_dir", str(out),
                  "--encoder", "vit", "--preset", "vit_tiny_test",
                  "--image_size", "64", "--batch_size", "1",
                  "--mode", "regions", "--num_regions", "4"])
    data = np.load(out / "dog.npz")
    assert data["features"].shape[0] == 4
    assert data["boxes"].shape == (4, 4)
    # boxes tile the image
    assert float(data["boxes"][-1][2]) == 64.0
    # FeaturesDatabase reads it back
    from antmmf_tpu.datasets.database.features_database import FeaturesDatabase

    db = FeaturesDatabase(str(out), max_regions=4)
    item = db("dog")
    assert item["image_feature"].shape[0] == 4
    assert item["image_feature_mask"].sum() == 4


def test_general_utils_surface():
    from antmmf_tpu.utils.general import (
        AttrDict,
        check_required_keys,
        dict_to_string,
        flatten_list,
        get_overlap_score,
        is_module_available,
        jsonl_dump,
    )

    assert get_overlap_score("a red car", "red car") == 1.0
    assert get_overlap_score("a blue car", "red car") == 0.5
    assert "x: 0.1235" in dict_to_string({"x": 0.12345})
    assert flatten_list([[1, [2]], (3,)]) == [1, 2, 3]
    assert is_module_available("json") and not is_module_available("nope_xyz")
    assert check_required_keys({"a": 1}, ["a"]) and not check_required_keys(
        {}, ["a"])
    d = AttrDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    import tempfile, os, json

    with tempfile.TemporaryDirectory() as td:
        p = jsonl_dump([{"x": 1}, {"x": 2}], os.path.join(td, "r.jsonl"))
        rows = [json.loads(l) for l in open(p)]
        assert rows == [{"x": 1}, {"x": 2}]
