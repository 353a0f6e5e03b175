"""Feature-reader family (reference antmmf/datasets/features/
feature_readers.py:24-339): layout dispatch, padding, info sidecars, bbox
payloads."""

import numpy as np
import pytest

from antmmf_tpu.datasets.database.feature_readers import (
    CHWFeatureReader,
    Dim3FeatureReader,
    FeatureReader,
    HWCFeatureReader,
    PaddedFeatureRCNNWithBBoxesFeatureReader,
)


def test_grid_readers(tmp_path):
    chw = tmp_path / "chw.npy"
    np.save(chw, np.zeros((1, 8, 4, 4), np.float32))
    feat, _ = CHWFeatureReader().read(str(chw))
    assert feat.shape == (8, 4, 4)

    hwc = tmp_path / "hwc.npy"
    np.save(hwc, np.zeros((1, 4, 4, 8), np.float32))
    feat, _ = HWCFeatureReader().read(str(hwc))
    assert feat.shape == (16, 8)

    d3 = tmp_path / "d3.npy"
    np.save(d3, np.zeros((4, 4, 8), np.float32))
    feat, _ = Dim3FeatureReader().read(str(d3))
    assert feat.shape == (16, 8)


def test_padded_reader_with_info_sidecar(tmp_path):
    np.save(tmp_path / "img1.npy", np.ones((5, 16), np.float32))
    np.save(tmp_path / "img1_info.npy",
            np.array({"bbox": np.zeros((5, 4)), "cls": [1, 2, 3, 4, 5]}))
    r = FeatureReader(str(tmp_path), ndim=2, max_features=8, feature_dim=16)
    feat, info = r.read("img1.npy")
    assert feat.shape == (8, 16)
    assert float(feat[:5].sum()) == 5 * 16 and float(feat[5:].sum()) == 0
    assert int(info["max_features"]) == 5
    assert "bbox" in info and "cls" in info


def test_padded_reader_dict_payload_and_overflow(tmp_path):
    # OCR-style dict payload + more regions than max_loc
    payload = {"image_feat": np.ones((10, 4), np.float32),
               "image_text": ["a"] * 10, "image_bbox_source": "ocr"}
    np.save(tmp_path / "ocr.npy", np.array(payload))
    r = FeatureReader(str(tmp_path), ndim=2, max_features=6)
    feat, info = r.read("ocr.npy")
    assert feat.shape == (6, 4) and info["image_text"][0] == "a"
    assert int(info["max_features"]) == 10  # true count kept

    # grid payload flattens to tokens
    np.save(tmp_path / "grid.npy", np.ones((2, 3, 8), np.float32))
    feat, _ = r.read("grid.npy")
    assert feat.shape == (6, 8)


def test_unpadded_and_info_only(tmp_path):
    np.save(tmp_path / "raw.npy", np.ones((3, 4), np.float32))
    r = FeatureReader(str(tmp_path), ndim=2)  # no max_features → raw
    feat, info = r.read("raw.npy")
    assert feat.shape == (3, 4) and info is None

    np.save(tmp_path / "raw_info.npy", np.array({"n": 3}))
    ri = FeatureReader(str(tmp_path), only_features_info=True)
    feat, info = ri.read("raw.npy")
    assert feat is None and info["n"] == 3


def test_bbox_payload_reader(tmp_path):
    payload = {"image_feature": np.ones((4, 8), np.float32),
               "image_bboxes": np.arange(16).reshape(4, 4)}
    p = tmp_path / "b.npy"
    np.save(p, np.array(payload))
    feat, info = PaddedFeatureRCNNWithBBoxesFeatureReader(6).read(str(p))
    assert feat.shape == (6, 8) and info["image_bbox"].shape == (6, 4)
    assert int(info["max_features"]) == 4
    assert info["image_bbox"][3].tolist() == [12, 13, 14, 15]
    assert info["image_bbox"][4:].sum() == 0


def test_corrupt_file_degrades_to_zeros(tmp_path):
    (tmp_path / "bad.npy").write_bytes(b"not-an-npy")
    r = FeatureReader(str(tmp_path), ndim=2, max_features=4, feature_dim=7)
    with pytest.warns(UserWarning):
        feat, info = r.read("bad.npy")
    assert feat.shape == (4, 7) and feat.sum() == 0


def test_unknown_layout_raises(tmp_path):
    with pytest.raises(TypeError):
        FeatureReader(str(tmp_path), ndim=5, depth_first=True)
