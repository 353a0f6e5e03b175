"""hm_convert: competition zip → mmf_image_text layout."""

import json
import os
import zipfile

import numpy as np


def _make_zip(path):
    import cv2

    img = (np.random.default_rng(0).uniform(size=(8, 8, 3)) * 255
           ).astype(np.uint8)
    tmp_img = str(path.parent / "tmp.png")
    cv2.imwrite(tmp_img, img)
    with zipfile.ZipFile(path, "w") as zf:
        for split in ("train", "dev", "test"):
            zf.writestr(f"data/{split}.jsonl", json.dumps(
                {"id": 1, "img": "img/0001.png", "text": "hello",
                 "label": 0}) + "\n")
        zf.write(tmp_img, "data/img/0001.png")
        zf.write(tmp_img, "data/img/0002.png")
    return str(path)


def test_hm_convert_layout(tmp_path):
    from antmmf_tpu.scripts.hm_convert import convert

    zpath = _make_zip(tmp_path / "hm.zip")
    out = tmp_path / "hateful_memes"
    result = convert(zpath, str(out), verify_checksum=True)  # warns, proceeds
    assert result["n_images"] == 2
    for split in ("train", "dev", "test"):
        p = out / "annotations" / f"{split}.jsonl"
        assert p.exists()
        row = json.loads(p.read_text().strip())
        assert row["text"] == "hello"
    assert (out / "images" / "0001.png").exists()


def test_hm_convert_missing_annotations(tmp_path):
    from antmmf_tpu.scripts.hm_convert import convert

    with zipfile.ZipFile(tmp_path / "bad.zip", "w") as zf:
        zf.writestr("data/train.jsonl", "{}")
    import pytest

    with pytest.raises(AssertionError):
        convert(str(tmp_path / "bad.zip"), str(tmp_path / "o"),
                verify_checksum=False)
