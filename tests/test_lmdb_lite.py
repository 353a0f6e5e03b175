"""lmdb-lite: the pure-Python LMDB reader/writer + the un-stubbed data paths.

The reference stores packed features/frames in LMDB (reference
antmmf/datasets/database/video_database.py:289-335, scripts/features/
lmdb_conversion.py); this image lacks the lmdb package, so
``utils/lmdb_lite.py`` implements the on-disk format directly. These tests
round-trip write→read (multi-page B+tree, overflow values), then drive the
real data-plane consumers: LmdbVideoDatabase, FeaturesDatabase and the
keyframe packer CLI.
"""

import io
import os

import numpy as np
import pytest

from antmmf_tpu.utils.lmdb_lite import (
    PAGE_SIZE, LmdbLiteReader, LmdbLiteWriter, open_lmdb)


def test_roundtrip_small(tmp_path):
    p = str(tmp_path / "small.lmdb")
    w = LmdbLiteWriter(p)
    w.put("b", b"two")
    w.put("a", b"one")
    w.put("c", b"three")
    w.save()
    r = LmdbLiteReader(p)
    assert len(r) == 3
    assert r.get(b"a") == b"one"
    assert r.get("b") == b"two"
    assert r.get(b"c") == b"three"
    assert r.get(b"zz") is None
    assert r.keys() == [b"a", b"b", b"c"]  # sorted bulk load


def test_roundtrip_multipage_branch(tmp_path):
    """Enough entries to force multiple leaf pages under a branch root."""
    p = str(tmp_path / "big.lmdb")
    w = LmdbLiteWriter(p)
    rng = np.random.default_rng(0)
    kv = {}
    for i in range(400):
        key = f"key_{i:05d}"
        val = rng.integers(0, 256, rng.integers(10, 200)).astype(
            np.uint8).tobytes()
        kv[key] = val
        w.put(key, val)
    w.save()
    r = LmdbLiteReader(p)
    assert len(r) == 400
    for key, val in kv.items():
        assert r.get(key) == val, key
    # full scan agrees
    items = dict(r.items())
    assert items == {k.encode(): v for k, v in kv.items()}


def test_roundtrip_overflow_values(tmp_path):
    """Values larger than a page go to overflow chains (F_BIGDATA)."""
    p = str(tmp_path / "ovf.lmdb")
    w = LmdbLiteWriter(p)
    big = bytes(range(256)) * 64  # 16 KiB > PAGE_SIZE
    w.put("big", big)
    w.put("small", b"x")
    w.save()
    r = LmdbLiteReader(p)
    assert r.get("big") == big
    assert r.get("small") == b"x"


def test_open_lmdb_falls_back(tmp_path):
    p = str(tmp_path / "env.lmdb")
    w = LmdbLiteWriter(p)
    w.put("k", b"v")
    w.save()
    env = open_lmdb(p)
    assert env.get(b"k") == b"v"


def test_lmdb_video_database(tmp_path):
    from antmmf_tpu.datasets.database.video_database import (
        LmdbVideoDatabase, MultiSourceLoader)

    p = str(tmp_path / "clips.lmdb")
    w = LmdbLiteWriter(p)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (10, 8, 8, 3)).astype(np.uint8)
    buf = io.BytesIO()
    np.save(buf, frames)
    w.put("video9770", buf.getvalue())
    w.save()

    db = LmdbVideoDatabase(p)
    out = db.get("video9770.mp4", n_clips=2, frames_per_clip=4)
    assert out.shape == (2, 4, 8, 8, 3)
    # uniform (eval) sampling is deterministic
    out2 = db.get("video9770", n_clips=2, frames_per_clip=4)
    np.testing.assert_array_equal(out, out2)

    loader = MultiSourceLoader(p, source="lmdb")
    out3 = loader.get("video9770", n_clips=1, frames_per_clip=4)
    assert out3.shape == (1, 4, 8, 8, 3)


def test_features_database_lmdb(tmp_path):
    from antmmf_tpu.datasets.database.features_database import (
        FeaturesDatabase)

    p = str(tmp_path / "feat.lmdb")
    w = LmdbLiteWriter(p)
    feat = np.random.default_rng(2).standard_normal((7, 16)).astype(
        np.float32)
    buf = io.BytesIO()
    np.save(buf, feat)
    w.put("img_001", buf.getvalue())
    w.save()
    db = FeaturesDatabase(p, max_regions=7, feature_dim=16)
    got = db._load_raw("img_001")
    np.testing.assert_array_equal(got, feat)
    with pytest.raises(KeyError):
        db._load_raw("missing")


def test_keyframe_packer_cli(tmp_path):
    """scripts/extract_keyframes.pack_lmdb: keyframe dirs → one env readable
    by LmdbVideoDatabase (the fixture round-trip VERDICT asked for)."""
    cv2 = pytest.importorskip("cv2")
    from antmmf_tpu.datasets.database.video_database import LmdbVideoDatabase
    from antmmf_tpu.scripts.extract_keyframes import pack_lmdb

    kf = tmp_path / "kf" / "clip_a"
    kf.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(6):
        img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        cv2.imwrite(str(kf / f"{i:04d}.png"), img[:, :, ::-1])
    out = pack_lmdb(str(tmp_path / "kf"), str(tmp_path / "packed.lmdb"))
    db = LmdbVideoDatabase(out)
    frames = db.get("clip_a", n_clips=1, frames_per_clip=4)
    assert frames.shape == (1, 4, 8, 8, 3)
