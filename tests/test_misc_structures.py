import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.datasets.database.video_database import (
    KeyFramesDatabase,
    MultiSourceLoader,
)
from antmmf_tpu.modules.fusions import CosineFusion, EncoderFusion, SimpleLinearFusion
from antmmf_tpu.structures.boxes import Boxes, pairwise_iou
from antmmf_tpu.structures.nested_tensor import NestedTensor

KEY = jax.random.PRNGKey(0)


@pytest.fixture
def keyframes_root(tmp_path):
    import cv2

    d = tmp_path / "clip1"
    d.mkdir()
    for i in range(6):
        img = np.full((20, 30, 3), i * 30, np.uint8)
        cv2.imwrite(str(d / f"frame_{i:03d}.jpg"), img)
    return str(tmp_path)


def test_keyframes_database(keyframes_root):
    db = KeyFramesDatabase(keyframes_root)
    clips = db.get("clip1", n_clips=2, frames_per_clip=2)
    assert clips.shape == (2, 2, 20, 30, 3)
    # uniform sampling: second clip's frames come later in the sequence
    assert clips[1].mean() > clips[0].mean()


def test_multi_source_loader_dispatch(keyframes_root):
    loader = MultiSourceLoader(keyframes_root, source="keyframes")
    clips = loader.get("clip1", n_clips=1, frames_per_clip=3)
    assert clips.shape[:2] == (1, 3)
    with pytest.raises(ValueError):
        MultiSourceLoader(keyframes_root, source="bogus")


def test_nested_tensor_padding():
    imgs = [np.ones((4, 6, 3), np.float32), np.ones((8, 5, 3), np.float32)]
    nt = NestedTensor.from_list(imgs)
    tensors, mask = nt.decompose()
    assert tensors.shape == (2, 8, 6, 3)
    assert not mask[0, :4, :6].any() and mask[0, 4:, :].all()
    assert not mask[1, :8, :5].any() and mask[1, :, 5:].all()
    nt2 = NestedTensor.from_list(imgs, pad_to=(10, 10))
    assert nt2.tensors.shape == (2, 10, 10, 3)


def test_boxes_container():
    b = Boxes(np.array([[0, 0, 4, 4], [2, 2, 6, 6]], np.float32))
    np.testing.assert_allclose(np.asarray(b.area()), [16.0, 16.0])
    iou = b.iou(b)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(iou)), 1.0)
    assert float(iou[0, 1]) == pytest.approx(4 / 28)
    clipped = b.clip(5, 5)
    assert float(clipped.tensor[1, 2]) == 5.0
    xywh = Boxes(np.array([[1, 1, 2, 2]], np.float32), mode="xywh")
    np.testing.assert_allclose(np.asarray(xywh.tensor), [[1, 1, 3, 3]])
    np.testing.assert_allclose(np.asarray(xywh.convert("cxcywh")), [[2, 2, 2, 2]])


def test_fusion_modules():
    a, b = jnp.ones((2, 8)), jnp.ones((2, 8)) * 2
    f = SimpleLinearFusion(out_dim=4)
    params = f.init(KEY, a, b)
    assert f.apply(params, a, b).shape == (2, 4)

    streams = (jnp.ones((2, 3, 16)), jnp.ones((2, 5, 16)))
    ef = EncoderFusion(num_layers=1, num_heads=2)
    params = ef.init(KEY, *streams)
    assert ef.apply(params, *streams).shape == (2, 8, 16)

    cf = CosineFusion(scale=10.0)
    sim = cf.apply(cf.init(KEY, a, b), a, b)
    np.testing.assert_allclose(np.asarray(sim), 10.0, rtol=1e-5)


def test_sized_data_structure_fields_and_slicing():
    import numpy as np

    from antmmf_tpu.structures.base import SizedDataStructure

    s = SizedDataStructure(np.arange(12).reshape(3, 4))
    s.score = np.array([0.1, 0.2, 0.3])
    assert len(s) == 3 and s.has_field("score")
    one = s[1]
    assert one.tensor.shape == (1, 4) and float(one.score[0]) == 0.2
    some = s[[0, 2]]
    assert some.tensor.shape == (2, 4)
    assert [float(x) for x in some.score] == [0.1, 0.3]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.bad = np.zeros(5)
    clone = s.clone()
    clone.tensor[0, 0] = 99
    assert s.tensor[0, 0] == 0  # deep copy


def test_image_list_padding_and_divisibility():
    import numpy as np

    from antmmf_tpu.structures.images import ImageList

    ims = [np.ones((30, 40, 3), np.float32), np.ones((50, 20, 3), np.float32)]
    il = ImageList.from_tensors(ims, size_divisibility=32)
    assert il.tensor.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(il.image_sizes, [[30, 40], [50, 20]])
    masks = il.pad_masks()
    assert masks.shape == (2, 64, 64)
    assert not masks[0, :30, :40].any() and masks[0, 30:, :].all()


def test_multisource_auto_prefers_keyframes(tmp_path, data_dir):
    """source=auto uses <root>_keyframes when present (thin-host fast path)
    and falls back to mp4 decode otherwise."""
    import os
    import shutil
    import time

    import numpy as np

    from antmmf_tpu.datasets.database.video_database import MultiSourceLoader
    from antmmf_tpu.scripts.extract_keyframes import extract_keyframes

    src = os.path.join(data_dir, "video", "data", "mp4")
    video_root = str(tmp_path / "mp4")
    shutil.copytree(src, video_root)

    # no keyframes yet → auto = video decode
    loader = MultiSourceLoader(video_root)
    assert loader.source == "video"
    clips_v = loader.get("video9770", n_clips=1, frames_per_clip=4)
    assert clips_v.shape[:2] == (1, 4)

    n = extract_keyframes(video_root, frames=8)
    assert n >= 2

    loader2 = MultiSourceLoader(video_root)
    assert loader2.source == "keyframes"
    clips_k = loader2.get("video9770", n_clips=1, frames_per_clip=4)
    assert clips_k.shape[:2] == (1, 4)
    assert clips_k.shape[2:] == clips_v.shape[2:]

    # keyframe reads are faster than mp4 seek-decode
    t0 = time.perf_counter()
    for _ in range(3):
        loader2.get("video9770", n_clips=1, frames_per_clip=4)
    t_kf = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        loader.get("video9770", n_clips=1, frames_per_clip=4)
    t_mp4 = time.perf_counter() - t0
    assert t_kf < t_mp4


def test_boxes_extended_surface():
    """nonempty/inside_box/get_centers/scale/cat/matched_iou
    (reference structures/boxes.py:199-376)."""
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.structures.boxes import Boxes

    b = Boxes(jnp.asarray([[0, 0, 4, 4], [1, 1, 1, 3], [2, 2, 8, 8]],
                          jnp.float32))
    assert b.nonempty().tolist() == [True, False, True]
    assert b.inside_box(6, 6).tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(b.get_centers())[0], [2, 2])
    scaled = b.scale(2.0, 0.5)
    np.testing.assert_allclose(np.asarray(scaled.tensor)[0], [0, 0, 8, 2])
    both = Boxes.cat([b, scaled])
    assert len(both) == 6
    assert len(Boxes.cat([])) == 0
    # aligned IoU: identical boxes → 1, disjoint → 0
    ident = b.matched_iou(b)
    np.testing.assert_allclose(np.asarray(ident)[[0, 2]], 1.0, atol=1e-6)
    one = b[0]
    assert len(one) == 1
