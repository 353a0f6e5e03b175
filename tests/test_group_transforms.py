"""TSN/TSM group (multi-frame) transforms + image loaders.

Reference: /root/reference/antmmf/utils/image_ops.py:17-697 (Group* family,
Stack/ToTorchFormatTensor, ImageLoader/ExifImageLoader/CV2ImageLoader/
YoloImageLoader).
"""

import numpy as np
import pytest

from antmmf_tpu.common.registry import registry
from antmmf_tpu.utils import image_ops as I


def _group(n=4, h=48, w=64, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (h, w, c), dtype=np.uint8).astype(np.uint8)
            for _ in range(n)]


def test_group_random_crop_shares_offset():
    g = _group()
    out = I.GroupRandomCrop(32)(g, np.random.default_rng(0))
    assert all(f.shape[:2] == (32, 32) for f in out)
    # same offset across frames: re-derive by matching against source
    out2 = I.GroupRandomCrop(32)(g, np.random.default_rng(0))
    for a, b in zip(out, out2):
        np.testing.assert_array_equal(a, b)


def test_group_center_crop_and_scale():
    g = _group()
    out = I.GroupCenterCrop((24, 40))(g)
    assert all(f.shape[:2] == (24, 40) for f in out)
    scaled = I.GroupScale(32)(g)
    assert all(min(f.shape[:2]) == 32 for f in scaled)


def test_group_flip_flow_inversion():
    g = _group(n=4, c=1)
    out = I.GroupRandomHorizontalFlip(is_flow=True)(
        g, np.random.default_rng(2))  # rng(2).random() ≈ 0.26 < 0.5 → flip
    assert out is not g and len(out) == 4
    # flow-x slots (even) inverted after flip: x + flipped == 255
    np.testing.assert_array_equal(
        out[0], 255 - np.flip(g[0], axis=1))
    np.testing.assert_array_equal(out[1], np.flip(g[1], axis=1))


def test_group_oversample_counts():
    g = _group(n=2)
    out = I.GroupOverSample(32, scale_size=40)(g)
    assert len(out) == 2 * 5 * 2  # frames × anchors × {normal, flip}
    assert all(f.shape[:2] == (32, 32) for f in out)
    out_noflip = I.GroupOverSample(32, scale_size=40, flip=False)(g)
    assert len(out_noflip) == 2 * 5


def test_group_fullres_sample_counts():
    g = _group(n=2)
    out = I.GroupFullResSample(32, scale_size=40)(g)
    assert len(out) == 2 * 3 * 2
    assert all(f.shape[:2] == (32, 32) for f in out)


def test_group_multiscale_crop():
    g = _group()
    out = I.GroupMultiScaleCrop(32)(g, np.random.default_rng(0))
    assert all(f.shape[:2] == (32, 32) for f in out)


def test_group_random_sized_crop():
    g = _group()
    out = I.GroupRandomSizedCrop(28)(g, np.random.default_rng(0))
    assert all(f.shape[:2] == (28, 28) for f in out)


def test_stack_and_to_array_format():
    g = _group(n=4)
    stacked = I.Stack()(g)
    assert stacked.shape == (48, 64, 12)
    rolled = I.Stack(roll=True)(g)
    np.testing.assert_array_equal(rolled[..., :3], g[0][..., ::-1])
    chw = I.ToArrayFormat()(g[0])
    assert chw.shape == (3, 48, 64) and chw.max() <= 1.0
    assert I.IdentityTransform()(g) is g


def test_group_normalize_tiles_channels():
    g = _group(n=2)
    stacked = I.Stack()(g)  # [H, W, 6] uint8-range
    out = I.GroupNormalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])(stacked)
    assert out.shape == stacked.shape
    assert -1.01 <= out.min() and out.max() <= 1.01  # /255 then (x-.5)/.5
    per_frame = I.GroupNormalize([0.5] * 3, [0.5] * 3)(g)
    assert isinstance(per_frame, list) and per_frame[0].shape == g[0].shape


def test_group_transforms_processor():
    cls = registry.get_processor_class("tsn_group_transforms")
    proc = cls({"seed": 0, "transforms": [
        {"type": "GroupScale", "params": {"size": 40}},
        {"type": "GroupMultiScaleCrop", "params": {"input_size": 32}},
        {"type": "GroupRandomHorizontalFlip"},
    ]})
    video = np.random.default_rng(0).integers(
        0, 255, (4, 48, 64, 3), dtype=np.int64).astype(np.uint8)
    out = proc({"video": video})["video"]
    assert out.shape == (4, 32, 32, 3)
    with pytest.raises(KeyError):
        cls({"transforms": [{"type": "nope"}]})


def test_image_loaders(tmp_path):
    import cv2

    d = tmp_path / "vid1"
    d.mkdir()
    frame = np.random.default_rng(0).integers(
        0, 255, (16, 20, 3), dtype=np.int64).astype(np.uint8)
    cv2.imwrite(str(d / "img_00001.jpg"), frame)

    loader = I.ImageLoader(root_path=str(tmp_path))
    imgs = loader.load_image("vid1", 1)
    assert imgs[0].shape == (16, 20, 3)
    # missing frame falls back to frame 1 (reference behavior)
    assert loader.load_image("vid1", 99)[0].shape == (16, 20, 3)

    # flow from an RGB file: first two channels
    fl = I.ImageLoader(modality="Flow", root_path=str(tmp_path),
                       image_tmpl="img_{:05d}.jpg")
    x, y = fl.load_image("vid1", 1)
    assert x.shape == (16, 20) and y.shape == (16, 20)

    rgb = I.CV2ImageLoader.load(str(d / "img_00001.jpg"))
    assert rgb.shape == (16, 20, 3)
    with pytest.raises(FileNotFoundError):
        I.CV2ImageLoader.load(str(d / "missing.jpg"))


def test_exif_loader(tmp_path):
    from PIL import Image

    p = tmp_path / "a.jpg"
    Image.fromarray(np.zeros((8, 12, 3), np.uint8)).save(p)
    arr = I.ExifImageLoader.load_with_exif(str(p))
    assert arr.shape == (8, 12, 3)

    # orientation 6 → 270° rotation with expand (dims swap)
    img = Image.fromarray(np.zeros((8, 12, 3), np.uint8))
    exif = img.getexif()
    exif[0x0112] = 6
    p2 = tmp_path / "b.jpg"
    img.save(p2, exif=exif)
    arr2 = I.ExifImageLoader.load_with_exif(str(p2))
    assert arr2.shape == (12, 8, 3)


def test_yolo_loader(tmp_path):
    import cv2

    p = tmp_path / "y.jpg"
    cv2.imwrite(str(p), np.zeros((60, 120, 3), np.uint8))
    out = I.YoloImageLoader(target_size=64)(str(p))
    assert out["origin_size"] == (60, 120)
    assert max(out["image_size"]) == 64
    assert out["image"].shape[:2] == out["image_size"]


def test_picture_in_picture(tmp_path):
    import cv2
    import warnings

    img = np.full((40, 30, 3), 128, np.uint8)
    # unset dir: warns, passthrough
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert I.picture_in_picture(img, None) is img
    cv2.imwrite(str(tmp_path / "bg.jpg"), np.zeros((100, 90, 3), np.uint8))
    for seed in range(4):  # exercise all background branches
        out = I.picture_in_picture(img, str(tmp_path),
                                   np.random.default_rng(seed))
        assert out.ndim == 3 and out.shape[2] == 3
        assert min(out.shape[:2]) >= min(img.shape[:2])


def test_rand_logo(tmp_path):
    from PIL import Image
    import warnings

    img = np.zeros((50, 60, 3), np.uint8)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert I.rand_logo(img, None) is img
    logo = np.zeros((10, 10, 4), np.uint8)
    logo[..., 0] = 255  # red
    logo[..., 3] = 255  # opaque
    Image.fromarray(logo, "RGBA").save(tmp_path / "logo.png")
    out = I.rand_logo(img, str(tmp_path), np.random.default_rng(0))
    assert out.shape == img.shape
    assert out[..., 0].max() == 255  # logo composited
    assert I.randLogo is I.rand_logo and I.pictureInPicture is I.picture_in_picture
