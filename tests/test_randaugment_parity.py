"""RandAugment parity: our numpy/cv2 ops vs the reference ALBEF
``randaugment.py`` run in-process
(``/root/reference/prj/M2_Encoder/vlmo/transforms/randaugment.py`` — the
augmentation M2-Encoder trains with, ``square_transform.py:17-41``).

Point ops (LUT-based) must match EXACTLY; geometry ops share the same cv2
warp so they must match exactly too; Color is compared with the channel
order each side assumes (the reference indexes luminance weights for BGR
arrays, ours for RGB — same math, mirrored channels).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_compat import REFERENCE_ROOT, reference_available  # noqa: E402

from antmmf_tpu.datasets.processors import augment  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present")


@pytest.fixture(scope="module")
def ref():
    path = os.path.join(
        REFERENCE_ROOT, "prj/M2_Encoder/vlmo/transforms/randaugment.py")
    spec = importlib.util.spec_from_file_location("ref_randaug", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    # inject structure so equalize/autocontrast have non-trivial histograms
    base[8:24, 10:30] = 200
    base[30:40, 40:60] = 15
    return base


def test_point_ops_exact(ref, img):
    assert np.array_equal(augment.autocontrast(img),
                          ref.autocontrast_func(img))
    assert np.array_equal(augment.equalize(img), ref.equalize_func(img))
    for thresh in (0, 77, 128, 256):
        assert np.array_equal(augment.solarize(img, thresh),
                              ref.solarize_func(img, thresh)), thresh
    for bits in (1, 2, 4):
        # the reference's np.uint8(255 << (8 - bits)) relies on numpy-1.x
        # modular wrapping (OverflowError on numpy ≥ 2); compare against
        # that wrap semantics directly
        want = img & np.uint8((255 << (8 - bits)) & 0xFF)
        assert np.array_equal(augment.posterize(img, bits), want), bits
    for f in (0.1, 0.7, 1.0, 1.9):
        assert np.array_equal(augment.brightness(img, f),
                              ref.brightness_func(img, f)), f
        # contrast blends against mean luminance; like Color, the reference
        # weights assume BGR channel order, ours RGB — mirror to compare
        theirs = ref.contrast_func(img[:, :, ::-1], f)[:, :, ::-1]
        assert np.array_equal(augment.contrast(img, f), theirs), f
        # sharpness: the reference astype(uint8) WRAPS on out-of-range blend
        # values at factor > 1 (PIL clips; we clip) — compare where in-range
        ours_s = augment.sharpness(img, f)
        theirs_s = ref.sharpness_func(img, f)
        in_range = (ours_s > 0) & (ours_s < 255)
        assert np.array_equal(ours_s[in_range], theirs_s[in_range]), f


def test_color_matches_with_channel_convention(ref, img):
    # the reference matrix assumes BGR input; ours assumes RGB. Feeding each
    # its own convention must produce the same image (mirrored back).
    for f in (0.1, 0.7, 1.9):
        ours_rgb = augment.color(img, f)
        theirs_bgr = ref.color_func(img[:, :, ::-1], f)
        assert np.abs(ours_rgb.astype(int)
                      - theirs_bgr[:, :, ::-1].astype(int)).max() <= 1, f


def test_geometry_ops_exact(ref, img):
    fill = (128, 128, 128)
    assert np.array_equal(augment.rotate(img, 17.5, fill),
                          ref.rotate_func(img, 17.5, fill))
    assert np.array_equal(augment.shear_x(img, 0.21, fill),
                          ref.shear_x_func(img, 0.21, fill))
    assert np.array_equal(augment.shear_y(img, -0.3, fill),
                          ref.shear_y_func(img, -0.3, fill))
    assert np.array_equal(augment.translate_x(img, 6.0, fill),
                          ref.translate_x_func(img, 6.0, fill))
    assert np.array_equal(augment.translate_y(img, -4.0, fill),
                          ref.translate_y_func(img, -4.0, fill))


def test_rand_augment_pipeline_determinism_and_domain(img):
    rng1 = np.random.default_rng(0)
    rng2 = np.random.default_rng(0)
    a = augment.rand_augment(img, 2, 7, rng1)
    b = augment.rand_augment(img, 2, 7, rng2)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == img.shape


def test_processor_preserves_float_domain(img):
    proc = augment.RandAugmentProcessor({"seed": 3, "magnitude": 7})
    fimg = img.astype(np.float32) / 255.0
    out = proc({"image": fimg})["image"]
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # frame stacks augment per frame
    stack = np.stack([fimg, fimg])
    outs = proc({"image": stack})["image"]
    assert outs.shape == stack.shape


def test_every_op_runs_at_every_magnitude(img):
    rng = np.random.default_rng(1)
    for name, fn in augment.OPS.items():
        for lvl in (0.0, 5.0, 10.0):
            out = fn(img, lvl, rng)
            assert out.shape == img.shape and out.dtype == np.uint8, (
                name, lvl)


def test_image_transforms_m2_encoder_recipe(img):
    """square_transform_randaug as an ImageTransforms config: RandomResizedCrop
    → flip → RandAugment(2, 7) → normalize (square_transform.py:17-41)."""
    from antmmf_tpu.common.registry import registry

    cls = registry.get_processor_class("image_transforms")
    proc = cls({"seed": 11, "transforms": [
        {"type": "random_resized_crop",
         "params": {"size": 32, "scale": (0.8, 1.0)}},
        {"type": "random_flip", "params": {"prob": 0.5}},
        {"type": "rand_augment", "params": {"num_ops": 2, "magnitude": 7}},
        {"type": "normalize", "params": {"preset": "imagenet"}},
    ]})
    out = proc({"image": img})["image"]
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    assert np.isfinite(out).all()


def test_normalized_image_train_augment(img):
    """NormalizedImageProcessor.train_augment: the M2-Encoder train recipe
    replaces resize+center-crop, stays size-correct and split-gated."""
    from antmmf_tpu.datasets.processors.image_processors import (
        NormalizedImageProcessor,
    )

    plain = NormalizedImageProcessor({"size": 32, "norm_preset": "clip"})
    aug = NormalizedImageProcessor({
        "size": 32, "norm_preset": "clip", "seed": 5,
        "train_augment": {
            "random_resized_crop": {"scale": (0.8, 1.0)},
            "random_flip": {"prob": 0.5},
            "rand_augment": {"num_ops": 2, "magnitude": 7},
        }})
    a = plain.transform_array(img)
    b = aug.transform_array(img)
    assert a.shape == b.shape == (32, 32, 3)
    assert np.isfinite(b).all()
    assert not np.allclose(a, b)  # augmentation actually fired
    # seeded determinism
    aug2 = NormalizedImageProcessor({
        "size": 32, "norm_preset": "clip", "seed": 5,
        "train_augment": {
            "random_resized_crop": {"scale": (0.8, 1.0)},
            "random_flip": {"prob": 0.5},
            "rand_augment": {"num_ops": 2, "magnitude": 7},
        }})
    assert np.allclose(b, aug2.transform_array(img))
    # the is_train gate lives in the processor itself: an eval-split build
    # with the same config must be augmentation-free (== plain pipeline)
    eval_proc = NormalizedImageProcessor({
        "size": 32, "norm_preset": "clip", "seed": 5,
        "train_augment": {
            "random_resized_crop": {"scale": (0.8, 1.0)},
            "random_flip": {"prob": 0.5},
            "rand_augment": {"num_ops": 2, "magnitude": 7},
        }}, is_train=False)
    assert eval_proc._augment is None
    assert np.allclose(a, eval_proc.transform_array(img))
