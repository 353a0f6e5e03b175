"""Image processors: host-side decode/resize/crop/normalize producing fixed-shape
float arrays in **HWC layout** (TPU-friendly: XLA convs and patch embedding prefer
NHWC; the reference emits CHW for torch, ``antmmf/datasets/processors/
image_processors.py:162-425``).

Registered names kept from the reference: ``normalized_image`` (:162),
``grayscale_to_3_channels`` (:427), ``random_flip`` (:560), plus a composable
``image_transforms`` pipeline standing in for ``torchvision_transforms`` (:374).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _to_float_hwc(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def resize_image(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (h, w)."""
    h, w = size
    if cv2 is not None:
        out = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        if out.ndim == 2:
            out = out[:, :, None]
        return out
    # numpy fallback: nearest
    ys = (np.linspace(0, img.shape[0] - 1, h)).astype(int)
    xs = (np.linspace(0, img.shape[1] - 1, w)).astype(int)
    return img[ys][:, xs]


def resize_shorter_side(img: np.ndarray, target: int) -> np.ndarray:
    h, w = img.shape[:2]
    if h <= w:
        new_h, new_w = target, max(1, round(w * target / h))
    else:
        new_h, new_w = max(1, round(h * target / w)), target
    return resize_image(img, (new_h, new_w))


def center_crop(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    th, tw = size
    h, w = img.shape[:2]
    if h < th or w < tw:  # pad if needed
        pad_h, pad_w = max(0, th - h), max(0, tw - w)
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        h, w = img.shape[:2]
    top = (h - th) // 2
    left = (w - tw) // 2
    return img[top : top + th, left : left + tw]


def normalize(img: np.ndarray, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    mean = np.asarray(mean, dtype=np.float32).reshape(1, 1, -1)
    std = np.asarray(std, dtype=np.float32).reshape(1, 1, -1)
    return (img - mean) / std


@registry.register_processor("normalized_image")
class NormalizedImageProcessor(BaseProcessor):
    """shorter-side resize → center crop → normalize. Output: float32[H, W, 3].

    Optional ``train_augment`` block (the M2-Encoder training transform,
    reference prj/M2_Encoder/vlmo/transforms/square_transform.py:17-41 —
    datasets pass it through only on the train split)::

        train_augment:
          random_resized_crop: {scale: [0.8, 1.0]}   # replaces resize+crop
          random_flip: {prob: 0.5}
          rand_augment: {num_ops: 2, magnitude: 7}
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any,
                 is_train: bool = True, **kw: Any):
        """``is_train=False`` drops any ``train_augment`` block — the gate
        lives HERE so every dataset that forwards its image config gets
        train-only augmentation without remembering to pop the key."""
        super().__init__(config)
        cfg = self.config
        self.size = int(cfg.get("size", 224))
        self.resize_target = int(cfg.get("resize", self.size))
        preset = cfg.get("norm_preset", "imagenet")
        default_mean, default_std = {
            "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
            "clip": (CLIP_MEAN, CLIP_STD),
            "none": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
        }[preset]
        self.mean = tuple(cfg.get("mean", default_mean))
        self.std = tuple(cfg.get("std", default_std))
        aug = cfg.get("train_augment") if is_train else None
        self._augment: Optional[ImageTransforms] = None
        if aug:
            steps = []
            if "random_resized_crop" in aug:
                p = dict(aug["random_resized_crop"] or {})
                p.setdefault("size", self.size)
                steps.append({"type": "random_resized_crop", "params": p})
            if "random_flip" in aug:
                steps.append({"type": "random_flip",
                              "params": dict(aug["random_flip"] or {})})
            if "rand_augment" in aug:
                steps.append({"type": "rand_augment",
                              "params": dict(aug["rand_augment"] or {})})
            self._augment = ImageTransforms(
                {"transforms": steps, "seed": cfg.get("seed", None)})

    def transform_array(self, img: np.ndarray) -> np.ndarray:
        img = _to_float_hwc(img)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        if self._augment is not None:
            for kind, p in self._augment.steps:
                img = self._augment._apply(img, kind, p)
            if img.shape[0] != self.size or img.shape[1] != self.size:
                img = resize_shorter_side(img, self.resize_target)
                img = center_crop(img, (self.size, self.size))
            return normalize(img, self.mean, self.std)
        img = resize_shorter_side(img, self.resize_target)
        img = center_crop(img, (self.size, self.size))
        return normalize(img, self.mean, self.std)

    def __call__(self, item: Any, *args: Any, **kw: Any) -> Dict[str, Any]:
        img = item["image"] if isinstance(item, Mapping) else item
        if isinstance(img, str):
            if cv2 is None:
                raise RuntimeError("cv2 required to read image files")
            bgr = cv2.imread(img, cv2.IMREAD_COLOR)
            if bgr is None:
                raise FileNotFoundError(f"Cannot read image {img!r}")
            img = bgr[:, :, ::-1]  # BGR→RGB
        if isinstance(img, (list, tuple)) or (
            isinstance(img, np.ndarray) and img.ndim == 4
        ):
            frames = np.stack([self.transform_array(f) for f in img])
            return {"image": frames}
        return {"image": self.transform_array(img)}


@registry.register_processor("grayscale_to_3_channels")
@registry.register_processor("GrayScaleTo3Channels")
class GrayScaleTo3Channels(BaseProcessor):
    def __call__(self, item: Any, *args: Any, **kw: Any) -> Dict[str, Any]:
        img = item["image"] if isinstance(item, Mapping) else item
        img = _to_float_hwc(img)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        return {"image": img}


@registry.register_processor("random_flip")
class RandomHorizontalFlip(BaseProcessor):
    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kw: Any):
        super().__init__(config)
        self.prob = float(self.config.get("prob", 0.5))
        self.rng = np.random.default_rng(self.config.get("seed", None))

    def __call__(self, item: Any, *args: Any, **kw: Any) -> Dict[str, Any]:
        img = item["image"] if isinstance(item, Mapping) else item
        if self.rng.random() < self.prob:
            img = np.ascontiguousarray(np.flip(img, axis=-2))
        return {"image": img}


@registry.register_processor("image_transforms")
@registry.register_processor("torchvision_transforms")
class ImageTransforms(BaseProcessor):
    """Composable pipeline: config.transforms = [{type, params}, ...] with types
    resize / resize_shorter_side / center_crop / random_crop /
    random_resized_crop / random_flip / rand_augment / normalize / to_float.

    ``random_resized_crop`` + ``rand_augment`` compose the M2-Encoder training
    transform (reference prj/M2_Encoder/vlmo/transforms/square_transform.py:
    17-41: RandomResizedCrop(scale=(0.8, 1.0)) → flip → RandomAugment(2, 7))."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kw: Any):
        super().__init__(config)
        self.steps: List[Tuple[str, dict]] = []
        for t in self.config.get("transforms", []):
            if isinstance(t, str):
                self.steps.append((t, {}))
            else:
                self.steps.append((t["type"], dict(t.get("params", {}))))
        self.rng = np.random.default_rng(self.config.get("seed", None))

    def _apply(self, img: np.ndarray, kind: str, p: dict) -> np.ndarray:
        if kind == "to_float":
            return _to_float_hwc(img)
        if kind == "resize":
            size = p.get("size", 224)
            hw = (size, size) if isinstance(size, int) else tuple(size)
            return resize_image(_to_float_hwc(img), hw)
        if kind == "resize_shorter_side":
            return resize_shorter_side(_to_float_hwc(img), int(p.get("size", 224)))
        if kind == "center_crop":
            size = p.get("size", 224)
            hw = (size, size) if isinstance(size, int) else tuple(size)
            return center_crop(img, hw)
        if kind == "random_crop":
            size = p.get("size", 224)
            th, tw = (size, size) if isinstance(size, int) else tuple(size)
            h, w = img.shape[:2]
            top = int(self.rng.integers(0, max(1, h - th + 1)))
            left = int(self.rng.integers(0, max(1, w - tw + 1)))
            out = img[top : top + th, left : left + tw]
            return center_crop(out, (th, tw))  # pad if undersized
        if kind == "random_resized_crop":
            # torchvision RandomResizedCrop: sample area scale + aspect
            # ratio, crop, then resize to the target square
            size = p.get("size", 224)
            th, tw = (size, size) if isinstance(size, int) else tuple(size)
            lo, hi = p.get("scale", (0.8, 1.0))
            rlo, rhi = p.get("ratio", (3.0 / 4.0, 4.0 / 3.0))
            h, w = img.shape[:2]
            for _ in range(10):
                area = h * w * self.rng.uniform(lo, hi)
                ratio = np.exp(self.rng.uniform(np.log(rlo), np.log(rhi)))
                ch = int(round(np.sqrt(area / ratio)))
                cw = int(round(np.sqrt(area * ratio)))
                if 0 < ch <= h and 0 < cw <= w:
                    top = int(self.rng.integers(0, h - ch + 1))
                    left = int(self.rng.integers(0, w - cw + 1))
                    crop = img[top:top + ch, left:left + cw]
                    return resize_image(crop, (th, tw))
            return resize_image(center_crop(img, (min(h, w), min(h, w))),
                                (th, tw))
        if kind == "rand_augment":
            from antmmf_tpu.datasets.processors.augment import (
                M2_ENCODER_AUGS,
                _to_uint8,
                rand_augment,
            )

            u8, was_float = _to_uint8(img)
            out = rand_augment(
                u8, int(p.get("num_ops", 2)), float(p.get("magnitude", 7)),
                self.rng, tuple(p.get("augs", M2_ENCODER_AUGS)),
                float(p.get("prob", 0.5)))
            return out.astype(np.float32) / 255.0 if was_float else out
        if kind == "random_flip":
            if self.rng.random() < float(p.get("prob", 0.5)):
                return np.ascontiguousarray(np.flip(img, axis=-2))
            return img
        if kind == "normalize":
            preset = p.get("preset", "imagenet")
            mean, std = {
                "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
                "clip": (CLIP_MEAN, CLIP_STD),
            }.get(preset, (IMAGENET_MEAN, IMAGENET_STD))
            return normalize(img, p.get("mean", mean), p.get("std", std))
        raise ValueError(f"Unknown transform {kind!r}")

    def __call__(self, item: Any, *args: Any, **kw: Any) -> Dict[str, Any]:
        img = item["image"] if isinstance(item, Mapping) else item
        img = _to_float_hwc(img)
        for kind, p in self.steps:
            img = self._apply(img, kind, p)
        return {"image": img}
