"""Extended image processors: custom_transforms, bbox, detr_processor.

Reference parity (``/root/reference/antmmf/datasets/processors/image_processors.py``):
  * ``custom_transforms`` (:447) — sequential/random composition of named
    augmentation functions resolved from the utils transform zoo;
  * ``bbox`` (:107) — annotation "info" bbox lists → fixed-size xyxy arrays;
  * ``detr_processor`` (:586) — DETR-style random multi-scale resize + imagenet
    normalize + box clamp/filter/pad (static ``num_box_max``).

All outputs are float HWC numpy arrays (NHWC downstream); boxes are absolute
xyxy like the reference.
"""

from __future__ import annotations

import inspect
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.image_processors import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _to_float_hwc,
    normalize,
    resize_image,
)
from antmmf_tpu.datasets.processors.processors import BaseProcessor
from antmmf_tpu.utils import image_ops


@registry.register_processor("custom_transforms")
class CustomTransforms(BaseProcessor):
    """Config: {mode: sequential|random, transforms: [{type, params}, ...]}.
    Names resolve to functions/classes in ``antmmf_tpu.utils.image_ops``."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        self.mode = cfg.get("mode", "sequential")
        assert self.mode in ("sequential", "random"), self.mode
        self.rng = np.random.default_rng(cfg.get("seed"))
        self.transforms: List[Any] = []
        for t in cfg.get("transforms", []):
            t = dict(t)
            obj = getattr(image_ops, t["type"], None)
            if obj is None:
                raise KeyError(
                    f"custom_transforms: no transform {t['type']!r} in "
                    "antmmf_tpu.utils.image_ops")
            params = dict(t.get("params", {}))
            if inspect.isclass(obj):
                self.transforms.append(obj(**params))
            else:
                self.transforms.append(
                    lambda img, rng, _f=obj, _p=params: _f(img, rng=rng, **_p))

    def _apply(self, img: np.ndarray) -> np.ndarray:
        img = _to_float_hwc(img)
        if self.mode == "sequential":
            for fn in self.transforms:
                img = fn(img, self.rng)
            return img
        fn = self.transforms[int(self.rng.integers(0, len(self.transforms)))]
        return fn(img, self.rng)

    def __call__(self, x, *a, **k):
        if isinstance(x, Mapping):
            return {**x, "image": self._apply(x["image"])}
        return self._apply(x)


@registry.register_processor("bbox")
class BBoxProcessor(BaseProcessor):
    """Annotation "info" list → padded absolute xyxy boxes + validity mask
    (reference :107-152; top_left/width/height → xyxy)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        self.max_length = int(self.config.get("max_length", 50))

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        info = item["info"]
        boxes = np.zeros((self.max_length, 4), np.float32)
        mask = np.zeros((self.max_length,), bool)
        for i, entry in enumerate(info[: self.max_length]):
            bb = entry["bounding_box"]
            if "top_left_x" in bb:
                x, y = float(bb["top_left_x"]), float(bb["top_left_y"])
            else:
                x, y = float(bb.get("topLeftX", 0)), float(bb.get("topLeftY", 0))
            w, h = float(bb["width"]), float(bb["height"])
            boxes[i] = (x, y, x + w, y + h)
            mask[i] = True
        return {"bbox": boxes, "bbox_mask": mask,
                "bbox_types": ["xyxy"] * int(mask.sum())}


DETR_DEFAULT_SCALES = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)


@registry.register_processor("detr_processor")
class DetrProcessor(BaseProcessor):
    """DETR grid-feature preprocessing (reference :586-702):
    random shorter-side resize from ``scales`` capped at ``max_size``, imagenet
    normalization, box clamp→filter→scale, pad to ``num_box_max``."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        scales = cfg.get("scales") or list(DETR_DEFAULT_SCALES)
        if not isinstance(scales, (list, tuple)):
            scales = [scales]
        self.scales = [int(s) for s in scales]
        self.max_size = int(cfg.get("max_size", 1333))
        self.num_box_max = cfg.get("num_box_max")
        self.pad_value = int(cfg.get("pad_value", 0))
        self.train = bool(cfg.get("train", True))
        self.rng = np.random.default_rng(cfg.get("seed"))

    def _target_hw(self, h: int, w: int) -> tuple:
        size = int(self.rng.choice(self.scales)) if self.train and \
            len(self.scales) > 1 else self.scales[-1]
        short, long = min(h, w), max(h, w)
        if size / short * long > self.max_size:
            size = int(round(self.max_size * short / long))
        scale = size / short
        return max(1, round(h * scale)), max(1, round(w * scale))

    def __call__(self, data, *a, **k) -> Dict[str, Any]:
        if not isinstance(data, Mapping):
            data = {"image": data, "target": None}
        img = _to_float_hwc(data["image"])
        h0, w0 = img.shape[:2]
        h1, w1 = self._target_hw(h0, w0)
        img = resize_image(img, (h1, w1))
        img = normalize(img, IMAGENET_MEAN, IMAGENET_STD)
        result: Dict[str, Any] = {"image": img,
                                  "size": np.asarray([h1, w1], np.int64),
                                  "orig_size": np.asarray([h0, w0], np.int64)}
        target = data.get("target")
        if target is not None:
            boxes = np.asarray(target["bbox"], np.float32).reshape(-1, 4)
            classes = np.asarray(target["objects"], np.int64).reshape(-1)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w0)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h0)
            keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
            boxes, classes = boxes[keep], classes[keep]
            boxes = boxes * np.asarray([w1 / w0, h1 / h0] * 2, np.float32)
            tgt: Dict[str, Any] = {
                "boxes": boxes, "labels": classes,
                "num_box": np.int64(len(boxes)),
                "orig_size": result["orig_size"], "size": result["size"],
            }
            if self.num_box_max is not None:
                n = len(boxes)
                assert n <= int(self.num_box_max), (n, self.num_box_max)
                pb = np.zeros((int(self.num_box_max), 4), np.float32)
                pb[:n] = boxes
                pl = np.full((int(self.num_box_max),), self.pad_value, np.int64)
                pl[:n] = classes
                tgt["boxes"], tgt["labels"] = pb, pl
            result["target"] = tgt
        return result


@registry.register_processor("group_transforms")
@registry.register_processor("tsn_group_transforms")
class GroupTransforms(BaseProcessor):
    """TSN/TSM-style multi-frame augmentation pipeline (reference
    utils/image_ops.py:17-497 Group* family).

    Config: {transforms: [{type: GroupScale, params: {...}}, ...], seed}.
    Names resolve to the Group*/Stack/ToArrayFormat classes in
    ``antmmf_tpu.utils.image_ops``; one sampled geometry applies to the
    whole group so temporal coherence is preserved. Input: [F, H, W, C]
    array or list of HWC frames; output: whatever the last stage yields
    (frames are re-stacked to [F, H, W, C] when still a list).
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        self.rng = np.random.default_rng(cfg.get("seed"))
        self.stages: List[Any] = []
        for t in cfg.get("transforms", []):
            t = dict(t)
            cls = getattr(image_ops, t["type"], None)
            if cls is None or not inspect.isclass(cls):
                raise KeyError(
                    f"group_transforms: no transform class {t['type']!r} in "
                    "antmmf_tpu.utils.image_ops")
            self.stages.append(cls(**dict(t.get("params", {}))))

    def _apply(self, frames):
        if isinstance(frames, np.ndarray) and frames.ndim == 4:
            frames = list(frames)
        out = frames
        for stage in self.stages:
            out = stage(out, self.rng)
        if isinstance(out, list):
            out = np.stack(out)
        return out

    def __call__(self, x, *a, **k):
        if isinstance(x, Mapping):
            key = "video" if "video" in x else "image"
            return {**x, key: self._apply(x[key])}
        return self._apply(x)
