"""Box structures: coordinate conversions, areas, IoU — jittable numpy/jnp.

Reference parity: ``/root/reference/antmmf/structures/boxes.py`` (449 LoC torch
Boxes): mode conversions (:99-166), ``area`` (:167), ``clip`` (:180),
``nonempty`` (:199), ``inside_box`` (:212), ``get_centers`` (:235),
``scale`` (:245), ``cat`` (:253), ``pairwise_iou`` (:302),
``matched_pairwise_iou`` (:376). All ops are pure jnp (mask-friendly, no
in-place mutation — Boxes here is immutable, mutating reference methods
return new Boxes).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


def xywh_to_xyxy(boxes: Array) -> Array:
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: Array) -> Array:
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xyxy_to_cxcywh(boxes: Array) -> Array:
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def cxcywh_to_xyxy(boxes: Array) -> Array:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def area(boxes: Array) -> Array:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0)


def clip_to_image(boxes: Array, height: float, width: float) -> Array:
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, width),
        jnp.clip(boxes[..., 1], 0, height),
        jnp.clip(boxes[..., 2], 0, width),
        jnp.clip(boxes[..., 3], 0, height),
    ], axis=-1)


def nonempty(boxes: Array, threshold: float = 0.0) -> Array:
    """bool[N]: width AND height > threshold (reference boxes.py:199)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def inside_box(boxes: Array, height: float, width: float,
               boundary_threshold: int = 0) -> Array:
    """bool[N]: box fully inside the image ± threshold (ref boxes.py:212)."""
    t = boundary_threshold
    return ((boxes[..., 0] >= -t) & (boxes[..., 1] >= -t)
            & (boxes[..., 2] < width + t) & (boxes[..., 3] < height + t))


def get_centers(boxes: Array) -> Array:
    """[N, 2] box centers (reference boxes.py:235)."""
    return (boxes[..., :2] + boxes[..., 2:]) / 2


def scale(boxes: Array, scale_x: float, scale_y: float) -> Array:
    """Scale coordinates per axis (reference boxes.py:245)."""
    s = jnp.asarray([scale_x, scale_y, scale_x, scale_y], boxes.dtype)
    return boxes * s


def matched_pairwise_iou(a: Array, b: Array) -> Array:
    """Element-wise IoU over aligned [N, 4] pairs (reference boxes.py:376)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    return inter / jnp.maximum(union, 1e-9)


def pairwise_iou(a: Array, b: Array) -> Array:
    """[N, 4] × [M, 4] xyxy → IoU [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def generalized_iou(a: Array, b: Array) -> Array:
    """GIoU [N, M] (DETR matcher cost)."""
    iou = pairwise_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    enclose = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-9)
    inter_lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    inter_rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area(a)[:, None] + area(b)[None, :] - inter
    return iou - (enclose - union) / enclose


class Boxes:
    """Thin container matching the reference surface."""

    def __init__(self, tensor: Array, mode: str = "xyxy"):
        self.tensor = jnp.asarray(tensor, jnp.float32)
        if mode == "xywh":
            self.tensor = xywh_to_xyxy(self.tensor)
        elif mode == "cxcywh":
            self.tensor = cxcywh_to_xyxy(self.tensor)
        elif mode != "xyxy":
            raise ValueError(f"Unknown box mode {mode!r}")

    def __len__(self) -> int:
        return int(self.tensor.shape[0])

    def area(self):
        return area(self.tensor)

    def clip(self, height: float, width: float) -> "Boxes":
        return Boxes(clip_to_image(self.tensor, height, width))

    def iou(self, other: "Boxes"):
        return pairwise_iou(self.tensor, other.tensor)

    def convert(self, mode: str):
        if mode == "xyxy":
            return self.tensor
        if mode == "xywh":
            return xyxy_to_xywh(self.tensor)
        if mode == "cxcywh":
            return xyxy_to_cxcywh(self.tensor)
        raise ValueError(mode)

    def nonempty(self, threshold: float = 0.0):
        return nonempty(self.tensor, threshold)

    def inside_box(self, height: float, width: float,
                   boundary_threshold: int = 0):
        return inside_box(self.tensor, height, width, boundary_threshold)

    def get_centers(self):
        return get_centers(self.tensor)

    def scale(self, scale_x: float, scale_y: float) -> "Boxes":
        return Boxes(scale(self.tensor, scale_x, scale_y))

    def matched_iou(self, other: "Boxes"):
        return matched_pairwise_iou(self.tensor, other.tensor)

    @classmethod
    def cat(cls, boxes_list) -> "Boxes":
        """Concatenate Boxes (reference boxes.py:253)."""
        if not boxes_list:
            return cls(jnp.zeros((0, 4), jnp.float32))
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

    def __getitem__(self, item) -> "Boxes":
        t = self.tensor[item]
        return Boxes(t if t.ndim == 2 else t[None])
