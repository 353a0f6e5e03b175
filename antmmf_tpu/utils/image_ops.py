"""Host-side image ops used by feature extraction and data prep.

Reference parity: ``/root/reference/antmmf/utils/image_ops.py`` (699 LoC) —
the subset actually load-bearing for the data plane: aspect-preserving resize,
padding to fixed shapes, five/ten-crop for eval, patch grids.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from antmmf_tpu.datasets.processors.image_processors import (
    center_crop,
    resize_image,
    resize_shorter_side,
)


def pad_to_shape(img: np.ndarray, height: int, width: int,
                 value: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Pad bottom/right to (height, width); returns (padded, pad_mask True=pad)."""
    h, w = img.shape[:2]
    out = np.full((height, width) + img.shape[2:], value, img.dtype)
    out[:min(h, height), :min(w, width)] = img[:height, :width]
    mask = np.ones((height, width), bool)
    mask[:min(h, height), :min(w, width)] = False
    return out, mask


def five_crop(img: np.ndarray, size: int) -> List[np.ndarray]:
    h, w = img.shape[:2]
    tl = img[:size, :size]
    tr = img[:size, w - size:]
    bl = img[h - size:, :size]
    br = img[h - size:, w - size:]
    cc = center_crop(img, (size, size))
    return [tl, tr, bl, br, cc]


def ten_crop(img: np.ndarray, size: int) -> List[np.ndarray]:
    crops = five_crop(img, size)
    flipped = np.ascontiguousarray(np.flip(img, axis=1))
    return crops + five_crop(flipped, size)


def patchify(img: np.ndarray, patch: int) -> np.ndarray:
    """[H, W, C] → [h*w, patch*patch*C] (host-side patch grid)."""
    h, w = img.shape[0] // patch, img.shape[1] // patch
    x = img[: h * patch, : w * patch]
    x = x.reshape(h, patch, w, patch, -1).transpose(0, 2, 1, 3, 4)
    return x.reshape(h * w, -1)
