"""NestedTensor: variable-size images padded into one batch with a validity mask.

Reference parity: ``/root/reference/antmmf/structures/nested_tensor.py`` (66 LoC,
DETR-style). Static-shape discipline: ``from_list`` pads to the max (or a given
bucket) size; the mask marks padding True (reference convention).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class NestedTensor:
    def __init__(self, tensors: np.ndarray, mask: np.ndarray):
        self.tensors = tensors  # [B, H, W, C]
        self.mask = mask  # bool [B, H, W], True = padding

    @classmethod
    def from_list(
        cls, images: Sequence[np.ndarray],
        pad_to: Optional[Tuple[int, int]] = None,
    ) -> "NestedTensor":
        hs = [im.shape[0] for im in images]
        ws = [im.shape[1] for im in images]
        H, W = pad_to or (max(hs), max(ws))
        C = images[0].shape[2]
        B = len(images)
        out = np.zeros((B, H, W, C), dtype=images[0].dtype)
        mask = np.ones((B, H, W), dtype=bool)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            out[i, :h, :w] = im[:H, :W]
            mask[i, :h, :w] = False
        return cls(out, mask)

    def decompose(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.tensors, self.mask

    def __repr__(self) -> str:
        return f"NestedTensor(shape={self.tensors.shape})"
