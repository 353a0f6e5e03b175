"""ImageList: ragged images → one padded batch + per-image sizes.

Reference parity: ``/root/reference/antmmf/structures/images.py`` (detectron2-
style ``ImageList.from_tensors`` with size_divisibility). HWC layout here
(TPU conv convention); static-shape discipline — pad once on the host.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from antmmf_tpu.structures.base import SizedDataStructure


class ImageList(SizedDataStructure):
    """``tensor`` [N, H, W, C] padded batch; field ``image_sizes`` holds the
    original (h, w) per image."""

    @staticmethod
    def from_tensors(
        images: Sequence[np.ndarray],
        size_divisibility: int = 0,
        pad_value: float = 0.0,
    ) -> "ImageList":
        images = [np.asarray(im) for im in images]
        images = [im[..., None] if im.ndim == 2 else im for im in images]
        sizes = [(im.shape[0], im.shape[1]) for im in images]
        H = max(h for h, _ in sizes)
        W = max(w for _, w in sizes)
        if size_divisibility > 0:
            d = size_divisibility
            H = -(-H // d) * d
            W = -(-W // d) * d
        C = images[0].shape[-1]
        out = np.full((len(images), H, W, C), pad_value,
                      dtype=images[0].dtype)
        for i, im in enumerate(images):
            out[i, : im.shape[0], : im.shape[1]] = im
        image_list = ImageList(out)
        image_list.image_sizes = np.asarray(sizes, np.int64)
        return image_list

    def pad_masks(self) -> np.ndarray:
        """bool[N, H, W], True on padded pixels (NestedTensor convention)."""
        N, H, W = self.tensor.shape[:3]
        mask = np.ones((N, H, W), bool)
        for i, (h, w) in enumerate(np.asarray(self.image_sizes)):
            mask[i, :h, :w] = False
        return mask
