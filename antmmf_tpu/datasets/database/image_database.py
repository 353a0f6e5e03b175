"""Image database: image files addressed relative to a root directory.

Reference parity: ``/root/reference/antmmf/datasets/database/image_database.py``.
Returns RGB uint8 HWC numpy arrays.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageDatabase:
    def __init__(self, image_root: str):
        self.image_root = image_root

    def resolve(self, name: str) -> str:
        path = name if os.path.isabs(name) else os.path.join(self.image_root, name)
        if os.path.exists(path):
            return path
        base, ext = os.path.splitext(path)
        if not ext:
            for e in _EXTS:
                if os.path.exists(base + e):
                    return base + e
        raise FileNotFoundError(f"Image not found: {name!r} under {self.image_root!r}")

    def load(self, name: str) -> np.ndarray:
        if cv2 is None:
            raise RuntimeError("cv2 required for image decode")
        path = self.resolve(name)
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise IOError(f"Failed to decode image {path!r}")
        return bgr[:, :, ::-1].copy()

    def __call__(self, name: Union[str, Sequence[str]]):
        if isinstance(name, (list, tuple)):
            return [self.load(n) for n in name]
        return self.load(name)
