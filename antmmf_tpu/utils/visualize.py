"""Visualization helpers: image grids, attention overlays, saliency dumps.

Reference parity: ``/root/reference/antmmf/utils/visualize.py`` (148 LoC).
Writes PNG via cv2 (no matplotlib dependency).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    if img.max() <= 1.5:
        img = img * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def make_grid(images: Sequence[np.ndarray], cols: int = 4,
              pad: int = 2) -> np.ndarray:
    imgs = [_to_uint8(im) for im in images]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    rows = -(-len(imgs) // cols)
    grid = np.zeros((rows * (h + pad), cols * (w + pad), 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * (h + pad): r * (h + pad) + im.shape[0],
             c * (w + pad): c * (w + pad) + im.shape[1]] = im[..., :3]
    return grid


def save_image(img: np.ndarray, path: str) -> None:
    if cv2 is None:
        raise RuntimeError("cv2 required to write images")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, _to_uint8(img)[..., ::-1])


def overlay_attention(img: np.ndarray, attention: np.ndarray,
                      alpha: float = 0.5) -> np.ndarray:
    """Overlay an [h, w] attention map (any scale) onto an image."""
    if cv2 is None:
        raise RuntimeError("cv2 required")
    att = np.asarray(attention, np.float32)
    att = (att - att.min()) / max(att.max() - att.min(), 1e-9)
    att = cv2.resize(att, (img.shape[1], img.shape[0]))
    heat = cv2.applyColorMap(_to_uint8(att[..., None])[..., 0],
                             cv2.COLORMAP_JET)[..., ::-1]
    return (_to_uint8(img) * (1 - alpha) + heat * alpha).astype(np.uint8)


def saliency_text_report(tokens: List[str], saliency: np.ndarray,
                         top_k: int = 5) -> str:
    order = np.argsort(-np.asarray(saliency))[:top_k]
    return ", ".join(f"{tokens[i]}({saliency[i]:.3f})"
                     for i in order if i < len(tokens))
