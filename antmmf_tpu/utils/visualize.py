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


class VisualizationDataRecord:
    """Attribution record for interpreter visualization (reference
    visualize.py:9-42, same slots)."""

    __slots__ = ["word_attributions", "pred_prob", "pred_class", "true_class",
                 "attr_class", "attr_score", "raw_input", "convergence_score"]

    def __init__(self, word_attributions, pred_prob, pred_class, true_class,
                 attr_class, attr_score, raw_input, convergence_score):
        self.word_attributions = word_attributions
        self.pred_prob = pred_prob
        self.pred_class = pred_class
        self.true_class = true_class
        self.attr_class = attr_class
        self.attr_score = attr_score
        self.raw_input = raw_input
        self.convergence_score = convergence_score


def _record_label(vr: "VisualizationDataRecord") -> str:
    return "target {} pred {} ({:,.2f})".format(
        vr.true_class, vr.pred_class, round(float(vr.pred_prob), 2))


def visualize_images(images: Sequence[np.ndarray],
                     size: Optional[tuple] = (224, 224),
                     cols: int = 4) -> np.ndarray:
    """Resize + grid a set of images (reference visualize.py:45-84, headless:
    returns the grid array instead of plt.show)."""
    assert size is not None or len(images) == 1, \
        "If size is not passed, only one image can be visualized"
    if size is not None:
        if cv2 is None:
            raise RuntimeError("cv2 required")
        images = [cv2.resize(_to_uint8(im), (size[1], size[0]))
                  for im in images]
    return make_grid(images, cols=cols)


def visualize_text_importance(visual_record: List["VisualizationDataRecord"],
                              pad_token: str, title: str,
                              out_path: Optional[str] = None) -> str:
    """Token-attribution heatmap as a standalone HTML document (reference
    visualize.py:86-124 renders a seaborn heatmap interactively; headless
    here: green = positive, red = negative attribution). Truncates all rows
    at the longest pre-pad position like the reference."""
    assert isinstance(visual_record, list)
    max_pad_pos = -1
    for vr in visual_record:
        for idx, tok in enumerate(vr.raw_input):
            if tok == pad_token:
                max_pad_pos = max(max_pad_pos, idx)
                break
    rows = []
    for vr in visual_record:
        scores = np.asarray(vr.word_attributions, np.float32)
        toks = list(vr.raw_input)
        if max_pad_pos > 0:
            scores, toks = scores[:max_pad_pos], toks[:max_pad_pos]
        hi = max(float(np.abs(scores).max()), 1e-9)
        spans = []
        for tok, s in zip(toks, scores):
            if tok == pad_token:
                tok = ""
            a = abs(float(s)) / hi * 0.85
            color = (f"rgba(0, 160, 0, {a:.2f})" if s >= 0
                     else f"rgba(200, 0, 0, {a:.2f})")
            spans.append(f"<span style='background: {color}; padding: 1px'>"
                         f"{tok}</span>")
        rows.append(f"<tr><td style='white-space: nowrap'>"
                    f"{_record_label(vr)}</td><td>{' '.join(spans)}</td></tr>")
    html = (f"<html><body style='font-family: monospace'><h3>{title}</h3>"
            f"<table>{''.join(rows)}</table></body></html>")
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(html)
    return html


def visualize_image_importance(visual_record: List["VisualizationDataRecord"],
                               title: str,
                               out_path: Optional[str] = None) -> np.ndarray:
    """Region/patch-attribution heatmap as an image (reference
    visualize.py:127-148, headless): one row per record, JET-colormapped."""
    if cv2 is None:
        raise RuntimeError("cv2 required")
    assert isinstance(visual_record, list)
    scores = np.asarray([np.asarray(vr.word_attributions, np.float32)
                         for vr in visual_record])
    lo, hi = float(scores.min()), float(scores.max())
    norm = (scores - lo) / max(hi - lo, 1e-9)
    cell = 24
    heat = cv2.applyColorMap(_to_uint8(norm[..., None])[..., 0],
                             cv2.COLORMAP_JET)[..., ::-1]
    heat = np.repeat(np.repeat(heat, cell, axis=0), cell, axis=1)
    if out_path:
        save_image(heat, out_path)
    return heat
