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


# ----------------------------------------------------------------------------
# Augmentation library for the custom_transforms processor (reference
# image_ops.py / dataset_utils.py function zoo). All functions take and return
# float HWC arrays; randomized ones accept an optional numpy Generator.


class ImageLongsideScaleAndPad:
    """Scale the long side to ≤ max_size (optionally jittered), optional pad to
    square — the transform named in the reference retrieval configs
    (finetune_retrieval/base.yml)."""

    def __init__(self, max_size: int = 448, random_scale: bool = False,
                 pad: bool = False):
        self.max_size = int(max_size)
        self.random_scale = bool(random_scale)
        self.pad = bool(pad)

    def __call__(self, img: np.ndarray,
                 rng: "np.random.Generator" = None) -> np.ndarray:
        h, w = img.shape[:2]
        target = self.max_size
        if self.random_scale:
            rng = rng or np.random.default_rng()
            target = int(round(self.max_size * rng.uniform(0.8, 1.0)))
        scale = target / max(h, w)
        img = resize_image(img, (max(1, round(h * scale)),
                                 max(1, round(w * scale))))
        if self.pad:
            img, _ = pad_to_shape(img, target, target)
        return img


class GroupNormalize:
    """Channel-mean/std normalization (torchvision GroupNormalize analogue)."""

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32).reshape(1, 1, -1)
        self.std = np.asarray(std, np.float32).reshape(1, 1, -1)

    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        return (img.astype(np.float32) - self.mean) / self.std


def random_crop(img: np.ndarray, four_side_ratios: Sequence[float] = (0.1,),
                rng: "np.random.Generator" = None) -> np.ndarray:
    """Crop up to ratio r from each of the four sides independently."""
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    r = float(rng.choice(np.asarray(four_side_ratios, np.float64)))
    top = int(h * r * rng.uniform())
    bot = int(h * r * rng.uniform())
    left = int(w * r * rng.uniform())
    right = int(w * r * rng.uniform())
    return img[top: h - bot if bot else h, left: w - right if right else w]


def random_flip(img: np.ndarray, prob: float = 0.5,
                rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if rng.uniform() < prob:
        return np.ascontiguousarray(np.flip(img, axis=1))
    return img


def random_black(img: np.ndarray, max_ratio: float = 0.2,
                 rng: "np.random.Generator" = None) -> np.ndarray:
    """Blank a random rectangle (cutout)."""
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    bh, bw = int(h * max_ratio * rng.uniform()), int(w * max_ratio * rng.uniform())
    if bh and bw:
        y, x = rng.integers(0, h - bh + 1), rng.integers(0, w - bw + 1)
        img = img.copy()
        img[y: y + bh, x: x + bw] = 0.0
    return img


def random_gray(img: np.ndarray, prob: float = 0.2,
                rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if img.shape[-1] == 3 and rng.uniform() < prob:
        gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
        return np.repeat(gray[..., None], 3, axis=-1)
    return img


def random_noise(img: np.ndarray, sigma: float = 0.02,
                 rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    return img + rng.normal(0, sigma, img.shape).astype(img.dtype)


def random_blur(img: np.ndarray, prob: float = 0.3,
                rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if rng.uniform() >= prob:
        return img
    # 3×3 box blur without cv2 dependency
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            out += pad[dy: dy + img.shape[0], dx: dx + img.shape[1]]
    return out / 9.0


def random_color2(img: np.ndarray, strength: float = 0.2,
                  rng: "np.random.Generator" = None) -> np.ndarray:
    """Brightness/contrast jitter."""
    rng = rng or np.random.default_rng()
    b = 1.0 + rng.uniform(-strength, strength)
    c = 1.0 + rng.uniform(-strength, strength)
    mean = img.mean()
    return np.clip((img - mean) * c + mean * b, 0.0, None)


def random_affine2(img: np.ndarray, max_shift: float = 0.1,
                   max_scale: float = 0.1,
                   rng: "np.random.Generator" = None) -> np.ndarray:
    """Small translate+scale affine (reference random_affine_v2): implemented
    as a crop-shift + resize back, dependency-free."""
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    s = 1.0 + rng.uniform(0, max_scale)
    ch, cw = max(1, int(h / s)), max(1, int(w / s))
    dy = int(rng.uniform(0, max_shift) * (h - ch))
    dx = int(rng.uniform(0, max_shift) * (w - cw))
    return resize_image(img[dy: dy + ch, dx: dx + cw], (h, w))


def salt_pepper_noise(img: np.ndarray, amount: float = 0.02,
                      salt_vs_pepper: float = 0.5,
                      rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    out = img.copy()
    mask = rng.uniform(size=img.shape[:2])
    hi = float(img.max()) if img.size else 1.0
    out[mask < amount * salt_vs_pepper] = hi
    out[(mask >= amount * salt_vs_pepper) & (mask < amount)] = 0.0
    return out


def poisson_noise(img: np.ndarray,
                  rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    scaled = np.clip(img, 0.0, 1.0) * 255.0
    return (rng.poisson(scaled) / 255.0).astype(np.float32)


def speckle_noise(img: np.ndarray, sigma: float = 0.1,
                  rng: "np.random.Generator" = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    return img * (1.0 + rng.normal(0, sigma, img.shape).astype(img.dtype))


def rand_text(img: np.ndarray, rng: "np.random.Generator" = None,
              text: str = None) -> np.ndarray:
    """Overlay random text (watermark-robustness aug, reference randText)."""
    rng = rng or np.random.default_rng()
    try:
        import cv2
    except Exception:
        return img
    h, w = img.shape[:2]
    if text is None:
        letters = "abcdefghijklmnopqrstuvwxyz0123456789 "
        text = "".join(letters[i] for i in
                       rng.integers(0, len(letters), rng.integers(4, 12)))
    org = (int(rng.uniform(0, 0.6) * w), int(rng.uniform(0.2, 0.95) * h))
    # cv2.putText needs uint8; draw on a scaled copy and convert back
    was_float = np.issubdtype(img.dtype, np.floating)
    hi = float(img.max()) if was_float and img.size else 1.0
    canvas = (np.clip(img / max(hi, 1e-9), 0, 1) * 255).astype(np.uint8) \
        if was_float else np.ascontiguousarray(img)
    color = tuple(int(c) for c in rng.integers(0, 256, 3))
    cv2.putText(canvas, text, org, cv2.FONT_HERSHEY_SIMPLEX,
                float(rng.uniform(0.4, 1.2)), color, 1, cv2.LINE_AA)
    if was_float:
        return canvas.astype(np.float32) / 255.0 * max(hi, 1e-9)
    return canvas


# reference-name aliases (dataset_utils.py function zoo)
randText = rand_text
random_affine = random_affine2
random_color = random_color2
