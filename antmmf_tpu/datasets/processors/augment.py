"""RandAugment for the host-side image pipeline (uint8 HWC RGB, numpy/cv2).

Reference parity: M2-Encoder trains with the ALBEF-style ``RandomAugment``
(``/root/reference/prj/M2_Encoder/vlmo/transforms/randaugment.py:305-330``,
wired by ``square_transform.py:17-41`` as RandomResizedCrop → flip →
RandomAugment(2, 7, augs=[...]) → tensor). Each op reproduces PIL semantics
(the reference documents its cv2 ops as "same output as PIL.*"); magnitude
mapping follows the ALBEF conventions (``randaugment.py:200-264``):

  enhance factor   = level/10 * 1.8 + 0.1        (Color/Contrast/Brightness/Sharpness)
  shear            = ±level/10 * 0.3
  translate        = ±level/10 * 10 px
  rotate           = ±level/10 * 30°
  solarize thresh  = int(level/10 * 256)
  posterize bits   = int(level/10 * 4)   (top-`bits` bitplanes kept)
  cutout pad       = int(level/10 * 40) px

Everything is vectorized (LUTs for point ops, one cv2.warpAffine for
geometry) so a single host core can keep augmenting ahead of the chip.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_GRAY = np.float32([0.299, 0.587, 0.114])  # RGB luminance (PIL convert("L"))
_FILL = (128, 128, 128)


def _lut(img: np.ndarray, table: np.ndarray) -> np.ndarray:
    return table.clip(0, 255).astype(np.uint8)[img]


def identity(img: np.ndarray) -> np.ndarray:
    return img


def autocontrast(img: np.ndarray) -> np.ndarray:
    """Per-channel histogram stretch to the full [0, 255] range
    (PIL.ImageOps.autocontrast with cutoff=0)."""
    out = np.empty_like(img)
    for c in range(img.shape[2]):
        ch = img[..., c]
        lo, hi = int(ch.min()), int(ch.max())
        if hi <= lo:
            out[..., c] = ch
        else:
            scale = 255.0 / (hi - lo)
            table = (np.arange(256, dtype=np.float32) - lo) * scale
            out[..., c] = _lut(ch, table)
    return out


def equalize(img: np.ndarray) -> np.ndarray:
    """PIL.ImageOps.equalize (integer-step variant, NOT cv2.equalizeHist)."""
    out = np.empty_like(img)
    for c in range(img.shape[2]):
        ch = img[..., c]
        hist = np.bincount(ch.reshape(-1), minlength=256)
        nonzero = hist[hist != 0]
        step = (int(nonzero[:-1].sum()) // 255) if nonzero.size > 1 else 0
        if step == 0:
            out[..., c] = ch
            continue
        shifted = np.empty(256, dtype=np.int64)
        shifted[0] = step // 2
        shifted[1:] = hist[:-1]
        table = np.cumsum(shifted) // step
        out[..., c] = _lut(ch, table)
    return out


def solarize(img: np.ndarray, thresh: int) -> np.ndarray:
    """Invert every value ≥ thresh (PIL.ImageOps.solarize)."""
    ramp = np.arange(256)
    return _lut(img, np.where(ramp < thresh, ramp, 255 - ramp))


def posterize(img: np.ndarray, bits: int) -> np.ndarray:
    """Keep the top `bits` bitplanes (PIL.ImageOps.posterize; ALBEF allows
    bits=0 → black, reproduced)."""
    return img & np.uint8((255 << (8 - bits)) & 0xFF)


def brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return _lut(img, np.arange(256, dtype=np.float32) * factor)


def contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend against the mean luminance (PIL.ImageEnhance.Contrast; float
    mean as in the ALBEF variant).

    Intentional divergence: the reference randaugment applies its BGR-ordered
    luminance weights to RGB inputs (randaugment.py contrast_func/color_func
    swap the 0.299/0.114 channels); here the weights match the channel order
    — correct PIL behavior rather than bug-for-bug parity. Not reachable with
    the default M2_ENCODER_AUGS subset (Contrast/Color are opt-in)."""
    mean = float(img.astype(np.float32).mean(axis=(0, 1)) @ _GRAY)
    table = (np.arange(256, dtype=np.float32) - mean) * factor + mean
    return _lut(img, table)


def color(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend against the grayscale projection (PIL.ImageEnhance.Color)."""
    gray = img.astype(np.float32) @ _GRAY
    out = gray[..., None] * (1.0 - factor) + img.astype(np.float32) * factor
    return out.clip(0, 255).astype(np.uint8)


def sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend against a 3×3 smoothing (PIL.ImageEnhance.Sharpness kernel
    [[1,1,1],[1,5,1],[1,1,1]]/13; PIL leaves the 1-px border untouched)."""
    if cv2 is None:  # pragma: no cover
        return img
    if factor == 1.0:
        return img
    kernel = np.ones((3, 3), np.float32)
    kernel[1, 1] = 5.0
    smooth = cv2.filter2D(img, -1, kernel / 13.0).astype(np.float32)
    out = img.astype(np.float32)
    inner = smooth[1:-1, 1:-1] + factor * (out[1:-1, 1:-1] - smooth[1:-1, 1:-1])
    out[1:-1, 1:-1] = inner
    return out.clip(0, 255).astype(np.uint8)


def _warp(img: np.ndarray, matrix: np.ndarray,
          fill: Tuple[int, int, int]) -> np.ndarray:
    h, w = img.shape[:2]
    return cv2.warpAffine(img, matrix, (w, h), borderValue=fill,
                          flags=cv2.INTER_LINEAR).astype(np.uint8)


def rotate(img: np.ndarray, degrees: float,
           fill: Tuple[int, int, int] = _FILL) -> np.ndarray:
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), degrees, 1.0)
    return _warp(img, m, fill)


def shear_x(img: np.ndarray, factor: float,
            fill: Tuple[int, int, int] = _FILL) -> np.ndarray:
    return _warp(img, np.float32([[1, factor, 0], [0, 1, 0]]), fill)


def shear_y(img: np.ndarray, factor: float,
            fill: Tuple[int, int, int] = _FILL) -> np.ndarray:
    return _warp(img, np.float32([[1, 0, 0], [factor, 1, 0]]), fill)


def translate_x(img: np.ndarray, offset: float,
                fill: Tuple[int, int, int] = _FILL) -> np.ndarray:
    return _warp(img, np.float32([[1, 0, -offset], [0, 1, 0]]), fill)


def translate_y(img: np.ndarray, offset: float,
                fill: Tuple[int, int, int] = _FILL) -> np.ndarray:
    return _warp(img, np.float32([[1, 0, 0], [0, 1, -offset]]), fill)


def cutout(img: np.ndarray, pad: int, rng: np.random.Generator,
           fill: Tuple[int, int, int] = _FILL) -> np.ndarray:
    h, w = img.shape[:2]
    cy = int(rng.random() * h)
    cx = int(rng.random() * w)
    half = pad // 2
    out = img.copy()
    out[max(cy - half, 0):cy + half, max(cx - half, 0):cx + half] = \
        np.asarray(fill, np.uint8)
    return out


# op name → (apply(img, level, rng), uses geometry sign flip)
_MAX_LEVEL = 10.0


def _enhance(level: float) -> float:
    return level / _MAX_LEVEL * 1.8 + 0.1


def _signed(level: float, scale: float, rng: np.random.Generator) -> float:
    v = level / _MAX_LEVEL * scale
    return -v if rng.random() < 0.5 else v


OPS = {
    "Identity": lambda img, lvl, rng: img,
    "AutoContrast": lambda img, lvl, rng: autocontrast(img),
    "Equalize": lambda img, lvl, rng: equalize(img),
    "Rotate": lambda img, lvl, rng: rotate(img, _signed(lvl, 30.0, rng)),
    "Solarize": lambda img, lvl, rng: solarize(
        img, int(lvl / _MAX_LEVEL * 256)),
    "Posterize": lambda img, lvl, rng: posterize(
        img, int(lvl / _MAX_LEVEL * 4)),
    "Color": lambda img, lvl, rng: color(img, _enhance(lvl)),
    "Contrast": lambda img, lvl, rng: contrast(img, _enhance(lvl)),
    "Brightness": lambda img, lvl, rng: brightness(img, _enhance(lvl)),
    "Sharpness": lambda img, lvl, rng: sharpness(img, _enhance(lvl)),
    "ShearX": lambda img, lvl, rng: shear_x(img, _signed(lvl, 0.3, rng)),
    "ShearY": lambda img, lvl, rng: shear_y(img, _signed(lvl, 0.3, rng)),
    "TranslateX": lambda img, lvl, rng: translate_x(
        img, _signed(lvl, 10.0, rng)),
    "TranslateY": lambda img, lvl, rng: translate_y(
        img, _signed(lvl, 10.0, rng)),
    "Cutout": lambda img, lvl, rng: cutout(
        img, int(lvl / _MAX_LEVEL * 40), rng),
}

# The 10-op subset M2-Encoder's square_transform_randaug passes
# (square_transform.py:22-38).
M2_ENCODER_AUGS = ("Identity", "AutoContrast", "Equalize", "Brightness",
                   "Sharpness", "ShearX", "ShearY", "TranslateX",
                   "TranslateY", "Rotate")


def rand_augment(img: np.ndarray, n: int, m: float,
                 rng: np.random.Generator,
                 augs: Sequence[str] = M2_ENCODER_AUGS,
                 prob: float = 0.5) -> np.ndarray:
    """Apply N ops sampled with replacement, each firing with `prob`, at
    constant magnitude `m` (the ALBEF RandomAugment.__call__ contract,
    randaugment.py:315-330). `img` is uint8 HWC RGB."""
    names = [augs[int(rng.integers(0, len(augs)))] for _ in range(n)]
    for name in names:
        if rng.random() > prob:
            continue
        img = OPS[name](img, float(m), rng)
    return img


def _to_uint8(img: np.ndarray) -> Tuple[np.ndarray, bool]:
    """Accept uint8 or float[0,1]; return uint8 + whether input was float."""
    if img.dtype == np.uint8:
        return img, False
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8), True


@registry.register_processor("rand_augment")
@registry.register_processor("random_augment")
class RandAugmentProcessor(BaseProcessor):
    """Registered RandAugment. Config: ``num_ops`` (N, default 2),
    ``magnitude`` (M, default 7 — the M2-Encoder setting), ``augs`` (op-name
    list, default the M2-Encoder 10-op subset), ``prob``, ``seed``.
    Accepts uint8 or float[0,1] HWC and preserves the input domain."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None,
                 *args: Any, **kw: Any):
        super().__init__(config)
        cfg = self.config
        self.num_ops = int(cfg.get("num_ops", 2))
        self.magnitude = float(cfg.get("magnitude", 7))
        self.augs = tuple(cfg.get("augs", M2_ENCODER_AUGS))
        unknown = [a for a in self.augs if a not in OPS]
        if unknown:
            raise ValueError(f"Unknown RandAugment ops: {unknown}")
        self.prob = float(cfg.get("prob", 0.5))
        self.rng = np.random.default_rng(cfg.get("seed", None))

    def transform_array(self, img: np.ndarray) -> np.ndarray:
        u8, was_float = _to_uint8(np.asarray(img))
        out = rand_augment(u8, self.num_ops, self.magnitude, self.rng,
                           self.augs, self.prob)
        return out.astype(np.float32) / 255.0 if was_float else out

    def __call__(self, item: Any, *args: Any, **kw: Any) -> Dict[str, Any]:
        img = item["image"] if isinstance(item, Mapping) else item
        if isinstance(img, np.ndarray) and img.ndim == 4:  # frame stack
            return {"image": np.stack(
                [self.transform_array(f) for f in img])}
        return {"image": self.transform_array(img)}
