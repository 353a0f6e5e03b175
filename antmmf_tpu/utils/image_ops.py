"""Host-side image ops used by feature extraction and data prep.

Reference parity: ``/root/reference/antmmf/utils/image_ops.py`` (699 LoC) —
the subset actually load-bearing for the data plane: aspect-preserving resize,
padding to fixed shapes, five/ten-crop for eval, patch grids.
"""

from __future__ import annotations

import os
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
    """Channel-mean/std normalization (reference GroupNormalize :72).

    mean/std tile across the channel axis when frames are Stack-ed to
    [H, W, F*C]; lists of frames normalize per frame. uint8-range inputs
    are scaled to [0, 1] first when the mean is ≤ 1 (reference semantics).
    """

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def _one(self, img: np.ndarray) -> np.ndarray:
        img = img.astype(np.float32)
        c = img.shape[-1]
        reps = max(1, c // self.mean.size)
        mean = np.tile(self.mean, reps).reshape(1, 1, -1)
        std = np.tile(self.std, reps).reshape(1, 1, -1)
        if img.max() > 1.0 and mean.max() <= 1.0:
            img = img / 255.0
        return (img - mean) / std

    def __call__(self, img, rng=None):
        if isinstance(img, list):
            return [self._one(f) for f in img]
        return self._one(img)


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


# ----------------------------------------------------------------------------
# Group (multi-frame) transforms — the TSN/TSM video augmentation family
# (reference image_ops.py:17-497). Every transform applies ONE sampled
# geometry to the whole frame group so temporal coherence is preserved.
# Frames are numpy HWC arrays; randomized transforms accept an optional
# numpy Generator (reference uses the global `random` module).


def _size_pair(size) -> Tuple[int, int]:
    return (int(size), int(size)) if np.isscalar(size) else tuple(size)


class GroupRandomCrop:
    """One random (th, tw) crop offset shared by all frames (ref :17)."""

    def __init__(self, size):
        self.size = _size_pair(size)

    def __call__(self, img_group: List[np.ndarray],
                 rng: "np.random.Generator" = None) -> List[np.ndarray]:
        rng = rng or np.random.default_rng()
        h, w = img_group[0].shape[:2]
        th, tw = self.size
        y = int(rng.integers(0, h - th + 1))
        x = int(rng.integers(0, w - tw + 1))
        return [img[y:y + th, x:x + tw] for img in img_group]


class GroupCenterCrop:
    """Center crop every frame (ref :44)."""

    def __init__(self, size):
        self.size = _size_pair(size)

    def __call__(self, img_group, rng=None):
        return [center_crop(img, self.size) for img in img_group]


class GroupRandomHorizontalFlip:
    """One coin flip for the whole group; optical-flow x-channels are
    inverted when flipped (ref :52)."""

    def __init__(self, is_flow: bool = False):
        self.is_flow = is_flow

    def __call__(self, img_group, rng=None):
        rng = rng or np.random.default_rng()
        if rng.random() >= 0.5:
            return img_group
        out = [np.ascontiguousarray(np.flip(img, axis=1))
               for img in img_group]
        if self.is_flow:
            for i in range(0, len(out), 2):  # even slots carry flow-x
                out[i] = (255 if out[i].dtype == np.uint8 else 1.0) - out[i]
        return out


class GroupScale:
    """Shorter-edge resize for every frame (ref :111)."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, img_group, rng=None):
        return [resize_shorter_side(img, self.size) for img in img_group]


def _fill_fix_offset(more_fix_crop: bool, image_w: int, image_h: int,
                     crop_w: int, crop_h: int) -> List[Tuple[int, int]]:
    """The 5/13 canonical TSN crop anchors (ref GroupMultiScaleCrop:385)."""
    w_step = (image_w - crop_w) // 4
    h_step = (image_h - crop_h) // 4
    offsets = [(0, 0), (4 * w_step, 0), (0, 4 * h_step),
               (4 * w_step, 4 * h_step), (2 * w_step, 2 * h_step)]
    if more_fix_crop:
        offsets += [(0, 2 * h_step), (4 * w_step, 2 * h_step),
                    (2 * w_step, 4 * h_step), (2 * w_step, 0),
                    (1 * w_step, 1 * h_step), (3 * w_step, 1 * h_step),
                    (1 * w_step, 3 * h_step), (3 * w_step, 3 * h_step)]
    return offsets


class GroupOverSample:
    """TSN 10-crop eval: 5 fixed anchors × {normal, mirrored} (ref :226)."""

    def __init__(self, crop_size, scale_size: int = None, flip: bool = True):
        self.crop_size = _size_pair(crop_size)
        self.scale_worker = GroupScale(scale_size) if scale_size else None
        self.flip = flip

    def __call__(self, img_group, rng=None):
        if self.scale_worker is not None:
            img_group = self.scale_worker(img_group)
        h, w = img_group[0].shape[:2]
        cw, ch = self.crop_size
        out = []
        for ox, oy in _fill_fix_offset(False, w, h, cw, ch):
            crops = [img[oy:oy + ch, ox:ox + cw] for img in img_group]
            out.extend(crops)
            if self.flip:
                out.extend(np.ascontiguousarray(np.flip(c, axis=1))
                           for c in crops)
        return out


class GroupFullResSample:
    """3-crop eval (left/center/right at full scale) (ref :269)."""

    def __init__(self, crop_size, scale_size: int = None, flip: bool = True):
        self.crop_size = _size_pair(crop_size)
        self.scale_worker = GroupScale(scale_size) if scale_size else None
        self.flip = flip

    def __call__(self, img_group, rng=None):
        if self.scale_worker is not None:
            img_group = self.scale_worker(img_group)
        h, w = img_group[0].shape[:2]
        cw, ch = self.crop_size
        w_step, h_step = (w - cw) // 4, (h - ch) // 4
        anchors = [(0, 2 * h_step), (4 * w_step, 2 * h_step),
                   (2 * w_step, 2 * h_step)]
        out = []
        for ox, oy in anchors:
            crops = [img[oy:oy + ch, ox:ox + cw] for img in img_group]
            out.extend(crops)
            if self.flip:
                out.extend(np.ascontiguousarray(np.flip(c, axis=1))
                           for c in crops)
        return out


class GroupMultiScaleCrop:
    """TSN train-time crop: pick a (scale, scale) pair with bounded
    distortion, crop at a canonical anchor, resize to input_size (ref :317)."""

    def __init__(self, input_size, scales=None, max_distort: int = 1,
                 fix_crop: bool = True, more_fix_crop: bool = True):
        self.scales = list(scales) if scales is not None else \
            [1.0, 0.875, 0.75, 0.66]
        self.max_distort = max_distort
        self.fix_crop = fix_crop
        self.more_fix_crop = more_fix_crop
        self.input_size = _size_pair(input_size)

    def _sample_crop(self, h: int, w: int, rng) -> Tuple[int, int, int, int]:
        base = min(h, w)
        sizes = [int(base * s) for s in self.scales]
        snap = lambda x, t: t if abs(x - t) < 3 else x  # noqa: E731
        crop_hs = [snap(x, self.input_size[1]) for x in sizes]
        crop_ws = [snap(x, self.input_size[0]) for x in sizes]
        pairs = [(cw, chh) for i, chh in enumerate(crop_hs)
                 for j, cw in enumerate(crop_ws)
                 if abs(i - j) <= self.max_distort]
        cw, ch = pairs[int(rng.integers(0, len(pairs)))]
        if not self.fix_crop:
            ox = int(rng.integers(0, w - cw + 1))
            oy = int(rng.integers(0, h - ch + 1))
        else:
            anchors = _fill_fix_offset(self.more_fix_crop, w, h, cw, ch)
            ox, oy = anchors[int(rng.integers(0, len(anchors)))]
        return cw, ch, ox, oy

    def __call__(self, img_group, rng=None):
        rng = rng or np.random.default_rng()
        h, w = img_group[0].shape[:2]
        cw, ch, ox, oy = self._sample_crop(h, w, rng)
        return [resize_image(img[oy:oy + ch, ox:ox + cw],
                             (self.input_size[1], self.input_size[0]))
                for img in img_group]


class GroupRandomSizedCrop:
    """Inception-style area/aspect crop shared across the group (ref :409)."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, img_group, rng=None):
        rng = rng or np.random.default_rng()
        h, w = img_group[0].shape[:2]
        for _ in range(10):
            target_area = rng.uniform(0.08, 1.0) * h * w
            aspect = rng.uniform(3.0 / 4, 4.0 / 3)
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if rng.random() < 0.5:
                cw, ch = ch, cw
            if cw <= w and ch <= h:
                ox = int(rng.integers(0, w - cw + 1))
                oy = int(rng.integers(0, h - ch + 1))
                return [resize_image(img[oy:oy + ch, ox:ox + cw],
                                     (self.size, self.size))
                        for img in img_group]
        scaled = GroupScale(self.size)(img_group)
        return GroupRandomCrop(self.size)(scaled, rng=rng)


class Stack:
    """Concatenate a frame group along channels → [H, W, F*C] (ref :457);
    roll=True swaps RGB→BGR per frame (legacy caffe models)."""

    def __init__(self, roll: bool = False):
        self.roll = roll

    def __call__(self, img_group, rng=None):
        frames = [np.atleast_3d(img) for img in img_group]
        if self.roll:
            frames = [f[:, :, ::-1] for f in frames]
        return np.concatenate(frames, axis=2)


class ToArrayFormat:
    """[H, W, C] uint8 → float32 [C, H, W] in [0, 1] (ref
    ToTorchFormatTensor:473, returned as numpy for jnp feeding)."""

    def __init__(self, div: bool = True):
        self.div = div

    def __call__(self, pic: np.ndarray, rng=None) -> np.ndarray:
        out = np.transpose(np.atleast_3d(pic), (2, 0, 1)).astype(np.float32)
        return out / 255.0 if self.div else out


class IdentityTransform:
    def __call__(self, data, rng=None):
        return data


# ----------------------------------------------------------------------------
# Image loaders (reference image_ops.py:499-697): frame-folder templates for
# TSN/TSM-style datasets, exif-aware loading, and yolo letterbox sizing.


class ImageLoader:
    """Load frames from `<root>/<dir>/<tmpl % idx>` (ref :499).

    modality "RGB" returns [HWC uint8]; "Flow" returns [x, y] grayscale
    frames (either flow_{x,y}_%05d files or one RGB file whose first two
    channels carry flow).
    """

    def __init__(self, modality: str = "RGB", root_path: str = ".",
                 image_tmpl: str = "img_{:05d}.jpg"):
        self.modality = modality
        self.root_path = root_path
        self.image_tmpl = image_tmpl

    def _read(self, path: str, gray: bool = False) -> np.ndarray:
        import cv2

        flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag)
        if img is None:
            raise FileNotFoundError(path)
        return img if gray else cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def load_image(self, directory: str, idx: int) -> List[np.ndarray]:
        if self.modality in ("RGB", "RGBDiff"):
            if self.image_tmpl == "{}_{:05d}.jpg":
                name = self.image_tmpl.format(
                    os.path.basename(directory), idx)
            else:
                name = self.image_tmpl.format(idx)
            path = os.path.join(self.root_path, directory, name)
            try:
                return [self._read(path)]
            except FileNotFoundError:
                # fall back to frame 1 like the reference
                first = (self.image_tmpl.format(directory, 1)
                         if self.image_tmpl == "{}_{:05d}.jpg"
                         else self.image_tmpl.format(1))
                return [self._read(
                    os.path.join(self.root_path, directory, first))]
        if self.modality == "Flow":
            if self.image_tmpl == "flow_{}_{:05d}.jpg":
                base = os.path.join(self.root_path, directory)
                return [
                    self._read(os.path.join(
                        base, self.image_tmpl.format("x", idx)), gray=True),
                    self._read(os.path.join(
                        base, self.image_tmpl.format("y", idx)), gray=True)]
            rgb = self._read(os.path.join(
                self.root_path, directory, self.image_tmpl.format(idx)))
            return [rgb[:, :, 0], rgb[:, :, 1]]
        raise ValueError(f"unknown modality {self.modality}")


class ExifImageLoader:
    """PIL loader that applies the EXIF orientation tag (ref :594)."""

    @staticmethod
    def apply_exif_orientation(image):
        try:
            exif = image.getexif()
            orientation = exif.get(0x0112)  # EXIF Orientation tag
            if orientation == 3:
                image = image.rotate(180, expand=True)
            elif orientation == 6:
                image = image.rotate(270, expand=True)
            elif orientation == 8:
                image = image.rotate(90, expand=True)
        except Exception:
            pass
        return image

    @staticmethod
    def load_with_exif(file) -> np.ndarray:
        from PIL import Image

        img = Image.open(file)
        img = ExifImageLoader.apply_exif_orientation(img)
        if img.mode != "RGB":
            img = img.convert("RGB")
        return np.asarray(img)


class CV2ImageLoader:
    """cv2 loader returning RGB HWC uint8 (faster than PIL, ref :626)."""

    @staticmethod
    def load(file: str) -> np.ndarray:
        import cv2

        img = cv2.imread(file)
        if img is None:
            raise FileNotFoundError(file)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class YoloImageLoader:
    """Resize the longer side to target_size, keep ratio (ref :638);
    returns {image, origin_size, image_size} like the reference."""

    def __init__(self, target_size: int, is_training: bool = False):
        self.target_size = int(target_size)
        self.is_training = is_training

    def __call__(self, img_path: str) -> dict:
        img = CV2ImageLoader.load(img_path)
        return self.resize_image_to_target(img)

    def resize_image_to_target(self, img: np.ndarray) -> dict:
        import cv2

        h0, w0 = img.shape[:2]
        ratio = self.target_size / max(h0, w0)
        if ratio != 1:
            interp = (cv2.INTER_AREA if ratio < 1 and not self.is_training
                      else cv2.INTER_LINEAR)
            img = cv2.resize(img, (int(w0 * ratio), int(h0 * ratio)),
                             interpolation=interp)
        return {"image": img, "origin_size": (h0, w0),
                "image_size": img.shape[:2]}


def picture_in_picture(img: np.ndarray, picture_dir: str = None,
                       rng: "np.random.Generator" = None) -> np.ndarray:
    """Collage augmentation (reference dataset_utils.py:540 pictureInPicture):
    paste the (scaled) image onto a sampled background — a random picture
    from ``picture_dir``, a blurred variant, or a solid color. Returns the
    input unchanged when ``picture_dir`` is unset/empty."""
    import warnings

    rng = rng or np.random.default_rng()
    try:
        import cv2
    except Exception:
        return img
    import glob as _glob

    paths = _glob.glob(os.path.join(picture_dir, "*")) if picture_dir else []
    if not paths:
        warnings.warn(
            "skip pictureInPicture augmentation: picture_dir not set/empty")
        return img

    base = CV2ImageLoader.load(paths[int(rng.integers(0, len(paths)))])
    h, w = img.shape[:2]
    bh, bw = base.shape[:2]
    # backgrounds must comfortably contain the pasted foreground
    if min(bh, bw) < max(h, w):
        scale = max(h, w) * 1.3 / min(bh, bw)
        base = cv2.resize(base, (int(bw * scale) + 1, int(bh * scale) + 1))
        bh, bw = base.shape[:2]

    roll = rng.uniform()
    k = 2 * int(rng.integers(10, 16)) + 1  # odd gaussian kernel
    if roll <= 0.4:  # blurred background (asset or foreground itself)
        src = base if rng.uniform() <= 0.5 else cv2.resize(
            img.astype(np.uint8) if img.dtype != np.uint8 else img, (bw, bh))
        base = cv2.GaussianBlur(src, (k, k), 0)
    elif roll < 0.8:  # solid color
        color = rng.integers(0, 256, 3)
        base = np.full((bh, bw, 3), color, np.uint8)

    paste_ratio = float(rng.uniform(0.8, 1.0)) * min(bh, bw) / max(h, w)
    th, tw = max(1, int(h * paste_ratio)), max(1, int(w * paste_ratio))
    ox = int(rng.uniform((bw - tw) // 4, max((bw - tw) // 2, (bw - tw) // 4 + 1)))
    oy = int(rng.uniform((bh - th) // 4, max((bh - th) // 2, (bh - th) // 4 + 1)))
    if rng.uniform() > 0.5:  # mirror the anchor like the reference
        ox, oy = bw - ox - tw, bh - oy - th
    region = cv2.resize(np.asarray(img, np.uint8) if img.dtype != np.uint8
                        else img, (tw, th))
    out = np.array(base)
    out[oy:oy + th, ox:ox + tw] = region
    return out


def rand_logo(img: np.ndarray, random_logo_dir: str = None,
              rng: "np.random.Generator" = None) -> np.ndarray:
    """Alpha-composite a random logo at a random location (reference
    dataset_utils.py:670 randLogo). Logos larger than 30% of the image short
    side are shrunk. Returns the input unchanged when the dir is unset."""
    import warnings

    rng = rng or np.random.default_rng()
    import glob as _glob

    paths = _glob.glob(os.path.join(random_logo_dir, "*")) \
        if random_logo_dir else []
    if not paths:
        warnings.warn("skip randLogo augmentation: random_logo_dir not set")
        return img
    try:
        import cv2
        from PIL import Image
    except Exception:
        return img

    h, w = img.shape[:2]
    logo = np.asarray(Image.open(
        paths[int(rng.integers(0, len(paths)))]).convert("RGBA"))
    lh, lw = logo.shape[:2]
    limit = max(1, int(0.3 * min(h, w)))
    if min(lh, lw) > limit:
        scale = limit / min(lh, lw)
        lh, lw = max(1, int(lh * scale)), max(1, int(lw * scale))
        logo = cv2.resize(logo, (lw, lh))
    ox = int(rng.integers(0, max(w - lw, 1)))
    oy = int(rng.integers(0, max(h - lh, 1)))
    out = np.array(img, np.uint8) if img.dtype != np.uint8 else np.array(img)
    patch = out[oy:oy + lh, ox:ox + lw].astype(np.float32)
    alpha = logo[:patch.shape[0], :patch.shape[1], 3:4].astype(np.float32) / 255
    rgb = logo[:patch.shape[0], :patch.shape[1], :3].astype(np.float32)
    out[oy:oy + lh, ox:ox + lw] = \
        (alpha * rgb + (1 - alpha) * patch).astype(np.uint8)
    return out


# reference-name aliases (dataset_utils.py:540,670)
pictureInPicture = picture_in_picture
randLogo = rand_logo
