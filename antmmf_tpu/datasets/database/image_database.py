"""Image database: image files addressed relative to a root directory.

Reference parity: ``/root/reference/antmmf/datasets/database/
image_database.py`` (247 LoC): extension resolution (:23-29), the
annotation-db-driven item interface with image-key inference incl. the
nlvr2 identifier pairing (:129-239), per-sample image-count sampling +
padding with a mask (:141-158), threaded ``from_path`` loading with
corrupt/missing-image tolerance (:160-200), and a transform hook.

Returns RGB uint8 HWC numpy arrays (the host data plane); the mask makes
padded image slots explicit so batches stay static-shape.
"""

from __future__ import annotations

import os
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

# annotation keys that may point at the image, in priority order
# (reference _get_possible_attrs, image_database.py:222-239)
_IMAGE_ATTRS = ("Flickr30kID", "Flikr30kID", "identifier", "image_path",
                "image_name", "image", "img", "image_id")


class ImageDatabase:
    """Path-resolving loader, optionally attached to an annotation DB.

    Standalone: ``db.load(name)`` / ``db(name_or_list)``.
    Attached: ``db.annotation_db = ann; db[idx]`` → ``get(item)`` →
    ``{"images": [...], "images_mask": [...], "image_shape": [...]}``.
    """

    def __init__(self, image_root: str,
                 annotation_db: Optional[Any] = None,
                 transform: Optional[Callable] = None,
                 is_valid_file: Optional[Callable[[str], bool]] = None,
                 image_field_keys: Optional[Sequence[str]] = None,
                 num_images_of_each_sample: Optional[int] = None,
                 apply_exif: bool = False,
                 loading_workers: int = 1,
                 seed: Optional[int] = None):
        self.image_root = image_root
        self.annotation_db = annotation_db
        self.transform = transform
        self.is_valid_file = is_valid_file
        self.image_field_keys = list(image_field_keys) if image_field_keys \
            else None
        self.num_images_of_each_sample = num_images_of_each_sample
        self.apply_exif = apply_exif
        self._rng = np.random.default_rng(seed)
        self._executor = ThreadPoolExecutor(max_workers=loading_workers)

    # ------------------------------------------------------------ standalone
    def resolve(self, name: str) -> str:
        path = name if os.path.isabs(name) else os.path.join(self.image_root, name)
        if os.path.exists(path):
            return path
        base, ext = os.path.splitext(path)
        for e in _EXTS:  # try sibling extensions (reference :23-29)
            if os.path.exists(base + e):
                return base + e
        raise FileNotFoundError(f"Image not found: {name!r} under {self.image_root!r}")

    def load(self, name: str) -> np.ndarray:
        if cv2 is None:
            raise RuntimeError("cv2 required for image decode")
        path = self.resolve(name)
        if self.apply_exif:
            from antmmf_tpu.utils.image_ops import ExifImageLoader

            return np.asarray(ExifImageLoader.load_with_exif(path))
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise IOError(f"Failed to decode image {path!r}")
        return bgr[:, :, ::-1].copy()

    def __call__(self, name: Union[str, Sequence[str]]):
        if isinstance(name, (list, tuple)):
            return [self.load(n) for n in name]
        return self.load(name)

    # ------------------------------------------------- annotation-db interface
    def __len__(self) -> int:
        self._check_annotation_db()
        return len(self.annotation_db)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        self._check_annotation_db()
        return self.get(self.annotation_db[idx])

    def _check_annotation_db(self) -> None:
        if self.annotation_db is None:
            raise AttributeError(
                "'annotation_db' must be set for indexed access — assign "
                "image_database.annotation_db first")

    def _get_attrs(self, item: Dict[str, Any]) -> List[str]:
        """Infer the image path(s) from an annotation item (reference
        :205-220): first matching key wins; nlvr2 identifiers expand to the
        img0/img1 pair; image_name/image_id get the .jpeg suffix."""
        image, pick = None, None
        for attr in _IMAGE_ATTRS:
            image = item.get(attr)
            if image is not None:
                pick = attr
                break
        if pick == "identifier" and "left_url" in item and "right_url" in item:
            return [image + "-img0.jpg", image + "-img1.jpg"]
        if pick in ("image_name", "image_id"):
            return [image + ".jpeg"]
        return [image]

    def get(self, item: Dict[str, Any]) -> Dict[str, Any]:
        from antmmf_tpu.utils.general import flatten_list

        if self.image_field_keys is None:
            candidates = self._get_attrs(item)
        else:
            candidates = [item.get(k) for k in self.image_field_keys]
        images_to_load = flatten_list(candidates)
        if self.is_valid_file is not None:
            images_to_load = [p for p in images_to_load
                              if self.is_valid_file(p)]

        images_mask = np.ones(len(images_to_load), np.int32)
        max_n = self.num_images_of_each_sample
        if max_n is not None:  # fixed image count per sample (reference :141)
            images_mask = np.zeros(max_n, np.int32)
            if len(images_to_load) >= max_n:
                # order-preserving random subsample (fps-agnostic, ref :146)
                keep = sorted(self._rng.choice(
                    len(images_to_load), max_n, replace=False).tolist())
                images_to_load = [images_to_load[i] for i in keep]
                images_mask[:] = 1
            else:
                pad = max_n - len(images_to_load)
                images_to_load = list(images_to_load) + [None] * pad
                images_mask[:-pad] = 1
        return self.from_path(images_to_load, images_mask)

    def from_path(self, paths, images_mask=None,
                  use_transforms: bool = True) -> Dict[str, Any]:
        """Threaded multi-image load; missing/corrupt files yield None slots
        with a warning instead of failing the sample (reference :160-200)."""
        if isinstance(paths, str):
            paths = [paths]
        if images_mask is None:
            images_mask = np.ones(len(paths), np.int32)

        def load_one(p):
            if p is None:
                return None, None
            try:
                img = self.load(p)
            except FileNotFoundError:
                warnings.warn(f"Image not found at path {p}")
                return None, None
            except (OSError, IOError):
                warnings.warn(f"Corrupted image: {p}")
                return None, None
            shape = img.shape[:2]
            if self.transform is not None and use_transforms:
                img = self.transform(img)
            return img, shape

        infos = list(self._executor.map(load_one, paths))
        return {"images": [x[0] for x in infos],
                "images_mask": images_mask,
                "image_shape": [x[1] for x in infos]}
