"""Feature-reader family: layout-specific readers for precomputed features.

Reference parity: ``/root/reference/antmmf/datasets/features/
feature_readers.py`` (339 LoC) — the ndim/depth-first dispatching
``FeatureReader`` (:24-109) and its concrete readers:
``FeatureInfoReader`` (:112), ``FasterRCNNFeatureReader`` (:125),
``CHWFeatureReader`` (:130), ``Dim3FeatureReader`` (:138),
``HWCFeatureReader`` (:146), ``PaddedFasterRCNNFeatureReader`` (:155 —
``_info.npy`` sidecars, dict-payload unwrap, pad to max_features),
``LMDBFeatureReader``/``LMDBFeatureInfoReader`` (:226/:287, gated on the
optional lmdb package), ``PaddedFeatureRCNNWithBBoxesFeatureReader`` (:317).

TPU deltas: readers return numpy float32 (the static-shape host batch plane;
jnp conversion happens at prefetch), and every padded reader emits fixed
shapes so the jitted step never recompiles.
"""

from __future__ import annotations

import io
import os
import warnings
from typing import Any, Dict, Optional, Tuple

import numpy as np

MAX_FEATURES_KEY = "max_features"
LMDB_EXT = ".lmdb"
NPY_EXT = ".npy"

ReadResult = Tuple[Optional[np.ndarray], Optional[Dict[str, Any]]]


def _load_info_sidecar(feat_path: str) -> Dict[str, Any]:
    info_path = f"{feat_path.split(NPY_EXT)[0]}_info.npy"
    if not os.path.exists(info_path):
        return {}
    try:
        return dict(np.load(info_path, allow_pickle=True).item())
    except (OSError, ValueError):
        warnings.warn(f"Corrupt npy feature-info file: {info_path}")
        return {}


class FeatureInfoReader:
    """bbox/class metadata only, from the `_info.npy` sidecar (ref :112)."""

    def read(self, feat_path: str) -> ReadResult:
        return None, _load_info_sidecar(feat_path)


class FasterRCNNFeatureReader:
    """Raw [R, D] region features, no padding (ref :125)."""

    def read(self, feat_path: str) -> ReadResult:
        return np.load(feat_path).astype(np.float32), None


class CHWFeatureReader:
    """[1, C, H, W] grid feature → [C, H, W] (ref :130)."""

    def read(self, feat_path: str) -> ReadResult:
        feat = np.load(feat_path)
        assert feat.shape[0] == 1, "batch is not 1"
        return feat[0].astype(np.float32), None


class Dim3FeatureReader:
    """[H, W, C] grid feature → [H*W, C] token grid (ref :138)."""

    def read(self, feat_path: str) -> ReadResult:
        feat = np.load(feat_path)
        return feat.reshape(-1, feat.shape[-1]).astype(np.float32), None


class HWCFeatureReader:
    """[1, H, W, C] grid feature → [H*W, C] token grid (ref :146)."""

    def read(self, feat_path: str) -> ReadResult:
        feat = np.load(feat_path)
        assert feat.shape[0] == 1, "batch is not 1"
        return feat.reshape(-1, feat.shape[-1]).astype(np.float32), None


class PaddedFasterRCNNFeatureReader:
    """[R, D] region features padded to max_loc + `_info.npy` sidecar merge
    (ref :155). Handles dict payloads ({'features': ..., 'info': ...} or
    OCR-style {'image_feat': ..., 'image_text': ...}) and >2-d grid features
    (flattened to tokens); corrupt files degrade to zeros with a warning."""

    def __init__(self, max_loc: int, feat_dim: Optional[int] = None):
        self.max_loc = max_loc
        self.feat_dim = feat_dim

    def _load(self, feat_path: str) -> Tuple[np.ndarray, Dict[str, Any]]:
        import pickle

        try:
            feat = np.load(feat_path, allow_pickle=True)
        except (OSError, ValueError, pickle.UnpicklingError):
            warnings.warn(f"Corrupt npy feature file: {feat_path}")
            feat = np.zeros((self.max_loc, self.feat_dim or 1), np.float32)
        return feat, _load_info_sidecar(feat_path)

    def _unwrap(self, feat: np.ndarray,
                info: Dict[str, Any]) -> np.ndarray:
        if feat.size == 1 and isinstance(feat.item(0), dict):
            item = feat.item()
            if "image_text" in item:  # OCR payload
                info["image_text"] = item["image_text"]
                info["is_ocr"] = item.get("image_bbox_source")
                feat = item["image_feat"]
            if "info" in item:
                if "image_text" in item["info"]:
                    info.update(item["info"])
                feat = item["features"]
        return feat

    def prepare(self, feat: Optional[np.ndarray],
                info: Dict[str, Any]) -> ReadResult:
        if feat is None:
            return None, info
        feat = self._unwrap(np.asarray(feat), info)
        if feat.ndim > 2:  # ResNet-grid case: flatten to tokens
            feat = feat.reshape(-1, feat.shape[-1])
        if feat.ndim == 1:  # pooled vector → single region
            feat = feat[None]
        loc, dim = feat.shape
        if self.feat_dim is not None:
            assert dim == self.feat_dim, (dim, self.feat_dim)
        out = np.zeros((self.max_loc, dim), np.float32)
        out[:min(loc, self.max_loc)] = feat[: self.max_loc]
        info[MAX_FEATURES_KEY] = np.int64(loc)
        return out, info

    def read(self, feat_path: str) -> ReadResult:
        feat, info = self._load(feat_path)
        return self.prepare(feat, info)


class PaddedFeatureRCNNWithBBoxesFeatureReader:
    """Dict payload carrying both region features and their boxes, each
    padded to max_loc (ref :317)."""

    def __init__(self, max_loc: int):
        self.max_loc = max_loc

    def read(self, feat_path: str) -> ReadResult:
        payload = np.load(feat_path, allow_pickle=True).item()
        feat = np.asarray(payload["image_feature"], np.float32)
        boxes = np.asarray(payload["image_bboxes"])
        loc, dim = feat.shape
        out = np.zeros((self.max_loc, dim), np.float32)
        out[:min(loc, self.max_loc)] = feat[: self.max_loc]
        out_boxes = np.zeros((self.max_loc, 4), np.int32)
        out_boxes[:min(loc, self.max_loc)] = boxes[: self.max_loc]
        return out, {"image_bbox": out_boxes,
                     MAX_FEATURES_KEY: np.int64(loc)}


class LMDBFeatureReader(PaddedFasterRCNNFeatureReader):
    """Padded reader over an LMDB of pickled npy buffers (ref :226); gated
    on the optional lmdb package."""

    def __init__(self, max_loc: int, feat_dim: Optional[int],
                 db_path: str):
        super().__init__(max_loc, feat_dim)
        from antmmf_tpu.utils.lmdb_lite import open_lmdb

        # real lmdb when installed, pure-Python reader otherwise
        self.env = open_lmdb(db_path)

    def read(self, feat_path: str) -> ReadResult:
        key = os.path.splitext(os.path.basename(feat_path))[0]
        buf = self.env.get(key.encode())
        if buf is None:
            raise KeyError(f"Feature {key!r} not in lmdb")
        feat = np.load(io.BytesIO(buf), allow_pickle=True)
        return self.prepare(feat, {})


class LMDBFeatureInfoReader(LMDBFeatureReader):
    """Info-only variant of the LMDB reader (ref :287)."""

    def read(self, feat_path: str) -> ReadResult:
        _, info = super().read(feat_path)
        return None, info


class FeatureReader:
    """Layout-dispatching entry (ref :24-109): picks the concrete reader
    from (ndim, depth_first, max_features, only_features_info) exactly like
    the reference — lmdb paths, info-only, padded/unpadded regions, and the
    three grid layouts."""

    def __init__(self, base_path: str, depth_first: bool = False,
                 feature_dim: Optional[int] = None, ndim: int = 2,
                 max_features: Optional[int] = None,
                 only_features_info: bool = False):
        self.base_path = base_path
        if base_path.endswith(LMDB_EXT):
            cls = (LMDBFeatureInfoReader if only_features_info
                   else LMDBFeatureReader)
            self.feat_reader = cls(max_features, feature_dim, base_path)
        elif only_features_info:
            self.feat_reader = FeatureInfoReader()
        elif ndim in (0, 2):
            self.feat_reader = (
                FasterRCNNFeatureReader() if max_features is None
                else PaddedFasterRCNNFeatureReader(max_features, feature_dim))
        elif ndim == 3 and not depth_first:
            self.feat_reader = Dim3FeatureReader()
        elif ndim == 4 and depth_first:
            self.feat_reader = CHWFeatureReader()
        elif ndim == 4 and not depth_first:
            self.feat_reader = HWCFeatureReader()
        else:
            raise TypeError("unknown image feature format")

    def read(self, feat_path: str) -> ReadResult:
        return self.feat_reader.read(os.path.join(self.base_path, feat_path))
