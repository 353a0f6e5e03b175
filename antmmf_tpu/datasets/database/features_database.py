"""Precomputed-feature database: .npy/.npz region or grid features per item.

Reference parity: ``/root/reference/antmmf/datasets/database/
features_database.py`` (147 LoC) + ``features/feature_readers.py`` (339 LoC,
LMDB-backed). LMDB is optional in this image; the npy/npz directory reader is
the default path, padded to fixed region counts (static shapes).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


class FeaturesDatabase:
    def __init__(self, features_root: str, max_regions: int = 36,
                 feature_dim: Optional[int] = None):
        self.features_root = features_root
        self.max_regions = max_regions
        self.feature_dim = feature_dim
        self._lmdb = None
        if features_root.endswith(".lmdb"):
            from antmmf_tpu.utils.lmdb_lite import open_lmdb

            # real lmdb when installed, pure-Python reader otherwise
            self._lmdb = open_lmdb(features_root)

    def _load_raw(self, name: str) -> np.ndarray:
        if self._lmdb is not None:
            buf = self._lmdb.get(name.encode())
            if buf is None:
                raise KeyError(f"Feature {name!r} not in lmdb")
            import io

            return np.load(io.BytesIO(buf), allow_pickle=True)
        base = os.path.join(self.features_root, name)
        for cand in (base, base + ".npy", base + ".npz"):
            if os.path.exists(cand):
                data = np.load(cand, allow_pickle=True)
                if isinstance(data, np.lib.npyio.NpzFile):
                    key = "features" if "features" in data else data.files[0]
                    return data[key]
                return data
        raise FileNotFoundError(f"Feature not found: {name!r} under "
                                f"{self.features_root!r}")

    def get(self, name: str) -> Dict[str, np.ndarray]:
        """Returns fixed-shape {'image_feature': [R, D], 'image_feature_mask':
        [R]} padded/truncated to max_regions."""
        feat = np.asarray(self._load_raw(name), np.float32)
        if feat.ndim == 1:
            feat = feat[None]
        R, D = feat.shape
        if self.feature_dim is not None and D != self.feature_dim:
            raise ValueError(f"{name}: feature dim {D} != {self.feature_dim}")
        out = np.zeros((self.max_regions, D), np.float32)
        n = min(R, self.max_regions)
        out[:n] = feat[:n]
        mask = np.zeros((self.max_regions,), np.int64)
        mask[:n] = 1
        return {"image_feature": out, "image_feature_mask": mask}

    def __call__(self, name: str) -> Dict[str, np.ndarray]:
        return self.get(name)
