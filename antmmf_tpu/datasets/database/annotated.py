"""Annotation database: jsonl / json / npy annotation files.

Reference parity: ``/root/reference/antmmf/datasets/database/annotated.py`` —
index-addressable records, jsonl one-object-per-line or json list-of-objects.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Mapping, Optional

import numpy as np


class AnnotatedDatabase:
    def __init__(self, annotation_path: str):
        self.annotation_path = annotation_path
        self.data: List[Dict[str, Any]] = self._load(annotation_path)
        self.start_idx = 0

    def _load(self, path: str) -> List[Dict[str, Any]]:
        if not os.path.exists(path):
            raise FileNotFoundError(f"Annotation file not found: {path!r}")
        if path.endswith(".jsonl"):
            with open(path, encoding="utf-8") as f:
                return [self.process_annotation(json.loads(line)) for line in f if line.strip()]
        if path.endswith(".json"):
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
            if isinstance(data, Mapping):  # {"annotations": [...]} style
                for key in ("annotations", "data", "samples"):
                    if key in data:
                        data = data[key]
                        break
            return [self.process_annotation(d) for d in data]
        if path.endswith(".npy"):
            arr = np.load(path, allow_pickle=True)
            return [self.process_annotation(d) for d in arr.tolist()]
        raise ValueError(f"Unsupported annotation format: {path!r}")

    def process_annotation(self, annotation: Dict[str, Any]) -> Dict[str, Any]:
        """Hook for subclasses to normalise records."""
        return annotation

    def __len__(self) -> int:
        return len(self.data) - self.start_idx

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.data[self.start_idx + idx]
