"""Annotation database: jsonl / json / npy / csv / tsv annotation files.

Reference parity: ``/root/reference/antmmf/datasets/database/annotated.py``
(224 LoC) — index-addressable records from jsonl (:85), jsonl directories
(:72), json (:102), npy imdb dumps with metadata + legacy start_idx (:136),
csv/tsv tables (:116-134), the answers→label normalization of
``preprocess_item`` (:159-175), and ``DetectionCOCOAnnotated`` (:184 —
implemented here without pycocotools: the COCO json is indexed directly).
"""

from __future__ import annotations

import csv
import glob
import json
import os
from typing import Any, Dict, List, Mapping, Optional

import numpy as np


class AnnotatedDatabase:
    def __init__(self, annotation_path: str, anno_type: str = "normal"):
        self.annotation_path = annotation_path
        self.anno_type = anno_type
        self.metadata: Dict[str, Any] = {}
        self.start_idx = 0
        self.data: List[Dict[str, Any]] = self._load(annotation_path)

    def _rows(self, path: str) -> List[Dict[str, Any]]:
        if os.path.isdir(path):  # directory of jsonl shards (ref :72)
            rows: List[Dict[str, Any]] = []
            for shard in sorted(glob.glob(os.path.join(path, "*.jsonl"))):
                with open(shard, encoding="utf-8") as f:
                    rows.extend(json.loads(line) for line in f if line.strip())
            return rows
        if path.endswith(".jsonl"):
            with open(path, encoding="utf-8") as f:
                return [json.loads(line) for line in f if line.strip()]
        if path.endswith(".json"):
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
            if isinstance(data, Mapping):  # {"annotations": [...]} style
                for key in ("annotations", "data", "samples"):
                    if key in data:
                        data = data[key]
                        break
            return list(data)
        if path.endswith(".npy"):
            db = np.load(path, allow_pickle=True)
            if db.ndim == 0 and isinstance(db.item(), dict):  # imdb dump
                item = db.item()
                self.metadata = item.get("metadata", {})
                return list(item.get("data", []))
            rows = db.tolist()
            # legacy imdb: header row carries metadata (ref :143-147)
            if rows and isinstance(rows[0], dict) and "image_id" not in rows[0]:
                self.start_idx = 1
            return rows
        if path.endswith((".csv", ".tsv")):
            delim = "\t" if path.endswith(".tsv") else ","
            with open(path, encoding="utf-8", newline="") as f:
                reader = csv.DictReader(f, delimiter=delim)
                self.metadata = list(reader.fieldnames or [])
                return [dict(r) for r in reader]
        raise ValueError(f"Unsupported annotation format: {path!r}")

    def _load(self, path: str) -> List[Dict[str, Any]]:
        if isinstance(path, (list, tuple)):
            assert len(path) == 1, "only one annotation path supported"
            path = path[0]
        if not os.path.exists(path):
            raise FileNotFoundError(f"Annotation file not found: {path!r}")
        rows = self._rows(path)
        keep = self.start_idx
        out = [self.process_annotation(r) for r in rows[keep:]]
        self.start_idx = 0  # rows already sliced
        return out

    def process_annotation(self, annotation: Dict[str, Any]) -> Dict[str, Any]:
        """Hook for subclasses to normalise records."""
        return annotation

    def preprocess_item(self, item: Dict[str, Any]) -> Dict[str, Any]:
        """Answers → label normalization for legacy imdbs (ref :159-175)."""
        if isinstance(item, dict) and "answers" not in item:
            if "all_answers" in item and "valid_answers" not in item:
                item["answers"] = item["all_answers"]
            if "valid_answers" in item:
                item["answers"] = item["valid_answers"]
        if isinstance(item, dict) and item.get("answers"):
            if item["answers"][-1] == "<copy>":
                item["answers"] = item["answers"][:-1]
            item["label"] = item["answers"]
        return item

    def get_version(self):
        return self.metadata.get("version") \
            if isinstance(self.metadata, dict) else None

    def __len__(self) -> int:
        return len(self.data) - self.start_idx

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.preprocess_item(self.data[self.start_idx + idx])


class DetectionCOCOAnnotated(AnnotatedDatabase):
    """COCO detection annotations addressable by image index or file name
    (reference annotated.py:184-224). pycocotools-free: the COCO json's
    images/annotations tables are indexed directly."""

    def __init__(self, config, **kwargs):
        if isinstance(config, (str, os.PathLike)):
            path = str(config)
        else:
            path = dict(config).get("annotation_path")
        with open(path, encoding="utf-8") as f:
            coco = json.load(f)
        self.id2imginfo = {img["id"]: img for img in coco.get("images", [])}
        self.img2id = {img["file_name"]: img["id"]
                       for img in self.id2imginfo.values()}
        self.categories = {c["id"]: c for c in coco.get("categories", [])}
        self._anns_by_img: Dict[Any, List[Dict[str, Any]]] = {}
        for ann in coco.get("annotations", []):
            self._anns_by_img.setdefault(ann["image_id"], []).append(ann)
        self.metadata = {}
        self.start_idx = 0
        self.data = sorted(self.id2imginfo.keys())

    def get_annotation_by_name(self, img_name: str) -> List[Dict[str, Any]]:
        img_id = self.img2id.get(img_name)
        return [] if img_id is None else self._anns_by_img.get(img_id, [])

    def get_annotation_by_idx(self, idx: int) -> List[Dict[str, Any]]:
        return self._anns_by_img.get(self.data[idx], [])

    def __getitem__(self, id_or_name):
        if isinstance(id_or_name, int):
            return self.get_annotation_by_idx(id_or_name)
        assert isinstance(id_or_name, str)
        return self.get_annotation_by_name(id_or_name)
