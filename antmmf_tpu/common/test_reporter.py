"""TestReporter: prediction dumping for EvalAI-style submission files.

Reference parity: ``/root/reference/antmmf/common/test_reporter.py:40`` —
per-dataset prediction loop, csv/json/jsonl dump, file splitting by
``evalai_max_predictions_per_file`` (:91-164).
"""

from __future__ import annotations

import csv
import json
import math
import os
import time
from typing import Any, Dict, List, Mapping, Optional

import numpy as np


def _to_jsonable(v: Any) -> Any:
    if isinstance(v, (np.ndarray, np.generic)):
        return v.tolist()
    if hasattr(v, "tolist"):
        return v.tolist()
    return v


class TestReporter:
    def __init__(self, config: Mapping):
        tp = config.get("training_parameters", {})
        self.save_dir = tp.get("save_dir", "./save")
        self.report_format = tp.get("report_format", "json")
        self.max_per_file = tp.get("evalai_max_predictions_per_file", math.inf)
        if self.max_per_file in (".inf", None):
            self.max_per_file = math.inf
        self.out_file = tp.get("evalai_inference_file")
        self.predictions: List[Dict[str, Any]] = []

    def add_batch(self, batch: Mapping, output: Mapping,
                  fields: Optional[List[str]] = None) -> None:
        keys = fields or [k for k in ("id", "question_id", "image_vid",
                                      "caption_tid", "logits", "scores", "sim")
                          if k in output or k in batch]
        n = None
        rows: List[Dict[str, Any]] = []
        for key in keys:
            arr = np.asarray(output.get(key, batch.get(key)))
            if arr.ndim == 0:
                continue
            if n is None:
                n = arr.shape[0]
                rows = [dict() for _ in range(n)]
            for i in range(min(n, arr.shape[0])):
                rows[i][key] = _to_jsonable(arr[i])
        self.predictions.extend(rows)

    def dump(self, dataset_name: str = "predictions") -> List[str]:
        os.makedirs(os.path.join(self.save_dir, "reports"), exist_ok=True)
        stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
        n_files = max(1, math.ceil(
            len(self.predictions) / self.max_per_file)
            if self.max_per_file != math.inf else 1)
        per_file = math.ceil(len(self.predictions) / n_files) if self.predictions \
            else 0
        paths = []
        for i in range(n_files):
            chunk = self.predictions[i * per_file:(i + 1) * per_file]
            suffix = f"_{i}" if n_files > 1 else ""
            base = self.out_file or os.path.join(
                self.save_dir, "reports", f"{dataset_name}_{stamp}")
            path = f"{base}{suffix}.{self.report_format}"
            if self.report_format == "json":
                with open(path, "w") as f:
                    json.dump(chunk, f)
            elif self.report_format == "jsonl":
                with open(path, "w") as f:
                    for row in chunk:
                        f.write(json.dumps(row) + "\n")
            elif self.report_format == "csv":
                with open(path, "w", newline="") as f:
                    if chunk:
                        writer = csv.DictWriter(f, fieldnames=list(chunk[0]))
                        writer.writeheader()
                        writer.writerows(chunk)
            else:
                raise ValueError(f"Unknown report format {self.report_format!r}")
            paths.append(path)
        return paths
