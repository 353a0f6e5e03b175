"""DataUpdater: gather model outputs across processes and rewrite dataset
annotations (adversarial data generation loop).

Reference parity: ``/root/reference/antmmf/common/data_updater.py:18`` — a
TestReporter subclass that all-gathers logits cross-rank and updates the
annotation store.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Mapping, Optional

import numpy as np

from antmmf_tpu.common.test_reporter import TestReporter
from antmmf_tpu.parallel import collectives as coll


class DataUpdater(TestReporter):
    def __init__(self, config: Mapping,
                 update_fn: Optional[Callable[[Dict, Dict], Dict]] = None):
        super().__init__(config)
        self.update_fn = update_fn or self.default_update

    @staticmethod
    def default_update(annotation: Dict, prediction: Dict) -> Dict:
        out = dict(annotation)
        if "logits" in prediction:
            logits = np.asarray(prediction["logits"])
            out["pseudo_label"] = int(np.argmax(logits))
            out["pseudo_score"] = float(np.max(logits))
        return out

    def gather_predictions(self) -> List[Dict[str, Any]]:
        """All-gather per-process prediction lists (rank order preserved)."""
        gathered = coll.all_gather_object(self.predictions)
        flat: List[Dict[str, Any]] = []
        for part in gathered:
            flat.extend(part)
        return flat

    def update_annotations(self, database, out_path: Optional[str] = None) -> int:
        """Apply predictions onto an AnnotatedDatabase in caption_tid order;
        optionally persist the rewritten jsonl. Returns #updated."""
        predictions = self.gather_predictions()
        updated = 0
        for pred in predictions:
            idx = pred.get("caption_tid", pred.get("id"))
            if idx is None:
                continue
            idx = int(np.asarray(idx).reshape(-1)[0])
            if 0 <= idx < len(database.data):
                database.data[idx] = self.update_fn(database.data[idx], pred)
                updated += 1
        if out_path and coll.is_main_process():
            os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
            with open(out_path, "w", encoding="utf-8") as f:
                for ann in database.data:
                    f.write(json.dumps(ann) + "\n")
        return updated
