"""MMBT and multitask predictors.

Reference parity: ``/root/reference/antmmf/predictors/mmbt_predictor.py``
(``MMBTPredictor:16`` / ``MMBTBatchPredictor:52``) and
``multitask_predictor.py`` (``MultitaskPredictor:10``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.predictors.base_predictor import BasePredictor, BatchPredictor


@registry.register_predictor("mmbt_predictor")
class MMBTPredictor(BasePredictor):
    """Single image+text classification request → label probabilities."""

    def example_data(self) -> Dict[str, Any]:
        return {"image_data": np.zeros((224, 224, 3), np.float32),
                "text": "example"}

    def build_sample(self, data: Mapping[str, Any]):
        from antmmf_tpu.datasets.processors.image_processors import (
            NormalizedImageProcessor,
        )

        data = dict(data)
        img = data.get("image_data", data.get("image"))
        if img is not None and np.asarray(img).ndim == 3:
            if not hasattr(self, "_img_proc"):
                self._img_proc = NormalizedImageProcessor(
                    self.pp.get("image", {"size": 224}))
            data["image_data"] = self._img_proc.transform_array(np.asarray(img))
        batch = super().build_sample(data)
        # MMBT consumes unprefixed text fields
        for key in ("input_ids", "input_mask", "segment_ids"):
            cap = f"caption_{key}"
            if cap in batch and key not in batch:
                batch[key] = batch[cap]
        return batch

    def format_result(self, output: Mapping[str, Any]) -> Dict[str, Any]:
        logits = np.asarray(output.get("logits"))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        return {"label": int(np.argmax(logits, -1)[0]),
                "probabilities": probs[0].tolist()}


@registry.register_predictor("mmbt_batch_predictor")
class MMBTBatchPredictor(MMBTPredictor, BatchPredictor):
    pass


@registry.register_predictor("multitask_predictor")
class MultitaskPredictor(BasePredictor):
    """Splits multitask outputs (task_<i>_logits) into per-task results."""

    def format_result(self, output: Mapping[str, Any]) -> Dict[str, Any]:
        result: Dict[str, Any] = {}
        for key, val in output.items():
            if key.startswith("task_") and key.endswith("_logits"):
                arr = np.asarray(val)
                result[key.replace("_logits", "")] = {
                    "label": int(np.argmax(arr, -1)[0]),
                    "logits": arr[0].tolist(),
                }
        return result or super().format_result(output)
