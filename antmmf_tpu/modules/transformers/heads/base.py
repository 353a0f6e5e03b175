"""Pretraining-head contract.

Reference parity: ``PredictableHead`` (``/root/reference/antmmf/modules/
transformers/heads/base.py:8``): a head exposes ``forward_head(...)`` producing
predictions and ``get_loss_metric(predictions, targets)`` returning
``{"losses": {name: scalar}, "metrics": {name: scalar}}``; the owning model merges
these into its output dict (univl_model.py:65-69).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn


class PredictableHead(nn.Module):
    def forward_head(self, *args: Any, **kwargs: Any):
        raise NotImplementedError

    def get_loss_metric(self, predictions: Any, targets: Any) -> Dict[str, Dict[str, Any]]:
        raise NotImplementedError
