"""Report: ordered merge of the input batch and the model output for downstream
loss/metric computation and prediction dumping.

Reference parity: ``/root/reference/antmmf/common/report.py`` (``Report:14``,
``default_result_formater:70``). Here a Report is a thin dict view over
(batch pytree, model output pytree) with batch fields shadowed by output fields.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping


class Report(dict):
    def __init__(self, batch: Mapping[str, Any], model_output: Mapping[str, Any]):
        super().__init__()
        self.update(batch)
        self.update(model_output)
        self.batch = dict(batch)
        self.model_output = dict(model_output)

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e


def default_result_formater(report: Report) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in ("id", "question_id", "image_id", "logits", "targets", "scores"):
        if key in report:
            out[key] = report[key]
    return out
