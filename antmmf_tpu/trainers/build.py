"""Trainer factory (reference ``antmmf/trainers/build.py:1-40``)."""

from __future__ import annotations

from typing import Mapping

import antmmf_tpu.datasets  # noqa: F401  (builder/processor registry side effects)
import antmmf_tpu.models  # noqa: F401  (model registry side effects)
import antmmf_tpu.tasks  # noqa: F401
from antmmf_tpu.common.configuration import convert_to_config
from antmmf_tpu.common.registry import registry


def build_trainer(config: Mapping):
    config = convert_to_config(config)
    name = config.get("training_parameters", {}).get("trainer", "base_trainer")
    cls = registry.get_trainer_class(name)
    return cls(config)
