"""Dataset builder contract: named factories resolved from YAML via the registry.

Reference parity: ``/root/reference/antmmf/datasets/base_dataset_builder.py:43`` —
``_build`` (download/prepare, main-process only with a barrier :107-110) then
``_load`` (construct the dataset object) per dataset_type.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from antmmf_tpu.common.configuration import convert_to_config
from antmmf_tpu.parallel import collectives as coll


class BaseDatasetBuilder:
    def __init__(self, dataset_name: str):
        self.dataset_name = dataset_name

    def build(self, config: Mapping, dataset_type: str = "train", *args: Any, **kw: Any):
        config = convert_to_config(config)
        # data preparation runs once (process 0), others wait at the barrier
        if coll.is_main_process():
            self._build(dataset_type, config, *args, **kw)
        coll.synchronize("dataset_build")
        return self._load(dataset_type, config, *args, **kw)

    def _build(self, dataset_type: str, config, *args: Any, **kw: Any) -> None:
        """Download / preprocess. Default: nothing (local data)."""

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        raise NotImplementedError
