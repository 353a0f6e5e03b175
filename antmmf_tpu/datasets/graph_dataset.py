"""KG link-prediction dataset over GraphDatabase — feeds comp_gcn end-to-end.

Reference parity: the kgrl graph data path
(``/root/reference/antmmf/datasets/database/graph_database.py:88`` +
``models/comp_gcn.py:8``); here the data source is a local triples file (see
``database/graph_database.py``) instead of Ant's graph service.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.base_dataset import BaseDataset
from antmmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from antmmf_tpu.datasets.database.graph_database import GraphDatabase
from antmmf_tpu.structures.sample import Sample


class GraphLinkPredictionDataset(BaseDataset):
    """Samples are (head, relation → tail) over a shared static graph."""

    def __init__(self, name: str, dataset_type: str, config: Mapping):
        super().__init__(name, dataset_type, config)
        cfg = self.config
        root = cfg.get("data_root_dir", ".")
        triples = cfg.get("triples", {})
        path = triples.get(dataset_type) if isinstance(triples, Mapping) \
            else triples
        self.db = GraphDatabase(
            os.path.join(root, str(path)),
            max_edges=cfg.get("max_edges"),
        )

    @property
    def num_entities(self) -> int:
        return self.db.num_entities

    @property
    def num_relations(self) -> int:
        return self.db.num_relations

    def __len__(self) -> int:
        return len(self.db)

    def get_item(self, idx: int) -> Sample:
        sample = Sample()
        for k, v in self.db[idx].items():
            sample[k] = v
        sample["id"] = np.int64(idx)
        return sample


@registry.register_builder("graph_link_prediction")
@registry.register_builder("kg_link_prediction")
class GraphLinkPredictionBuilder(BaseDatasetBuilder):
    def __init__(self, dataset_name: str = "graph_link_prediction"):
        super().__init__(dataset_name)

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        ds = GraphLinkPredictionDataset(self.dataset_name, dataset_type, config)
        # export graph cardinalities for model construction from config
        registry.register(f"graph.{self.dataset_name}.num_entities",
                          ds.num_entities)
        registry.register(f"graph.{self.dataset_name}.num_relations",
                          ds.num_relations)
        return ds
