"""Knowledge-graph database: triples file → static-shape subgraph samples.

Reference parity: ``/root/reference/antmmf/datasets/database/graph_database.py:88``
(``KgrlDatabase``) — the reference streams subgraph samples from Ant-internal
graph services (kgrl samplers over ODPS seeds; node- and edge-seeded modes,
deterministic for val/test). Those services don't exist outside Ant, so this is
the same capability over local files: a triples file (jsonl
``{"head","relation","tail"}`` or TSV ``h\\tr\\tt``) with

  * entity/relation vocabularies built on load;
  * full-graph arrays padded to static shapes (``edge_index`` [2, E_pad],
    ``edge_type`` [E_pad], ``edge_mask``) — XLA-friendly fixed sizes;
  * indexable link-prediction samples (head, relation → tail target);
  * optional node-seeded k-hop subgraph sampling with static
    ``max_nodes``/``max_edges`` caps + masks (the kgrl sampler analogue),
    seeded-deterministic for val/test.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _parse_line(line: str) -> Optional[Tuple[str, str, str]]:
    line = line.strip()
    if not line:
        return None
    if line.startswith("{"):
        row = json.loads(line)
        return str(row["head"]), str(row["relation"]), str(row["tail"])
    parts = line.split("\t")
    if len(parts) == 1:
        parts = line.split()
    if len(parts) < 3:
        return None
    return parts[0], parts[1], parts[2]


class GraphDatabase:
    def __init__(
        self,
        triples_path: str,
        entity_vocab: Optional[Dict[str, int]] = None,
        relation_vocab: Optional[Dict[str, int]] = None,
        max_edges: Optional[int] = None,
    ):
        if not os.path.exists(triples_path):
            raise FileNotFoundError(f"Triples file not found: {triples_path!r}")
        self.entity_vocab: Dict[str, int] = dict(entity_vocab or {})
        self.relation_vocab: Dict[str, int] = dict(relation_vocab or {})
        triples: List[Tuple[int, int, int]] = []
        with open(triples_path) as f:
            for line in f:
                parsed = _parse_line(line)
                if parsed is None:
                    continue
                h, r, t = parsed
                triples.append((self._ent(h), self._rel(r), self._ent(t)))
        if not triples:
            raise ValueError(f"No triples parsed from {triples_path!r}")
        self.triples = np.asarray(triples, np.int64)  # [E, 3]
        E = len(self.triples)
        self.num_entities = len(self.entity_vocab)
        self.num_relations = len(self.relation_vocab)
        # static padded graph arrays (pad to a power-of-two bucket unless fixed)
        E_pad = max_edges or _next_bucket(E)
        if E_pad < E:
            raise ValueError(f"max_edges={E_pad} < graph edges {E}")
        self.edge_index = np.zeros((2, E_pad), np.int64)
        self.edge_type = np.zeros((E_pad,), np.int64)
        self.edge_mask = np.zeros((E_pad,), bool)
        self.edge_index[0, :E] = self.triples[:, 0]
        self.edge_index[1, :E] = self.triples[:, 2]
        self.edge_type[:E] = self.triples[:, 1]
        self.edge_mask[:E] = True
        # adjacency for k-hop expansion
        self._nbrs: Dict[int, List[int]] = {}
        for ei, (h, r, t) in enumerate(self.triples):
            self._nbrs.setdefault(int(h), []).append(ei)
            self._nbrs.setdefault(int(t), []).append(ei)

    def _ent(self, name: str) -> int:
        if name not in self.entity_vocab:
            self.entity_vocab[name] = len(self.entity_vocab)
        return self.entity_vocab[name]

    def _rel(self, name: str) -> int:
        if name not in self.relation_vocab:
            self.relation_vocab[name] = len(self.relation_vocab)
        return self.relation_vocab[name]

    # ------------------------------------------------------- link prediction
    def __len__(self) -> int:
        return len(self.triples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """One (head, relation → tail) sample plus the shared padded graph."""
        h, r, t = self.triples[idx]
        return {
            "head": np.int64(h),
            "relation": np.int64(r),
            "targets": np.int64(t),
            "edge_index": self.edge_index,
            "edge_type": self.edge_type,
            "edge_mask": self.edge_mask,
        }

    # ------------------------------------------------------ subgraph sampling
    def sample_subgraph(
        self,
        seed_entity: int,
        hops: int = 2,
        max_nodes: int = 64,
        max_edges: int = 128,
        rng: Optional[np.random.Generator] = None,
    ) -> Dict[str, np.ndarray]:
        """Node-seeded k-hop subgraph with static caps + masks (the kgrl
        node-sampler analogue). Deterministic when ``rng`` is None."""
        rng = rng or np.random.default_rng(0)
        nodes = [int(seed_entity)]
        node_set = {int(seed_entity)}
        edges: List[int] = []
        edge_set: set = set()
        frontier = [int(seed_entity)]
        for _ in range(hops):
            nxt: List[int] = []
            for n in frontier:
                cand = self._nbrs.get(n, [])
                if len(cand) > 8:
                    cand = list(rng.choice(cand, 8, replace=False))
                for ei in cand:
                    if ei in edge_set or len(edges) >= max_edges:
                        continue
                    h, r, t = self.triples[ei]
                    other = int(t) if int(h) == n else int(h)
                    if other not in node_set:
                        if len(nodes) >= max_nodes:
                            continue
                        node_set.add(other)
                        nodes.append(other)
                        nxt.append(other)
                    edge_set.add(ei)
                    edges.append(ei)
            frontier = nxt
        # remap to local node ids, pad to static shapes
        local = {g: i for i, g in enumerate(nodes)}
        ei = np.zeros((2, max_edges), np.int64)
        et = np.zeros((max_edges,), np.int64)
        em = np.zeros((max_edges,), bool)
        for k, edge in enumerate(edges):
            h, r, t = self.triples[edge]
            ei[0, k], ei[1, k] = local[int(h)], local[int(t)]
            et[k] = r
            em[k] = True
        node_ids = np.zeros((max_nodes,), np.int64)
        node_mask = np.zeros((max_nodes,), bool)
        node_ids[: len(nodes)] = nodes
        node_mask[: len(nodes)] = True
        return {
            "node_ids": node_ids, "node_mask": node_mask,
            "edge_index": ei, "edge_type": et, "edge_mask": em,
            "seed": np.int64(seed_entity),
        }


    def iter_subgraphs(
        self,
        seeds,
        hops: int = 2,
        max_nodes: int = 64,
        max_edges: int = 128,
        deterministic: bool = True,
        seed: int = 0,
    ):
        """Seeded streaming mode (the reference KgrlDatabase seeds path,
        graph_database.py:52-83): ``seeds`` is any iterable of rows naming a
        seed entity (``{"seed": name}``) or edge (``{"src", "dst"}``) — e.g. a
        ``datasets.readers.TextReader`` over an exported seed table. Yields
        static-shape subgraph samples per seed."""
        rng = None if deterministic else np.random.default_rng(seed)
        for row in seeds:
            names = []
            if "seed" in row:
                names = [str(row["seed"])]
            elif "src" in row:
                names = [str(row["src"])]
                if "dst" in row:
                    names.append(str(row["dst"]))
            for name in names:
                ent = self.entity_vocab.get(name)
                if ent is None:
                    continue
                sample = self.sample_subgraph(
                    ent, hops=hops, max_nodes=max_nodes, max_edges=max_edges,
                    rng=rng)
                sample["seed_name"] = name
                yield sample


def _next_bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b
