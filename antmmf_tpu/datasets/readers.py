"""Seed/record readers: sharded iteration over tabular text files.

Reference parity: ``/root/reference/antmmf/datasets/utils.py`` —
``TextReader:66`` (delimiter-split table rows with worker×process sharding,
the seed source for the graph data path) and ``ODPSReader:133`` (Ant's
internal table service — gated here since ODPS does not exist outside Ant;
TextReader over an exported table is the drop-in substitute, exactly as the
reference docstring describes).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

from antmmf_tpu.parallel import collectives as coll


class TextReader:
    """Iterate records of a delimited text (or jsonl) table, sharded by
    (process_index, num_processes) × (worker_id, num_workers)."""

    def __init__(
        self,
        file_path: str,
        field_names: Optional[Sequence[str]] = None,
        field_delimiter: str = "\t",
        worker_id: int = 0,
        num_workers: int = 1,
    ):
        if not os.path.exists(file_path):
            raise FileNotFoundError(file_path)
        self.file_path = file_path
        self.field_names = list(field_names or [])
        self.field_delimiter = field_delimiter
        self.worker_id = int(worker_id)
        self.num_workers = max(1, int(num_workers))

    def _parse(self, line: str) -> Optional[Dict[str, Any]]:
        line = line.rstrip("\n")
        if not line:
            return None
        if line.startswith("{"):
            return json.loads(line)
        values = line.split(self.field_delimiter)
        names = self.field_names or [f"f{i}" for i in range(len(values))]
        return dict(zip(names, values))

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        world = coll.get_world_size()
        rank = coll.get_rank()
        shards = world * self.num_workers
        my_shard = rank * self.num_workers + self.worker_id
        with open(self.file_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i % shards != my_shard:
                    continue
                record = self._parse(line)
                if record is not None:
                    yield record

    def __len__(self) -> int:
        with open(self.file_path, encoding="utf-8") as f:
            total = sum(1 for line in f if line.strip())
        shards = coll.get_world_size() * self.num_workers
        my_shard = coll.get_rank() * self.num_workers + self.worker_id
        return (total - my_shard + shards - 1) // shards


class ODPSReader:
    """Gated: ODPS is an Ant-internal table service unavailable in OSS/TPU
    deployments. Export the table with ``odpscmd`` and read it with
    ``TextReader`` (the reference's own documented workflow)."""

    def __init__(self, table_name: str, **_: Any):
        raise RuntimeError(
            f"ODPSReader({table_name!r}): ODPS is Ant-internal and not "
            "reachable from this deployment. Export the table to text with "
            "odpscmd and point TextReader at the file instead.")
