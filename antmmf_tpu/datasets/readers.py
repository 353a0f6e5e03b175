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


def text_classification_online_process(text, max_len: int, tokenizer) -> Dict[str, Any]:
    """Serving-time tokenize+pad for text classification (reference
    ``antmmf/datasets/utils.py:12-56``): [CLS] a [SEP] (b [SEP]), padded or
    truncated to ``max_len``; returns the reference's key set (``ids`` kept
    for backward compatibility alongside ``text``)."""
    def _encode(s: str):
        return tokenizer.convert_tokens_to_ids(tokenizer.tokenize(s))

    input_ids = [tokenizer.cls_token_id] + _encode(text[0]) \
        + [tokenizer.sep_token_id]
    if len(text) == 2:
        input_ids += _encode(text[1]) + [tokenizer.sep_token_id]
    token_type_ids = [0] * len(input_ids)
    mask = [1] * len(input_ids)
    pad = max_len - len(input_ids)
    if pad > 0:
        input_ids += [tokenizer.pad_token_id] * pad
        mask += [0] * pad
        token_type_ids += [0] * pad
    else:
        input_ids = input_ids[:max_len]
        mask = mask[:max_len]
        token_type_ids = token_type_ids[:max_len]
    return {"ids": input_ids, "text": input_ids, "mask": mask,
            "token_type_ids": token_type_ids, "orig_text": text}


def block_read(files, size: int = 65536):
    """Yield fixed-size blocks from an open file (reference
    ``datasets/utils.py:58-63``) — the line-count helper for TextReader."""
    while True:
        block = files.read(size)
        if not block:
            break
        yield block
