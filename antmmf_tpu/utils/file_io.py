"""File IO helpers (reference ``antmmf/utils/file_io.py``): local + optional
fsspec-style remote paths, atomic writes."""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Iterator, List


class PathManager:
    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path)

    @staticmethod
    def mkdirs(path: str) -> None:
        os.makedirs(path, exist_ok=True)

    @staticmethod
    def open(path: str, mode: str = "r", **kw):
        if "w" in mode or "a" in mode:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        return open(path, mode, **kw)

    @staticmethod
    def ls(path: str) -> List[str]:
        return sorted(os.listdir(path))

    @staticmethod
    def rm(path: str) -> None:
        if os.path.isfile(path):
            os.remove(path)


def atomic_write_json(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


def read_jsonl(path: str) -> Iterator[dict]:
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                yield json.loads(line)
