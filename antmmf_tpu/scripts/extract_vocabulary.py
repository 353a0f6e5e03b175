"""Vocabulary extraction from annotation files.

Reference parity: ``/root/reference/antmmf/scripts/extract_vocabulary.py`` —
tokenize every text field across input files, keep words above ``min_freq``,
write a sorted vocab file the ``Vocab``/``vocab`` processor loads. Supports
jsonl (one record per line) and json ({"questions": [...]} or a list), with a
configurable text key.

Usage::

    python -m antmmf_tpu.scripts.extract_vocabulary \
        --input_files anns/train.jsonl --text_key caption \
        --out_dir vocabs/ --min_freq 2
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter
from typing import Iterable, List


def iter_texts(input_files: Iterable[str], text_key: str = "text") -> List[str]:
    texts: List[str] = []
    for path in input_files:
        with open(path, encoding="utf-8") as f:
            head = f.read(1)
            f.seek(0)
            if path.endswith(".jsonl") or head == "{" and "\n{" in f.read(4096):
                f.seek(0)
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    row = json.loads(line)
                    val = row.get(text_key) or row.get("caption") or \
                        row.get("question") or row.get("text") or ""
                    texts.append(str(val))
            else:
                f.seek(0)
                data = json.load(f)
                if isinstance(data, dict):
                    data = data.get("questions", data.get("annotations", []))
                for row in data:
                    if isinstance(row, str):
                        texts.append(row)
                    else:
                        texts.append(str(row.get(text_key, row.get(
                            "caption", row.get("question", "")))))
    return texts


def extract_vocabulary(input_files, out_dir=".", min_freq=0,
                       vocab_file_name="vocabulary.txt",
                       text_key="text") -> str:
    from antmmf_tpu.datasets.processors.text_processors_ext import tokenize

    os.makedirs(out_dir, exist_ok=True)
    counter: Counter = Counter()
    lengths: List[int] = []
    for text in iter_texts(input_files, text_key):
        words = tokenize(text)
        lengths.append(len(words))
        counter.update(words)
    vocabulary = sorted(w for w, c in counter.items() if c >= min_freq)
    path = os.path.join(out_dir, vocab_file_name)
    with open(path, "w", encoding="utf-8") as f:
        f.writelines(w + "\n" for w in vocabulary)
    if lengths:
        print(f"min text len={min(lengths)} max text len={max(lengths)} "
              f"vocab={len(vocabulary)}")
    return path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_files", nargs="+", required=True)
    parser.add_argument("--out_dir", default="./")
    parser.add_argument("--min_freq", type=int, default=0)
    parser.add_argument("--vocab_file_name", default="vocabulary.txt")
    parser.add_argument("--text_key", default="text")
    args = parser.parse_args(argv)
    extract_vocabulary(args.input_files, args.out_dir, args.min_freq,
                       args.vocab_file_name, args.text_key)


if __name__ == "__main__":
    main()
