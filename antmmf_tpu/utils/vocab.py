"""Vocabulary containers for word-level models.

Reference parity: ``/root/reference/antmmf/utils/vocab.py`` (481 LoC) — base
vocab with pad/unk/sos/eos specials, file loading, optional pretrained vector
intersection (glove-style text files).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

PAD_TOKEN, PAD_INDEX = "<pad>", 0
SOS_TOKEN, SOS_INDEX = "<s>", 1
EOS_TOKEN, EOS_INDEX = "</s>", 2
UNK_TOKEN, UNK_INDEX = "<unk>", 3
DEFAULT_SPECIALS = (PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, UNK_TOKEN)


class Vocab:
    def __init__(
        self,
        words: Optional[Sequence[str]] = None,
        vocab_file: Optional[str] = None,
        specials: Sequence[str] = DEFAULT_SPECIALS,
    ):
        if vocab_file is not None:
            with open(vocab_file, encoding="utf-8") as f:
                words = [w.strip() for w in f if w.strip()]
        words = list(words or [])
        self.itos: List[str] = list(specials) + [
            w for w in words if w not in specials]
        self.stoi: Dict[str, int] = {w: i for i, w in enumerate(self.itos)}

    def __len__(self) -> int:
        return len(self.itos)

    def get_size(self) -> int:
        return len(self)

    def get_pad_index(self) -> int:
        return self.stoi.get(PAD_TOKEN, 0)

    def get_unk_index(self) -> int:
        return self.stoi.get(UNK_TOKEN, 0)

    def to_indices(self, tokens: Sequence[str]) -> List[int]:
        unk = self.get_unk_index()
        return [self.stoi.get(t, unk) for t in tokens]

    def to_tokens(self, indices: Sequence[int]) -> List[str]:
        return [self.itos[i] if 0 <= i < len(self.itos) else UNK_TOKEN
                for i in indices]


class IntersectedVocab(Vocab):
    """Vocab whose words carry pretrained vectors loaded from a glove-style
    text file (word v1 v2 ... per line); missing words get random vectors."""

    def __init__(self, vocab_file: str, vectors_file: str,
                 dim: Optional[int] = None, seed: int = 0):
        super().__init__(vocab_file=vocab_file)
        table: Dict[str, np.ndarray] = {}
        if os.path.exists(vectors_file):
            with open(vectors_file, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip().split(" ")
                    if len(parts) < 2:
                        continue
                    table[parts[0]] = np.asarray(parts[1:], np.float32)
        if table and dim is None:
            dim = len(next(iter(table.values())))
        dim = dim or 300
        rng = np.random.default_rng(seed)
        self.vectors = np.stack([
            table.get(w, rng.normal(0, 0.1, dim).astype(np.float32))
            for w in self.itos])
        self.vectors[self.get_pad_index()] = 0.0
