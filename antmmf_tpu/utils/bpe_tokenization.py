"""Byte-level BPE tokenizer (CLIP / GPT-2 / RoBERTa class) from local files.

Reference parity: the CLIP and RoBERTa tokenizer processors of
``/root/reference/antmmf/datasets/processors/text_processors.py`` (HF-backed)
and the CLIP BPE of ``modules/vision/backbone/clip/``. Zero-egress: loads a
local ``vocab.json`` (token → id) + ``merges.txt`` (one merge pair per line);
standard byte-level pre-tokenization with the GPT-2 unicode byte mapping.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte↔unicode table: printable chars map to themselves; the rest get
    shifted into the private-use range."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.IGNORECASE)


class BPETokenizer:
    def __init__(self, vocab_file: str, merges_file: str,
                 unk_token: str = "<|endoftext|>",
                 end_of_word_suffix: str = ""):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        merges: List[Tuple[str, str]] = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.unk_token = unk_token
        self.suffix = end_of_word_suffix  # CLIP uses "</w>"
        self.cache: Dict[str, List[str]] = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = list(token)
        if self.suffix and word:
            word[-1] = word[-1] + self.suffix
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self.cache[token] = word
        return word

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for chunk in _PRETOKEN.findall(text):
            mapped = "".join(self.byte_encoder[b]
                             for b in chunk.encode("utf-8"))
            out.extend(self._bpe(mapped))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        unk = self.encoder.get(self.unk_token, 0)
        return [self.encoder.get(t, unk) for t in tokens]

    def encode(self, text: str) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        if self.suffix:
            text = text.replace(self.suffix, " ")
        raw = bytearray(self.byte_decoder.get(ch, 32) for ch in text)
        return raw.decode("utf-8", errors="replace").strip()

    def __len__(self) -> int:
        return len(self.encoder)
