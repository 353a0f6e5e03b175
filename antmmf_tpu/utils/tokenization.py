"""Self-contained BERT-style WordPiece tokenizer (no network, no HF download).

The reference wraps HuggingFace tokenizers (``antmmf/datasets/processors/
text_processors.py:101-1199``); in this zero-egress TPU build the tokenizer is a
fresh pure-Python WordPiece implementation loading a local vocab file (the fixtures
ship ``tests/data/vocabs/bert-base-uncased_30522_vocab.txt`` and the Chinese
variant). Behavior follows the standard BERT tokenization algorithm: basic
whitespace+punctuation split with CJK isolation and optional lowercasing/accent
stripping, then greedy longest-match wordpiece with ``##`` continuations.
"""

from __future__ import annotations

import collections
import unicodedata
from typing import Dict, List, Optional

CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"
PAD_TOKEN = "[PAD]"
MASK_TOKEN = "[MASK]"
UNK_TOKEN = "[UNK]"


def load_vocab(path: str) -> Dict[str, int]:
    vocab: "collections.OrderedDict[str, int]" = collections.OrderedDict()
    with open(path, "r", encoding="utf-8") as f:
        for idx, line in enumerate(f):
            token = line.rstrip("\n")
            if token:
                vocab[token] = idx
    return vocab


def _is_whitespace(ch: str) -> bool:
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class BasicTokenizer:
    def __init__(self, do_lower_case: bool = True):
        self.do_lower_case = do_lower_case

    def tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        text = self._pad_cjk(text)
        tokens: List[str] = []
        for tok in text.split():
            if self.do_lower_case:
                tok = self._strip_accents(tok.lower())
            tokens.extend(self._split_punct(tok))
        return [t for t in tokens if t]

    @staticmethod
    def _clean(text: str) -> str:
        out = []
        for ch in text:
            if ord(ch) == 0 or ord(ch) == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    @staticmethod
    def _pad_cjk(text: str) -> str:
        out = []
        for ch in text:
            if _is_cjk(ord(ch)):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        return "".join(out)

    @staticmethod
    def _strip_accents(text: str) -> str:
        return "".join(
            ch for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )

    @staticmethod
    def _split_punct(token: str) -> List[str]:
        out: List[List[str]] = []
        new_word = True
        for ch in token:
            if _is_punctuation(ch):
                out.append([ch])
                new_word = True
            else:
                if new_word:
                    out.append([])
                    new_word = False
                out[-1].append(ch)
        return ["".join(x) for x in out]


class WordpieceTokenizer:
    def __init__(self, vocab: Dict[str, int], unk_token: str = UNK_TOKEN,
                 max_chars_per_word: int = 100):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_chars_per_word = max_chars_per_word

    def tokenize(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_token]
            pieces.append(piece)
            start = end
        return pieces


class BertTokenizer:
    """Full pipeline: basic split → wordpiece → ids. Mirrors the surface actually
    used by the processors: tokenize / convert_tokens_to_ids / special tokens."""

    def __init__(self, vocab_file: str, do_lower_case: bool = True):
        self.vocab = load_vocab(vocab_file)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.basic = BasicTokenizer(do_lower_case)
        self.wordpiece = WordpieceTokenizer(self.vocab)
        # native C++ fast path (antmmf_tpu/native/host_plane.py): identical
        # output by construction (shared unicode tables), per-string Python
        # fallback for context-sensitive codepoints; disable with
        # ANTMMF_NATIVE=0
        self._native = None
        self._id_to_tok: List[str] = []
        try:
            from antmmf_tpu.native.host_plane import NativeWordPiece

            self._native = NativeWordPiece(
                vocab_file, do_lower_case=do_lower_case,
                unk_token=UNK_TOKEN,
                max_chars_per_word=self.wordpiece.max_chars_per_word)
            size = max(self.vocab.values()) + 1
            self._id_to_tok = [UNK_TOKEN] * size
            for tok, idx in self.vocab.items():
                self._id_to_tok[idx] = tok
        except Exception:
            self._native = None

    def __len__(self) -> int:
        return len(self.vocab)

    def tokenize(self, text: str) -> List[str]:
        if self._native is not None:
            ids = self._native.encode(text)
            if ids is not None:
                return [self._id_to_tok[i] for i in ids]
        out: List[str] = []
        for word in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(word))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        unk = self.vocab[UNK_TOKEN]
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.inv_vocab.get(i, UNK_TOKEN) for i in ids]

    @property
    def cls_token_id(self) -> int:
        return self.vocab[CLS_TOKEN]

    @property
    def sep_token_id(self) -> int:
        return self.vocab[SEP_TOKEN]

    @property
    def pad_token_id(self) -> int:
        return self.vocab.get(PAD_TOKEN, 0)

    @property
    def mask_token_id(self) -> int:
        return self.vocab[MASK_TOKEN]

    def decode(self, ids: List[int], skip_special: bool = True) -> str:
        toks = self.convert_ids_to_tokens([int(i) for i in ids])
        if skip_special:
            toks = [t for t in toks if t not in (CLS_TOKEN, SEP_TOKEN, PAD_TOKEN)]
        text = " ".join(toks).replace(" ##", "")
        return text
