"""sentencepiece-lite: pure-Python SentencePiece-BPE + the GLM tokenizer.

The M2-Encoder bilingual text side tokenizes with ``GLMChineseTokenizer``
(reference ``prj/M2_Encoder/vlmo/tokenizer/tokenization_glm.py:219-253``) —
a SentencePiece **BPE** model (``sp.model`` ships with the reference;
model_type=2, 115 244 pieces) plus GLM's whitespace-run encoding
(``encode_whitespaces``/``decode_whitespaces``, :208-216: runs of 2-10
spaces become ``<|blank_n|>`` tokens). The ``sentencepiece`` package is not
in this image, so this module implements the pieces directly:

* a minimal protobuf walk of ``ModelProto`` (field 1 = repeated
  SentencePiece{piece=1, score=2, type=3}) — scores in a BPE model are
  negative merge ranks;
* SentencePiece-BPE encoding: NFKC normalization, ``▁`` whitespace
  escaping with a dummy prefix, then greedy highest-score adjacent-pair
  merging (the sentencepiece BPE decode order);
* ``GLMChineseTokenizer``: the reference surface (tokenize / convert ids /
  decode / [CLS]+[gMASK] special ids / whitespace runs).
"""

from __future__ import annotations

import struct
import unicodedata
from typing import Dict, List, Optional, Tuple

WORD_BOUNDARY = "▁"  # ▁

# piece types (sentencepiece_model.proto)
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, BYTE, UNUSED = 1, 2, 3, 4, 6, 5


def _read_varint(b: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return out, i
        shift += 7


def parse_model_proto(data: bytes) -> List[Tuple[str, float, int]]:
    """ModelProto → [(piece, score, type)]."""
    pieces: List[Tuple[str, float, int]] = []
    i = 0
    while i < len(data):
        tag, i = _read_varint(data, i)
        field, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _read_varint(data, i)
            payload = data[i: i + ln]
            i += ln
            if field != 1:
                continue
            j = 0
            piece, score, ptype = None, 0.0, NORMAL
            while j < len(payload):
                t2, j = _read_varint(payload, j)
                f2, w2 = t2 >> 3, t2 & 7
                if w2 == 2:
                    l2, j = _read_varint(payload, j)
                    if f2 == 1:
                        piece = payload[j: j + l2].decode("utf-8", "replace")
                    j += l2
                elif w2 == 5:
                    if f2 == 2:
                        score = struct.unpack("<f", payload[j: j + 4])[0]
                    j += 4
                elif w2 == 0:
                    v, j = _read_varint(payload, j)
                    if f2 == 3:
                        ptype = v
                elif w2 == 1:
                    j += 8
                else:
                    break
            if piece is not None:
                pieces.append((piece, score, ptype))
        elif wt == 0:
            _, i = _read_varint(data, i)
        elif wt == 5:
            i += 4
        elif wt == 1:
            i += 8
        else:
            break
    return pieces


class SentencePieceBPE:
    """SentencePiece BPE segmentation over a parsed model."""

    def __init__(self, model_path: str, add_dummy_prefix: bool = True):
        with open(model_path, "rb") as f:
            self.pieces = parse_model_proto(f.read())
        self.piece_to_id: Dict[str, int] = {
            p: i for i, (p, _, _) in enumerate(self.pieces)}
        self.scores = {p: s for p, s, _ in self.pieces}
        self.unk_id = next((i for i, (_, _, t) in enumerate(self.pieces)
                            if t == UNKNOWN), 0)
        # user-defined symbols (e.g. <|blank_2|>, [gMASK]) match greedily
        # before BPE segmentation
        self.user_defined = sorted(
            (p for p, _, t in self.pieces if t in (USER_DEFINED, CONTROL)),
            key=len, reverse=True)
        self.add_dummy_prefix = add_dummy_prefix

    def __len__(self) -> int:
        return len(self.pieces)

    def _split_user_defined(self, text: str) -> List[Tuple[str, bool]]:
        """[(segment, is_symbol)] with user-defined/control symbols split out."""
        out: List[Tuple[str, bool]] = []
        i = 0
        buf = []
        while i < len(text):
            hit = None
            for sym in self.user_defined:
                if text.startswith(sym, i):
                    hit = sym
                    break
            if hit:
                if buf:
                    out.append(("".join(buf), False))
                    buf = []
                out.append((hit, True))
                i += len(hit)
            else:
                buf.append(text[i])
                i += 1
        if buf:
            out.append(("".join(buf), False))
        return out

    def _bpe(self, chars: List[str]) -> List[str]:
        """Greedy highest-score adjacent merge (sentencepiece bpe encoder)."""
        symbols = list(chars)
        while len(symbols) > 1:
            best, best_score = -1, None
            for k in range(len(symbols) - 1):
                cand = symbols[k] + symbols[k + 1]
                s = self.scores.get(cand)
                if s is not None and (best_score is None or s > best_score):
                    best, best_score = k, s
            if best < 0:
                break
            symbols[best: best + 2] = [symbols[best] + symbols[best + 1]]
        return symbols

    def encode_as_pieces(self, text: str) -> List[str]:
        text = unicodedata.normalize("NFKC", text)
        if self.add_dummy_prefix:
            text = " " + text
        text = text.replace(" ", WORD_BOUNDARY)
        out: List[str] = []
        for seg, is_symbol in self._split_user_defined(text):
            if is_symbol:
                out.append(seg)
                continue
            for sym in self._bpe(list(seg)):
                if sym in self.piece_to_id:
                    out.append(sym)
                else:  # unknown chars (no byte fallback in this model)
                    out.extend(c if c in self.piece_to_id else "<unk>"
                               for c in sym)
        return out

    def encode(self, text: str) -> List[int]:
        return [self.piece_to_id.get(p, self.unk_id)
                for p in self.encode_as_pieces(text)]

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.pieces[int(i)][0] for i in ids
                       if 0 <= int(i) < len(self.pieces))
        return text.replace(WORD_BOUNDARY, " ").lstrip(" ")


def encode_whitespaces(content: str) -> str:
    """GLM whitespace-run escaping (tokenization_glm.py:208-211)."""
    for i in range(10, 1, -1):
        content = content.replace(" " * i, f"<|blank_{i}|>")
    return content


def decode_whitespaces(content: str) -> str:
    for i in range(10, 1, -1):
        content = content.replace(f"<|blank_{i}|>", " " * i)
    return content


class GLMChineseTokenizer:
    """The reference GLM tokenizer surface (tokenization_glm.py:219-253)
    over the pure-Python BPE engine."""

    def __init__(self, model_path: str):
        self.sp = SentencePieceBPE(model_path)

    def __len__(self) -> int:
        return len(self.sp)

    @property
    def cls_token_id(self) -> int:
        return self.sp.piece_to_id.get("[CLS]", 0)

    @property
    def sep_token_id(self) -> int:
        return self.sp.piece_to_id.get("[SEP]", 0)

    @property
    def pad_token_id(self) -> int:
        return self.sp.piece_to_id.get("<|endoftext|>", 0)

    @property
    def gmask_token_id(self) -> int:
        return self.sp.piece_to_id.get("[gMASK]", 0)

    @property
    def sop_token_id(self) -> int:
        return self.sp.piece_to_id.get("<|startofpiece|>", 0)

    def tokenize(self, text: str) -> List[str]:
        return self.sp.encode_as_pieces(encode_whitespaces(text))

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        return [self.sp.piece_to_id.get(t, self.sp.unk_id) for t in tokens]

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if add_special_tokens:  # GLM: [CLS] text [SEP] (build_inputs path)
            return [self.cls_token_id] + ids + [self.sep_token_id]
        return ids

    def decode(self, ids: List[int]) -> str:
        return decode_whitespaces(self.sp.decode(list(ids)))
