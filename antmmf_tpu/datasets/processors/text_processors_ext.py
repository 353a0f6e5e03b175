"""Extended text-processor family — completes the reference registry surface.

Reference parity (``/root/reference/antmmf/datasets/processors/text_processors.py``):
``vocab`` (:101), ``glove`` (:255), ``fasttext`` (:297),
``multi_hot_answer_from_vocab`` (:433), ``soft_copy_answer`` (:445),
``simple_word`` (:540), ``simple_sentence`` (:558), ``caption`` (:577),
``masked_layoutlm_tokenizer`` (:926), ``masked_roberta_tokenizer`` (:1082),
``phoc`` (:1101), ``roberta_tokenizer`` (:1139), ``cn_clip_tokenizer`` (:1199).

Deltas from the reference (zero-egress, torch-free):
  * glove/fasttext vectors load from LOCAL text files (word v1 v2... lines);
    fasttext OOV uses deterministic hashed char-ngram vectors instead of a
    binary fasttext model;
  * outputs are fixed-shape numpy arrays (static-shape discipline).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor
from antmmf_tpu.datasets.processors.text_processors import (
    MaskedTokenProcessor,
    _resolve_vocab_path,
)
from antmmf_tpu.utils.vocab import EOS_INDEX, IntersectedVocab, PAD_INDEX, SOS_INDEX, Vocab


def word_tokenize(word: str, remove: Sequence[str] = (",", "?")) -> str:
    word = str(word).lower()
    for item in remove:
        word = word.replace(item, "")
    return word.replace("'s", " 's").strip()


_SENTENCE_SPLIT = re.compile(r"(\W+)")


def tokenize(sentence: str, keep: Sequence[str] = ("'s",),
             remove: Sequence[str] = (",", "?")) -> List[str]:
    sentence = str(sentence).lower()
    for token in keep:
        sentence = sentence.replace(token, " " + token)
    for token in remove:
        sentence = sentence.replace(token, "")
    return [t for t in _SENTENCE_SPLIT.split(sentence) if t.strip()]


@registry.register_processor("vocab")
class VocabProcessor(BaseProcessor):
    """text → padded vocab indices (pad ``<pad>``=0, unk ``<unk>``)."""

    MAX_LENGTH_DEFAULT = 50

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        vocab_cfg = dict(cfg.get("vocab", {}))
        self.vocab = self._build_vocab(vocab_cfg)
        self.max_length = int(cfg.get("max_length", self.MAX_LENGTH_DEFAULT))
        self.prepend_bos_append_eos = bool(
            cfg.get("prepend_bos_append_eos", False))

    def _build_vocab(self, vocab_cfg: Mapping[str, Any]):
        return Vocab(vocab_file=_resolve_vocab_path(vocab_cfg["vocab_file"]))

    def _tokens(self, item: Mapping[str, Any]) -> List[str]:
        if "tokens" in item:
            return list(item["tokens"])
        return tokenize(item.get("text", ""))

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        tokens = self._tokens(item)
        indices = self.vocab.to_indices(tokens)
        if self.prepend_bos_append_eos:
            indices = [SOS_INDEX] + indices[: self.max_length - 2] + [EOS_INDEX]
        indices = indices[: self.max_length]
        out = np.full((self.max_length,), PAD_INDEX, np.int64)
        out[: len(indices)] = indices
        return {"text": out, "tokens": tokens[: self.max_length],
                "length": np.int64(len(indices))}

    def get_vocab_size(self) -> int:
        return len(self.vocab)


@registry.register_processor("glove")
class GloVeProcessor(VocabProcessor):
    """vocab indices + pretrained word vectors from a local glove-format file."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config, *a, **k)

    def _build_vocab(self, vocab_cfg: Mapping[str, Any]):
        return IntersectedVocab(
            vocab_file=_resolve_vocab_path(vocab_cfg["vocab_file"]),
            vectors_file=vocab_cfg.get("vectors_file", ""),
            dim=vocab_cfg.get("dim"),
        )

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        out = super().__call__(item)
        out["text"] = self.vocab.vectors[out["text"]].astype(np.float32)
        return out


def _hashed_ngram_vector(word: str, dim: int, n: int = 3) -> np.ndarray:
    """Deterministic OOV vector from char-ngram hashes (fasttext-style)."""
    padded = f"<{word}>"
    grams = [padded[i:i + n] for i in range(max(1, len(padded) - n + 1))]
    vec = np.zeros(dim, np.float32)
    for g in grams:
        rng = np.random.default_rng(abs(hash(g)) % (2 ** 32))
        vec += rng.normal(0, 1.0 / np.sqrt(dim), dim).astype(np.float32)
    return vec / max(len(grams), 1)


@registry.register_processor("fasttext")
class FastTextProcessor(VocabProcessor):
    """Per-token word vectors; OOV via hashed char-ngram composition."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        cfg = dict(config or {})
        self.dim = int(cfg.get("dim", 300))
        self._table: Dict[str, np.ndarray] = {}
        vectors_file = cfg.get("vectors_file", cfg.get("model_file", ""))
        if vectors_file and os.path.exists(vectors_file):
            with open(vectors_file, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip().split(" ")
                    if len(parts) > 2:
                        self._table[parts[0]] = np.asarray(parts[1:], np.float32)
            if self._table:
                self.dim = len(next(iter(self._table.values())))
        self.max_length = int(cfg.get("max_length", self.MAX_LENGTH_DEFAULT))
        self.config = cfg

    def _vector(self, word: str) -> np.ndarray:
        if word in self._table:
            return self._table[word]
        return _hashed_ngram_vector(word, self.dim)

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        tokens = tokenize(item.get("text", "")) if "tokens" not in item \
            else list(item["tokens"])
        tokens = tokens[: self.max_length]
        out = np.zeros((self.max_length, self.dim), np.float32)
        for i, t in enumerate(tokens):
            out[i] = self._vector(t)
        return {"text": out, "tokens": tokens,
                "length": np.int64(len(tokens))}


@registry.register_processor("simple_word")
class SimpleWordProcessor(BaseProcessor):
    def __init__(self, *a, **k):
        self.tokenizer = word_tokenize

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        return {"text": self.tokenizer(item["text"], *a, **k)}


@registry.register_processor("simple_sentence")
class SimpleSentenceProcessor(BaseProcessor):
    def __init__(self, *a, **k):
        self.tokenizer = tokenize

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        return {"text": self.tokenizer(item["text"], *a, **k)}


@registry.register_processor("caption")
class CaptionProcessor(BaseProcessor):
    """Decoded caption ids → raw string (strips SOS/EOS/PAD, stops at EOS)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        vocab_cfg = dict(self.config.get("vocab", {}))
        self.vocab = Vocab(vocab_file=_resolve_vocab_path(vocab_cfg["vocab_file"]))

    def __call__(self, item: Sequence[int], *a, **k) -> Dict[str, Any]:
        ids = [int(i) for i in np.asarray(item).reshape(-1)]
        if EOS_INDEX in ids:
            ids = ids[: ids.index(EOS_INDEX) + 1]
        tokens = [self.vocab.itos[i] for i in ids
                  if i not in (SOS_INDEX, EOS_INDEX, PAD_INDEX)
                  and 0 <= i < len(self.vocab.itos)]
        return {"tokens": tokens, "caption": " ".join(tokens)}


@registry.register_processor("phoc")
class PhocProcessor(BaseProcessor):
    """Per-token 604-dim PHOC vectors (reference :1101-1127; native C kernel)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        self.max_length = int(self.config.get("max_length", 50))

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        from antmmf_tpu.utils.phoc.build_phoc import PHOC_DIM, build_phoc

        tokens = tokenize(item.get("text", "")) if "tokens" not in item \
            else list(item["tokens"])
        tokens = tokens[: self.max_length]
        out = np.zeros((self.max_length, PHOC_DIM), np.float32)
        for i, t in enumerate(tokens):
            word = re.sub(r"[^a-z0-9]", "", t.lower())
            if word:
                out[i] = build_phoc(word)
        return {"text": out, "tokens": tokens,
                "length": np.int64(len(tokens))}


@registry.register_processor("masked_roberta_tokenizer")
class MaskedRobertaTokenizer(BaseProcessor):
    """RoBERTa-convention masking over byte-level BPE: <s> a </s> (</s> b </s>),
    no token types, <mask> token, -1 ignore labels (reference :1082-1100)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        from antmmf_tpu.utils.bpe_tokenization import BPETokenizer

        self.tokenizer = BPETokenizer(cfg["vocab_json"], cfg["merges_file"])
        self.max_seq_length = int(cfg.get("max_seq_length", 128))
        self.mask_probability = float(cfg.get("mask_probability", 0.15))
        enc = self.tokenizer.encoder
        self.bos = enc.get("<s>", 0)
        self.eos = enc.get("</s>", 2)
        self.pad = enc.get("<pad>", 1)
        self.mask = enc.get("<mask>", len(enc) - 1)
        self.rng = np.random.default_rng(cfg.get("seed"))

    def __call__(self, item: Mapping[str, Any],
                 probability: Optional[float] = None) -> Dict[str, Any]:
        prob = self.mask_probability if probability is None else float(probability)
        L = self.max_seq_length
        ids = self.tokenizer.encode(str(item.get("text", "")))[: L - 2]
        ids = [self.bos] + ids + [self.eos]
        n = len(ids)
        input_ids = np.full((L,), self.pad, np.int64)
        input_ids[:n] = ids
        input_mask = np.zeros((L,), np.int64)
        input_mask[:n] = 1
        lm_labels = np.full((L,), -1, np.int64)
        if prob > 0:
            for i in range(1, n - 1):  # never mask <s>/</s>
                if self.rng.random() < prob:
                    lm_labels[i] = input_ids[i]
                    r = self.rng.random()
                    if r < 0.8:
                        input_ids[i] = self.mask
                    elif r < 0.9:
                        input_ids[i] = int(self.rng.integers(0, len(self.tokenizer)))
        return {
            "input_ids": input_ids, "input_mask": input_mask,
            "segment_ids": np.zeros((L,), np.int64),
            "lm_label_ids": lm_labels, "source_len": int(n),
        }


@registry.register_processor("roberta_tokenizer")
class RobertaTokenizer(MaskedRobertaTokenizer):
    """Unmasked RoBERTa ids (reference :1139-1145)."""

    def __call__(self, item, probability=None):
        return super().__call__(item, probability=0.0)


@registry.register_processor("masked_layoutlm_tokenizer")
class MaskedLayoutlmTokenizer(MaskedTokenProcessor):
    """masked_token + per-token layout boxes: word boxes replicate across
    wordpieces; [CLS]=[0,0,0,0], [SEP]=[1000,1000,1000,1000], pad=0
    (reference :926-1046)."""

    CLS_BOX = (0, 0, 0, 0)
    SEP_BOX = (1000, 1000, 1000, 1000)

    def __call__(self, item: Mapping[str, Any],
                 probability: Optional[float] = None) -> Dict[str, Any]:
        words = list(item.get("words", str(item.get("text", "")).split()))
        boxes = [tuple(b) for b in item.get("boxes", [(0, 0, 0, 0)] * len(words))]
        tokens: List[str] = []
        token_boxes: List[tuple] = []
        for w, b in zip(words, boxes):
            pieces = self.tokenizer.tokenize(w)
            tokens.extend(pieces)
            token_boxes.extend([b] * len(pieces))
        out = super().__call__({"text": " ".join(words)}, probability)
        L = self.max_seq_length
        bbox = np.zeros((L, 4), np.int64)
        bbox[0] = self.CLS_BOX
        n_tok = min(len(token_boxes), L - 2)
        for i in range(n_tok):
            bbox[1 + i] = token_boxes[i]
        bbox[1 + n_tok] = self.SEP_BOX
        out["bbox"] = bbox
        return out


@registry.register_processor("cn_clip_tokenizer")
class CNCLIPTokenizerProcessor(BaseProcessor):
    """Chinese CLIP text ids: [CLS] chars [SEP] padded to context_length=52
    (reference :1199-1235; Chinese-BERT WordPiece)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        from antmmf_tpu.utils.tokenization import BertTokenizer

        vocab = _resolve_vocab_path(cfg.get(
            "vocab_file", "tests/data/vocabs/bert-base-chinese_21128_vocab.txt"))
        self.tokenizer = BertTokenizer(vocab, do_lower_case=True)
        self.context_length = int(cfg.get("context_length", 52))

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        text = item.get("text", "")
        vocab = self.tokenizer.vocab
        ids = ([vocab["[CLS]"]]
               + self.tokenizer.convert_tokens_to_ids(
                   self.tokenizer.tokenize(text))[: self.context_length - 2]
               + [vocab["[SEP]"]])
        out = np.zeros((self.context_length,), np.int64)
        out[: len(ids)] = ids
        mask = np.zeros((self.context_length,), np.int64)
        mask[: len(ids)] = 1
        return {"input_ids": out, "input_mask": mask, "text": text}


@registry.register_processor("multi_hot_answer_from_vocab")
class MultiHotAnswerFromVocabProcessor(BaseProcessor):
    """Multi-hot (0/1) answer targets instead of VQA soft scores
    (reference :433-444)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        from antmmf_tpu.datasets.processors.mm_processors import VQAAnswerProcessor

        self.inner = VQAAnswerProcessor(config)

    def __len__(self):
        return len(self.inner)

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        out = self.inner(item)
        out["answers_scores"] = (out["answers_scores"] > 0).astype(np.float32)
        out["targets"] = out["answers_scores"]
        return out


@registry.register_processor("soft_copy_answer")
class SoftCopyAnswerProcessor(BaseProcessor):
    """VQA answers + dynamic OCR-copy answer space (reference :445-539,
    LoRRA https://arxiv.org/abs/1904.08920): vocab scores are extended by
    ``max_length`` slots scoring matches against per-sample OCR tokens."""

    DEFAULT_MAX_LENGTH = 50

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        from antmmf_tpu.datasets.processors.mm_processors import (
            VQAAnswerProcessor,
            normalize_answer,
        )

        cfg = dict(config or {})
        self.inner = VQAAnswerProcessor(cfg)
        self.max_length = int(cfg.get("max_length", self.DEFAULT_MAX_LENGTH))
        self._norm = normalize_answer

    def get_vocab_size(self) -> int:
        return len(self.inner) + self.max_length

    def get_true_vocab_size(self) -> int:
        return len(self.inner)

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        out = self.inner(item)
        V = len(self.inner)
        scores = np.zeros((V + self.max_length,), np.float32)
        scores[:V] = out["answers_scores"]
        context = [self._norm(t) for t in
                   list(item.get("tokens", []))[: self.max_length]]
        answers = [self._norm(a) for a in item.get(
            "answers", [item.get("answer", "")])]
        for i, tok in enumerate(context):
            if tok and tok in answers:
                match = sum(a == tok for a in answers)
                scores[V + i] = min(1.0, match / 3.0)
        out["answers_scores"] = scores
        out["targets"] = scores
        return out


@registry.register_processor("glm_chinese")
class GLMChineseProcessor(BaseProcessor):
    """GLM Chinese tokenization for M2-Encoder bilingual text (reference
    vlmo/tokenizer/tokenization_glm.py GLMChineseTokenizer — SentencePiece
    BPE + whitespace-run escaping — via the pure-Python engine in
    utils/sentencepiece_lite.py; the sp.model file ships with checkpoints).

    {'text': str} → {'input_ids', 'input_mask'} int64[max_seq_length]."""

    def __init__(self, config=None, *a, **k):
        super().__init__(config)
        cfg = self.config
        from antmmf_tpu.utils.sentencepiece_lite import GLMChineseTokenizer

        model_path = cfg.get("sp_model", cfg.get("model_file"))
        if not model_path:
            raise ValueError(
                "glm_chinese processor needs sp_model: path to sp.model")
        self.tokenizer = GLMChineseTokenizer(model_path)
        self.max_seq_length = int(cfg.get("max_seq_length", 52))

    def __call__(self, item, *a, **k):
        ids = self.tokenizer.encode(str(item.get("text", "")))
        L = self.max_seq_length
        out_ids = np.full((L,), self.tokenizer.pad_token_id, np.int64)
        mask = np.zeros((L,), np.int64)
        n = min(len(ids), L)
        out_ids[:n] = ids[:n]
        mask[:n] = 1
        return {"input_ids": out_ids, "input_mask": mask,
                "tokens": [str(t) for t in
                           self.tokenizer.tokenize(str(item.get("text", "")))]}
