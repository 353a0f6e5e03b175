"""Text processors: tokenization + masked-LM target synthesis.

Reference parity (``/root/reference/antmmf/datasets/processors/text_processors.py``):
  * ``masked_token`` / ``masked_bert_tokenizer`` output contract (:840-925, and
    SURVEY.md §8.1): ``input_ids`` int64[L] = [CLS] a [SEP] (b [SEP]) pad 0;
    ``input_mask`` 1 on real tokens; ``segment_ids`` 0/1; ``lm_label_ids`` -1
    except masked positions; plus ``tokens`` and ``source_len`` metadata.
  * 15% masking, 80/10/10 mask/random/keep split; whole-word masking option
    (:846-848); ``probability=0.0`` yields unmasked raw ids (roi/dataset.py:259-262).
  * ``vocab_processor`` for simple vocab lookups.

All outputs are fixed-shape numpy arrays (static-shape discipline for XLA).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

from antmmf_tpu.common.constants import LM_IGNORE_INDEX
from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor
from antmmf_tpu.utils.tokenization import BertTokenizer


def _resolve_vocab_path(path: str) -> str:
    if os.path.exists(path):
        return path
    # common fixture locations; the repo root anchors the default vocab
    # when the caller's cwd is elsewhere (library use)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    for root in (os.getcwd(), os.path.join(os.getcwd(), "tests", "data"),
                 repo_root, os.path.join(repo_root, "tests", "data")):
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"Vocab file not found: {path!r}")


@registry.register_processor("masked_token")
@registry.register_processor("masked_bert_tokenizer")
class MaskedTokenProcessor(BaseProcessor):
    """Tokenize (a, optional b) into BERT input arrays with MLM targets."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kw: Any):
        super().__init__(config)
        cfg = self.config
        vocab_path = _resolve_vocab_path(
            cfg.get("vocab_file", cfg.get("tokenizer_config", {}).get("vocab_file",
                    "tests/data/vocabs/bert-base-uncased_30522_vocab.txt"))
        )
        self.tokenizer = BertTokenizer(
            vocab_path, do_lower_case=bool(cfg.get("do_lower_case", True))
        )
        self.max_seq_length = int(cfg.get("max_seq_length", 128))
        self.mask_probability = float(cfg.get("mask_probability", 0.15))
        self.whole_word_masking = bool(cfg.get("wwm", cfg.get("whole_word_masking", False)))
        self.trim_start_token = bool(cfg.get("trim_start_token", False))
        # SNP-S3 significant-semantic masking (reference text_processors.py
        # :650-693): content terms are masked preferentially. Terms come from a
        # file/list, else a stopword-free heuristic.
        self.significant_masking = bool(cfg.get("significant_masking", False))
        self.significant_boost = float(cfg.get("significant_boost", 2.0))
        terms = cfg.get("significant_terms", [])
        if cfg.get("significant_terms_file"):
            with open(cfg["significant_terms_file"], encoding="utf-8") as f:
                terms = [l.strip() for l in f if l.strip()]
        self.significant_terms = set(terms)
        seed = cfg.get("seed", None)
        self.rng = np.random.default_rng(seed)

    _STOPWORDS = {
        "a", "an", "the", "is", "are", "was", "were", "be", "been", "being",
        "to", "of", "in", "on", "at", "by", "for", "with", "and", "or", "but",
        "it", "its", "this", "that", "these", "those", "as", "from", "into",
    }

    def _word_significance(self, tokens: List[str], span: List[int]) -> float:
        """Masking-probability multiplier for a whole-word span."""
        word = "".join(t.replace("##", "") for t in (tokens[i] for i in span))
        if self.significant_terms:
            return self.significant_boost if word in self.significant_terms \
                else 1.0 / self.significant_boost
        if word in self._STOPWORDS or len(word) <= 2:
            return 1.0 / self.significant_boost
        return self.significant_boost if len(word) >= 4 else 1.0

    # ------------------------------------------------------------------ public
    def __call__(
        self,
        item: Mapping[str, Any],
        probability: Optional[float] = None,
    ) -> Dict[str, Any]:
        text_a = item.get("text", item.get("text_a", ""))
        text_b = item.get("text_b", None)
        prob = self.mask_probability if probability is None else float(probability)

        tokens_a = self.tokenizer.tokenize(text_a)
        tokens_b = self.tokenizer.tokenize(text_b) if text_b else None
        self._truncate(tokens_a, tokens_b)

        tokens = [ "[CLS]" ] + tokens_a + ["[SEP]"]
        segment_ids = [0] * len(tokens)
        if tokens_b:
            tokens += tokens_b + ["[SEP]"]
            segment_ids += [1] * (len(tokens_b) + 1)

        lm_labels = [LM_IGNORE_INDEX] * len(tokens)
        if prob > 0:
            tokens, lm_labels = self._mask(tokens, prob)

        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        input_mask = [1] * len(ids)
        L = self.max_seq_length
        pad = L - len(ids)
        out_ids = np.asarray(ids + [0] * pad, dtype=np.int64)[:L]
        out_mask = np.asarray(input_mask + [0] * pad, dtype=np.int64)[:L]
        out_seg = np.asarray(segment_ids + [0] * pad, dtype=np.int64)[:L]
        out_lm = np.asarray(lm_labels + [LM_IGNORE_INDEX] * pad, dtype=np.int64)[:L]

        if self.trim_start_token:
            out_ids, out_mask, out_seg, out_lm = (
                a[1:] for a in (out_ids, out_mask, out_seg, out_lm)
            )

        return {
            "input_ids": out_ids,
            "input_mask": out_mask,
            "segment_ids": out_seg,
            "lm_label_ids": out_lm,
            "tokens": tokens,
            "source_len": int(min(len(ids), L)),
            "text": text_a,
        }

    # ----------------------------------------------------------------- helpers
    def _truncate(self, tokens_a: List[str], tokens_b: Optional[List[str]]) -> None:
        # reserve [CLS] a [SEP] (+ b [SEP])
        if tokens_b is None:
            budget = self.max_seq_length - 2
            del tokens_a[budget:]
            return
        budget = self.max_seq_length - 3
        while len(tokens_a) + len(tokens_b) > budget:
            longer = tokens_a if len(tokens_a) >= len(tokens_b) else tokens_b
            longer.pop()

    def _word_starts(self, tokens: List[str]) -> List[int]:
        """Indices that begin a whole word (non-special, not ## continuation)."""
        return [
            i for i, t in enumerate(tokens)
            if t not in ("[CLS]", "[SEP]") and not t.startswith("##")
        ]

    def _word_span(self, tokens: List[str], start: int) -> List[int]:
        span = [start]
        j = start + 1
        while j < len(tokens) and tokens[j].startswith("##"):
            span.append(j)
            j += 1
        return span

    def _mask(self, tokens: List[str], prob: float):
        tokens = list(tokens)
        labels = [LM_IGNORE_INDEX] * len(tokens)
        if self.whole_word_masking or self.significant_masking:
            candidates = [self._word_span(tokens, i) for i in self._word_starts(tokens)]
        else:
            candidates = [
                [i] for i, t in enumerate(tokens) if t not in ("[CLS]", "[SEP]")
            ]
        for span in candidates:
            p = prob
            if self.significant_masking:
                p = min(1.0, prob * self._word_significance(tokens, span))
            if self.rng.random() >= p:
                continue
            for i in span:
                labels[i] = self.tokenizer.convert_tokens_to_ids([tokens[i]])[0]
                r = self.rng.random()
                if r < 0.8:
                    tokens[i] = "[MASK]"
                elif r < 0.9:
                    tokens[i] = self.tokenizer.convert_ids_to_tokens(
                        [int(self.rng.integers(0, len(self.tokenizer)))]
                    )[0]
                # else: keep original token
        return tokens, labels


@registry.register_processor("bert_tokenizer")
class BertTokenizerProcessor(MaskedTokenProcessor):
    """Unmasked tokenization: identical contract with probability forced to 0."""

    def __call__(self, item: Mapping[str, Any], probability: Optional[float] = None):
        return super().__call__(item, probability=0.0)


@registry.register_processor("vocab_processor")
class VocabProcessor(BaseProcessor):
    """Whitespace-token → vocab-index lookup with fixed length (simple models)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kw: Any):
        super().__init__(config)
        vocab_path = _resolve_vocab_path(self.config.get("vocab_file", "tests/data/vocab.txt"))
        with open(vocab_path, encoding="utf-8") as f:
            words = [w.strip() for w in f if w.strip()]
        self.word2idx = {w: i + 1 for i, w in enumerate(words)}  # 0 = pad/unk
        self.max_length = int(self.config.get("max_length", 16))

    def __len__(self) -> int:
        return len(self.word2idx) + 1

    def __call__(self, item: Mapping[str, Any], *args: Any, **kw: Any) -> Dict[str, Any]:
        words = str(item.get("text", "")).lower().split()
        ids = [self.word2idx.get(w, 0) for w in words][: self.max_length]
        ids += [0] * (self.max_length - len(ids))
        return {
            "input_ids": np.asarray(ids, dtype=np.int64),
            "input_mask": np.asarray([1 if i else 0 for i in ids], dtype=np.int64),
            "text": item.get("text", ""),
        }


@registry.register_processor("clip_tokenizer")
@registry.register_processor("bpe_tokenizer")
class BPETokenizerProcessor(BaseProcessor):
    """Byte-BPE tokenization (CLIP/GPT-2/RoBERTa class) from local
    vocab.json + merges.txt; fixed-length id arrays with bos/eos options."""

    def __init__(self, config=None, *args, **kw):
        super().__init__(config)
        from antmmf_tpu.utils.bpe_tokenization import BPETokenizer

        cfg = self.config
        self.tokenizer = BPETokenizer(
            cfg["vocab_json"], cfg["merges_file"],
            end_of_word_suffix=cfg.get("end_of_word_suffix", ""))
        self.max_seq_length = int(cfg.get("max_seq_length", 77))
        self.bos_id = cfg.get("bos_id")
        self.eos_id = cfg.get("eos_id")

    def __call__(self, item, *args, **kw):
        text = item.get("text", "") if isinstance(item, Mapping) else str(item)
        ids = self.tokenizer.encode(text)
        if self.bos_id is not None:
            ids = [int(self.bos_id)] + ids
        if self.eos_id is not None:
            ids = ids[: self.max_seq_length - 1] + [int(self.eos_id)]
        L = self.max_seq_length
        pad = max(0, L - len(ids))
        out_ids = np.asarray(ids[:L] + [0] * pad, dtype=np.int64)
        mask = np.asarray([1] * min(len(ids), L) + [0] * pad, dtype=np.int64)
        return {"input_ids": out_ids, "input_mask": mask, "text": text}
