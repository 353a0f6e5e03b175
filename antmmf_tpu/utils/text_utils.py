"""Text decoding + host-side text helpers.

Reference parity: ``/root/reference/antmmf/utils/text_utils.py`` —
``beam_search`` (:475) and ``nucleus_sampling`` (:555) registered decoders, plus
the host-side helper surface: full/half-width normalization (:48), entity
cleanup (:98-210), CJK predicates (:213-245), ngram generators (:247-283), the
classic VQA tokenizer + ``VocabDict``/``VocabFromText`` (:285-424), and the
BMESO/BIOES/BIO tag→span converters (:632-739) that feed span-F1 NER scoring.
The reference decodes with Python loops over torch tensors; here decoding is a
single ``lax.scan`` per step across the whole batch (static max_length), so it
compiles once and runs on-device. The helpers are plain numpy/str host code
(they run in the data pipeline, never under jit).

The decode callback contract: ``logits_fn(tokens, lengths) -> [B, V]`` scores the
next token given the prefix — models wrap their decoder + cross-attention state
in this closure.
"""

from __future__ import annotations

import functools
import itertools
import os
import re
from collections import Counter
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry

NEG_INF = -1e9

SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")

PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, UNK_TOKEN = "<pad>", "<s>", "</s>", "<unk>"
PAD_INDEX, SOS_INDEX, EOS_INDEX, UNK_INDEX = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# Host-side text normalization (reference text_utils.py:48-245)


def str_q2b(sentence: str) -> str:
    """Full-width → half-width character normalization (ref :48).

    Full-width ASCII (U+FF01..U+FF5E) maps to ASCII by subtracting 0xFEE0;
    the ideographic space U+3000 maps to a plain space and the Chinese full
    stop U+3002 to ``.``; everything else passes through unchanged.
    """
    out = []
    for ch in sentence:
        code = ord(ch)
        if code == 0x3000:
            code = 0x20
        elif code == 0x3002:
            code = 0x2E
        else:
            code -= 0xFEE0
        out.append(chr(code) if 0x20 <= code <= 0x7E else ch)
    return "".join(out)


def replace_blank_with(sentence: str, repl: str) -> str:
    """Collapse runs of spaces into ``repl`` (ref :92)."""
    return re.sub(r" {2,}| ", lambda m: repl, sentence)


_ENTITY_PATTERNS = "|".join([
    r"(http[s]?://\S+)",                        # url
    r"((?:\d{1,3}\.){3}\d{1,3})",               # ip
    r"([\w.-]+@[\w-]+\.[\w.-]+)",               # email
    r'(<[a-z0-9"/= :#;\-]*?>)',                  # html tag
    r"(&[a-zA-Z0-9]+;)",                        # html escape
    r"(1[3-9]\d{9})",                            # cn phone
    r"(\d{1,2}:\d{1,2})",                        # time
    r"(\d{4}-\d{1,2}-\d{1,2})",                  # date
    r"([\w-]+\.jpg)",                            # image file
    r"(\d*\.?\d+KB)",                            # size
])


def replace_simple_entity_with(sentence: str, repl: str) -> str:
    """Replace urls/ips/emails/html/phones/dates/... with ``repl`` (ref :98)."""
    return re.sub(_ENTITY_PATTERNS, repl, sentence)


def replace_digit(sentence: str, repl: str = "0") -> str:
    return re.sub(r"\d", repl, sentence)


def to_lowercase_english(sentence: str) -> str:
    return "".join(c.lower() if c.isascii() and c.isalpha() else c
                   for c in sentence)


def _is_chinese_char(cp: int) -> bool:
    """True when the codepoint is in a CJK Unified Ideographs block (ref :213)."""
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
            or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
            or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)


def is_chinese(word: str) -> int:
    """1 when every char in ``word`` is a CJK ideograph, else 0 (ref :238)."""
    return int(bool(word) and all(_is_chinese_char(ord(c)) for c in word))


def not_hanzi_digit_english(char: str) -> bool:
    """True when char is NOT a CJK ideograph / digit / ascii letter (ref :193)."""
    return not ("一" <= char <= "鿿" or char.isdigit()
                or ("a" <= char.lower() <= "z" and char.isascii()))


def entity_process(entity: str) -> str:
    """Strip leading/trailing symbol chars off an entity string (ref :204)."""
    start, end = 0, len(entity)
    while start < end and not_hanzi_digit_english(entity[start]):
        start += 1
    while end > start and not_hanzi_digit_english(entity[end - 1]):
        end -= 1
    return entity[start:end]


# ---------------------------------------------------------------------------
# ngrams + the classic VQA tokenizer (reference text_utils.py:247-320)


def generate_ngrams(tokens: Sequence[str], n: int = 1):
    """Space-joined n-grams of a token list (generator, ref :247)."""
    return (" ".join(gram) for gram in zip(*(tokens[i:] for i in range(n))))


def generate_ngrams_range(tokens: Sequence[str], ngram_range=(1, 3)):
    """All n-grams for n in ``range(*ngram_range)`` (ref :265)."""
    assert len(ngram_range) == 2, "ngram_range must be (lo, hi)"
    return itertools.chain(
        *(generate_ngrams(tokens, n) for n in range(*ngram_range)))


def tokenize(sentence: str, regex=SENTENCE_SPLIT_REGEX,
             keep=("'s",), remove=(",", "?")) -> List[str]:
    """Classic mmf/VQA word tokenizer (ref :285): lowercase, split on
    non-word runs, keep ``'s`` as its own token, drop ``,``/``?``."""
    sentence = sentence.lower()
    for tok in keep:
        sentence = sentence.replace(tok, " " + tok)
    for tok in remove:
        sentence = sentence.replace(tok, "")
    return [t.strip() for t in regex.split(sentence) if t.strip()]


def word_tokenize(word: str, remove=(",", "?")) -> str:
    word = word.lower()
    for tok in remove:
        word = word.replace(tok, "")
    return word.replace("'s", " 's").strip()


def load_str_list(fname: str) -> List[str]:
    with open(fname, encoding="utf-8") as f:
        return [line.strip() for line in f]


def keep_till_eos(item: Sequence[int]) -> Sequence[int]:
    """Truncate a decoded id sequence at the first EOS_INDEX (ref :315)."""
    for idx, v in enumerate(item):
        if v == EOS_INDEX:
            return item[:idx]
    return item


class VocabDict:
    """Word↔index dictionary from a vocab file (ref text_utils.py:323).

    Prepends ``<unk>`` when absent; exposes stoi/itos and the
    ``tokenize_and_index`` convenience used by the classic VQA processors.
    """

    def __init__(self, vocab_file: str, data_root_dir: Optional[str] = None):
        if not os.path.isabs(vocab_file) and data_root_dir:
            vocab_file = os.path.join(data_root_dir, vocab_file)
        if not os.path.exists(vocab_file):
            raise RuntimeError(f"Vocab file {vocab_file} doesn't exist")
        self.word_list = load_str_list(vocab_file)
        self._build()

    def _build(self) -> None:
        if UNK_TOKEN not in self.word_list:
            self.word_list = [UNK_TOKEN] + list(self.word_list)
        self.word2idx_dict = {w: i for i, w in enumerate(self.word_list)}
        self.stoi = self.word2idx_dict
        self.itos = self.word_list
        self.num_vocab = len(self.word_list)
        self.UNK_INDEX = self.word2idx_dict.get(UNK_TOKEN)
        self.PAD_INDEX = self.word2idx_dict.get(PAD_TOKEN)

    def idx2word(self, idx: int) -> str:
        return self.word_list[idx]

    def __len__(self) -> int:
        return len(self.word_list)

    def get_size(self) -> int:
        return len(self.word_list)

    def get_unk_index(self):
        return self.UNK_INDEX

    def get_unk_token(self) -> str:
        return UNK_TOKEN

    def word2idx(self, word: str) -> int:
        idx = self.word2idx_dict.get(word, self.UNK_INDEX)
        if idx is None:
            raise ValueError(f"word {word} not in dictionary without <unk>")
        return idx

    def tokenize_and_index(self, sentence: str, keep=("'s",)) -> List[int]:
        return [self.word2idx(w) for w in tokenize(sentence, keep=keep)]


class VocabFromText(VocabDict):
    """Build a VocabDict from raw sentences with a min-count cut (ref :388)."""

    DEFAULT_TOKENS = [PAD_TOKEN, UNK_TOKEN, SOS_TOKEN, EOS_TOKEN]

    def __init__(self, sentences: Sequence[str], min_count: int = 1,
                 regex=SENTENCE_SPLIT_REGEX, keep=(), remove=(),
                 only_unk_extra: bool = False):
        counter: Counter = Counter()
        for sentence in sentences:
            counter.update(tokenize(sentence, regex=regex,
                                    keep=keep, remove=remove))
        tokens = [t for t in counter if counter[t] >= min_count]
        extras = [UNK_TOKEN] if only_unk_extra else self.DEFAULT_TOKENS
        self.word_list = extras + tokens
        self._build()


# ---------------------------------------------------------------------------
# NER tag-sequence → span converters (reference text_utils.py:632-739).
# All three return [(label, (start, end))] half-open intervals, skip "<pad>"
# positions, and treat malformed continuations as new single-token spans.


def _tag_to_spans(tags: Sequence[str], begin: str, mid: str,
                  ignore_labels=None) -> List[Tuple[str, Tuple[int, int]]]:
    ignore = set(ignore_labels or ())
    spans: List[List] = []
    prev = None
    for idx, tag in enumerate(tags):
        if tag == PAD_TOKEN:
            continue
        tag = tag.lower()
        kind, label = tag[:1], tag[2:]
        if kind in ("b", "s"):
            spans.append([label, idx, idx])
        elif kind in mid and prev is not None \
                and prev in (begin + mid[:1]) and spans \
                and label == spans[-1][0]:
            spans[-1][2] = idx
        elif kind == "o":
            pass
        else:
            spans.append([label, idx, idx])
        prev = kind
    return [(lbl, (s, e + 1)) for lbl, s, e in spans if lbl not in ignore]


def bmeso_tag_to_spans(tags, ignore_labels=None):
    """['O','B-x','M-x','E-x','O'] → [('x', (1, 4))] (ref :632)."""
    return _tag_to_spans(tags, begin="b", mid="me", ignore_labels=ignore_labels)


def bioes_tag_to_spans(tags, ignore_labels=None):
    """['O','B-x','I-x','E-x','O'] → [('x', (1, 4))] (ref :668)."""
    return _tag_to_spans(tags, begin="b", mid="ie", ignore_labels=ignore_labels)


def bio_tag_to_spans(tags, ignore_labels=None):
    """['O','B-x','I-x','I-x','O'] → [('x', (1, 4))] (ref :706)."""
    return _tag_to_spans(tags, begin="b", mid="i", ignore_labels=ignore_labels)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def beam_search(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bos: jnp.ndarray,  # int[B] begin tokens
    eos_id: int,
    max_length: int = 20,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    vocab_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sequences int[B, max_length], scores f32[B]) for the best beam.

    ``logits_fn(tokens int[N, t]) -> f32[N, V]`` scores next-token logits for a
    left-to-right prefix (rows = flattened batch×beam).
    """
    B = bos.shape[0]
    K = num_beams

    tokens = jnp.full((B, K, max_length), eos_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(bos[:, None])
    # beam 0 alive, others -inf so step 1 expands only beam 0
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B, 1))
    finished = jnp.zeros((B, K), bool)

    def step(carry, t):
        tokens, scores, finished = carry
        flat = tokens.reshape(B * K, max_length)
        logits = logits_fn(flat[:, : max_length])  # [B*K, V]
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1).reshape(B, K, V)
        # finished beams: only allow eos at score 0 (keep score frozen)
        frozen = jnp.full((V,), NEG_INF).at[eos_id].set(0.0)
        logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)
        cand = scores[:, :, None] + logp  # [B, K, V]
        flat_cand = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat_cand, K)
        beam_idx = top_idx // V
        tok_idx = top_idx % V
        new_tokens = jnp.take_along_axis(
            tokens, beam_idx[:, :, None], axis=1)
        new_tokens = jax.vmap(
            lambda tk, ti: tk.at[:, t].set(ti))(new_tokens, tok_idx)
        new_finished = jnp.take_along_axis(finished, beam_idx, axis=1) | (
            tok_idx == eos_id)
        return (new_tokens, top_scores, new_finished), None

    (tokens, scores, finished), _ = jax.lax.scan(
        step, (tokens, scores, finished), jnp.arange(1, max_length))

    lengths = jnp.sum(tokens != eos_id, axis=-1) + 1
    norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm, axis=-1)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def nucleus_sampling(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bos: jnp.ndarray,  # int[B]
    rng: jax.Array,
    eos_id: int,
    max_length: int = 20,
    top_p: float = 0.9,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Top-p (nucleus) sampling; returns sequences int[B, max_length]."""
    B = bos.shape[0]
    tokens = jnp.full((B, max_length), eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(bos)
    done = jnp.zeros((B,), bool)

    def step(carry, t):
        tokens, done, rng = carry
        rng, sub = jax.random.split(rng)
        logits = logits_fn(tokens).astype(jnp.float32) / temperature  # [B, V]
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, -1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # smallest set with cumulative prob ≥ top_p: keep while cum - p < prob
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [B]
        cutoff_logit = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1)
        filtered = jnp.where(logits < cutoff_logit, NEG_INF, logits)
        sample = jax.random.categorical(sub, filtered, axis=-1)
        sample = jnp.where(done, eos_id, sample)
        tokens = tokens.at[:, t].set(sample)
        done = done | (sample == eos_id)
        return (tokens, done, rng), None

    (tokens, done, _), _ = jax.lax.scan(
        step, (tokens, done, rng), jnp.arange(1, max_length))
    return tokens


def beam_search_cached(
    decode_fn: Callable,
    init_logits: jnp.ndarray,  # f32[B, V] next-token logits after prefill
    cache: Any,  # pytree, leading dim B on every leaf
    start_pos: jnp.ndarray,  # int[B] absolute slot/position of first new token
    eos_id: int,
    max_new: int = 20,
    num_beams: int = 4,
    length_penalty: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cache beam search (the reference decodes through HF ``generate`` with
    ``past_key_values``, e.g. prj/Pink/pink/eval/model_vqav2.py:141 — this is
    the TPU-native equivalent: O(L) per step instead of O(L²) full re-encode).

    ``decode_fn(tokens int[N], pos int[N], cache) -> (logits f32[N, V], cache)``
    scores ONE token per row against the cache and writes its k/v at ``pos``.
    The cache is expanded to ``B*num_beams`` rows internally and beam-reordered
    (row gather) each step. Returns (best tokens int[B, max_new], scores f32[B]).
    """
    B, V = init_logits.shape
    K = num_beams

    logp0 = jax.nn.log_softmax(init_logits.astype(jnp.float32), -1)
    scores, tok0 = jax.lax.top_k(logp0, K)  # [B, K]
    tokens = jnp.full((B, K, max_new), eos_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(tok0)
    finished = tok0 == eos_id

    cache = jax.tree.map(lambda c: jnp.repeat(c, K, axis=0), cache)
    pos_flat = jnp.repeat(start_pos, K)  # [B*K]

    def step(carry, t):
        tokens, scores, finished, cache = carry
        last = jnp.take_along_axis(
            tokens, (t - 1)[None, None, None].repeat(B, 0).repeat(K, 1),
            axis=2)[:, :, 0]
        logits, cache = decode_fn(last.reshape(B * K), pos_flat + t - 1, cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1).reshape(
            B, K, V)
        frozen = jnp.full((V,), NEG_INF).at[eos_id].set(0.0)
        logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)
        cand = (scores[:, :, None] + logp).reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(cand, K)
        beam_idx = top_idx // V  # [B, K]
        tok_idx = top_idx % V
        new_tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        new_tokens = jax.vmap(
            lambda tk, ti: tk.at[:, t].set(ti))(new_tokens, tok_idx)
        new_finished = jnp.take_along_axis(finished, beam_idx, axis=1) | (
            tok_idx == eos_id)
        flat_idx = (jnp.arange(B)[:, None] * K + beam_idx).reshape(B * K)
        cache = jax.tree.map(lambda c: jnp.take(c, flat_idx, axis=0), cache)
        return (new_tokens, top_scores, new_finished, cache), None

    (tokens, scores, finished, _), _ = jax.lax.scan(
        step, (tokens, scores, finished, cache), jnp.arange(1, max_new))

    lengths = jnp.sum(tokens != eos_id, axis=-1) + 1
    norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm, axis=-1)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores


def nucleus_sampling_cached(
    decode_fn: Callable,
    init_logits: jnp.ndarray,  # f32[B, V]
    cache: Any,
    start_pos: jnp.ndarray,  # int[B]
    rng: jax.Array,
    eos_id: int,
    max_new: int = 20,
    top_p: float = 0.9,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """KV-cache top-p sampling; returns sequences int[B, max_new]."""
    B = init_logits.shape[0]

    def sample_one(rng, logits):
        logits = logits.astype(jnp.float32) / temperature
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, -1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff_logit = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1)
        filtered = jnp.where(logits < cutoff_logit, NEG_INF, logits)
        return jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)

    rng, sub = jax.random.split(rng)
    tok0 = sample_one(sub, init_logits)
    tokens = jnp.full((B, max_new), eos_id, jnp.int32).at[:, 0].set(tok0)
    done = tok0 == eos_id

    def step(carry, t):
        tokens, done, cache, rng = carry
        rng, sub = jax.random.split(rng)
        last = jnp.take_along_axis(tokens, (t - 1)[None, None].repeat(B, 0),
                                   axis=1)[:, 0]
        logits, cache = decode_fn(last, start_pos + t - 1, cache)
        sample = jnp.where(done, eos_id, sample_one(sub, logits))
        tokens = jax.vmap(lambda tk, s: tk.at[t].set(s))(tokens, sample)
        done = done | (sample == eos_id)
        return (tokens, done, cache, rng), None

    (tokens, done, _, _), _ = jax.lax.scan(
        step, (tokens, done, cache, rng), jnp.arange(1, max_new))
    return tokens


@registry.register_decoder("beam_search")
class BeamSearchDecoder:
    def __init__(self, params: Optional[Dict[str, Any]] = None):
        self.params = dict(params or {})

    def __call__(self, logits_fn, bos, **kw):
        merged = {**self.params, **kw}
        return beam_search(
            logits_fn, bos,
            eos_id=int(merged.get("eos_id", 102)),
            max_length=int(merged.get("max_length", 20)),
            num_beams=int(merged.get("num_beams", 4)),
            length_penalty=float(merged.get("length_penalty", 1.0)),
        )


@registry.register_decoder("nucleus_sampling")
class NucleusSamplingDecoder:
    def __init__(self, params: Optional[Dict[str, Any]] = None):
        self.params = dict(params or {})

    def __call__(self, logits_fn, bos, rng, **kw):
        merged = {**self.params, **kw}
        return nucleus_sampling(
            logits_fn, bos, rng,
            eos_id=int(merged.get("eos_id", 102)),
            max_length=int(merged.get("max_length", 20)),
            top_p=float(merged.get("sum_threshold", merged.get("top_p", 0.9))),
            temperature=float(merged.get("temperature", 1.0)),
        )
