"""Vocabulary containers for word-level models.

Reference parity: ``/root/reference/antmmf/utils/vocab.py`` (481 LoC) — base
vocab with pad/unk/sos/eos specials, file loading, and the embedding-backed
family: ``CustomVocab`` (:210 — vocab file + npy embedding table),
``IntersectedVocab`` (:258 — vocab ∩ pretrained vectors), ``NpyVocab`` (:328),
``PretrainedVocab`` (:356 — vocabulary comes from the vector file itself),
``WordToVectorDict`` (:412), ``ModelVocab`` (:421 — fasttext model as a vocab),
``ExtractedVocab`` (:463 — per-item precomputed embedding files), and the
type-dispatching entry (:13-62) exposed here as ``build_vocab``.

TPU deltas: vectors are numpy float32 (feed ``flax`` embedding init), and
``PretrainedVocab`` reads a LOCAL glove-format text file instead of a
torchtext download alias (zero-egress environment).
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


def _load_vector_table(vectors_file: str) -> Dict[str, np.ndarray]:
    """Parse a glove-format text file (``word v1 v2 ...`` per line)."""
    table: Dict[str, np.ndarray] = {}
    with open(vectors_file, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < 2:
                continue
            table[parts[0]] = np.asarray(parts[1:], np.float32)
    return table


class CustomVocab(Vocab):
    """Vocab file + custom npy embedding table (ref vocab.py:210).

    The npy table covers the non-special words in file order; the four
    specials get constant rows ``0.1 * i`` like the reference so imported
    tables stay index-compatible.
    """

    def __init__(self, vocab_file: str, embedding_file: str,
                 data_root_dir: Optional[str] = None):
        super().__init__(vocab_file=vocab_file)
        self.type = "custom"
        if not os.path.isabs(embedding_file) and data_root_dir:
            embedding_file = os.path.join(data_root_dir, embedding_file)
        if not os.path.exists(embedding_file):
            raise RuntimeError(
                f"Embedding file path {embedding_file} doesn't exist")
        table = np.load(embedding_file).astype(np.float32)
        dim = table.shape[1]
        n_special = len(DEFAULT_SPECIALS)
        self.vectors = np.zeros((self.get_size(), dim), np.float32)
        for i in range(n_special):
            self.vectors[i] = 0.1 * i
        n_words = min(self.get_size() - n_special, len(table))
        self.vectors[n_special:n_special + n_words] = table[:n_words]

    def get_vectors(self) -> np.ndarray:
        return self.vectors


class NpyVocab(Vocab):
    """Word list stored as an npy array of strings (ref vocab.py:328).

    Indices start at 1 (0 stays reserved for padding, matching the
    reference's off-by-one convention); vectors are allocated zeroed at
    ``embedding_dim`` for the model to initialize.
    """

    def __init__(self, vocab_file: str, data_root_dir: Optional[str] = None,
                 embedding_dim: int = 300):
        self.type = "npy"
        if not os.path.isabs(vocab_file) and data_root_dir:
            vocab_file = os.path.join(data_root_dir, vocab_file)
        words = [str(w) for w in np.load(vocab_file, allow_pickle=True)]
        self.itos = [PAD_TOKEN] + words
        self.stoi = {w: i for i, w in enumerate(self.itos)}
        self.vectors = np.zeros((len(self.itos), embedding_dim), np.float32)

    def get_vectors(self) -> np.ndarray:
        return self.vectors


class PretrainedVocab(Vocab):
    """Vocabulary defined by a pretrained vector file itself (ref :356).

    The reference resolves torchtext download aliases; here
    ``embedding_name`` is a path to a local glove-format file (zero egress),
    and the vocabulary = specials + every word in the file, vectors attached.
    """

    def __init__(self, embedding_name: str,
                 data_root_dir: Optional[str] = None):
        self.type = "pretrained"
        path = embedding_name
        if not os.path.isabs(path) and data_root_dir:
            path = os.path.join(data_root_dir, path)
        if not os.path.exists(path):
            raise RuntimeError(
                f"Unknown embedding: {embedding_name} is not a local "
                "glove-format file (downloads are disabled on this image)")
        table = _load_vector_table(path)
        dim = len(next(iter(table.values()))) if table else 300
        self.itos = list(DEFAULT_SPECIALS) + list(table)
        self.stoi = {w: i for i, w in enumerate(self.itos)}
        self.vectors = np.zeros((len(self.itos), dim), np.float32)
        for i in range(len(DEFAULT_SPECIALS)):
            self.vectors[i] = 0.1 * i
        for i, w in enumerate(table):
            self.vectors[len(DEFAULT_SPECIALS) + i] = table[w]

    def to_indices(self, tokens: Sequence[str]) -> List[int]:
        unk = self.stoi.get(UNK_TOKEN, 0)
        return [self.stoi.get(t, unk) for t in tokens]

    def get_vectors(self) -> np.ndarray:
        return self.vectors

    def get_embedding_dim(self) -> int:
        return self.vectors.shape[1]


class WordToVectorDict:
    """Dict-like word→vector view over an embedding model (ref vocab.py:412).

    Multi-word keys average their per-word vectors.
    """

    def __init__(self, model):
        self.model = model

    def __getitem__(self, word: str) -> np.ndarray:
        return np.mean(
            [self.model.get_word_vector(w) for w in word.split(" ")], axis=0)


class ModelVocab(Vocab):
    """An embedding *model* wrapped in the vocab API (ref vocab.py:421).

    Only fasttext is supported, as in the reference; gated on the optional
    ``fasttext`` package (absent from this image — raises with guidance).
    """

    def __init__(self, name: str, model_file: str):
        self.type = "model"
        if name != "fasttext":
            raise ValueError("Model vocab only supports fasttext as of now")
        try:
            from fasttext import load_model  # noqa: PLC0415
        except ImportError as e:
            raise ImportError(
                "ModelVocab requires the optional `fasttext` package; use "
                "the `fasttext` processor (hashed char-ngram fallback) or "
                "CustomVocab with a precomputed table instead") from e
        self.model = load_model(model_file)
        self.itos = []
        self.stoi = WordToVectorDict(self.model)

    def get_embedding_dim(self) -> int:
        return self.model.get_dimension()


class ExtractedVocab(Vocab):
    """Pre-extracted per-item embedding files as a vocab (ref vocab.py:463).

    ``base_path`` holds one ``<idx>.npy`` per item (e.g. ELMo/BERT dumps);
    lookup loads the file rather than indexing a table.
    """

    def __init__(self, base_path: str, emb_dim: int):
        self.type = "extracted"
        self.base_path = base_path
        self.emb_dim = emb_dim
        self.itos = []
        self.stoi = {}

    def get_dim(self) -> int:
        return self.emb_dim

    def get_item_embedding(self, idx) -> np.ndarray:
        return np.load(os.path.join(self.base_path, f"{idx}.npy"))


def build_vocab(type: str = "pretrained", **params):
    """Type-dispatching vocab factory (reference ``Vocab.__init__`` :13-62).

    Types: random (word file only), custom, pretrained, intersected, npy,
    extracted, model.
    """
    if type == "random":
        return Vocab(vocab_file=params["vocab_file"])
    if type == "custom":
        return CustomVocab(params["vocab_file"], params["embedding_file"],
                           params.get("data_root_dir"))
    if type == "pretrained":
        return PretrainedVocab(params["embedding_name"],
                               params.get("data_root_dir"))
    if type == "intersected":
        return IntersectedVocab(
            params["vocab_file"],
            params.get("embedding_name", params.get("vectors_file")),
            dim=params.get("dim"))
    if type == "npy":
        return NpyVocab(params["vocab_file"], params.get("data_root_dir"),
                        int(params.get("embedding_dim", 300)))
    if type == "extracted":
        return ExtractedVocab(params["base_path"],
                              int(params["embedding_dim"]))
    if type == "model":
        return ModelVocab(params["name"], params["model_file"])
    raise ValueError(f"Unknown vocab type: {type}")
