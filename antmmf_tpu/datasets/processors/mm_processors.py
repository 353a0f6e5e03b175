"""Multimodal processors: VQA answer encoding.

Reference parity: ``/root/reference/antmmf/datasets/processors/mm_processors.py``
(``vqa_answer`` :82): map free-form answers onto an answer vocabulary with
VQA-style soft scores (min(1, count/3) over 10 annotator answers → the standard
0 / 0.3 / 0.6 / 0.9→1 buckets).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor

_ARTICLES = {"a", "an", "the"}
_PUNCT = re.compile(r"[^\w\s]")


def normalize_answer(ans: str) -> str:
    ans = _PUNCT.sub("", str(ans).lower().strip())
    words = [w for w in ans.split() if w not in _ARTICLES]
    return " ".join(words)


@registry.register_processor("vqa_answer")
class VQAAnswerProcessor(BaseProcessor):
    """Config: answer_vocab (list of answers) or vocab_file; num_answers=10.

    Input item: {"answers": [str, ...]} (annotator answers) or {"answer": str}.
    Output: {"answers_scores": f32[V], "answers_indices": int64[num_answers],
    "targets": f32[V]}.
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a: Any, **k: Any):
        super().__init__(config)
        cfg = self.config
        vocab: List[str] = list(cfg.get("answer_vocab", []))
        if not vocab and cfg.get("vocab_file"):
            with open(cfg["vocab_file"], encoding="utf-8") as f:
                vocab = [l.strip() for l in f if l.strip()]
        self.answer_vocab = [normalize_answer(v) for v in vocab]
        self.word2idx = {w: i for i, w in enumerate(self.answer_vocab)}
        self.num_answers = int(cfg.get("num_answers", 10))

    def __len__(self) -> int:
        return len(self.answer_vocab)

    def idx(self, answer: str) -> int:
        return self.word2idx.get(normalize_answer(answer), -1)

    def __call__(self, item: Mapping[str, Any], *a: Any, **k: Any) -> Dict[str, Any]:
        answers = item.get("answers")
        if answers is None:
            answers = [item.get("answer", "")] * self.num_answers
        answers = [normalize_answer(x) for x in answers][: self.num_answers]
        while len(answers) < self.num_answers:
            answers.append(answers[-1] if answers else "")

        V = len(self.answer_vocab)
        scores = np.zeros((V,), np.float32)
        for ans, count in Counter(answers).items():
            i = self.word2idx.get(ans, -1)
            if i >= 0:
                # VQA accuracy-style soft score
                scores[i] = min(1.0, count * 0.3)
        indices = np.asarray(
            [self.word2idx.get(a, 0) for a in answers], np.int64)
        return {"answers_scores": scores, "targets": scores,
                "answers_indices": indices}
