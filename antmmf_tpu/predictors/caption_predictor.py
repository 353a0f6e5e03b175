"""Caption predictor: online-serving caption generation (beam search).

Reference parity: the serving plane (``/root/reference/antmmf/predictors/``)
plus the caption post-processing convention of the MLM head
(``heads/mlm.py convert_id2text`` — stop at [SEP], strip pads, join
wordpieces). Serves a ``univl_caption`` model: image/video in → caption
string out.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.predictors.base_predictor import BasePredictor


def ids_to_caption(tokenizer, ids) -> str:
    """[SEP]-terminated wordpiece ids → text (reference convert_id2text)."""
    tokens = tokenizer.convert_ids_to_tokens([int(t) for t in ids])
    for stop in ("[SEP]", "[PAD]"):
        if stop in tokens:
            tokens = tokens[: tokens.index(stop)]
    tokens = [t for t in tokens if t != "[CLS]"]
    return " ".join(tokens).replace(" ##", "").strip("##").strip()


@registry.register_predictor("caption_predictor")
class CaptionPredictor(BasePredictor):
    """predict({"image_data": ...}) → {"caption": str, "generated_ids": ...}."""

    def load(self, with_ckpt: bool = True) -> "CaptionPredictor":
        super().load(with_ckpt=with_ckpt)
        from antmmf_tpu.utils.tokenization import BertTokenizer

        vocab = self.pp.get(
            "vocab_file", "tests/data/vocabs/bert-base-uncased_30522_vocab.txt")
        self.tokenizer = BertTokenizer(vocab)
        self.num_beams = int(self.pp.get("num_beams", 4))
        self.max_length = self.pp.get("max_length")
        return self

    def predict(self, data: Mapping[str, Any],
                json_obj: Optional[Mapping] = None) -> Dict[str, Any]:
        sample = self.build_sample(data)
        arrays = {k: np.asarray(v) for k, v in sample.arrays().items()}
        module = self.shell.module
        if not hasattr(module, "generate"):
            raise NotImplementedError(
                f"{type(module).__name__} has no generate(); caption serving "
                "needs a generation-capable model (univl_caption)")
        ids, scores = module.generate(
            self.variables, arrays, num_beams=self.num_beams,
            max_length=self.max_length)
        ids = np.asarray(ids)
        captions = [ids_to_caption(self.tokenizer, row) for row in ids]
        result: Dict[str, Any] = {
            "generated_ids": ids,
            "caption": captions[0] if len(captions) == 1 else captions,
            "scores": np.asarray(scores),
        }
        return result
