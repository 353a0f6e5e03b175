"""M2-Encoder serving predictor: embeddings + zero-shot similarity.

Reference parity: ``/root/reference/prj/M2_Encoder/m2_encoder.py`` (NN4K
``M2EncoderExecutor``) and ``ms_wrapper.py`` (ModelScope pipeline) — the
inference surface the reference ships for serving the bilingual CLIP-class
model: ``extract_feat="text"|"image"`` returns L2-normalized embeddings;
without it, texts × images similarity logits (zero-shot classification).

TPU design: the towers are jitted once per input shape; text tokenizes
through the registered CN-CLIP/BERT processor pipeline (local vocab files,
no downloads).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax
import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.predictors.base_predictor import BasePredictor


@registry.register_predictor("m2_encoder_predictor")
class M2EncoderPredictor(BasePredictor):
    """predict({"texts": [...], "images": [H,W,3] or [N,H,W,3],
    "extract_feat": "text"|"image"|None})."""

    def example_data(self) -> Dict[str, Any]:
        size = self.pp.get("image_size", 224)
        return {"texts": ["example"],
                "images": np.zeros((1, size, size, 3), np.float32)}

    def load(self, with_ckpt: bool = True) -> "M2EncoderPredictor":
        import antmmf_tpu.models  # noqa: F401 — registry side effects
        from antmmf_tpu.models.base_model import build_model

        cfg = self.config
        self.model_config = cfg
        self.shell = build_model(cfg, for_test=True, online_serving=True)
        example = self._encode_batch(self.example_data())
        self.variables = self.shell.init(jax.random.PRNGKey(0), example)
        model_dir = self.pp.get("model_dir")
        if with_ckpt and model_dir:
            self._load_checkpoint(model_dir)

        module = self.shell.module

        def embed_text(variables, ids, mask):
            emb, _ = module.apply(variables, ids, mask, method="encode_text")
            return emb

        def embed_image(variables, images):
            emb, _ = module.apply(variables, images, method="encode_image")
            return emb

        self._jit_text = jax.jit(embed_text)
        self._jit_image = jax.jit(embed_image)
        return self

    # ------------------------------------------------------------------ input
    def _tokenize(self, texts: List[str]):
        from antmmf_tpu.datasets.processors.processors import build_processors

        procs = build_processors(self.pp.get("processors", {}))
        text_proc = None
        for name, proc in procs.items():
            if "text" in name or "tokenizer" in name:
                text_proc = proc
                break
        if text_proc is None:
            from antmmf_tpu.datasets.processors.text_processors import (
                MaskedTokenProcessor,
            )

            if not hasattr(self, "_fallback_text_proc"):
                self._fallback_text_proc = MaskedTokenProcessor({
                    "vocab_file": self.pp.get(
                        "vocab_file",
                        "tests/data/vocabs/bert-base-uncased_30522_vocab.txt"),
                    "max_seq_length": int(self.pp.get("max_text_len", 52))})
            text_proc = lambda item: self._fallback_text_proc(  # noqa: E731
                item, probability=0.0)
        ids, mask = [], []
        for t in texts:
            out = text_proc({"text": t})
            ids.append(out["input_ids"])
            mask.append(out["input_mask"])
        return np.stack(ids), np.stack(mask)

    def _encode_batch(self, data: Mapping[str, Any]) -> Dict[str, Any]:
        ids, mask = self._tokenize(list(data.get("texts", ["example"])))
        images = np.asarray(data.get(
            "images", np.zeros((1,) + (self.pp.get("image_size", 224),) * 2
                               + (3,), np.float32)), np.float32)
        if images.ndim == 3:
            images = images[None]
        return {"image": images, "input_ids": ids, "input_mask": mask}

    # ---------------------------------------------------------------- predict
    def predict(self, data: Mapping[str, Any]) -> Dict[str, Any]:
        extract = data.get("extract_feat")
        if extract == "text":
            ids, mask = self._tokenize(list(data["texts"]))
            emb = self._jit_text(self.variables, ids, mask)
            return {"text_embeddings": np.asarray(emb).tolist()}
        if extract == "image":
            images = np.asarray(data["images"], np.float32)
            if images.ndim == 3:
                images = images[None]
            emb = self._jit_image(self.variables, images)
            return {"image_embeddings": np.asarray(emb).tolist()}
        # zero-shot: texts × images similarity (softmax over texts per image)
        ids, mask = self._tokenize(list(data["texts"]))
        images = np.asarray(data["images"], np.float32)
        if images.ndim == 3:
            images = images[None]
        t = np.asarray(self._jit_text(self.variables, ids, mask), np.float32)
        v = np.asarray(self._jit_image(self.variables, images), np.float32)
        sim = v @ t.T  # [n_images, n_texts]
        probs = np.exp(sim * 100.0 - (sim * 100.0).max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        return {"similarity": sim.tolist(), "probs": probs.tolist()}
