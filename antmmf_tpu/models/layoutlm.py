"""LayoutLM: document understanding with 2D layout position embeddings.

Reference parity: ``/root/reference/antmmf/models/layoutlm.py`` (``AntmmfLayoutLM``
:639, 810 LoC) and ``modules/embeddings/layout_lm_embeddings.py``: token
embeddings + 2D bbox coordinate embeddings (x0, y0, x1, y1, w, h buckets) into a
BERT stack, with classification / token-labeling heads.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.modules.classifier import ClassifierLayer
from antmmf_tpu.modules.encoders.text_encoder import (
    PRESETS as BERT_PRESETS, BertEncoder,
)
from antmmf_tpu.modules.layers import LayerNorm

Dtype = Any


class LayoutEmbeddings(nn.Module):
    """2D position embeddings over bucketised bbox coords (0..1023)."""

    hidden_size: int
    max_position: int = 1024
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, bbox: jnp.ndarray) -> jnp.ndarray:
        """bbox int[B, L, 4] (x0, y0, x1, y1 in [0, max_position)) → [B, L, C]."""
        x_emb = nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype,
                         name="x_embed")
        y_emb = nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype,
                         name="y_embed")
        w_emb = nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype,
                         name="w_embed")
        h_emb = nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype,
                         name="h_embed")
        clip = lambda v: jnp.clip(v, 0, self.max_position - 1)  # noqa: E731
        out = (x_emb(clip(bbox[..., 0])) + y_emb(clip(bbox[..., 1]))
               + x_emb(clip(bbox[..., 2])) + y_emb(clip(bbox[..., 3]))
               + w_emb(clip(bbox[..., 2] - bbox[..., 0]))
               + h_emb(clip(bbox[..., 3] - bbox[..., 1])))
        return out


@registry.register_model("layoutlm")
class LayoutLM(BaseModel):
    bert_preset: str = "bert_base"
    num_labels: int = 2
    token_labeling: bool = False  # per-token classification (NER-style)
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        kw = dict(BERT_PRESETS[self.bert_preset])
        self.hidden = kw["hidden_size"]
        self.text_encoder = BertEncoder(dtype=dtype, **kw)
        self.layout_embed = LayoutEmbeddings(hidden_size=self.hidden, dtype=dtype)
        self.classifier = ClassifierLayer("logit", self.num_labels, dtype=dtype)

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        ids = batch["input_ids"]
        mask = batch.get("input_mask", jnp.ones_like(ids))
        seg = batch.get("segment_ids")
        bbox = batch["bbox"]
        emb = self.text_encoder.embeddings_apply(ids, seg, deterministic)
        emb = emb + self.layout_embed(bbox).astype(emb.dtype)
        seq = self.text_encoder.encoder_apply(emb, mask, deterministic)
        out: Dict[str, Any] = {"sequence_output": seq}
        if self.token_labeling:
            out["logits"] = self.classifier(seq).astype(jnp.float32)
        else:
            pooled = jnp.tanh(self.text_encoder.pooler_apply(seq[:, 0]))
            out["logits"] = self.classifier(pooled).astype(jnp.float32)
            out["pooled_output"] = pooled
        return out
