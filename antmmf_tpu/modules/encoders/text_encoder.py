"""Text tower: BERT-style encoder (embeddings + post-LN stack + pooler).

Reference parity: ``/root/reference/antmmf/modules/encoders/text_encoder.py:22-176``
(HF AutoModel wrap). Here a fresh flax BERT with identical output surface:
``sequence_output`` [B, L, C], ``pooled_output`` [B, C]; hidden states exposed for
attention-derived word-importance consumers (univl_video_base.py:138-143).

Presets: bert_base (L12 H768), bert_small (L4 H512), bert_tiny_test.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.embeddings import TextEmbeddings
from antmmf_tpu.modules.layers import make_attention_mask
from antmmf_tpu.modules.transformers.base import TransformerEncoder

Dtype = Any

PRESETS = {
    "bert_base": dict(num_layers=12, hidden_size=768, num_heads=12, vocab_size=30522),
    "bert_small": dict(num_layers=4, hidden_size=512, num_heads=8, vocab_size=30522),
    "bert_chinese_base": dict(num_layers=12, hidden_size=768, num_heads=12,
                              vocab_size=21128),
    "bert_tiny_test": dict(num_layers=2, hidden_size=64, num_heads=2, vocab_size=30522),
    "bert_chinese_tiny_test": dict(num_layers=2, hidden_size=64, num_heads=2,
                                   vocab_size=21128),
}


@registry.register_encoder("bert")
class BertEncoder(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    add_pooler: bool = True
    remat: bool = False
    scan_layers: bool = False
    pipeline_stages: int = 1  # GPipe the layer stack (requires scan_layers)
    pipeline_microbatches: int = 4
    use_pallas: bool = True
    sow_attention: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.embeddings = TextEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=self.type_vocab_size, dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.encoder = TransformerEncoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, dropout=self.dropout, norm_style="post",
            layer_norm_eps=self.layer_norm_eps, activation="gelu_exact",
            final_norm=False, remat=self.remat,
            scan_layers=self.scan_layers or self.pipeline_stages > 1,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            use_pallas=self.use_pallas,
            sow_attention=self.sow_attention,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        if self.add_pooler:
            self.pooler = nn.Dense(self.hidden_size, dtype=self.dtype,
                                   param_dtype=self.param_dtype)

    # staged sub-passes — used by MMBT/VisualBERT-style models that splice
    # visual tokens between embedding and encoding
    def embeddings_apply(self, input_ids, segment_ids=None, deterministic=True,
                         extra=None):
        return self.embeddings(input_ids, segment_ids,
                               deterministic=deterministic, extra=extra)

    def encoder_apply(self, hidden, input_mask, deterministic=True):
        bias = make_attention_mask(input_mask)
        return self.encoder(hidden, bias=bias, deterministic=deterministic)

    def word_importance(self, input_ids, input_mask, segment_ids=None,
                        deterministic=True):
        """Attention-derived per-token importance (the reference's
        output_attentions word-importance, univl_video_base.py:138-143):
        sum over layers of mean-head attention column mass."""
        x = self.embeddings_apply(input_ids, segment_ids, deterministic)
        bias = make_attention_mask(input_mask)
        _, importance = self.encoder(x, bias=bias,
                                     deterministic=deterministic,
                                     return_importance=True)
        return importance

    def pooler_apply(self, cls_state):
        if self.add_pooler:
            return self.pooler(cls_state)
        return cls_state

    def __call__(
        self,
        input_ids: jnp.ndarray,
        input_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        if input_mask is None:
            input_mask = jnp.ones_like(input_ids)
        x = self.embeddings_apply(input_ids, segment_ids, deterministic)
        x = self.encoder_apply(x, input_mask, deterministic)
        out = {"sequence_output": x}
        if self.add_pooler:
            out["pooled_output"] = jnp.tanh(self.pooler_apply(x[:, 0]))
        else:
            out["pooled_output"] = x[:, 0]
        return out


def build_bert(preset: str, **overrides) -> BertEncoder:
    if preset not in PRESETS:
        raise KeyError(f"Unknown BERT preset {preset!r}; known: {sorted(PRESETS)}")
    kwargs = dict(PRESETS[preset])
    hidden = kwargs.pop("hidden_size")
    kwargs["hidden_size"] = hidden
    kwargs.update(overrides)
    return BertEncoder(**kwargs)
