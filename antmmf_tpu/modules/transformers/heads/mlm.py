"""Masked-language-modeling head with embedding-tied decoder.

Reference parity: ``/root/reference/antmmf/modules/transformers/heads/mlm.py:13``
(``tie_weights:48`` ties the decoder to the word-embedding matrix; tied at
``univl_video_pretrain.py:146-151``). Here tying is explicit: the caller passes
the embedding table into ``__call__`` and the head computes logits against it.

Loss masks ignore-index (-1) positions (contract §8.1: ``lm_label_ids``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import jax

from antmmf_tpu.common.constants import LM_IGNORE_INDEX
from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.layers import LayerNorm

Dtype = Any


@registry.register_head("mlm")
class MLMHead(nn.Module):
    vocab_size: int
    hidden_size: int
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sequence_output: jnp.ndarray,  # [B, L, C]
        embedding_table: Optional[jnp.ndarray] = None,  # [V, C] tied weights
    ) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="transform")(sequence_output)
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="transform_norm")(x)
        if embedding_table is not None:
            logits = jnp.einsum(
                "blc,vc->blv", x, embedding_table.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            logits = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="decoder")(x)
        bias = self.param("decoder_bias", nn.initializers.zeros,
                          (self.vocab_size,), self.param_dtype)
        return logits.astype(jnp.float32) + bias.astype(jnp.float32)

    @staticmethod
    def loss_metric(
        logits: jnp.ndarray, lm_label_ids: jnp.ndarray
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """CE over masked positions only; accuracy over the same positions."""
        valid = lm_label_ids != LM_IGNORE_INDEX
        labels = jnp.where(valid, lm_label_ids, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, nll, 0.0).sum() / denom
        acc = (jnp.where(valid, jnp.argmax(logits, -1) == labels, False).sum() / denom)
        return {"losses": {"masked_lm_loss": loss},
                "metrics": {"masked_lm_acc": acc}}
