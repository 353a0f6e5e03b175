"""Masked-region-classification (MRC) head.

Reference parity: ``/root/reference/antmmf/modules/transformers/heads/mrc.py``
(VilBERT/volta-style region head: BertOnlyMLMHead transform over region states,
KL divergence against the detector's class distribution on masked regions,
mrc_acc metric). ``vocab_size`` is the detector class count (80 for COCO).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.layers import LayerNorm

Dtype = Any


@registry.register_head("mrc")
class MRCHead(nn.Module):
    vocab_size: int = 80  # detector classes
    hidden_size: int = 768
    layer_norm_eps: float = 1e-6
    loss_name: str = "masked_region_classification"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sequence_output: jnp.ndarray) -> jnp.ndarray:
        """[B, R, C] region states → [B, R, vocab_size] class logits."""
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="transform")(
            sequence_output)
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="transform_norm")(x)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="decoder")(x)
        return logits.astype(jnp.float32)

    def loss_metric(
        self,
        logits: jnp.ndarray,           # [B, R, V]
        region_to_predict: jnp.ndarray,  # int[B, R] 1 on masked regions
        region_cls_dis: jnp.ndarray,     # float[B, R, V] detector distribution
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """KL(detector ‖ head) summed over masked regions / their count
        (reference mrc.py forward; volta losses.py:16)."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = region_cls_dis.astype(jnp.float32)
        # torch KLDivLoss(input=logp, target=p) elementwise = p·(log p − logp)
        kl = p * (jnp.log(jnp.clip(p, 1e-12)) - logp)
        mask = (region_to_predict == 1)
        denom = jnp.maximum(mask.sum(), 1)
        loss = jnp.where(mask[..., None], kl, 0.0).sum() / denom
        acc = jnp.where(
            mask, jnp.argmax(p, -1) == jnp.argmax(logits, -1), False
        ).sum() / denom
        return {"losses": {self.loss_name: loss},
                "metrics": {"mrc_acc": acc}}
