"""Frame-order-modeling head: predict each shuffled clip's original position.

Reference parity: the FOM objective of UniVL pretraining
(``/root/reference/prj/base_vtp/roi_univl/univl/model/univl_video_pretrain.py:156-158``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry

Dtype = Any


@registry.register_head("fom")
class FOMHead(nn.Module):
    max_positions: int  # number of clip slots to classify into
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_sequence: jnp.ndarray) -> jnp.ndarray:  # [B, N, C]→[B, N, P]
        logits = nn.Dense(self.max_positions, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="classifier")(clip_sequence)
        return logits.astype(jnp.float32)

    @staticmethod
    def loss_metric(
        logits: jnp.ndarray, order_targets: jnp.ndarray, valid: jnp.ndarray
    ) -> Dict[str, Dict]:
        """order_targets int[B, N] original positions; valid bool[B, N]."""
        labels = jnp.where(valid, order_targets, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, nll, 0.0).sum() / denom
        acc = jnp.where(valid, jnp.argmax(logits, -1) == labels, False).sum() / denom
        return {"losses": {"fom_loss": loss}, "metrics": {"fom_acc": acc}}
