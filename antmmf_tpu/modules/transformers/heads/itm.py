"""Image/video-text matching head (binary alignment classifier).

Reference parity: ``/root/reference/antmmf/modules/transformers/heads/itm.py:14-70``.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry

Dtype = Any


@registry.register_head("itm")
class ITMHead(nn.Module):
    hidden_size: int = 768
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled_output: jnp.ndarray) -> jnp.ndarray:  # [B, C] → [B, 2]
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="transform")(pooled_output)
        x = jnp.tanh(x)
        logits = nn.Dense(2, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="classifier")(x)
        return logits.astype(jnp.float32)

    @staticmethod
    def loss_metric(logits: jnp.ndarray, labels: jnp.ndarray) -> Dict[str, Dict]:
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return {
            "losses": {"itm_loss": nll.mean()},
            "metrics": {"itm_acc": (jnp.argmax(logits, -1) == labels).mean()},
        }
