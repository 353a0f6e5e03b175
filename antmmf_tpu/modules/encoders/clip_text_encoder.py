"""CLIP-style causal text transformer with EOT pooling.

Reference parity: the CLIP text tower of ``/root/reference/antmmf/modules/
vision/backbone/clip/model.py`` (828 LoC: token embedding + causal transformer
+ take-features-at-EOT + text projection) and the CN-CLIP variant
(``cn_model.py``: a BERT text tower — covered by ``BertEncoder`` with the
Chinese preset).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.decoders import causal_bias
from antmmf_tpu.modules.layers import LayerNorm
from antmmf_tpu.modules.transformers.base import TransformerEncoder

Dtype = Any


@registry.register_encoder("clip_text")
class ClipTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    output_dim: Optional[int] = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # int[B, L]; EOT = max token id per row
        input_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        B, L = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width), jnp.float32)
        x = tok + pos[:L][None].astype(tok.dtype)
        bias = causal_bias(L)
        if input_mask is not None:
            pad = jnp.where(input_mask[:, None, None, :] > 0, 0.0, -1e30)
            bias = bias + pad
        x = TransformerEncoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            norm_style="pre", final_norm=True, activation="quick_gelu",
            dtype=self.dtype, name="transformer",
        )(x, bias=bias, deterministic=deterministic)
        # pool at the EOT token (highest token id, CLIP convention)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        if self.output_dim is not None:
            pooled = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                              name="text_projection")(pooled)
        return {"sequence_output": x, "pooled_output": pooled}
