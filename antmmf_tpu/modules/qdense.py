"""QuantDense: an nn.Dense drop-in that serves packed int4 weights.

Training/init behave exactly like ``nn.Dense(use_bias=False)`` — same param
name ("kernel"), same initializer, same dtype promotion — so checkpoints,
sharding rules, and importers are unchanged. At SERVING time,
``make_live_vars`` (predictors/quantization.py) routes
``quantize_for_decode(bits=4)`` records under ``*_proj/kernel`` into two
sibling arrays in this module's scope:

    kernel_q4     uint8  [in/2, out]   nibble-packed (ops/pallas/int4_matmul)
    kernel_scale  f32    [in/group, out]

and ``__call__`` routes through ``int4_apply`` — the Pallas GEMV on decode-
sized inputs (weights cross HBM as 4-bit), the XLA unpack on prefill-sized
ones. Storing records under separate param NAMES (not a dict at the kernel
path) keeps flax's param retrieval and jit tree handling array-only.

Reference role: serving-efficiency counterpart to the reference's fp16 HF
serving (prj/M2_omni 7B-class checkpoints exceed one v5e chip in bf16).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.ops.pallas.int4_matmul import int4_apply

Dtype = Any


class QuantDense(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # freeze the KERNEL (stop_gradient on the weight, NOT the output): no
    # weight grad is ever built, but the activation gradient still flows
    # W^T·dy through the layer — the true PEFT/LoRA backward. Stopping the
    # OUTPUT instead (the old lora_freeze_base behavior) silently restricted
    # upstream gradients to the rank-r adapter path.
    freeze: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        if self.has_variable("params", "kernel_q4"):
            q4 = self.get_variable("params", "kernel_q4")
            scale = self.get_variable("params", "kernel_scale")
            return int4_apply(x, q4, scale, self.dtype).astype(self.dtype)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), self.param_dtype)
        if self.freeze:
            kernel = jax.lax.stop_gradient(kernel)
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return x @ kernel
