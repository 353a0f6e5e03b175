"""LoRA: low-rank adaptation layers for parameter-efficient finetuning.

Reference parity: ``/root/reference/prj/Pink`` trains a LLaMA2+CLIP MLLM with
LoRA-class adapters (pink/model/adapters, 412 LoC). Here LoRA is a drop-in
Dense replacement: ``y = x @ (W_frozen) + x @ A @ B * (alpha/rank)`` with the
base kernel stop-gradiented when ``freeze_base`` — so the optimizer only moves
the adapter (additionally enforceable with a 0-lr multiplier rule on ``.*base/
kernel``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _BaseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's exact names and inits so the
    param tree stays {base: {kernel, bias}} while the caller can
    stop-gradient the WEIGHTS (not the output)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        return kernel, bias


class LoRADense(nn.Module):
    features: int
    rank: int = 8
    alpha: float = 16.0
    freeze_base: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel, bias = _BaseParams(self.features, self.use_bias,
                                   name="base")(in_dim)
        if self.freeze_base:
            # freeze the WEIGHTS, not the output: no weight grad is built,
            # but the activation gradient still flows W^T·dy — the true
            # PEFT/LoRA backward (an output-level stop_gradient restricts
            # upstream grads to the rank-r path)
            kernel = jax.lax.stop_gradient(kernel)
            bias = None if bias is None else jax.lax.stop_gradient(bias)
        a = self.param("lora_a", nn.initializers.normal(0.02),
                       (in_dim, self.rank), jnp.float32)
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features), jnp.float32)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        delta = (x @ a.astype(x.dtype)) @ b.astype(x.dtype)
        return y + delta * (self.alpha / self.rank)


def merge_lora_params(params: Any) -> Any:
    """Fold trained LoRA deltas into base kernels (inference deployment):
    kernel' = kernel + A @ B * (alpha/rank). Walks the tree for subtrees that
    look like a LoRADense ({base: {kernel}, lora_a, lora_b})."""

    def walk(node):
        if isinstance(node, dict):
            if "lora_a" in node and "lora_b" in node and "base" in node:
                a, b = node["lora_a"], node["lora_b"]
                rank = a.shape[-1]
                merged = dict(node["base"])
                # alpha is static config; conventionally 16/rank scaling
                merged["kernel"] = node["base"]["kernel"] + (a @ b) * (16.0 / rank)
                return {"base": merged,
                        "lora_a": jnp.zeros_like(a),
                        "lora_b": jnp.zeros_like(b)}
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
