"""Core NN building blocks with an explicit TPU dtype policy.

Design: flax.linen modules, bf16 compute / fp32 params by default, with
numerically sensitive ops (LayerNorm, softmax) forced to fp32 — the structural
equivalent of the reference's AMP fp32-escape list
(``/root/reference/antmmf/utils/register_fp32.py``) but decided at module level
instead of monkey-patching.

Everything here is shape-static and jit-traceable; parameter sharding is applied
externally by path-regex rules (see ``antmmf_tpu/parallel/partitioning.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """params / compute / norms dtypes (config key training_parameters.dtype_policy)."""

    params: Dtype = jnp.float32
    compute: Dtype = jnp.bfloat16
    norms: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg: Optional[Any]) -> "DTypePolicy":
        if cfg is None:
            return cls()
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: getattr(cfg, k, d)
        to_dtype = lambda s, d: jnp.dtype(s) if s else d  # noqa: E731
        return cls(
            params=to_dtype(get("params", None), jnp.float32),
            compute=to_dtype(get("compute", None), jnp.bfloat16),
            norms=to_dtype(get("softmax_and_norms", None), jnp.float32),
        )


def cpu_safe_policy(policy: DTypePolicy) -> DTypePolicy:
    """bf16 matmuls are painfully slow on CPU test runs; keep the same code path
    but fp32 compute when no accelerator is present."""
    if jax.default_backend() == "cpu":
        return dataclasses.replace(policy, compute=jnp.float32)
    return policy


class LayerNorm(nn.Module):
    """fp32 LayerNorm that casts back to the compute dtype."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=self.param_dtype
        )(x.astype(jnp.float32))
        return out.astype(self.dtype)


class Mlp(nn.Module):
    """Transformer FFN: fc1 → activation → fc2 (+dropout)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    activation: str = "gelu"
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        act = {
            "gelu": nn.gelu,
            "gelu_exact": lambda v: nn.gelu(v, approximate=False),
            "relu": nn.relu,
            "silu": nn.silu,
            "quick_gelu": lambda v: v * nn.sigmoid(1.702 * v),
        }[self.activation]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the entire residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def make_attention_mask(
    pad_mask: jnp.ndarray, dtype: Dtype = jnp.float32
) -> jnp.ndarray:
    """[B, L] 1/0 validity mask → additive [B, 1, 1, L] bias (-inf on padding)."""
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(pad_mask[:, None, None, :] > 0, 0.0, neg).astype(jnp.float32)
    return bias
