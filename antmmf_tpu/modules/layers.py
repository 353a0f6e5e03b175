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


class SyncBatchNorm(nn.Module):
    """Train-mode BatchNorm whose batch statistics are GLOBAL-batch exact.

    Reference semantics: torchvision BN trained under DDP with
    ``convert_sync_batchnorm`` (reference ``trainers/base_trainer.py:358-362``,
    ``modules/encoders/visual_encoder.py:84``) — per-step mean/var over the
    whole global batch, EMA running stats for eval. TPU-native form: under
    ``jit``+GSPMD the reduction runs on the GLOBAL array view, so the
    cross-replica sync is what the compiler emits for ``jnp.mean`` over a
    batch-sharded tensor — no NCCL wrapper or axis plumbing needed. (Inside
    ``shard_map``/``pmap`` bodies pass ``axis_name`` for an explicit psum.)

    Stats/params are fp32 (``batch_stats`` collection: ``mean``/``var``;
    thread mutably through training — the trainer's ``with_mutable`` path
    already carries non-param collections). ``momentum`` follows the torch
    convention: ``running = (1 - momentum)·running + momentum·batch``.
    """

    use_running_average: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        use_run = (self.use_running_average if use_running_average is None
                   else use_running_average)
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        xf = x.astype(jnp.float32)
        if use_run:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))  # (N, *spatial)
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(xf * xf, axes)
            if self.axis_name is not None:  # shard_map/pmap bodies only
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - mean * mean
            if not self.is_initializing():
                n = x.size // C  # per-step sample count (global under jit)
                unbiased = var * (n / max(n - 1, 1))  # torch running-var
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


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
