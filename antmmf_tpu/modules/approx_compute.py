"""Approximate-softmax training: sampled softmax with log-uniform candidates.

Reference parity: ``/root/reference/antmmf/modules/approx_compute.py:48``
(``SampledSoftmaxLoss`` with log-uniform candidate sampling :253-280) — large
output-vocab classification without the full [B, V] logit matrix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def log_uniform_sample(
    rng: jax.Array, num_samples: int, vocab_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zipfian (log-uniform) candidate ids + their expected counts. P(k) =
    log((k+2)/(k+1)) / log(V+1)."""
    u = jax.random.uniform(rng, (num_samples,))
    ids = (jnp.exp(u * jnp.log(float(vocab_size + 1))) - 1.0).astype(jnp.int32)
    ids = jnp.clip(ids, 0, vocab_size - 1)
    probs = jnp.log((ids + 2.0) / (ids + 1.0)) / jnp.log(float(vocab_size + 1))
    return ids, probs


def sampled_softmax_loss(
    embeddings: jnp.ndarray,  # [B, D] pre-logit features
    weight: jnp.ndarray,  # [V, D] output projection (tied or free)
    bias: Optional[jnp.ndarray],  # [V] or None
    targets: jnp.ndarray,  # int[B]
    rng: jax.Array,
    num_samples: int = 256,
) -> jnp.ndarray:
    """Sampled-softmax CE: true class + sampled negatives, logits corrected by
    -log(expected_count) (standard candidate-sampling correction)."""
    V, D = weight.shape
    ids, probs = log_uniform_sample(rng, num_samples, V)

    true_w = weight[targets]  # [B, D]
    true_logit = jnp.sum(embeddings * true_w, -1)
    if bias is not None:
        true_logit = true_logit + bias[targets]
    true_p = jnp.log((targets + 2.0) / (targets + 1.0)) / jnp.log(float(V + 1))
    true_logit = true_logit - jnp.log(jnp.maximum(true_p * num_samples, 1e-9))

    samp_w = weight[ids]  # [S, D]
    samp_logits = embeddings @ samp_w.T  # [B, S]
    if bias is not None:
        samp_logits = samp_logits + bias[ids][None]
    samp_logits = samp_logits - jnp.log(
        jnp.maximum(probs * num_samples, 1e-9))[None]
    # mask accidental hits of the true class
    samp_logits = jnp.where(ids[None, :] == targets[:, None], -1e9, samp_logits)

    logits = jnp.concatenate([true_logit[:, None], samp_logits], axis=1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return -logp[:, 0].mean()
