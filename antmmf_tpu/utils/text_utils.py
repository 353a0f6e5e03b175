"""Text decoding: beam search and nucleus sampling as jit-compiled lax loops.

Reference parity: ``/root/reference/antmmf/utils/text_utils.py`` —
``beam_search`` (:475) and ``nucleus_sampling`` (:555) registered decoders, plus
small text helpers. The reference decodes with Python loops over torch tensors;
here decoding is a single ``lax.scan`` per step across the whole batch (static
max_length), so it compiles once and runs on-device.

The decode callback contract: ``logits_fn(tokens, lengths) -> [B, V]`` scores the
next token given the prefix — models wrap their decoder + cross-attention state
in this closure.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry

NEG_INF = -1e9


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def beam_search(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bos: jnp.ndarray,  # int[B] begin tokens
    eos_id: int,
    max_length: int = 20,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    vocab_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sequences int[B, max_length], scores f32[B]) for the best beam.

    ``logits_fn(tokens int[N, t]) -> f32[N, V]`` scores next-token logits for a
    left-to-right prefix (rows = flattened batch×beam).
    """
    B = bos.shape[0]
    K = num_beams

    tokens = jnp.full((B, K, max_length), eos_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(bos[:, None])
    # beam 0 alive, others -inf so step 1 expands only beam 0
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B, 1))
    finished = jnp.zeros((B, K), bool)

    def step(carry, t):
        tokens, scores, finished = carry
        flat = tokens.reshape(B * K, max_length)
        logits = logits_fn(flat[:, : max_length])  # [B*K, V]
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1).reshape(B, K, V)
        # finished beams: only allow eos at score 0 (keep score frozen)
        frozen = jnp.full((V,), NEG_INF).at[eos_id].set(0.0)
        logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)
        cand = scores[:, :, None] + logp  # [B, K, V]
        flat_cand = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat_cand, K)
        beam_idx = top_idx // V
        tok_idx = top_idx % V
        new_tokens = jnp.take_along_axis(
            tokens, beam_idx[:, :, None], axis=1)
        new_tokens = jax.vmap(
            lambda tk, ti: tk.at[:, t].set(ti))(new_tokens, tok_idx)
        new_finished = jnp.take_along_axis(finished, beam_idx, axis=1) | (
            tok_idx == eos_id)
        return (new_tokens, top_scores, new_finished), None

    (tokens, scores, finished), _ = jax.lax.scan(
        step, (tokens, scores, finished), jnp.arange(1, max_length))

    lengths = jnp.sum(tokens != eos_id, axis=-1) + 1
    norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm, axis=-1)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def nucleus_sampling(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bos: jnp.ndarray,  # int[B]
    rng: jax.Array,
    eos_id: int,
    max_length: int = 20,
    top_p: float = 0.9,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Top-p (nucleus) sampling; returns sequences int[B, max_length]."""
    B = bos.shape[0]
    tokens = jnp.full((B, max_length), eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(bos)
    done = jnp.zeros((B,), bool)

    def step(carry, t):
        tokens, done, rng = carry
        rng, sub = jax.random.split(rng)
        logits = logits_fn(tokens).astype(jnp.float32) / temperature  # [B, V]
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, -1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # smallest set with cumulative prob ≥ top_p: keep while cum - p < prob
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [B]
        cutoff_logit = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1)
        filtered = jnp.where(logits < cutoff_logit, NEG_INF, logits)
        sample = jax.random.categorical(sub, filtered, axis=-1)
        sample = jnp.where(done, eos_id, sample)
        tokens = tokens.at[:, t].set(sample)
        done = done | (sample == eos_id)
        return (tokens, done, rng), None

    (tokens, done, _), _ = jax.lax.scan(
        step, (tokens, done, rng), jnp.arange(1, max_length))
    return tokens


@registry.register_decoder("beam_search")
class BeamSearchDecoder:
    def __init__(self, params: Optional[Dict[str, Any]] = None):
        self.params = dict(params or {})

    def __call__(self, logits_fn, bos, **kw):
        merged = {**self.params, **kw}
        return beam_search(
            logits_fn, bos,
            eos_id=int(merged.get("eos_id", 102)),
            max_length=int(merged.get("max_length", 20)),
            num_beams=int(merged.get("num_beams", 4)),
            length_penalty=float(merged.get("length_penalty", 1.0)),
        )


@registry.register_decoder("nucleus_sampling")
class NucleusSamplingDecoder:
    def __init__(self, params: Optional[Dict[str, Any]] = None):
        self.params = dict(params or {})

    def __call__(self, logits_fn, bos, rng, **kw):
        merged = {**self.params, **kw}
        return nucleus_sampling(
            logits_fn, bos, rng,
            eos_id=int(merged.get("eos_id", 102)),
            max_length=int(merged.get("max_length", 20)),
            top_p=float(merged.get("sum_threshold", merged.get("top_p", 0.9))),
            temperature=float(merged.get("temperature", 1.0)),
        )
