"""Prompt-lookup speculative greedy decoding (self-drafting, exact tokens).

The reference serves its MLLMs through HF ``model.generate`` one token per
forward (``prj/Pink/pink/eval/model_vqav2.py:141``,
``prj/M2_omni/models/modeling_llama_3d.py:900-1000`` past_key_values) — on
TPU every decode step is HBM-bandwidth-bound, so a step that verifies
``gamma + 1`` tokens costs nearly the same wall-clock as a step that emits
one. This module goes beyond the reference: draft tokens are proposed by
matching the trailing n-gram against the sequence-so-far (prompt lookup /
"assisted generation" without a draft model — grounded generation such as
VQA, captioning, and box-serialization copies long spans from its prompt),
then verified in ONE chunked KV-cache step. Accepted tokens are exactly the
greedy tokens: speculative output is token-for-token identical to plain
greedy decode by construction (the draft only decides how many greedy
tokens each step yields, never which).

Everything is a single jittable program: static chunk width ``gamma + 1``,
``lax.while_loop`` over verify steps (each emits >= 1 token per active
row), per-row windowed read-modify-writes into the shared output buffer.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def propose_prompt_lookup(
    tokens: jnp.ndarray,   # int32 [B, W] valid in [0, cur_len)
    cur_len: jnp.ndarray,  # int32 [B]
    last_tok: jnp.ndarray,  # int32 [B] fallback draft when no n-gram hit
    gamma: int,
    ngram: int = 2,
) -> jnp.ndarray:
    """Draft ``gamma`` tokens per row: find the most recent earlier
    occurrence of the trailing ``ngram`` and propose its continuation.
    Rows with no match propose ``last_tok`` repeated (verification keeps
    the output exact either way — a bad draft just yields fewer accepted
    tokens)."""
    B, W = tokens.shape
    key = jax.vmap(lambda row, l: jax.lax.dynamic_slice(
        row, (jnp.maximum(l - ngram, 0),), (ngram,)))(tokens, cur_len)
    # sliding windows [B, W - ngram + 1, ngram]
    idx = jnp.arange(W - ngram + 1)[:, None] + jnp.arange(ngram)[None]
    hit = (tokens[:, idx] == key[:, None, :]).all(-1)  # [B, W-ngram+1]
    # candidate start t must sit strictly before the trailing occurrence
    t_axis = jnp.arange(W - ngram + 1)
    hit &= (t_axis[None] + ngram) <= (cur_len - 1)[:, None]
    t_star = jnp.where(hit, t_axis[None], -1).max(1)  # most recent match
    src = (t_star + ngram)[:, None] + jnp.arange(gamma)[None]
    draft = jnp.take_along_axis(tokens, src.clip(0, W - 1), axis=1)
    return jnp.where((t_star >= 0)[:, None], draft, last_tok[:, None])


def speculative_greedy(
    decode_chunk_fn: Callable,  # (chunk int[B, g+1], start_off int[B], cache)
    #                            -> (logits f32[B, g+1, V], cache)
    logits0: jnp.ndarray,  # [B, V] prefill logits (next-token dist)
    cache,                 # KV-cache pytree threaded through the loop; must
    #                        hold lens.max() + max_new + gamma slots
    tokens: jnp.ndarray,   # int32 [B, W]; prompt at [0, lens); W >= lens.max()
    #                        + max_new + gamma + 1 headroom for window writes
    lens: jnp.ndarray,     # int32 [B] prompt lengths
    eos_id: int,
    max_new: int,
    gamma: int = 4,
    ngram: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode with prompt-lookup speculation. ``start_off`` passed to
    ``decode_chunk_fn`` counts decode tokens already consumed (the chunk's
    first token is emitted token #start_off; the model maps that onto its
    own cache-slot / RoPE streams). Returns ``(tokens, n_generated int[B],
    n_steps int)`` — generations written after each row's prompt with
    eos-padding after early stops (identical layout AND content to the
    per-token greedy loop); ``n_steps`` counts verify iterations, so
    ``n_generated.mean() / n_steps`` is the measured tokens-per-step
    (acceptance telemetry)."""
    B, W = tokens.shape
    K = gamma + 1
    j_axis = jnp.arange(K)

    # token #0 comes straight from the prefill logits
    first = jnp.argmax(logits0, -1).astype(jnp.int32)
    tokens = jnp.where(jax.nn.one_hot(lens, W, dtype=bool), first[:, None],
                       tokens)
    done0 = first == eos_id
    count0 = jnp.ones((B,), jnp.int32)

    def cond(carry):
        _, count, done, _, _, _ = carry
        return jnp.any(~done & (count < max_new))

    def body(carry):
        tokens, count, done, last_tok, cache, n_steps = carry
        draft = propose_prompt_lookup(tokens, lens + count, last_tok,
                                      gamma, ngram)
        chunk = jnp.concatenate([last_tok[:, None], draft], axis=1)
        logits, cache = decode_chunk_fn(chunk, count - 1, cache)
        g = jnp.argmax(logits, -1).astype(jnp.int32)  # [B, K] greedy tokens
        # longest draft prefix that matches the true greedy continuation
        m = jnp.cumprod((draft == g[:, :-1]).astype(jnp.int32), 1).sum(1)
        m = jnp.minimum(m, max_new - count - 1)  # token budget
        eos_hit = (g == eos_id) & (j_axis[None] <= m[:, None])
        first_eos = jnp.where(eos_hit.any(1), jnp.argmax(eos_hit, 1), K)
        m = jnp.minimum(m, first_eos)
        active = ~done & (count < max_new)
        n_emit = jnp.where(active, m + 1, 0)  # [B] tokens emitted this step

        emit_mask = j_axis[None] < n_emit[:, None]  # [B, K]

        def window_write(row, vals, mask, start):
            win = jax.lax.dynamic_slice(row, (start,), (K,))
            return jax.lax.dynamic_update_slice(
                row, jnp.where(mask, vals, win), (start,))

        tokens = jax.vmap(window_write)(
            tokens, g, emit_mask, (lens + count).clip(0, W - K))
        last_tok = jnp.where(
            n_emit > 0,
            jnp.take_along_axis(g, (n_emit - 1).clip(0)[:, None], 1)[:, 0],
            last_tok)
        done = done | (active & eos_hit.any(1))
        return tokens, count + n_emit, done, last_tok, cache, n_steps + 1

    tokens, count, done, _, cache, n_steps = jax.lax.while_loop(
        cond, body,
        (tokens, count0, done0, first, cache, jnp.zeros((), jnp.int32)))
    # eos-pad rows that stopped early (parity with the per-token loop, which
    # keeps writing eos_id after done)
    p_axis = jnp.arange(W)[None]
    pad = (p_axis >= (lens + count)[:, None]) \
        & (p_axis < (lens + max_new)[:, None])
    tokens = jnp.where(pad, eos_id, tokens)
    return tokens, count, n_steps
