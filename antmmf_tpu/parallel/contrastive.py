"""Memory-bounded global-batch contrastive loss — the M2-Encoder
"grouped aggregation" equivalent.

Reference claim: M2-Encoder's grouped-aggregation contrastive loss gives "60%
increase in training speed" by avoiding the full [N, N] logits materialisation
at pod-scale batch (``/root/reference/prj/M2_Encoder/README.md:16``).

Technique here: the symmetric InfoNCE over global embeddings is computed in
**row chunks** with rematerialisation — each chunk's [chunk, N] logits exist
only transiently in VMEM-sized working sets, and the backward pass recomputes
them (jax.checkpoint over the chunk body). Peak memory drops from O(N²) to
O(chunk·N) while XLA still sees one fused scan. Under pjit the embeddings are
already global arrays, so no explicit gather is needed; combined with sharded
rows this reproduces the grouped-aggregation communication pattern (each shard
scores its own rows against all columns).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _chunk_lse_and_pos(chunk_rows: jnp.ndarray, cols: jnp.ndarray,
                       row_offset: jnp.ndarray, scale: jnp.ndarray):
    """For a [C, D] row chunk vs [N, D] columns: per-row logsumexp and the
    positive (diagonal) logit."""
    logits = (chunk_rows @ cols.T) * scale  # [C, N]
    lse = jax.nn.logsumexp(logits, axis=-1)
    C = chunk_rows.shape[0]
    idx = row_offset + jnp.arange(C)
    pos = jnp.take_along_axis(logits, idx[:, None], axis=-1)[:, 0]
    return lse, pos


def chunked_infonce(
    rows: jnp.ndarray,  # [N, D] (e.g. text embeddings, L2-normalised)
    cols: jnp.ndarray,  # [N, D]
    scale: jnp.ndarray | float = 1.0,
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """-mean_i log softmax(rows_i·colsᵀ)_i with O(chunk·N) peak memory."""
    N, D = rows.shape
    scale = jnp.asarray(scale, jnp.float32)
    rows = rows.astype(jnp.float32)
    cols = cols.astype(jnp.float32)
    chunk_size = min(chunk_size, N)
    pad = (-N) % chunk_size
    if pad:
        rows_p = jnp.pad(rows, ((0, pad), (0, 0)))
    else:
        rows_p = rows
    n_chunks = rows_p.shape[0] // chunk_size

    body = jax.checkpoint(
        lambda chunk, off: _chunk_lse_and_pos(chunk, cols, off, scale))

    def scan_fn(carry, i):
        chunk = jax.lax.dynamic_slice(
            rows_p, (i * chunk_size, 0), (chunk_size, D))
        lse, pos = body(chunk, i * chunk_size)
        valid = (i * chunk_size + jnp.arange(chunk_size)) < N
        return carry + jnp.sum(jnp.where(valid, lse - pos, 0.0)), None

    total, _ = jax.lax.scan(scan_fn, jnp.zeros((), jnp.float32),
                            jnp.arange(n_chunks))
    return total / N


def chunked_symmetric_infonce(
    text: jnp.ndarray, video: jnp.ndarray,
    scale: jnp.ndarray | float = 1.0, chunk_size: int = 1024,
) -> jnp.ndarray:
    """(t2v + v2t)/2 without ever materialising the full [N, N] matrix."""
    return 0.5 * (chunked_infonce(text, video, scale, chunk_size)
                  + chunked_infonce(video, text, scale, chunk_size))
