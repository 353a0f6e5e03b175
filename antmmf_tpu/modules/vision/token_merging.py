"""Token Merging (ToMe) for ViT inference acceleration.

Implements bipartite soft matching from "Token Merging: Your ViT But
Faster" (arXiv:2210.09461, retrieved via PAPERS.md): between transformer
blocks, the ``r`` most similar even-index tokens merge into their best
odd-index match by size-weighted averaging, shrinking the sequence by
``r`` per block — training-free ViT speedup at small accuracy cost.

TPU-first: ``r`` is static, so every block still compiles with fixed
shapes (L, L-r, L-2r, ...); the merge itself is gather + scatter-add, no
data-dependent control flow. The CLS token (index 0, an even token) is
protected by pinning its match score to -inf and restoring ascending
order for kept tokens, so readouts that index ``x[:, 0]`` keep working.

Beyond-reference capability (the reference has no token reduction); wired
into ``VisionTransformer(token_merge_r=r)`` for serving configs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def tome_merge(
    x: jnp.ndarray,            # [B, L, C]
    size: jnp.ndarray,         # [B, L] token sizes (start at 1)
    r: int,
    protect_first: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge ``r`` tokens per sample; returns ([B, L-r, C], [B, L-r])."""
    B, L, C = x.shape
    a, b = x[:, 0::2], x[:, 1::2]
    sa, sb = size[:, 0::2], size[:, 1::2]
    La, Lb = a.shape[1], b.shape[1]
    r = min(int(r), La - (1 if protect_first else 0), Lb)
    if r <= 0:
        return x, size

    metric = x.astype(jnp.float32)
    metric = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    ma, mb = metric[:, 0::2], metric[:, 1::2]
    scores = jnp.einsum("bic,bjc->bij", ma, mb)  # [B, La, Lb]
    if protect_first:
        scores = scores.at[:, 0, :].set(-jnp.inf)

    node_max = scores.max(axis=-1)               # [B, La]
    node_idx = scores.argmax(axis=-1)            # [B, La]
    order = jnp.argsort(-node_max, axis=1)
    merged_src = order[:, :r]                    # [B, r] most-similar evens
    kept_src = jnp.sort(order[:, r:], axis=1)    # original order (CLS first)
    dst = jnp.take_along_axis(node_idx, merged_src, axis=1)  # [B, r]

    def merge_one(a1, sa1, b1, sb1, msrc, ksrc, d):
        af, bf = a1.astype(jnp.float32), b1.astype(jnp.float32)
        contrib = af[msrc] * sa1[msrc][:, None]
        num = (bf * sb1[:, None]).at[d].add(contrib)
        den = sb1.at[d].add(sa1[msrc])
        merged_b = (num / den[:, None]).astype(a1.dtype)
        out = jnp.concatenate([a1[ksrc], merged_b], axis=0)
        sizes = jnp.concatenate([sa1[ksrc], den], axis=0)
        return out, sizes

    return jax.vmap(merge_one)(a, sa, b, sb, merged_src, kept_src, dst)
