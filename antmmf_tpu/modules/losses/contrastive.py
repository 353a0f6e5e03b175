"""Contrastive losses over similarity matrices — the retrieval training core.

Reference parity:
  * MIL-NCE with a positive mask (``/root/reference/prj/base_vtp/roi_univl/univl/
    model/univl_video_ret.py:146-197`` — kron-eye positive mask over gathered
    batches);
  * ``CrossEn`` symmetric InfoNCE and ``NegNCE`` hard-negative-aware variant
    (``prj/dmae_vtp/.../model/dmae_utils.py:528-563``);
  * cross-replica global negatives arrive via ``parallel.collectives.
    gather_with_grad`` *before* these functions (sharded-logits variants live in
    ``antmmf_tpu/parallel/contrastive.py`` — the M2-Encoder "grouped aggregation"
    equivalent).

All functions take fp32 similarity matrices (already temperature-scaled unless a
``temperature`` argument exists) and return scalars.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_en(sim: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """InfoNCE with diagonal positives along ``axis`` (rows by default)."""
    sim = sim.astype(jnp.float32)
    logp = jax.nn.log_softmax(sim, axis=axis)
    return -jnp.mean(jnp.diagonal(logp))


def symmetric_cross_en(sim: jnp.ndarray) -> jnp.ndarray:
    """(t2v + v2t)/2 — CLIP-style bidirectional InfoNCE on a square sim matrix."""
    return 0.5 * (cross_en(sim, axis=-1) + cross_en(sim, axis=-2))


def mil_nce(sim: jnp.ndarray, pos_mask: jnp.ndarray) -> jnp.ndarray:
    """MIL-NCE: multiple positives per row.

    loss = -log( sum_pos exp(s) / sum_all exp(s) ), averaged over rows that have
    at least one positive. ``pos_mask`` bool/int [N, M].
    """
    sim = sim.astype(jnp.float32)
    pos_mask = pos_mask.astype(jnp.float32)
    all_lse = jax.nn.logsumexp(sim, axis=-1)
    neg_inf = jnp.finfo(jnp.float32).min
    pos_sim = jnp.where(pos_mask > 0, sim, neg_inf)
    pos_lse = jax.nn.logsumexp(pos_sim, axis=-1)
    has_pos = pos_mask.sum(-1) > 0
    per_row = jnp.where(has_pos, all_lse - pos_lse, 0.0)
    return per_row.sum() / jnp.maximum(has_pos.sum(), 1)


def neg_nce(
    sim: jnp.ndarray,
    margin: float = 0.0,
    neg_weight: float = 1.0,
) -> jnp.ndarray:
    """Hard-negative-aware NCE (DMAE's NegNCE semantics): the softmax denominator
    keeps only the positive and the *hard* negatives — those within ``margin`` of
    the positive similarity — and hard negatives are up-weighted by
    ``neg_weight``. Diagonal positives."""
    sim = sim.astype(jnp.float32)
    n = sim.shape[0]
    eye = jnp.eye(n, sim.shape[1], dtype=bool)
    pos = jnp.sum(jnp.where(eye, sim, 0.0), axis=-1, keepdims=True)
    hard = (~eye) & (sim >= pos - margin)
    weights = jnp.where(eye, 1.0, jnp.where(hard, neg_weight, 0.0))
    neg_inf = jnp.finfo(jnp.float32).min
    logits = jnp.where(weights > 0, sim + jnp.log(jnp.maximum(weights, 1e-30)), neg_inf)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(logp))


def neg_nce_dmae(
    sim: jnp.ndarray,
    logit_scale: float = 100.0,
    c_pos: float = 1.0,
    c_neg: float = 0.5,
    margin: float = 0.0,
) -> jnp.ndarray:
    """The reference DMAE NegNCE verbatim (dmae_utils.py:539-563): CE on the
    scaled softmax diagonal, plus ``c_neg`` × mean(-log(1−p)) over hard
    negatives — entries violating the margin against the diagonal in either
    the row or column direction. Jittable masked-mean form."""
    sim = sim.astype(jnp.float32)
    n = sim.shape[0]
    p = jax.nn.softmax(sim * logit_scale, axis=-1)
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    diag = jnp.diagonal(sim)
    eye = jnp.eye(n, dtype=bool)
    max_margin = jax.nn.relu(margin + sim - diag[:, None]) + \
        jax.nn.relu(margin + sim - diag[None, :])
    hard = (max_margin > 0.0) & ~eye
    loss_pos = -jnp.log(jnp.diagonal(p))
    neg_terms = jnp.where(hard, -jnp.log(1.0 - p), 0.0)
    n_hard = jnp.maximum(hard.sum(), 1)
    return c_pos * loss_pos.mean() + c_neg * neg_terms.sum() / n_hard


def moco_nce(
    query: jnp.ndarray,  # [B, C] normalised
    key_pos: jnp.ndarray,  # [B, C] normalised (momentum encoder, stop-grad)
    queue: jnp.ndarray,  # [K, C] normalised negatives
    temperature: float = 0.07,
) -> jnp.ndarray:
    """MoCo InfoNCE: positive from the momentum tower, negatives from the queue
    (reference moco_utils.py:13-108)."""
    key_pos = jax.lax.stop_gradient(key_pos)
    queue = jax.lax.stop_gradient(queue)
    l_pos = jnp.sum(query * key_pos, axis=-1, keepdims=True)  # [B, 1]
    l_neg = query @ queue.T  # [B, K]
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -logp[:, 0].mean()


def make_block_diag_pos_mask(n_rows: int, group: int) -> jnp.ndarray:
    """kron(eye, ones(1, group)) positive mask [n_rows, n_rows*group] — text row i
    is positive with the ``group`` clip columns of its own sample (clip grouping,
    univl_video_ret.py:146-197)."""
    return jnp.repeat(jnp.eye(n_rows), group, axis=1)


# ------------------------------------------------------------- registry glue
from antmmf_tpu.common.registry import registry  # noqa: E402
from antmmf_tpu.modules.losses.losses import BaseLoss  # noqa: E402


@registry.register_loss("nce")
@registry.register_loss("discount_infonce")
class InfoNCELoss(BaseLoss):
    """Symmetric InfoNCE over output['sim'] (or 'l1_simi')."""

    def __call__(self, batch, output):
        sim = output.get("sim", output.get("l1_simi"))
        if sim is None:
            return None
        return symmetric_cross_en(sim)


@registry.register_loss("mil-nce")
class MILNCELoss(BaseLoss):
    def __call__(self, batch, output):
        sim = output.get("sim", output.get("l1_simi"))
        mask = output.get("pos_mask")
        if sim is None:
            return None
        if mask is None:
            mask = jnp.eye(sim.shape[0], sim.shape[1])
        return 0.5 * (mil_nce(sim, mask) + mil_nce(sim.T, mask.T))


@registry.register_loss("mil-margin-contrastive")
class MILMarginContrastive(BaseLoss):
    def __call__(self, batch, output):
        sim = output.get("sim", output.get("l1_simi"))
        if sim is None:
            return None
        margin = float(self.params.get("margin", 0.2))
        n = sim.shape[0]
        eye = jnp.eye(n, sim.shape[1])
        pos = (sim * eye).sum(-1, keepdims=True)
        viol = jnp.maximum(0.0, sim - pos + margin) * (1 - eye)
        return viol.mean()
