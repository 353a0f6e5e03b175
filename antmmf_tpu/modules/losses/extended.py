"""Extended loss battery — completes the reference's 34-loss registry.

Reference parity: the loss names enumerated in SURVEY.md §2.1 from
``/root/reference/antmmf/modules/losses/*.py``: asymmetric_loss,
attention_supervision, bce_kl_combined, cos_amssoftmax, cosarc, custom, eet,
hier_loss, hier_multilabel_loss, kg_margin_contrastive, kn_dis_loss,
m4c_decoding_bce_with_mask, mce_loss, multi, ordinal_loss, pairwise_loss,
weighted_softmax. Each is a fresh jittable implementation of the published
technique the reference wraps.
"""

from __future__ import annotations

from typing import Any, List, Mapping, Optional

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.losses.losses import BaseLoss, Losses, _logits_targets


def _bce_with_logits(logits, targets):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


@registry.register_loss("asymmetric_loss")
class AsymmetricLoss(BaseLoss):
    """ASL for multi-label: focal-style down-weighting with separate γ for
    positives/negatives and probability shifting for negatives."""

    def __call__(self, batch, output):
        gamma_pos = float(self.params.get("gamma_pos", 0.0))
        gamma_neg = float(self.params.get("gamma_neg", 4.0))
        clip = float(self.params.get("clip", 0.05))
        logits, targets = _logits_targets(batch, output)
        targets = targets.astype(jnp.float32)
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        p_neg = jnp.clip(p - clip, 0.0, 1.0) if clip > 0 else p
        loss_pos = targets * jnp.log(jnp.maximum(p, 1e-8)) * \
            ((1 - p) ** gamma_pos)
        loss_neg = (1 - targets) * jnp.log(jnp.maximum(1 - p_neg, 1e-8)) * \
            (p_neg ** gamma_neg)
        return -(loss_pos + loss_neg).mean()


@registry.register_loss("attention_supervision")
class AttentionSupervisionLoss(BaseLoss):
    """BCE between model attention maps and human attention supervision."""

    def __call__(self, batch, output):
        att = output.get("attention")
        sup = batch.get("attention_supervision")
        if att is None or sup is None:
            return None
        att = jnp.clip(att.astype(jnp.float32), 1e-6, 1 - 1e-6)
        sup = sup.astype(jnp.float32)
        return -(sup * jnp.log(att) + (1 - sup) * jnp.log(1 - att)).mean()


@registry.register_loss("bce_kl_combined")
class BCEKLCombined(BaseLoss):
    def __call__(self, batch, output):
        w = float(self.params.get("weight_softmax", 1.0))
        logits, targets = _logits_targets(batch, output)
        bce = _bce_with_logits(logits, targets).mean()
        t = targets.astype(jnp.float32)
        t = t / jnp.maximum(t.sum(-1, keepdims=True), 1e-6)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        kl = (t * (jnp.log(jnp.maximum(t, 1e-8)) - logp)).sum(-1).mean()
        return bce + w * kl


@registry.register_loss("cos_amssoftmax")
class AMSoftmaxLoss(BaseLoss):
    """Additive-margin softmax on cosine logits (speaker/embedding training)."""

    def __call__(self, batch, output):
        m = float(self.params.get("margin", 0.35))
        s = float(self.params.get("scale", 30.0))
        cos, targets = _logits_targets(batch, output)
        one_hot = jax.nn.one_hot(targets, cos.shape[-1])
        adjusted = (cos.astype(jnp.float32) - m * one_hot) * s
        logp = jax.nn.log_softmax(adjusted, -1)
        return -jnp.take_along_axis(logp, targets[:, None], -1).mean()


@registry.register_loss("cosarc")
class ArcFaceLoss(BaseLoss):
    """Additive-angular-margin softmax (ArcFace) on cosine logits."""

    def __call__(self, batch, output):
        m = float(self.params.get("margin", 0.5))
        s = float(self.params.get("scale", 30.0))
        cos, targets = _logits_targets(batch, output)
        cos = jnp.clip(cos.astype(jnp.float32), -1 + 1e-7, 1 - 1e-7)
        theta = jnp.arccos(cos)
        one_hot = jax.nn.one_hot(targets, cos.shape[-1])
        adjusted = jnp.cos(theta + m * one_hot) * s
        logp = jax.nn.log_softmax(adjusted, -1)
        return -jnp.take_along_axis(logp, targets[:, None], -1).mean()


@registry.register_loss("weighted_softmax")
class WeightedSoftmax(BaseLoss):
    """CE with per-sample weights from ``batch['weights']`` (or targets sum)."""

    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, targets[:, None], -1)[:, 0]
        w = batch.get("weights")
        if w is None:
            return nll.mean()
        w = w.astype(jnp.float32)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1e-6)


@registry.register_loss("mce_loss")
class MCELoss(BaseLoss):
    """Multi-label cross entropy with normalised soft targets."""

    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        t = targets.astype(jnp.float32)
        t = t / jnp.maximum(t.sum(-1, keepdims=True), 1e-6)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -(t * logp).sum(-1).mean()


@registry.register_loss("ordinal_loss")
class OrdinalLoss(BaseLoss):
    """Ordinal regression as cumulative-threshold BCE: class k implies all
    thresholds < k are exceeded."""

    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        K = logits.shape[-1]
        thresholds = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        cum_targets = (targets[:, None] > thresholds).astype(jnp.float32)
        return _bce_with_logits(logits, cum_targets).mean()


@registry.register_loss("pairwise_loss")
class PairwiseRankingLoss(BaseLoss):
    """Margin ranking: positive scores must beat in-batch negatives."""

    def __call__(self, batch, output):
        margin = float(self.params.get("margin", 0.2))
        sim = output.get("sim", output.get("logits"))
        if sim is None or sim.ndim != 2 or sim.shape[0] != sim.shape[1]:
            return None
        pos = jnp.diagonal(sim)
        viol_r = jnp.maximum(0.0, margin + sim - pos[:, None])
        viol_c = jnp.maximum(0.0, margin + sim - pos[None, :])
        eye = jnp.eye(sim.shape[0])
        return ((viol_r + viol_c) * (1 - eye)).mean()


@registry.register_loss("kg_margin_contrastive")
class KGMarginContrastive(BaseLoss):
    """TransE-style margin loss over pos/neg triple scores."""

    def __call__(self, batch, output):
        margin = float(self.params.get("margin", 1.0))
        pos = output.get("pos_score")
        neg = output.get("neg_score")
        if pos is None or neg is None:
            return None
        return jnp.maximum(0.0, margin + pos - neg).mean()


@registry.register_loss("kn_dis_loss")
class KnowledgeDistillationLoss(BaseLoss):
    """KL between student logits and teacher logits in the output dict."""

    def __call__(self, batch, output):
        t = output.get("teacher_logits", batch.get("teacher_logits"))
        if t is None:
            return None
        temp = float(self.params.get("temperature", 2.0))
        s = jax.nn.log_softmax(output["logits"].astype(jnp.float32) / temp, -1)
        p = jax.nn.softmax(t.astype(jnp.float32) / temp, -1)
        return (p * (jnp.log(jnp.maximum(p, 1e-9)) - s)).sum(-1).mean() * temp ** 2


@registry.register_loss("m4c_decoding_bce_with_mask")
class M4CDecodingBCEWithMask(BaseLoss):
    """Multi-step decoding BCE with a valid-step mask (TextVQA M4C)."""

    def __call__(self, batch, output):
        logits = output["logits"].astype(jnp.float32)  # [B, T, V]
        targets = batch["targets"].astype(jnp.float32)  # multi-hot [B, T, V]
        mask = batch.get("train_loss_mask")  # [B, T]
        loss = _bce_with_logits(logits, targets).sum(-1)
        if mask is not None:
            mask = mask.astype(jnp.float32)
            return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss.mean()


@registry.register_loss("hier_loss")
class HierarchicalLoss(BaseLoss):
    """Sum of per-level CE over hierarchical label levels; -1 skips a level."""

    def __call__(self, batch, output):
        total = 0.0
        count = 0
        i = 0
        while f"level_{i}_logits" in output:
            logits = output[f"level_{i}_logits"].astype(jnp.float32)
            targets = batch["hier_targets"][:, i]
            valid = targets >= 0
            labels = jnp.where(valid, targets, 0)
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
            total = total + jnp.where(valid, nll, 0.0).sum() / \
                jnp.maximum(valid.sum(), 1)
            count += 1
            i += 1
        return total / max(count, 1) if count else None


@registry.register_loss("hier_multilabel_loss")
class HierarchicalMultilabelLoss(BaseLoss):
    def __call__(self, batch, output):
        total = 0.0
        count = 0
        i = 0
        while f"level_{i}_logits" in output:
            logits = output[f"level_{i}_logits"]
            targets = batch[f"level_{i}_targets"]
            total = total + _bce_with_logits(logits, targets).mean()
            count += 1
            i += 1
        return total / max(count, 1) if count else None


@registry.register_loss("eet")
class EETLoss(BaseLoss):
    """Batch-sensitive embedding-equalisation loss: pull same-class embeddings
    together, push class centroids apart (reference 'eet' family; depends on
    the synchronized_loss global batch)."""

    def __call__(self, batch, output):
        emb = output.get("pooled_output", output.get("text_embed"))
        targets = batch.get("targets")
        if emb is None or targets is None:
            return None
        emb = emb.astype(jnp.float32)
        same = (targets[:, None] == targets[None, :]).astype(jnp.float32)
        sim = emb @ emb.T / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True) @
            jnp.linalg.norm(emb, axis=-1, keepdims=True).T, 1e-6)
        eye = jnp.eye(emb.shape[0])
        pull = ((1 - sim) * same * (1 - eye)).sum() / jnp.maximum(
            (same * (1 - eye)).sum(), 1.0)
        push = jnp.maximum(0.0, sim - 0.5) * (1 - same)
        return pull + push.sum() / jnp.maximum((1 - same).sum(), 1.0)


@registry.register_loss("multi")
class MultiLoss(BaseLoss):
    """Weighted combination of sub-losses: params.losses = [{type, weight,
    params}, ...] (reference 'multi' wrapper)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.inner = Losses(self.params.get("losses", []))

    def __call__(self, batch, output):
        vals = self.inner(batch, output)
        if not vals:
            return None
        return sum(vals.values())


@registry.register_loss("custom")
class CustomLoss(BaseLoss):
    """Pass-through: the model computed its loss into output['custom_loss']."""

    def __call__(self, batch, output):
        return output.get("custom_loss")


@registry.register_loss("hier_softmax_loss")
class HierarchicalSoftmaxLoss(BaseLoss):
    """CE along the gold root→leaf path through the grouped-softmax heads
    (reference hierarchical_classifier training contract): batch carries
    ``hier_label``/``hier_param`` int[B, G] from
    ``HierTree.encode_label_str`` (−1 = level unused); output carries
    ``hier_logits`` (one [B, n_g] per group)."""

    def __call__(self, batch, output):
        hier_label = batch["hier_label"]
        hier_param = batch["hier_param"]
        total = 0.0
        count = 0.0
        for g, logits in enumerate(output["hier_logits"]):
            at_g = hier_param == g  # [B, G] — where the path uses group g
            label = jnp.sum(jnp.where(at_g, hier_label, 0), axis=1)
            has = at_g.any(axis=1)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(
                logp, jnp.clip(label, 0, logits.shape[-1] - 1)[:, None],
                -1)[:, 0]
            total = total + jnp.where(has, nll, 0.0).sum()
            count = count + has.sum()
        return total / jnp.maximum(count, 1.0)
