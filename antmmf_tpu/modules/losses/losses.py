"""Loss registry + the ``Losses`` aggregator.

Reference parity: ``/root/reference/antmmf/modules/losses/losses.py:50-152`` — the
wrapper resolves registered loss names from config
``[{type, weight, params}, ...]`` and emits ``{dataset_type/dataset_name/loss_name:
value}``; a loss returning ``None`` is skipped ("fault tolerance",
base_model.py:241-246).

Losses are **pure jittable functions** ``(batch: Mapping, output: Mapping) →
scalar | None``: batch fields per the §8 contracts (``targets``, ``lm_label_ids``
…), outputs per model (``logits``, similarity matrices …). Cross-replica reduction
happens in the trainer via pmean — not here.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry


class BaseLoss:
    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})

    def __call__(self, batch: Mapping, output: Mapping) -> Optional[jnp.ndarray]:
        raise NotImplementedError


def _logits_targets(batch: Mapping, output: Mapping):
    return output["logits"], batch["targets"]


@registry.register_loss("cross_entropy")
class CrossEntropyLoss(BaseLoss):
    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, targets[:, None], axis=-1).mean()


@registry.register_loss("label_smooth_ce")
class LabelSmoothCrossEntropy(BaseLoss):
    def __call__(self, batch, output):
        eps = float(self.params.get("smoothing", 0.1))
        logits, targets = _logits_targets(batch, output)
        n = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        smooth = -logp.mean(axis=-1)
        return ((1 - eps) * nll + eps * smooth).mean()


@registry.register_loss("logit_bce")
class LogitBCELoss(BaseLoss):
    """Sigmoid BCE on logits; targets may be multi-hot float."""

    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        logits = logits.astype(jnp.float32)
        targets = targets.astype(jnp.float32)
        loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        return loss.mean()


@registry.register_loss("bce")
class BCELoss(LogitBCELoss):
    pass


@registry.register_loss("bce_ls")
class BCEWithLabelSmoothing(BaseLoss):
    def __call__(self, batch, output):
        eps = float(self.params.get("smoothing", 0.1))
        logits, targets = _logits_targets(batch, output)
        targets = targets.astype(jnp.float32) * (1 - eps) + 0.5 * eps
        logits = logits.astype(jnp.float32)
        loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        return loss.mean()


@registry.register_loss("mse")
class MSELoss(BaseLoss):
    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        return jnp.mean((logits.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2)


@registry.register_loss("nll_loss")
class NLLLoss(BaseLoss):
    """Expects log-probabilities in output['logits']."""

    def __call__(self, batch, output):
        logp, targets = _logits_targets(batch, output)
        return -jnp.take_along_axis(logp.astype(jnp.float32),
                                    targets[:, None], axis=-1).mean()


@registry.register_loss("softmax_kldiv")
class SoftmaxKLDivLoss(BaseLoss):
    """KL(target_dist || softmax(logits)); targets are probability rows."""

    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        t = targets.astype(jnp.float32)
        safe_t = jnp.where(t > 0, t, 1.0)
        return (t * (jnp.log(safe_t) - logp)).sum(-1).mean()


@registry.register_loss("caption_cross_entropy")
class CaptionCrossEntropy(BaseLoss):
    """Token-level CE with -1 ignore index (decoder training)."""

    def __call__(self, batch, output):
        logits = output["logits"].astype(jnp.float32)  # [B, L, V]
        targets = batch["targets"]  # int[B, L], -1 = pad
        valid = targets >= 0
        labels = jnp.where(valid, targets, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)


@registry.register_loss("wrong")
class WrongLoss(BaseLoss):
    """Penalise confident wrong predictions: CE on the most-confident wrong class
    margin (reference 'wrong' loss analogue)."""

    def __call__(self, batch, output):
        logits, targets = _logits_targets(batch, output)
        logits = logits.astype(jnp.float32)
        one_hot = jax.nn.one_hot(targets, logits.shape[-1])
        wrong_best = jnp.max(logits - one_hot * 1e9, axis=-1)
        true_logit = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
        return jnp.maximum(0.0, 1.0 + wrong_best - true_logit).mean()


class Losses:
    """Aggregate configured losses into a flat named dict."""

    def __init__(self, loss_configs: Optional[List] = None):
        self.entries = []
        for cfg in loss_configs or []:
            if isinstance(cfg, str):
                cfg = {"type": cfg}
            name = cfg["type"]
            weight = float(cfg.get("weight", 1.0))
            cls = registry.get_loss_class(name)
            self.entries.append((name, weight, cls(cfg.get("params", {}))))

    def __call__(
        self, batch: Mapping, output: Mapping, prefix: str = ""
    ) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        for name, weight, fn in self.entries:
            val = fn(batch, output)
            if val is None:  # fault-tolerant skip
                continue
            out[f"{prefix}{name}"] = val * weight
        return out
