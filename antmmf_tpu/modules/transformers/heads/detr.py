"""DETR set-prediction head: class + box MLPs over decoder queries, Hungarian
matching loss.

Reference parity: ``/root/reference/antmmf/modules/transformers/heads/detr.py:166``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.matcher import HungarianMatcher
from antmmf_tpu.structures.boxes import cxcywh_to_xyxy, generalized_iou

Dtype = Any


@registry.register_head("detr")
class DETRHead(nn.Module):
    num_classes: int  # excludes the no-object class
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """queries [B, Q, C] → class logits [B, Q, C+1] + boxes [B, Q, 4]."""
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="class_embed")(queries)
        h = queries
        for i in range(2):
            h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"bbox_fc{i}")(h))
        box = nn.sigmoid(nn.Dense(4, dtype=self.dtype, name="bbox_out")(h))
        return {"pred_logits": cls.astype(jnp.float32), "pred_boxes": box}

    @staticmethod
    def loss_metric(
        predictions: Mapping[str, jnp.ndarray],
        gt_labels: jnp.ndarray,  # int[B, G]
        gt_boxes: jnp.ndarray,  # [B, G, 4] cxcywh
        gt_valid: jnp.ndarray,  # bool[B, G]
        matcher: HungarianMatcher = None,
        no_object_weight: float = 0.1,
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        matcher = matcher or HungarianMatcher()
        logits = predictions["pred_logits"]
        boxes = predictions["pred_boxes"]
        B, Q, _ = logits.shape
        no_obj = logits.shape[-1] - 1
        assign = matcher(logits, boxes, gt_labels, gt_boxes, gt_valid)  # [B, Q]

        tgt_labels = jnp.take_along_axis(gt_labels, assign, axis=1)
        tgt_valid = jnp.take_along_axis(gt_valid, assign, axis=1)
        tgt_boxes = jnp.take_along_axis(gt_boxes, assign[..., None], axis=1)
        cls_targets = jnp.where(tgt_valid, tgt_labels, no_obj)

        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, cls_targets[..., None], -1)[..., 0]
        weights = jnp.where(tgt_valid, 1.0, no_object_weight)
        cls_loss = (nll * weights).sum() / jnp.maximum(weights.sum(), 1.0)

        l1 = jnp.abs(boxes - tgt_boxes).sum(-1)
        giou = jax.vmap(lambda p, g: jnp.diagonal(generalized_iou(
            cxcywh_to_xyxy(p), cxcywh_to_xyxy(g))))(boxes, tgt_boxes)
        n_matched = jnp.maximum(tgt_valid.sum(), 1)
        box_loss = jnp.where(tgt_valid, l1, 0.0).sum() / n_matched
        giou_loss = jnp.where(tgt_valid, 1.0 - giou, 0.0).sum() / n_matched

        acc = jnp.where(tgt_valid, jnp.argmax(logits, -1) == cls_targets,
                        False).sum() / n_matched
        return {
            "losses": {"detr_class_loss": cls_loss,
                       "detr_bbox_loss": 5.0 * box_loss,
                       "detr_giou_loss": 2.0 * giou_loss},
            "metrics": {"detr_matched_acc": acc},
        }
