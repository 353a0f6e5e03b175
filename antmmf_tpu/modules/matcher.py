"""Hungarian matcher for DETR-style set prediction.

Reference parity: ``/root/reference/antmmf/modules/matcher.py`` (109 LoC,
scipy-based). The assignment itself is combinatorial — it runs on host via
``jax.pure_callback`` with static shapes (padded GT with validity mask), so the
surrounding loss stays inside one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.structures.boxes import generalized_iou


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    out = np.zeros((cost.shape[0], cost.shape[1]), np.int32)
    for b in range(cost.shape[0]):
        row, col = linear_sum_assignment(cost[b])
        out[b, row] = col
    return out


def hungarian_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """cost f32[B, Q, G] → assigned gt index per query int32[B, Q] (a
    permutation when Q == G; with Q > G pad gt columns with large cost)."""
    B, Q, G = cost.shape
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((B, Q), jnp.int32),
        cost.astype(jnp.float32),
        vmap_method="sequential",
    )


class HungarianMatcher:
    """Weighted class/L1/GIoU matching cost (DETR)."""

    def __init__(self, cost_class: float = 1.0, cost_bbox: float = 5.0,
                 cost_giou: float = 2.0):
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou

    def __call__(
        self,
        pred_logits: jnp.ndarray,  # [B, Q, C+1]
        pred_boxes: jnp.ndarray,  # [B, Q, 4] cxcywh in [0,1]
        gt_labels: jnp.ndarray,  # int[B, G] (padded with 0)
        gt_boxes: jnp.ndarray,  # [B, G, 4] cxcywh
        gt_valid: jnp.ndarray,  # bool[B, G]
    ) -> jnp.ndarray:
        """Returns assigned gt index per query int32[B, Q]."""
        from antmmf_tpu.structures.boxes import cxcywh_to_xyxy

        probs = jax.nn.softmax(pred_logits.astype(jnp.float32), -1)
        cost_class = -jnp.take_along_axis(
            probs, gt_labels[:, None, :].repeat(probs.shape[1], 1), axis=-1)
        cost_bbox = jnp.abs(
            pred_boxes[:, :, None] - gt_boxes[:, None, :]).sum(-1)
        giou = jax.vmap(generalized_iou)(
            cxcywh_to_xyxy(pred_boxes), cxcywh_to_xyxy(gt_boxes))
        cost = (self.cost_class * cost_class + self.cost_bbox * cost_bbox
                - self.cost_giou * giou)
        big = 1e6
        cost = jnp.where(gt_valid[:, None, :], cost, big)
        return hungarian_assignment(cost)
