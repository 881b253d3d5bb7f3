"""DETR criterion: Hungarian matching + VFL/focal + L1 + GIoU losses.

Rebuild of ``src/lightly_train/_task_models/object_detection_components/
matcher.py:34`` + ``rtdetrv2_criterion.py``/``dfine_criterion.py``: matching
costs (focal class cost, L1, GIoU) computed on device as batched matmuls, the
assignment solved on host via ``pure_callback`` (scipy LSA — the same shared
callback as the EoMT loss), then varifocal classification loss + box L1 +
GIoU on matched pairs. Targets are fixed-shape (B, K, ...) padded boxes with
valid flags.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from lightly_train_tpu.tasks.detection.box_utils import (
    cxcywh_to_xyxy,
    generalized_box_iou,
    paired_box_iou,
    paired_generalized_box_iou,
)
from lightly_train_tpu.tasks.eomt_semantic_segmentation import hungarian_match


def detection_matching_cost(
    logits: jax.Array,  # (B, Q, C+1)
    boxes: jax.Array,  # (B, Q, 4) cxcywh
    tgt_labels: jax.Array,  # (B, K)
    tgt_boxes: jax.Array,  # (B, K, 4) cxcywh
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    prob = jax.nn.sigmoid(logits[..., :-1])
    p = jnp.take_along_axis(
        prob[:, :, None, :],
        tgt_labels[:, None, :, None].repeat(prob.shape[1], 1),
        axis=-1,
    )[..., 0]  # (B, Q, K)
    # Focal-style class cost (matcher.py).
    neg_cost = (1 - alpha) * (p**gamma) * (-jnp.log(1 - p + 1e-8))
    pos_cost = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    cost_class = pos_cost - neg_cost
    cost_l1 = jnp.sum(
        jnp.abs(boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), axis=-1
    )
    cost_giou = -generalized_box_iou(
        cxcywh_to_xyxy(boxes), cxcywh_to_xyxy(tgt_boxes)
    )
    return 2.0 * cost_class + 5.0 * cost_l1 + 2.0 * cost_giou


def dfine_fgl_loss(
    dist: jax.Array,  # (B, Q, 4, nb) per-edge offset-bin logits
    base_boxes: jax.Array,  # (B, Q, 4) cxcywh BEFORE this layer's refinement
    refined_boxes: jax.Array,  # (B, Q, 4) cxcywh after refinement
    tgt_boxes: jax.Array,  # (B, K, 4)
    assignment: jax.Array,  # (B, K)
    scale: float,
) -> jax.Array:
    """Fine-Grained Localization loss (D-FINE ``dfine_criterion.py`` fgl):
    distribution focal loss pushing each edge's bin distribution toward the
    matched target edge, IoU-weighted. The target bin coordinate is the
    exact inverse of the decoder's Integral refinement
    (``components.py`` use_dfine branch)."""
    B, Q, _, nb = dist.shape
    assigned = assignment >= 0
    safe_q = jnp.maximum(assignment, 0)
    d = jnp.take_along_axis(
        dist, safe_q[:, :, None, None].repeat(4, 2).repeat(nb, 3), axis=1
    )  # (B, K, 4, nb)
    b0 = jnp.take_along_axis(base_boxes, safe_q[..., None], axis=1)
    br = jnp.take_along_axis(refined_boxes, safe_q[..., None], axis=1)

    def edges(b):
        return jnp.stack(
            [b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2,
             b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2], axis=-1)

    e0 = edges(b0)
    et = edges(tgt_boxes)
    denom = jnp.stack(
        [b0[..., 2], b0[..., 3], b0[..., 2], b0[..., 3]], axis=-1
    ) * scale
    off = jnp.clip((et - e0) / jnp.maximum(denom, 1e-6), -1.0, 1.0)
    y = jnp.clip((off + 1.0) / 2.0 * (nb - 1), 0.0, nb - 1 - 1e-4)
    yl = jnp.floor(y)
    w_r = y - yl
    w_l = 1.0 - w_r
    yl_i = yl.astype(jnp.int32)
    logp = jax.nn.log_softmax(d.astype(jnp.float32), axis=-1)
    pl = jnp.take_along_axis(logp, yl_i[..., None], axis=-1)[..., 0]
    pr = jnp.take_along_axis(
        logp, jnp.clip(yl_i + 1, 0, nb - 1)[..., None], axis=-1
    )[..., 0]
    dfl = -(w_l * pl + w_r * pr)  # (B, K, 4)
    iou = paired_box_iou(cxcywh_to_xyxy(br), cxcywh_to_xyxy(tgt_boxes))
    w = jax.lax.stop_gradient(iou) * assigned
    n = jnp.maximum(jnp.sum(assigned), 1.0)
    return jnp.sum(jnp.mean(dfl, axis=-1) * w) / n


def detection_loss_from_assignment(
    logits: jax.Array,
    boxes: jax.Array,
    tgt_labels: jax.Array,
    tgt_boxes: jax.Array,
    assignment: jax.Array,  # (B, K) query index per target or -1
    alpha: float = 0.75,
    gamma: float = 2.0,
) -> Dict[str, jax.Array]:
    """VFL + L1 + GIoU for a known target->query assignment.

    Shared by the Hungarian-matched path and the denoising path (where the
    assignment is the identity onto the dn query slots, ``denoising.py``).
    """
    B, Q, C1 = logits.shape
    C = C1 - 1
    assigned = assignment >= 0  # (B, K)
    safe_q = jnp.maximum(assignment, 0)

    # ---- varifocal classification loss (rtdetrv2_criterion.py) ----
    matched_boxes = jnp.take_along_axis(boxes, safe_q[..., None], axis=1)
    pair_iou = paired_box_iou(
        cxcywh_to_xyxy(matched_boxes), cxcywh_to_xyxy(tgt_boxes)
    )  # (B, K) aligned pairs
    pair_iou = jax.lax.stop_gradient(pair_iou) * assigned

    # Build per-query target score map (B, Q, C): IoU at matched (q, class).
    target_scores = jnp.zeros((B, Q, C), jnp.float32)
    b_idx = jnp.arange(B)[:, None].repeat(tgt_labels.shape[1], 1)
    target_scores = target_scores.at[
        b_idx, jnp.where(assigned, safe_q, Q), jnp.where(assigned, tgt_labels, 0)
    ].max(jnp.where(assigned, pair_iou, 0.0), mode="drop")
    prob = jax.nn.sigmoid(logits[..., :C])
    weight = (
        alpha * (prob**gamma) * (1 - (target_scores > 0)) + target_scores
    )
    bce = -(
        target_scores * jnp.log(prob + 1e-8)
        + (1 - target_scores) * jnp.log(1 - prob + 1e-8)
    )
    n_matched = jnp.maximum(jnp.sum(assigned), 1.0)
    loss_vfl = jnp.sum(bce * weight) / n_matched

    # ---- box losses on matched pairs ----
    l1 = jnp.sum(jnp.abs(matched_boxes - tgt_boxes), axis=-1)
    giou_pair = paired_generalized_box_iou(
        cxcywh_to_xyxy(matched_boxes), cxcywh_to_xyxy(tgt_boxes)
    )
    loss_l1 = jnp.sum(l1 * assigned) / n_matched
    loss_giou = jnp.sum((1.0 - giou_pair) * assigned) / n_matched
    return {
        "loss_vfl": loss_vfl,
        "loss_l1": loss_l1,
        "loss_giou": loss_giou,
    }


def detection_criterion(
    outputs: List[Tuple[jax.Array, jax.Array]],
    tgt_labels: jax.Array,
    tgt_boxes: jax.Array,
    tgt_valid: jax.Array,
    weights: Dict[str, float] = None,
    dists: List = None,
    fgl_weight: float = 0.15,
    dfine_scale: float = 0.5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Aux losses over all decoder levels + encoder level (outputs[0]).

    ``dists`` (optional): per-level D-FINE tuples ``(dist_logits,
    base_boxes)`` aligned with ``outputs`` (None entries for levels without
    distributions, e.g. the encoder level) — adds the IoU-weighted
    distribution focal loss (``dfine_criterion.py`` fgl).
    """
    if weights is None:
        weights = {"loss_vfl": 1.0, "loss_l1": 5.0, "loss_giou": 2.0}
    total = 0.0
    metrics: Dict[str, jax.Array] = {}
    for li, (logits, boxes) in enumerate(outputs):
        cost = detection_matching_cost(logits, boxes, tgt_labels, tgt_boxes)
        assignment = hungarian_match(jax.lax.stop_gradient(cost), tgt_valid)
        losses = detection_loss_from_assignment(
            logits, boxes, tgt_labels, tgt_boxes, assignment
        )
        level_total = sum(weights[k] * v for k, v in losses.items())
        if dists is not None and li < len(dists) and dists[li] is not None:
            dist_logits, base_boxes = dists[li]
            fgl = dfine_fgl_loss(
                dist_logits, base_boxes, boxes, tgt_boxes, assignment,
                dfine_scale,
            )
            level_total = level_total + fgl_weight * fgl
            losses = {**losses, "loss_fgl": fgl}
        total = total + level_total
        if li == len(outputs) - 1:
            metrics.update({k: v for k, v in losses.items()})
    # Reference criterion SUMS weighted aux-level losses
    # (rtdetrv2_criterion.py:224-241 losses.update per level, train_model
    # total_loss = sum(loss_dict.values())); averaging rescaled every
    # reference-tuned hyperparameter by 1/levels.
    return total, metrics
