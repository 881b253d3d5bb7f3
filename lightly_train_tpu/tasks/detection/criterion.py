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
import numpy as np

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


def _go_union_host(
    assign_stack: np.ndarray, valid: np.ndarray, n_pairs: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GO (global-optimal union) indices (``dfine_criterion.py:303-326``):
    union of every level's (query, target) matches, counted, sorted by
    count descending (stable, unique pairs pre-sorted ascending like
    torch.unique), deduplicated keeping ONE target per query."""
    L, B, K = assign_stack.shape
    out_q = np.full((B, n_pairs), 0, np.int32)
    out_t = np.full((B, n_pairs), 0, np.int32)
    out_v = np.zeros((B, n_pairs), bool)
    for b in range(B):
        pairs = [
            (int(assign_stack[li, b, k]), k)
            for li in range(L)
            for k in range(K)
            if valid[b, k] and assign_stack[li, b, k] >= 0
        ]
        if not pairs:
            continue
        arr = np.asarray(pairs, np.int64)
        uniq, counts = np.unique(arr, axis=0, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        seen = {}
        for q, t in uniq[order]:
            if q not in seen:
                seen[int(q)] = int(t)
        items = list(seen.items())[:n_pairs]
        for j, (q, t) in enumerate(items):
            out_q[b, j] = q
            out_t[b, j] = t
            out_v[b, j] = True
    return out_q, out_t, out_v


def go_union(
    assignments: jax.Array, valid: jax.Array, n_pairs: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Stacked per-level assignments (L, B, K) -> padded GO pair arrays
    ((B, G) query idx, (B, G) target idx, (B, G) valid), G = n_pairs."""
    B = valid.shape[0]
    return jax.pure_callback(
        lambda a, v: _go_union_host(
            np.asarray(a), np.asarray(v), n_pairs
        ),
        (
            jax.ShapeDtypeStruct((B, n_pairs), jnp.int32),
            jax.ShapeDtypeStruct((B, n_pairs), jnp.int32),
            jax.ShapeDtypeStruct((B, n_pairs), bool),
        ),
        assignments,
        valid,
        vmap_method="sequential",
    )


def go_union_device(
    assignments: jax.Array, valid: jax.Array, n_pairs: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Device-native GO union (no host callback): for each query keep its
    most frequent target across levels. Equivalent to the reference's
    count-sorted dedup except tie-breaking order; used where callbacks are
    unavailable (the axon relay) via LIGHTLY_TRAIN_MATCHER=greedy."""
    L, B, K = assignments.shape
    ok = (assignments >= 0) & valid[None]
    Q = n_pairs
    # counts[b, q, k] = how many levels matched query q to target k
    q_idx = jnp.clip(assignments, 0, Q - 1)
    onehot = jax.nn.one_hot(q_idx, Q, axis=-1) * ok[..., None]
    counts = jnp.sum(onehot, axis=0).transpose(0, 2, 1)  # (B, Q, K)
    best_t = jnp.argmax(counts, axis=-1).astype(jnp.int32)  # (B, Q)
    has = jnp.max(counts, axis=-1) > 0
    go_q = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (B, Q))
    return go_q, jnp.where(has, best_t, 0), has


def dfine_fgl_ddf_loss(
    dist: jax.Array,  # (B, Q, 4, nb) corner logits for THIS level
    anchor: jax.Array,  # (B, Q, 4) cxcywh fixed refinement anchor
    pred_boxes: jax.Array,  # (B, Q, 4) this level's decoded boxes
    teacher_dist,  # (B, Q, 4, nb) final-layer corner logits or None
    teacher_logits,  # (B, Q, C+1) final-layer class logits or None
    tgt_boxes: jax.Array,  # (B, K, 4) cxcywh
    go_q: jax.Array,  # (B, G) GO query indices
    go_t: jax.Array,  # (B, G) GO target indices
    go_valid: jax.Array,  # (B, G)
    num_boxes_go: jax.Array,
    *,
    reg_scale: float = 4.0,
    up: float = 0.5,
    T: float = 5.0,
    is_final: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Reference ``loss_local`` (``dfine_criterion.py:178-285``): FGL
    (unimodal distribution focal loss at the exact W(n)-bin targets,
    IoU-weighted per edge, summed / num_boxes_go) + DDF (KL distillation of
    aux-layer corner distributions from the final layer, matched queries
    weighted by IoU, unmatched by the teacher's max class prob)."""
    from lightly_train_tpu.tasks.detection.dfine_utils import bbox2distance

    B, Q, _, nb = dist.shape
    reg_max = nb - 1
    g = go_valid.astype(jnp.float32)

    d_go = jnp.take_along_axis(
        dist, go_q[:, :, None, None].repeat(4, 2).repeat(nb, 3), axis=1
    )  # (B, G, 4, nb)
    anchor_go = jnp.take_along_axis(anchor, go_q[..., None], axis=1)
    pred_go = jnp.take_along_axis(pred_boxes, go_q[..., None], axis=1)
    tgt_go = jnp.take_along_axis(tgt_boxes, go_t[..., None], axis=1)

    idx, w_r, w_l = bbox2distance(
        anchor_go, cxcywh_to_xyxy(tgt_go), reg_max, reg_scale, up
    )  # (B, G, 4) each
    left = idx.astype(jnp.int32)
    right = jnp.clip(left + 1, 0, reg_max)
    logp = jax.nn.log_softmax(d_go.astype(jnp.float32), axis=-1)
    ce_l = -jnp.take_along_axis(logp, left[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, right[..., None], axis=-1)[..., 0]
    dfl = ce_l * w_l + ce_r * w_r  # (B, G, 4)
    iou = jax.lax.stop_gradient(
        paired_box_iou(cxcywh_to_xyxy(pred_go), cxcywh_to_xyxy(tgt_go))
    )  # (B, G)
    loss_fgl = jnp.sum(dfl * (iou * g)[..., None]) / num_boxes_go

    if teacher_dist is None or is_final:
        # the reference's torch.equal(pred, teacher) short-circuit
        return loss_fgl, jnp.zeros((), jnp.float32)

    # ---- DDF ----
    t_logp = jax.nn.log_softmax(
        jax.lax.stop_gradient(teacher_dist).astype(jnp.float32) / T, axis=-1
    )
    s_logp = jax.nn.log_softmax(dist.astype(jnp.float32) / T, axis=-1)
    kl = jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp), axis=-1)  # (B, Q, 4)
    # weights: matched queries -> IoU, unmatched -> teacher max class prob
    w_local = jnp.max(
        jax.nn.sigmoid(jax.lax.stop_gradient(teacher_logits)), axis=-1
    )  # (B, Q)
    mask = jnp.zeros((B, Q), bool)
    b_idx = jnp.arange(B)[:, None].repeat(go_q.shape[1], 1)
    mask = mask.at[b_idx, jnp.where(go_valid, go_q, Q)].set(
        True, mode="drop"
    )
    w_local = w_local.at[b_idx, jnp.where(go_valid, go_q, Q)].set(
        jnp.where(go_valid, iou, 0.0), mode="drop"
    )
    kl_w = kl * (T ** 2) * w_local[..., None]  # (B, Q, 4)
    m4 = mask[..., None].repeat(4, -1).astype(jnp.float32)
    batch_scale = 8.0 / B
    num_pos = jnp.sqrt(jnp.sum(m4) * batch_scale)
    num_neg = jnp.sqrt(jnp.sum(1.0 - m4) * batch_scale)
    pos_mean = jnp.sum(kl_w * m4) / jnp.maximum(jnp.sum(m4), 1.0)
    neg_mean = jnp.sum(kl_w * (1.0 - m4)) / jnp.maximum(
        jnp.sum(1.0 - m4), 1.0
    )
    loss_ddf = (pos_mean * num_pos + neg_mean * num_neg) / jnp.maximum(
        num_pos + num_neg, 1e-9
    )
    return loss_fgl, loss_ddf


def box_losses_on_pairs(
    boxes: jax.Array,  # (B, Q, 4) cxcywh predictions
    tgt_boxes: jax.Array,  # (B, K, 4)
    q_idx: jax.Array,  # (B, G)
    t_idx: jax.Array,  # (B, G)
    pair_valid: jax.Array,  # (B, G)
    num: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """L1 + GIoU on explicit (query, target) pairs (the GO set for decoder
    levels, ``dfine_criterion.py:152-176`` with go indices)."""
    pred = jnp.take_along_axis(boxes, q_idx[..., None], axis=1)
    tgt = jnp.take_along_axis(tgt_boxes, t_idx[..., None], axis=1)
    v = pair_valid.astype(jnp.float32)
    l1 = jnp.sum(jnp.abs(pred - tgt), axis=-1)
    giou = paired_generalized_box_iou(
        cxcywh_to_xyxy(pred), cxcywh_to_xyxy(tgt)
    )
    return jnp.sum(l1 * v) / num, jnp.sum((1.0 - giou) * v) / num


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

    # Build per-query target score map (B, Q, C): IoU at matched (q, class),
    # and the matched one-hot (the focal-weight mask uses the ONE-HOT, not
    # iou > 0 — a zero-IoU match still counts as positive,
    # ``dfine_criterion.py:136-142``).
    target_scores = jnp.zeros((B, Q, C), jnp.float32)
    onehot = jnp.zeros((B, Q, C), jnp.float32)
    b_idx = jnp.arange(B)[:, None].repeat(tgt_labels.shape[1], 1)
    scatter = (
        b_idx,
        jnp.where(assigned, safe_q, Q),
        jnp.where(assigned, tgt_labels, 0),
    )
    target_scores = target_scores.at[scatter].max(
        jnp.where(assigned, pair_iou, 0.0), mode="drop"
    )
    onehot = onehot.at[scatter].max(
        assigned.astype(jnp.float32), mode="drop"
    )
    # The focal weight is a CONSTANT w.r.t. the logits — the reference
    # detaches pred_score (``dfine_criterion.py:143-144``) so no gradient
    # flows through the weight, only through the BCE term.
    prob = jax.lax.stop_gradient(jax.nn.sigmoid(logits[..., :C]))
    weight = alpha * (prob**gamma) * (1 - onehot) + target_scores
    # Exact logits-space BCE (torch ``binary_cross_entropy_with_logits``):
    # max(x,0) - x*t + log1p(exp(-|x|)), no epsilon bias.
    x = logits[..., :C]
    bce = (
        jnp.maximum(x, 0.0)
        - x * target_scores
        + jnp.log1p(jnp.exp(-jnp.abs(x)))
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
    ddf_weight: float = 1.5,
    reg_scale: float = 4.0,
    up: float = 0.5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """D-FINE criterion over all levels (reference ``DFINECriterion.forward``,
    ``dfine_criterion.py:343-541``).

    ``outputs``: [(logits, boxes)] per level — encoder level, pre level
    (D-FINE layer-0 traditional head), decoder layers. Per-level Hungarian
    matchings drive the VFL loss (normalized by the global target count);
    the box L1+GIoU and the local (FGL + DDF) losses use the GO-union
    matching across ALL levels (``_get_go_indices``), normalized by the GO
    pair count. Levels are SUMMED (the reference's loss_total).

    ``dists``: per-level ``(corner_logits (B,Q,4,nb), anchor (B,Q,4))`` or
    None for levels without distributions (encoder/pre); the LAST non-None
    entry is the DDF teacher.
    """
    import os

    if weights is None:
        weights = {"loss_vfl": 1.0, "loss_l1": 5.0, "loss_giou": 2.0}
    B, K = tgt_valid.shape
    Q = outputs[0][0].shape[1]
    # The reference sanitizes predicted boxes (clamp to [0, 1]) before every
    # cost/L1/IoU computation (``box_ops.sanitize_boxes_cxcywh_normalized``);
    # the clamp participates in the gradient exactly like torch's.
    outputs = [
        (logits, jnp.clip(boxes, 0.0, 1.0)) for logits, boxes in outputs
    ]
    assignments = []
    for logits, boxes in outputs:
        cost = detection_matching_cost(logits, boxes, tgt_labels, tgt_boxes)
        assignments.append(
            hungarian_match(jax.lax.stop_gradient(cost), tgt_valid)
        )
    # GO union across levels (host exact; device-native fallback where
    # callbacks are unavailable, same dispatch rule as the matcher).
    stack = jnp.stack(assignments)
    n_pairs = min(Q, len(outputs) * K)
    choice = os.environ.get("LIGHTLY_TRAIN_MATCHER", "auto")
    # Same auto rule as the matcher (eomt_semantic_segmentation.py
    # hungarian_match): device-native on TPU / multi-device CPU, host
    # exact on the single-device CPU parity platform.
    use_device = choice == "greedy" or (
        choice == "auto"
        and (
            jax.devices()[0].platform != "cpu"
            or jax.device_count() > 1
        )
    )
    if use_device:
        go_q, go_t, go_valid = go_union_device(stack, tgt_valid, n_pairs)
    else:
        go_q, go_t, go_valid = go_union(stack, tgt_valid, n_pairs)

    num_boxes = jnp.maximum(jnp.sum(tgt_valid), 1.0)
    num_go = jnp.maximum(jnp.sum(go_valid), 1.0)
    teacher = None
    if dists is not None:
        for d in reversed(dists):
            if d is not None:
                teacher = d
                break

    total = 0.0
    metrics: Dict[str, jax.Array] = {}
    for li, (logits, boxes) in enumerate(outputs):
        losses = detection_loss_from_assignment(
            logits, boxes, tgt_labels, tgt_boxes, assignments[li]
        )
        loss_l1, loss_giou = box_losses_on_pairs(
            boxes, tgt_boxes, go_q, go_t, go_valid, num_go
        )
        losses["loss_l1"], losses["loss_giou"] = loss_l1, loss_giou
        level_total = sum(weights[k] * v for k, v in losses.items())
        if dists is not None and li < len(dists) and dists[li] is not None:
            dist_logits, anchor = dists[li]
            fgl, ddf = dfine_fgl_ddf_loss(
                dist_logits, anchor, boxes,
                teacher[0] if teacher is not None else None,
                outputs[-1][0],
                tgt_boxes, go_q, go_t, go_valid, num_go,
                reg_scale=reg_scale, up=up,
                is_final=(li == len(outputs) - 1),
            )
            level_total = level_total + fgl_weight * fgl + ddf_weight * ddf
            losses = {**losses, "loss_fgl": fgl, "loss_ddf": ddf}
        total = total + level_total
        if li == len(outputs) - 1:
            metrics.update({k: v for k, v in losses.items()})
    return total, metrics
