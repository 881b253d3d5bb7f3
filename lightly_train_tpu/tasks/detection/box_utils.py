"""Box utilities: format conversion, IoU, GIoU.

Rebuild of the reference box math used by the DETR criterion/matcher
(``src/lightly_train/_task_models/object_detection_components/``). Boxes are
normalized cxcywh in models and xyxy for IoU computations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jax.Array) -> jax.Array:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU. a: (..., N, 4), b: (..., M, 4) xyxy -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = (
        box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    )
    return inter / jnp.maximum(union, 1e-9)


def paired_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise IoU of aligned pairs. a, b: (..., 4) xyxy -> (...)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / jnp.maximum(union, 1e-9)


def paired_generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise GIoU of aligned pairs (xyxy): the matched-pair loss needs
    only the diagonal, not the (K, K) pairwise matrix."""
    iou = paired_box_iou(a, b)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(a[..., :2], b[..., :2])
    inter_rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise GIoU (xyxy)."""
    iou = box_iou(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    inter_rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)
