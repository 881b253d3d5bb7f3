"""D-FINE distribution parameterization (exact reference math).

Rebuild of ``object_detection_components/dfine_utils.py`` + the decoder's
``Integral`` (``dfine_decoder.py:345-366``): the non-uniform Weighting
Function W(n), the Integral expectation, the anchor->box decode
(``distance2bbox``) and its inverse (``bbox2distance`` + ``translate_gt``)
used by the FGL loss. ``up`` (0.5) and ``reg_scale`` (4.0) are non-trainable
constants in the reference (``dfine_decoder.py:671``), so W(n) is a static
numpy table here — no tracing cost.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def weighting_function(
    reg_max: int, up: float = 0.5, reg_scale: float = 4.0
) -> np.ndarray:
    """W(n): reg_max+1 non-uniform bin values (``dfine_utils.py:28-63``)."""
    u1 = abs(up) * abs(reg_scale)
    u2 = u1 * 2
    step = (u1 + 1) ** (2 / (reg_max - 2))
    left = [-(step ** i) + 1 for i in range(reg_max // 2 - 1, 0, -1)]
    right = [step ** i - 1 for i in range(1, reg_max // 2)]
    return np.asarray([-u2] + left + [0.0] + right + [u2], np.float32)


def integral(corners: jax.Array, project: np.ndarray) -> jax.Array:
    """sum{Pr(n) * W(n)} per edge: (..., 4, reg_max+1) -> (..., 4)."""
    prob = jax.nn.softmax(corners.astype(jnp.float32), axis=-1)
    return jnp.einsum("...n,n->...", prob, jnp.asarray(project))


def distance2bbox(
    points: jax.Array, distance: jax.Array, reg_scale: float = 4.0
) -> jax.Array:
    """Anchor (cxcywh) + per-edge distances -> refined cxcywh box
    (``dfine_utils.py:125-142``)."""
    rs = abs(reg_scale)
    x1 = points[..., 0] - (0.5 * rs + distance[..., 0]) * (points[..., 2] / rs)
    y1 = points[..., 1] - (0.5 * rs + distance[..., 1]) * (points[..., 3] / rs)
    x2 = points[..., 0] + (0.5 * rs + distance[..., 2]) * (points[..., 2] / rs)
    y2 = points[..., 1] + (0.5 * rs + distance[..., 3]) * (points[..., 3] / rs)
    return jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def bbox2distance(
    points: jax.Array,  # (..., 4) cxcywh anchors
    bbox_xyxy: jax.Array,  # (..., 4) target boxes
    reg_max: int,
    reg_scale: float = 4.0,
    up: float = 0.5,
    eps: float = 0.1,
):
    """Targets for the FGL loss: continuous edge distances -> (left-bin
    index, weight_right, weight_left), exact ``bbox2distance`` +
    ``translate_gt`` (``dfine_utils.py:66-122, 145-190``)."""
    rs = abs(reg_scale)
    wx = points[..., 2] / rs + 1e-16
    wy = points[..., 3] / rs + 1e-16
    left = (points[..., 0] - bbox_xyxy[..., 0]) / wx - 0.5 * rs
    top = (points[..., 1] - bbox_xyxy[..., 1]) / wy - 0.5 * rs
    right = (bbox_xyxy[..., 2] - points[..., 0]) / wx - 0.5 * rs
    bottom = (bbox_xyxy[..., 3] - points[..., 1]) / wy - 0.5 * rs
    gt = jnp.stack([left, top, right, bottom], axis=-1)

    fv = jnp.asarray(weighting_function(reg_max, up, reg_scale))
    # closest left bin: number of W values <= gt, minus 1
    idx = jnp.sum(fv[None, :] <= gt[..., None], axis=-1) - 1
    valid = (idx >= 0) & (idx < reg_max)
    safe = jnp.clip(idx, 0, reg_max - 1)
    lv = fv[safe]
    rv = fv[safe + 1]
    ld = jnp.abs(gt - lv)
    rd = jnp.abs(rv - gt)
    w_right = jnp.where(valid, ld / jnp.maximum(ld + rd, 1e-12), 0.0)
    w_right = jnp.where(idx >= reg_max, 1.0, w_right)
    w_left = 1.0 - w_right
    out_idx = jnp.where(
        idx < 0, 0.0, jnp.where(idx >= reg_max, reg_max - 0.1, idx)
    ).astype(jnp.float32)
    out_idx = jnp.clip(out_idx, 0.0, reg_max - eps)
    return out_idx, w_right, w_left
