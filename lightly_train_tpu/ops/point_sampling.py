"""Point sampling for Mask2Former-style losses (PointRend sampling).

TPU-native rebuild of the reference's point-sampled mask loss
(``src/lightly_train/_task_models/dinov3_eomt_semantic_segmentation/mask_loss.py:28-54``,
which delegates to HF ``Mask2FormerLoss.sample_points_using_uncertainty``):
instead of computing CE+dice over full-resolution masks (O(Q*H*W) per deep-
supervision layer), losses are evaluated at ``num_points`` sampled coordinates
— importance-sampled where the prediction is uncertain plus a uniform floor.
Everything here is static-shape: fixed point budgets, fixed top-k, gathers
instead of ragged index_select.

Coordinates are normalized to [0, 1] with the torch ``grid_sample``
``align_corners=False`` convention (pixel centers at (i + 0.5)/size) and
zero padding outside the grid.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _uniform(key: jax.Array, shape) -> jax.Array:
    """Uniform [0, 1) draw — single seam for every point-sampling and
    attention-annealing random draw in the EoMT stack. Trajectory-parity
    harnesses patch this to inject the exact same uniforms into the torch
    reference and the rebuild (the code path is identical either way)."""
    return jax.random.uniform(key, shape)


def bilinear_point_sample(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``grid`` (B, C, gh, gw) at ``coords`` (B, P, 2) [(y, x) in [0,1]].

    Returns (B, C, P). Bilinear, align_corners=False, zero padding — matching
    torch ``point_sample`` (``grid_sample``) used by the reference loss.
    """
    B, C, gh, gw = grid.shape
    flat = grid.reshape(B, C, gh * gw)
    y = coords[..., 0] * gh - 0.5  # (B, P)
    x = coords[..., 1] * gw - 0.5
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0
    out = jnp.zeros((B, C) + y.shape[1:], dtype=grid.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            w = (wy1 if dy else 1.0 - wy1) * (wx1 if dx else 1.0 - wx1)
            inb = (yi >= 0) & (yi < gh) & (xi >= 0) & (xi < gw)
            yc = jnp.clip(yi, 0, gh - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, gw - 1).astype(jnp.int32)
            lin = yc * gw + xc  # (B, P)
            g = jnp.take_along_axis(flat, lin[:, None, :], axis=2)  # (B, C, P)
            out = out + g * (w * inb)[:, None, :].astype(grid.dtype)
    return out


def sample_id_indicator(
    id_map: jax.Array, coords: jax.Array, num_slots: int
) -> jax.Array:
    """Bilinearly sample the one-hot indicator of an integer id map.

    id_map: (B, H, W) int32 slot/class ids (ids outside [0, num_slots) are
    background); coords: (B, P, 2) shared across slots. Returns (B, K, P)
    float32 — equivalent to bilinear sampling of each slot's binary mask
    without materializing (B, K, H, W) one-hot targets.
    """
    B, H, W = id_map.shape
    flat = id_map.reshape(B, H * W)
    y = coords[..., 0] * H - 0.5
    x = coords[..., 1] * W - 0.5
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0
    out = jnp.zeros((B, coords.shape[1], num_slots), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            w = (wy1 if dy else 1.0 - wy1) * (wx1 if dx else 1.0 - wx1)
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            ids = jnp.take_along_axis(flat, yc * W + xc, axis=1)  # (B, P)
            onehot = jax.nn.one_hot(ids, num_slots, dtype=jnp.float32)
            out = out + onehot * (w * inb)[..., None]
    return out.transpose(0, 2, 1)  # (B, K, P)


def sample_slot_indicator(
    id_map: jax.Array, coords: jax.Array, slot_ids: jax.Array
) -> jax.Array:
    """Per-slot target sampling at per-slot coordinates.

    id_map: (B, H, W) int; coords: (B, S, P, 2); slot_ids: (S,) the id each
    slot row matches. Returns (B, S, P) float32 bilinear indicator samples.
    """
    B, H, W = id_map.shape
    S, P = coords.shape[1], coords.shape[2]
    flat = id_map.reshape(B, H * W)
    y = coords[..., 0] * H - 0.5  # (B, S, P)
    x = coords[..., 1] * W - 0.5
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0
    out = jnp.zeros((B, S, P), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            w = (wy1 if dy else 1.0 - wy1) * (wx1 if dx else 1.0 - wx1)
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            lin = (yc * W + xc).reshape(B, S * P)
            ids = jnp.take_along_axis(flat, lin, axis=1).reshape(B, S, P)
            hit = (ids == slot_ids[None, :, None]).astype(jnp.float32)
            out = out + hit * (w * inb).astype(jnp.float32)
    return out


def uncertainty_point_coords(
    rng: jax.Array,
    pred_grid: jax.Array,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jax.Array:
    """Importance + uniform point coordinates per mask.

    pred_grid: (M, gh, gw) mask logits (one row per mask). Rebuild of HF
    ``sample_points_using_uncertainty``: draw ``num_points*oversample_ratio``
    uniform candidates, keep the ``importance_sample_ratio`` fraction with the
    highest uncertainty (-|logit|), fill the rest with fresh uniform points.
    Returns (M, num_points, 2).
    """
    M, gh, gw = pred_grid.shape
    n_over = int(num_points * oversample_ratio)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    k_over, k_rand = jax.random.split(rng)
    coords_o = _uniform(k_over, (M, n_over, 2))
    if n_unc > 0:
        logits_o = bilinear_point_sample(
            pred_grid[:, None, :, :], coords_o
        )[:, 0, :]  # (M, n_over)
        uncertainty = -jnp.abs(logits_o.astype(jnp.float32))
        _, top_idx = jax.lax.top_k(uncertainty, n_unc)
        coords_unc = jnp.take_along_axis(
            coords_o, top_idx[..., None], axis=1
        )
    else:
        coords_unc = coords_o[:, :0]
    if n_rand > 0:
        coords_r = _uniform(k_rand, (M, n_rand, 2))
        return jnp.concatenate([coords_unc, coords_r], axis=1)
    return coords_unc
