"""Static-shape tiled inference over high-resolution images.

Rebuild of the reference's val-time tiling/untiling for EoMT semantic
segmentation (``src/lightly_train/_task_models/dinov3_eomt_semantic_segmentation/
train_model.py:358-420`` + ``task_model.py:511-583``): large images are
split into a static grid of overlapping tiles at the model's training
resolution, each tile runs the normal forward, and per-pixel logits are
averaged back onto the full canvas. On TPU the tile grid is static per
input shape, so one compiled program serves every image of that size and
each tile forward hits the MXU at the trained sequence length.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp


def tile_grid(extent: int, tile: int, stride: int) -> List[int]:
    """Tile start offsets covering [0, extent) with a final flush tile."""
    if extent <= tile:
        return [0]
    ys = list(range(0, extent - tile + 1, stride))
    if ys[-1] + tile < extent:
        ys.append(extent - tile)
    return ys


def tiled_logits(
    logits_fn: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    num_out: int,
    tile_size: int,
    stride: Optional[int] = None,
) -> jax.Array:
    """Average ``logits_fn`` outputs over an overlapping static tile grid.

    ``logits_fn`` maps a (B, t, t, C) tile to (B, t, t, num_out) logits.
    Overlap defaults to 1/3 tile (the reference's eval stride).
    """
    B, H, W, _ = images.shape
    if H <= tile_size and W <= tile_size:
        return logits_fn(images)
    stride = stride or (tile_size * 2 // 3)
    logits_sum = jnp.zeros((B, H, W, num_out), jnp.float32)
    counts = jnp.zeros((B, H, W, 1), jnp.float32)
    for y in tile_grid(H, tile_size, stride):
        for x in tile_grid(W, tile_size, stride):
            tile = jax.lax.dynamic_slice(
                images, (0, y, x, 0),
                (B, min(tile_size, H), min(tile_size, W), images.shape[3]),
            )
            tl = logits_fn(tile).astype(jnp.float32)
            logits_sum = jax.lax.dynamic_update_slice(
                logits_sum,
                jax.lax.dynamic_slice(
                    logits_sum, (0, y, x, 0), tl.shape
                ) + tl,
                (0, y, x, 0),
            )
            counts = jax.lax.dynamic_update_slice(
                counts,
                jax.lax.dynamic_slice(
                    counts, (0, y, x, 0), tl.shape[:3] + (1,)
                ) + 1.0,
                (0, y, x, 0),
            )
    return logits_sum / jnp.maximum(counts, 1.0)


def n_tiles(hw: tuple, tile_size: int, stride: Optional[int] = None) -> int:
    H, W = hw
    if H <= tile_size and W <= tile_size:
        return 1
    stride = stride or (tile_size * 2 // 3)
    return len(tile_grid(H, tile_size, stride)) * len(
        tile_grid(W, tile_size, stride)
    )
