"""On-device iBOT block-mask generation with a fixed budget.

Rebuild of the reference ``MaskingGenerator`` (``src/lightly_train/_methods/
dinov2/utils.py:41``): for each image chosen for masking, a target fraction of
patch tokens is covered by random rectangular blocks. The reference runs a
data-dependent rejection loop on CPU; here masks are built on device from a
fixed number of random rectangles (static shapes, stateless RNG), and the loss
normalizes per-sample via ``mask_weight`` so the variable achieved ratio has
the same expectation.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def random_block_masks(
    key: jax.Array,
    batch: int,
    grid_hw: Tuple[int, int],
    mask_prob: float = 0.5,
    mask_ratio: Tuple[float, float] = (0.1, 0.5),
    num_blocks: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Generate block masks over a (gh, gw) patch grid.

    Returns:
      mask: (B, gh*gw) bool — True at masked token positions.
      mask_weight: (B, gh*gw) float32 — 1/num_masked at masked positions, 0
      elsewhere (the reference's ``masks_weight``, ``dinov2_loss.py:246-268``).

    Each selected image gets ``num_blocks`` random rectangles whose total area
    targets a ratio drawn uniformly from ``mask_ratio``; rectangles use
    log-uniform aspect in [0.3, 1/0.3] like the reference generator.
    """
    gh, gw = grid_hw
    n_tokens = gh * gw
    k_sel, k_ratio, k_aspect, k_pos = jax.random.split(key, 4)
    selected = jax.random.uniform(k_sel, (batch,)) < mask_prob  # (B,)
    ratio = jax.random.uniform(
        k_ratio, (batch,), minval=mask_ratio[0], maxval=mask_ratio[1]
    )
    # Per-block target area in tokens.
    block_area = ratio * n_tokens / num_blocks  # (B,)
    log_aspect = jax.random.uniform(
        k_aspect,
        (batch, num_blocks),
        minval=math.log(0.3),
        maxval=math.log(1.0 / 0.3),
    )
    aspect = jnp.exp(log_aspect)  # h/w ratio per block
    bh = jnp.sqrt(block_area[:, None] * aspect)
    bw = jnp.sqrt(block_area[:, None] / aspect)
    bh = jnp.clip(jnp.round(bh), 1, gh).astype(jnp.int32)
    bw = jnp.clip(jnp.round(bw), 1, gw).astype(jnp.int32)
    pos = jax.random.uniform(k_pos, (batch, num_blocks, 2))
    y0 = (pos[..., 0] * (gh - bh + 1).astype(jnp.float32)).astype(jnp.int32)
    x0 = (pos[..., 1] * (gw - bw + 1).astype(jnp.float32)).astype(jnp.int32)

    rows = jnp.arange(gh)[None, None, :]  # (1, 1, gh)
    cols = jnp.arange(gw)[None, None, :]  # (1, 1, gw)
    in_y = (rows >= y0[..., None]) & (rows < (y0 + bh)[..., None])  # (B, nb, gh)
    in_x = (cols >= x0[..., None]) & (cols < (x0 + bw)[..., None])  # (B, nb, gw)
    blocks = in_y[:, :, :, None] & in_x[:, :, None, :]  # (B, nb, gh, gw)
    mask2d = jnp.any(blocks, axis=1)  # (B, gh, gw)
    mask = mask2d.reshape(batch, n_tokens) & selected[:, None]
    n_masked = jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)
    mask_weight = mask.astype(jnp.float32) / jnp.maximum(n_masked, 1.0)
    return mask, mask_weight
