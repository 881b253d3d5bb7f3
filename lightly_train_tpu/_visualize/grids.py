"""Visualization grids: augmented views and prediction previews.

Rebuild of ``src/lightly_train/_visualize/`` + ``_plot.py``: a grid PNG of
the first batch's augmented multi-crop views is written at step 0 of
pretraining (``method.py:169-191``), and task runs can write label /
prediction grids for the first validation batches.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD


def denormalize(images: np.ndarray) -> np.ndarray:
    """Normalized float (B, H, W, 3) -> uint8."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    out = (images.astype(np.float32) * std + mean) * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


def image_grid(
    images: np.ndarray, cols: int = 8, pad: int = 2
) -> np.ndarray:
    """(N, H, W, 3) uint8 -> one grid image."""
    n, h, w, c = images.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    grid = np.zeros(
        (rows * (h + pad) - pad, cols * (w + pad) - pad, c), np.uint8
    )
    for i in range(n):
        r, cl = divmod(i, cols)
        grid[r * (h + pad) : r * (h + pad) + h,
             cl * (w + pad) : cl * (w + pad) + w] = images[i]
    return grid


def save_augmentation_grid(
    views: Sequence[np.ndarray], out_path: Path, max_images: int = 8
) -> Optional[Path]:
    """One row per view of the first ``max_images`` samples (normalized in)."""
    from PIL import Image

    if not views:
        return None
    rows: List[np.ndarray] = []
    target_hw = views[0].shape[1:3]
    for v in views:
        imgs = denormalize(np.asarray(v[:max_images], np.float32))
        if imgs.shape[1:3] != target_hw:
            imgs = np.stack(
                [
                    np.asarray(
                        Image.fromarray(im).resize(
                            (target_hw[1], target_hw[0]), Image.NEAREST
                        )
                    )
                    for im in imgs
                ]
            )
        rows.append(image_grid(imgs, cols=max_images))
    width = max(r.shape[1] for r in rows)
    padded = [
        np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0))) for r in rows
    ]
    grid = np.concatenate(padded, axis=0)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(out_path)
    return out_path


def colorize_mask(mask: np.ndarray, num_classes: int) -> np.ndarray:
    """(H, W) int mask -> RGB with a deterministic palette."""
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 255, (max(num_classes, 1), 3), dtype=np.uint8)
    out = palette[np.clip(mask, 0, num_classes - 1)]
    out[mask >= num_classes] = 0
    return out
