"""Shared typed structures for datasets, transforms, and batches.

Rebuild of ``src/lightly_train/types.py:28-244``. In the TPU-native design a
batch is a pytree of numpy/JAX arrays with *static shapes*: multi-crop views are
stacked per-resolution ((B, Hg, Wg, 3) global views and (B, Hl, Wl, 3) local
views) rather than ragged lists, so one jitted step handles the whole method.
Images are channels-last (NHWC) — the natural TPU layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, List, Mapping, TypedDict, Union

import numpy as np

PathLike = Union[str, Path]

# A pytree of arrays (numpy on host, jax.Array on device).
ArrayTree = Any


class DatasetItem(TypedDict, total=False):
    """One dataset item after decode, before device-side augmentation."""

    filename: str
    # Decoded image, uint8 HWC (canonical host size).
    image: np.ndarray
    # Optional dense label/mask, int32 HW.
    mask: np.ndarray
    # Optional class label.
    label: int


class RawBatch(TypedDict, total=False):
    """Host-collated batch fed to the device augmentation stage."""

    filenames: List[str]
    # uint8 (B, H, W, 3) canonical decode size.
    images: np.ndarray
    masks: np.ndarray
    labels: np.ndarray


class ViewsBatch(TypedDict, total=False):
    """Device-side multi-crop output of the augmentation stage.

    ``global_views``: (G, B, Hg, Wg, 3) float32/bf16 normalized.
    ``local_views``:  (L, B, Hl, Wl, 3) or absent when the method uses 1-2 views.
    """

    global_views: Any
    local_views: Any
    labels: Any


TaskBatch = Mapping[str, Any]
