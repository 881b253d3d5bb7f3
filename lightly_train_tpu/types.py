"""Shared typed structures for datasets, transforms, and batches.

Rebuild of ``src/lightly_train/types.py:28-244``. In the TPU-native design a
batch is a pytree of numpy/JAX arrays with *static shapes*: multi-crop views are
stacked per-resolution ((B, Hg, Wg, 3) global views and (B, Hl, Wl, 3) local
views) rather than ragged lists, so one jitted step handles the whole method.
Images are channels-last (NHWC) — the natural TPU layout.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Any, List, Mapping, TypedDict, Union

import numpy as np

from lightly_train_tpu._configs.config import PydanticConfig

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


class EmbeddingFormat(str, Enum):
    """Output formats of the ``embed`` command (reference
    ``_embedding/embedding_format.py``; ``npz`` replaces the torch tensor
    file as the native array format here, ``torch`` stays for compat)."""

    CSV = "csv"
    LIGHTLY_CSV = "lightly_csv"
    NPZ = "npz"
    TORCH = "torch"


class ModelFormat(str, Enum):
    """Formats of the ``export`` command (reference
    ``_commands/common_helpers.py`` ModelFormat; ``numpy_state_dict``
    replaces torch_model — there is no pickled-module artifact in a
    functional framework)."""

    PACKAGE_DEFAULT = "package_default"
    NUMPY_STATE_DICT = "numpy_state_dict"
    TORCH_STATE_DICT = "torch_state_dict"


class ModelPart(str, Enum):
    """Which part of a pretrain artifact ``export`` writes (reference
    ``_commands/export.py`` ModelPart): the bare backbone, or the backbone
    plus the ``embed_dim`` projection head."""

    MODEL = "model"
    EMBEDDING_MODEL = "embedding_model"


class DescriptiveStatistics(PydanticConfig):
    """Summary statistics of a measurement series in ms (reference
    ``_commands/benchmark_types.py:67-74``, plus p90)."""

    min: float
    max: float
    mean: float
    median: float
    std: float
    p90: float

    @classmethod
    def from_times(cls, times: List[float]) -> "DescriptiveStatistics":
        import statistics

        return cls(
            min=min(times),
            max=max(times),
            mean=statistics.mean(times),
            median=statistics.median(times),
            std=statistics.stdev(times) if len(times) > 1 else 0.0,
            p90=sorted(times)[min(int(0.9 * len(times)), len(times) - 1)],
        )


class BenchmarkStatistics(PydanticConfig):
    """Latency/throughput statistics of one benchmark run (reference
    ``benchmark_types.py:77-83``)."""

    latency_ms: DescriptiveStatistics
    throughput_img_s: float


class BenchmarkResult(PydanticConfig):
    """Typed view over ``benchmark_object_detection``'s result dict
    (reference ``benchmark_types.py:94-108``): build one with
    ``BenchmarkResult.from_dict(lt.benchmark_object_detection(...))``."""

    backend: str
    device: str = ""
    image_size: int
    statistics: BenchmarkStatistics
    metric_values: Mapping[str, float] = {}

    @classmethod
    def from_dict(cls, result: Mapping[str, Any]) -> "BenchmarkResult":
        lat = dict(result["latency_ms"])
        lat.setdefault("std", 0.0)
        lat.setdefault("p90", lat["max"])
        stats = BenchmarkStatistics(
            latency_ms=DescriptiveStatistics(**lat),
            throughput_img_s=1000.0 / lat["mean"] if lat["mean"] else 0.0,
        )
        metrics = {k: float(v) for k, v in result.items()
                   if isinstance(v, (int, float)) and k != "image_size"}
        return cls(
            backend=str(result["backend"]),
            device=str(result.get("device", "")),
            image_size=int(result["image_size"]),
            statistics=stats,
            metric_values=metrics,
        )
