"""ctypes binding for the native (C++) pre/post-processing library.

TPU-native analog of the reference's C++ inference utilities
(``examples/cpp/common/detection_utils.hpp``): the shared library under
``native/`` implements preprocessing (bilinear resize + normalize to CHW
fp32) and detection / semantic postprocessing with numerics matching the
Python/JAX processors. Built on demand with ``make`` (g++); all entry
points have pure-numpy fallbacks so the Python API never hard-depends on
the toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from lightly_train_tpu._logging import get_logger
from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD

logger = get_logger("native")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "liblt_native.so"
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lt_preprocess_image.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ]
        lib.lt_postprocess_detections.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p, f32p, i32p,
        ]
        lib.lt_postprocess_detections.restype = ctypes.c_int
        lib.lt_postprocess_semantic.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p,
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.warning("Native library unavailable (%s); using numpy.", e)
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def preprocess_image(
    image: np.ndarray,
    out_hw: Tuple[int, int],
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> np.ndarray:
    """uint8 (H, W, C) -> normalized fp32 (C, oh, ow)."""
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    oh, ow = out_hw
    lib = _load()
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    if lib is not None:
        out = np.empty((c, oh, ow), np.float32)
        lib.lt_preprocess_image(
            image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c, oh, ow,
            mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    # numpy fallback (same half-pixel bilinear math)
    sy = (np.arange(oh) + 0.5) * h / oh - 0.5
    sx = (np.arange(ow) + 0.5) * w / ow - 0.5
    sy = np.clip(sy, 0, h - 1)
    sx = np.clip(sx, 0, w - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[:, None, None]
    wx = (sx - x0)[None, :, None]
    img_f = image.astype(np.float32)
    rows = img_f[y0] * (1 - wy) + img_f[y1] * wy
    out = rows[:, x0] * (1 - wx) + rows[:, x1] * wx
    out = (out / 255.0 - mean_a) / std_a
    return out.transpose(2, 0, 1).copy()


def postprocess_detections(
    logits: np.ndarray,
    boxes: np.ndarray,
    img_hw: Tuple[int, int],
    top_k: int = 100,
    score_threshold: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(Q, C) raw logits + (Q, 4) cxcywh-normalized boxes -> top-k
    (boxes xyxy px, scores, labels)."""
    logits = np.ascontiguousarray(logits, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    Q, C = logits.shape
    lib = _load()
    if lib is not None:
        out_boxes = np.empty((top_k, 4), np.float32)
        out_scores = np.empty((top_k,), np.float32)
        out_labels = np.empty((top_k,), np.int32)
        n = lib.lt_postprocess_detections(
            logits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            Q, C, img_hw[0], img_hw[1], top_k,
            ctypes.c_float(score_threshold),
            out_boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out_boxes[:n], out_scores[:n], out_labels[:n]
    scores = 1.0 / (1.0 + np.exp(-logits))
    flat = scores.reshape(-1)
    k = min(top_k, flat.size)
    order = np.argsort(-flat)[:k]
    keep = flat[order] >= score_threshold
    order = order[keep]
    q = order // C
    labels = (order % C).astype(np.int32)
    h, w = img_hw
    b = boxes[q]
    xy = np.stack(
        [
            (b[:, 0] - b[:, 2] / 2) * w,
            (b[:, 1] - b[:, 3] / 2) * h,
            (b[:, 0] + b[:, 2] / 2) * w,
            (b[:, 1] + b[:, 3] / 2) * h,
        ],
        axis=1,
    )
    return xy, flat[order], labels


def postprocess_semantic(logits: np.ndarray) -> np.ndarray:
    """(H, W, C) logits -> (H, W) int32 argmax mask."""
    logits = np.ascontiguousarray(logits, np.float32)
    h, w, c = logits.shape
    lib = _load()
    if lib is not None:
        out = np.empty((h, w), np.int32)
        lib.lt_postprocess_semantic(
            logits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    return np.argmax(logits, axis=-1).astype(np.int32)
