"""COCO-style mAP (host-side numpy).

Rebuild of ``src/lightly_train/_metrics/mean_average_precision.py``
(torchmetrics MeanAveragePrecision analog): mAP@[.5:.95], 101-point
interpolation, per-class AP averaged over classes with ground truth.
Validation collects (boxes, scores, labels) per image on host; this module
reduces them.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a: (N, 4), b: (M, 4) xyxy -> (N, M)."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None
    )
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None
    )
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def compute_map(
    predictions: List[Dict[str, np.ndarray]],
    targets: List[Dict[str, np.ndarray]],
    iou_thresholds: np.ndarray | None = None,
) -> Dict[str, float]:
    """predictions[i]: {boxes (N,4) xyxy, scores (N,), labels (N,)};
    targets[i]: {boxes (M,4) xyxy, labels (M,)}. Returns mAP + mAP50."""
    return compute_map_generic(
        predictions, targets, _iou_matrix, key="boxes",
        iou_thresholds=iou_thresholds,
    )


def compute_map_generic(
    predictions: List[Dict[str, np.ndarray]],
    targets: List[Dict[str, np.ndarray]],
    iou_fn,
    key: str = "boxes",
    iou_thresholds: np.ndarray | None = None,
) -> Dict[str, float]:
    """mAP over arbitrary region representations (boxes, binary masks, ...).

    ``iou_fn(a, b)`` computes a pairwise IoU matrix for stacked regions under
    ``predictions[i][key]`` / ``targets[i][key]`` (mask mAP for instance
    segmentation passes flattened bool masks).
    """
    if iou_thresholds is None:
        iou_thresholds = np.arange(0.5, 1.0, 0.05)
    classes = set()
    for t in targets:
        classes.update(np.unique(t["labels"]).tolist())
    if not classes:
        return {"map": 0.0, "map50": 0.0}
    aps = np.zeros((len(iou_thresholds), len(classes)))
    for ci, c in enumerate(sorted(classes)):
        # Gather detections and GTs of class c.
        dets = []  # (score, image_idx, region)
        n_gt = 0
        gts = []
        for i, (p, t) in enumerate(zip(predictions, targets)):
            sel = p["labels"] == c
            for s, b in zip(p["scores"][sel], p[key][sel]):
                dets.append((float(s), i, b))
            gsel = t["labels"] == c
            gts.append(t[key][gsel])
            n_gt += int(gsel.sum())
        if n_gt == 0:
            continue
        dets.sort(key=lambda x: -x[0])
        for ti, thr in enumerate(iou_thresholds):
            matched = [np.zeros(len(g), bool) for g in gts]
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            for di, (_, img, box) in enumerate(dets):
                g = gts[img]
                if len(g) == 0:
                    fp[di] = 1
                    continue
                ious = iou_fn(box[None], g)[0]
                best = int(np.argmax(ious))
                if ious[best] >= thr and not matched[img][best]:
                    matched[img][best] = True
                    tp[di] = 1
                else:
                    fp[di] = 1
            ctp = np.cumsum(tp)
            cfp = np.cumsum(fp)
            recall = ctp / n_gt
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            # 101-point interpolation.
            ap = 0.0
            for r in np.linspace(0, 1, 101):
                p_at = precision[recall >= r]
                ap += float(p_at.max()) if len(p_at) else 0.0
            aps[ti, ci] = ap / 101
    return {
        "map": float(aps.mean()),
        "map50": float(aps[0].mean()),
    }
