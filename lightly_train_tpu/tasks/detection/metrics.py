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
        # Per-detection IoU rows against the image's GTs are threshold-
        # independent: compute once, reuse across the 10 thresholds.
        det_ious = [
            iou_fn(box[None], gts[img])[0] if len(gts[img]) else None
            for (_, img, box) in dets
        ]
        for ti, thr in enumerate(iou_thresholds):
            matched = [np.zeros(len(g), bool) for g in gts]
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            for di, (_, img, _box) in enumerate(dets):
                ious = det_ious[di]
                if ious is None:
                    fp[di] = 1
                    continue
                # COCO protocol: match the highest-IoU UNMATCHED GT above
                # the threshold (argmax over all GTs would count a
                # detection FP when its best GT is taken but another
                # still-free GT overlaps above threshold).
                cand = np.where((ious >= thr) & ~matched[img])[0]
                if len(cand):
                    best = int(cand[np.argmax(ious[cand])])
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
    # "map50" = AP at the threshold closest to 0.5 (exactly 0.5 with the
    # default grid; a custom grid without 0.5 still gets a sane value).
    i50 = int(np.argmin(np.abs(np.asarray(iou_thresholds) - 0.5)))
    return {
        "map": float(aps.mean()),
        "map50": float(aps[i50].mean()),
    }
