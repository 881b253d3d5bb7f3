"""EoMT instance & panoptic segmentation.

Rebuild of ``src/lightly_train/_task_models/dinov{2,3}_eomt_instance_
segmentation/`` and ``..._eomt_panoptic_segmentation/`` (~9.7k LoC combined):
the same query-joint EoMT trunk as semantic segmentation, with per-instance /
per-segment targets, the shared Mask2Former loss, instance decoding
(thresholded per-query masks) or panoptic merging (query-weighted per-pixel
argmax + segment filtering), and mask-mAP / PQ validation on host.

Datasets encode targets compactly as an id map (H, W) + per-slot labels so
the loader moves one int16 plane instead of K binary masks; binary target
masks are materialized on device at patch resolution.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._data.image_dataset import decode_image
from lightly_train_tpu.errors import DatasetError
from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
    EoMTSemanticSegmentationArgs,
    EoMTSemanticSegmentationTrainModel,
    mask_classification_loss,
    point_sampled_mask_loss,
)

NO_SEGMENT = 255


class EoMTInstanceSegmentationArgs(EoMTSemanticSegmentationArgs):
    max_instances: int = 50
    score_threshold: float = 0.5
    default_steps: int = 40_000


class EoMTInstanceSegmentationTrainModel(EoMTSemanticSegmentationTrainModel):
    task = "instance_segmentation"
    transform_kind = "instance_segmentation"
    val_mode = "collect"

    def _targets_from_ids(self, seg_map: jax.Array, labels: jax.Array,
                          slot_valid: jax.Array, grid_hw: Tuple[int, int]):
        """seg_map (B, H, W) slot ids (NO_SEGMENT = none) -> per-slot binary
        masks at patch resolution."""
        gh, gw = grid_hw
        K = labels.shape[1]
        B = seg_map.shape[0]
        onehot = jax.nn.one_hot(
            jnp.where(seg_map == NO_SEGMENT, K, seg_map), K + 1
        )[..., :K]  # (B, H, W, K)
        t = jax.image.resize(onehot, (B, gh, gw, K), "linear")
        t = (t > 0.5).astype(jnp.float32)
        t = t.transpose(0, 3, 1, 2).reshape(B, K, gh * gw)
        return t, slot_valid

    def loss_fn(self, params, model_state, batch, rng, step):
        a = self.args
        mask_probs = self._mask_probs(
            step, getattr(self, "total_steps", None) or a.default_steps
        )
        # Disjoint PRNG streams (see eomt_semantic_segmentation.loss_fn).
        rng_trunk, rng_loss, rng_dp = jax.random.split(rng, 3)
        outputs, grid_hw = self.trunk.apply(
            {"params": params["backbone"]},
            batch["images"].astype(self.cfg.dtype),
            mask_probs, rng_trunk, True,
            return_factors=a.use_point_sampling,
            rngs={"droppath": rng_dp},
        )
        total = 0.0
        if a.use_point_sampling:
            # seg_map already IS the slot-id map (NO_SEGMENT -> background).
            id_map = batch["seg_map"].astype(jnp.int32)
            valid = batch["seg_valid"]
            for li, out_l in enumerate(outputs):
                cls_logits, mask_logits = out_l[0], out_l[1]
                total = total + point_sampled_mask_loss(
                    cls_logits, mask_logits, grid_hw, id_map, valid,
                    batch["seg_labels"], jax.random.fold_in(rng_loss, li),
                    num_classes=a.num_classes,
                    class_weight=a.class_weight,
                    mask_weight=a.mask_weight,
                    dice_weight=a.dice_weight,
                    no_object_weight=a.no_object_weight,
                    num_points=a.num_points,
                    oversample_ratio=a.oversample_ratio,
                    importance_sample_ratio=a.importance_sample_ratio,
                    factors=out_l[2:] if len(out_l) > 2 else None,
                )
            # Levels SUMMED (reference ``loss_total`` over all layers).
            return total, (model_state, {})
        targets, valid = self._targets_from_ids(
            batch["seg_map"], batch["seg_labels"], batch["seg_valid"], grid_hw
        )
        for cls_logits, mask_logits in outputs:
            total = total + mask_classification_loss(
                cls_logits, mask_logits, targets, valid, batch["seg_labels"],
                num_classes=a.num_classes,
                class_weight=a.class_weight,
                mask_weight=a.mask_weight,
                dice_weight=a.dice_weight,
                no_object_weight=a.no_object_weight,
            )
        return total, (model_state, {})

    def _query_outputs(self, params, images):
        outputs, grid_hw = self.trunk.apply(
            {"params": params["backbone"]},
            images.astype(self.cfg.dtype),
            jnp.zeros((self.args.num_joint_blocks,), jnp.float32),
            None, False,
        )
        cls_logits, mask_logits = outputs[-1]
        return cls_logits, mask_logits, grid_hw

    def val_step(self, params, model_state, batch):
        cls_logits, mask_logits, grid_hw = self._query_outputs(
            params, batch["images"]
        )
        scores = jax.nn.softmax(cls_logits, axis=-1)[..., : self.args.num_classes]
        best_score = jnp.max(scores, axis=-1)
        best_label = jnp.argmax(scores, axis=-1)
        gh, gw = grid_hw
        return {
            "pred_masks": jax.nn.sigmoid(mask_logits) > 0.5,
            "pred_scores": best_score,
            "pred_labels": best_label,
            "tgt_map": jax.image.resize(
                batch["seg_map"].astype(jnp.float32)[..., None],
                (batch["seg_map"].shape[0], gh, gw, 1), "nearest",
            )[..., 0].astype(jnp.int32),
            "tgt_labels": batch["seg_labels"],
            "tgt_valid": batch["seg_valid"],
            "sample_valid": batch.get(
                "valid", jnp.ones(batch["images"].shape[0], bool)
            ),
        }

    def val_finalize(self, collected):
        from lightly_train_tpu.tasks.detection.metrics import compute_map_generic

        predictions, targets = [], []
        for c in collected:
            c = {k: np.asarray(v) for k, v in c.items()}
            B, Q, n = c["pred_masks"].shape
            for b in range(B):
                if not bool(c["sample_valid"][b]):
                    continue
                keep = c["pred_scores"][b] > 0.05
                predictions.append({
                    "masks": c["pred_masks"][b][keep],
                    "scores": c["pred_scores"][b][keep],
                    "labels": c["pred_labels"][b][keep],
                })
                K = c["tgt_labels"].shape[1]
                tmap = c["tgt_map"][b].reshape(-1)
                tv = c["tgt_valid"][b].copy()
                # NEAREST-downsampling the seg map to the patch grid can
                # erase instances far smaller than a patch; an all-empty GT
                # mask would be an unmatchable permanent FN, so drop the
                # slot (evaluation runs at grid resolution by design).
                for k in range(K):
                    if tv[k] and not (tmap == k).any():
                        tv[k] = False
                masks = np.stack(
                    [(tmap == k) for k in range(K)], axis=0
                )[tv]
                targets.append({
                    "masks": masks,
                    "labels": c["tgt_labels"][b][tv],
                })

        def mask_iou(a, b):
            inter = (a[:, None] & b[None, :]).sum(-1).astype(np.float64)
            union = (a[:, None] | b[None, :]).sum(-1).astype(np.float64)
            return inter / np.maximum(union, 1e-9)

        out = compute_map_generic(predictions, targets, mask_iou, key="masks")
        return {"val_mask_map": out["map"], "val_mask_map50": out["map50"]}

    def predict(self, variables, images):
        """Returns (masks bool (B, Q, gh, gw), scores, labels)."""
        cls_logits, mask_logits, (gh, gw) = self._query_outputs(
            variables["params"], images
        )
        scores = jax.nn.softmax(cls_logits, axis=-1)[..., : self.args.num_classes]
        B, Q = scores.shape[:2]
        return (
            (jax.nn.sigmoid(mask_logits) > 0.5).reshape(B, Q, gh, gw),
            jnp.max(scores, axis=-1),
            jnp.argmax(scores, axis=-1),
        )

    @property
    def watch_metric(self):
        return ("val_mask_map", "max")


class EoMTPanopticSegmentationArgs(EoMTInstanceSegmentationArgs):
    pass


class EoMTPanopticSegmentationTrainModel(EoMTInstanceSegmentationTrainModel):
    task = "panoptic_segmentation"
    transform_kind = "panoptic_segmentation"

    def val_step(self, params, model_state, batch):
        cls_logits, mask_logits, grid_hw = self._query_outputs(
            params, batch["images"]
        )
        gh, gw = grid_hw
        scores = jax.nn.softmax(cls_logits, axis=-1)[..., : self.args.num_classes]
        best_score = jnp.max(scores, axis=-1)  # (B, Q)
        best_label = jnp.argmax(scores, axis=-1)
        # Panoptic merge: per-pixel argmax over score-weighted mask probs.
        weighted = jax.nn.sigmoid(mask_logits) * best_score[..., None]
        seg_query = jnp.argmax(weighted, axis=1)  # (B, n) winning query
        return {
            "pred_query_map": seg_query,
            "pred_scores": best_score,
            "pred_labels": best_label,
            "tgt_map": jax.image.resize(
                batch["seg_map"].astype(jnp.float32)[..., None],
                (batch["seg_map"].shape[0], gh, gw, 1), "nearest",
            )[..., 0].astype(jnp.int32),
            "tgt_labels": batch["seg_labels"],
            "tgt_valid": batch["seg_valid"],
            "sample_valid": batch.get(
                "valid", jnp.ones(batch["images"].shape[0], bool)
            ),
        }

    def val_finalize(self, collected):
        """Panoptic quality: segments matched by IoU>0.5 and class."""
        tp_iou = 0.0
        tp = fp = fn = 0
        for c in collected:
            c = {k: np.asarray(v) for k, v in c.items()}
            B = c["pred_query_map"].shape[0]
            for b in range(B):
                if not bool(c["sample_valid"][b]):
                    continue
                qmap = c["pred_query_map"][b]
                scores = c["pred_scores"][b]
                labels = c["pred_labels"][b]
                tmap = c["tgt_map"][b].reshape(-1)
                tvalid = c["tgt_valid"][b]
                tlabels = c["tgt_labels"][b]
                # Predicted segments = queries that win somewhere w/ score>thr.
                pred_segs = [
                    (q, labels[q], qmap == q)
                    for q in np.unique(qmap)
                    if scores[q] > self.args.score_threshold
                ]
                gt_segs = [
                    (k, tlabels[k], tmap == k)
                    for k in range(len(tvalid))
                    if tvalid[k] and (tmap == k).any()
                ]
                matched_gt = set()
                matched_pred = set()
                for pi, (q, pl, pm) in enumerate(pred_segs):
                    for gi, (k, gl, gm) in enumerate(gt_segs):
                        if gi in matched_gt or pl != gl:
                            continue
                        inter = float((pm & gm).sum())
                        union = float((pm | gm).sum())
                        iou = inter / max(union, 1e-9)
                        if iou > 0.5:
                            matched_gt.add(gi)
                            matched_pred.add(pi)
                            tp += 1
                            tp_iou += iou
                            break
                # Standard PQ: unmatched predictions lying mostly on void/
                # crowd pixels are dropped, not counted FP (pycocotools
                # panopticapi rule) — argmax assigns EVERY pixel to some
                # query, so crowd regions would otherwise be systematic FPs.
                void = tmap == NO_SEGMENT
                for pi, (q, pl, pm) in enumerate(pred_segs):
                    if pi in matched_pred:
                        continue
                    area = float(pm.sum())
                    if area > 0 and float((pm & void).sum()) / area > 0.5:
                        continue
                    fp += 1
                fn += len(gt_segs) - len(matched_gt)
        denom = tp + 0.5 * fp + 0.5 * fn
        pq = tp_iou / denom if denom > 0 else 0.0
        return {"val_pq": float(pq)}

    def predict(self, variables, images):
        """Returns (segment_map (B, gh, gw), labels (B, Q), scores (B, Q))."""
        cls_logits, mask_logits, (gh, gw) = self._query_outputs(
            variables["params"], images
        )
        scores = jax.nn.softmax(cls_logits, axis=-1)[..., : self.args.num_classes]
        best_score = jnp.max(scores, axis=-1)
        weighted = jax.nn.sigmoid(mask_logits) * best_score[..., None]
        B = images.shape[0]
        return (
            jnp.argmax(weighted, axis=1).reshape(B, gh, gw),
            jnp.argmax(scores, axis=-1),
            best_score,
        )

    @property
    def watch_metric(self):
        return ("val_pq", "max")


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------


def _decode_rle_counts(s: str) -> List[int]:
    """Decode pycocotools' compressed RLE counts string (LEB128-style,
    6 bits/char at ASCII 48+, delta-coded after the first two runs)."""
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def decode_rle(segmentation: dict) -> np.ndarray:
    """COCO RLE dict -> bool mask (h, w). Pure numpy (no pycocotools).

    Supports compressed (string counts) and uncompressed (list counts)
    encodings; runs are column-major starting with background.
    """
    h, w = segmentation["size"]
    counts = segmentation["counts"]
    if isinstance(counts, str):
        counts = _decode_rle_counts(counts)
    counts = np.asarray(counts, dtype=np.int64)
    values = np.zeros(len(counts), dtype=bool)
    values[1::2] = True
    flat = np.repeat(values, counts)
    flat = np.pad(flat, (0, max(0, h * w - flat.size)))[: h * w]
    return flat.reshape(w, h).T  # column-major


def _rasterize_polygons(polys: List[List[float]], hw: Tuple[int, int],
                        scale_xy: Tuple[float, float]) -> np.ndarray:
    from PIL import Image, ImageDraw

    mask = Image.new("1", (hw[1], hw[0]), 0)
    draw = ImageDraw.Draw(mask)
    sx, sy = scale_xy
    for poly in polys:
        pts = [
            (poly[i] * sx, poly[i + 1] * sy) for i in range(0, len(poly) - 1, 2)
        ]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(mask, dtype=bool)


class YOLOInstanceSegmentationDataset:
    """YOLO segmentation format -> compact slot-id map targets.

    Rebuild of the reference's YOLO instance-segmentation dataset
    (``_data/instance_segmentation_dataset.py:400-470``): per-image ``.txt``
    label files where each line is ``class x1 y1 x2 y2 ...`` with polygon
    coordinates normalized to [0, 1]. Polygons with < 3 points are skipped
    (``:58-66``). Emits the same batch dict as the COCO dataset.
    """

    def __init__(
        self,
        images_dir: Path,
        labels_dir: Path,
        num_classes: int,
        image_hw: Tuple[int, int] = (640, 640),
        max_instances: int = 50,
    ):
        images_dir, labels_dir = Path(images_dir), Path(labels_dir)
        exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
        self.items = []
        for p in sorted(images_dir.rglob("*")):
            if p.suffix.lower() not in exts:
                continue
            label = labels_dir / p.relative_to(images_dir).with_suffix(".txt")
            self.items.append((str(p), str(label) if label.exists() else None))
        if not self.items:
            raise DatasetError(f"No images under {images_dir}")
        self.num_classes = num_classes
        self.image_hw = image_hw
        self.max_instances = max_instances

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        path, label_path = self.items[index]
        image = decode_image(path, self.image_hw)
        hw = self.image_hw
        seg_map = np.full(hw, NO_SEGMENT, np.int32)
        labels = np.zeros((self.max_instances,), np.int32)
        valid = np.zeros((self.max_instances,), bool)
        boxes = np.zeros((self.max_instances, 4), np.float32)
        slot = 0
        if label_path is not None:
            for line in Path(label_path).read_text().splitlines():
                parts = line.split()
                if len(parts) < 7:  # class + >= 3 (x, y) points
                    continue
                if slot >= self.max_instances:
                    break
                cls = int(float(parts[0]))
                coords = [float(v) for v in parts[1:]]
                if len(coords) % 2 == 1:
                    coords = coords[:-1]
                # Normalized [0,1] coords -> view pixels.
                poly = [
                    c * (hw[1] if i % 2 == 0 else hw[0])
                    for i, c in enumerate(coords)
                ]
                m = _rasterize_polygons([poly], hw, (1.0, 1.0))
                if not m.any():
                    continue
                seg_map[m] = slot
                labels[slot] = cls
                valid[slot] = True
                xs, ys = coords[0::2], coords[1::2]
                x0, x1 = min(xs), max(xs)
                y0, y1 = min(ys), max(ys)
                boxes[slot] = [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0]
                slot += 1
        return {
            "images": image,
            "seg_map": seg_map,
            "seg_labels": labels,
            "seg_valid": valid,
            "boxes": boxes,
        }


class COCOInstanceSegmentationDataset:
    """COCO JSON with polygon segmentations -> compact slot-id map targets.

    iscrowd annotations are excluded from target slots (never Hungarian-
    matched); their pixels stay NO_SEGMENT (reference crowd handling,
    ``mask_panoptic_segmentation_dataset.py:218-258``).
    """

    def __init__(
        self,
        images_dir: Path,
        annotations_json: Path,
        image_hw: Tuple[int, int] = (640, 640),
        max_instances: int = 50,
    ):
        images_dir = Path(images_dir)
        ann = json.loads(Path(annotations_json).read_text())
        cat_ids = sorted(c["id"] for c in ann.get("categories", []))
        self.cat_to_idx = {c: i for i, c in enumerate(cat_ids)}
        self.num_classes = len(cat_ids)
        by_image: Dict[int, List[dict]] = {}
        for a in ann.get("annotations", []):
            if a.get("segmentation") and not a.get("iscrowd", 0):
                by_image.setdefault(a["image_id"], []).append(a)
        self.items = []
        for im in ann.get("images", []):
            path = images_dir / im["file_name"]
            if path.exists():
                self.items.append(
                    (str(path), im["width"], im["height"],
                     by_image.get(im["id"], []))
                )
        if not self.items:
            raise DatasetError(f"No images under {images_dir}")
        self.image_hw = image_hw
        self.max_instances = max_instances

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        path, W, H, anns = self.items[index]
        image = decode_image(path, self.image_hw)
        hw = self.image_hw
        seg_map = np.full(hw, NO_SEGMENT, np.int32)
        labels = np.zeros((self.max_instances,), np.int32)
        valid = np.zeros((self.max_instances,), bool)
        boxes = np.zeros((self.max_instances, 4), np.float32)
        sx, sy = hw[1] / W, hw[0] / H
        for slot, a in enumerate(anns[: self.max_instances]):
            seg = a["segmentation"]
            if isinstance(seg, list):
                m = _rasterize_polygons(seg, hw, (sx, sy))
            elif isinstance(seg, dict) and "counts" in seg:
                from PIL import Image

                full = decode_rle(seg)
                m = np.asarray(
                    Image.fromarray(full).resize((hw[1], hw[0]), Image.NEAREST)
                ).astype(bool)
            else:
                continue
            seg_map[m] = slot
            labels[slot] = self.cat_to_idx.get(a["category_id"], 0)
            valid[slot] = True
            if "bbox" in a:
                x, y, bw, bh = a["bbox"]
                boxes[slot] = [
                    (x + bw / 2) / W, (y + bh / 2) / H, bw / W, bh / H
                ]
        # A degenerate polygon or a slot fully overwritten by a later
        # overlapping annotation has zero pixels: matching a query to an
        # all-background target corrupts training, and an empty GT mask is
        # a permanent false negative in val mask-mAP.
        present = np.bincount(
            seg_map[seg_map != NO_SEGMENT].ravel(),
            minlength=self.max_instances,
        )
        valid &= present[: self.max_instances] > 0
        return {
            "images": image,
            "seg_map": seg_map,
            "seg_labels": labels,
            "seg_valid": valid,
            "boxes": boxes,
        }


class COCOPanopticSegmentationDataset:
    """COCO panoptic format: id-encoded PNGs + segments_info JSON."""

    def __init__(
        self,
        images_dir: Path,
        panoptic_dir: Path,
        annotations_json: Path,
        image_hw: Tuple[int, int] = (640, 640),
        max_segments: int = 50,
    ):
        images_dir, panoptic_dir = Path(images_dir), Path(panoptic_dir)
        ann = json.loads(Path(annotations_json).read_text())
        cat_ids = sorted(c["id"] for c in ann.get("categories", []))
        self.cat_to_idx = {c: i for i, c in enumerate(cat_ids)}
        self.num_classes = len(cat_ids)
        images_by_id = {im["id"]: im for im in ann.get("images", [])}
        self.items = []
        for a in ann.get("annotations", []):
            im = images_by_id.get(a["image_id"])
            if im is None:
                continue
            img_path = images_dir / im["file_name"]
            pan_path = panoptic_dir / a["file_name"]
            if img_path.exists() and pan_path.exists():
                self.items.append(
                    (str(img_path), str(pan_path), a["segments_info"])
                )
        if not self.items:
            raise DatasetError(f"No panoptic items under {images_dir}")
        self.image_hw = image_hw
        self.max_segments = max_segments

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        from PIL import Image

        img_path, pan_path, segments = self.items[index]
        image = decode_image(img_path, self.image_hw)
        with Image.open(pan_path) as p:
            p = p.convert("RGB").resize(
                (self.image_hw[1], self.image_hw[0]), Image.NEAREST
            )
            rgb = np.asarray(p, np.int64)
        ids = rgb[..., 0] + 256 * rgb[..., 1] + 256 * 256 * rgb[..., 2]
        seg_map = np.full(self.image_hw, NO_SEGMENT, np.int32)
        labels = np.zeros((self.max_segments,), np.int32)
        valid = np.zeros((self.max_segments,), bool)
        slot = 0
        for s in segments:
            if s.get("iscrowd", 0):
                # Crowd regions are never target slots; pixels stay at the
                # ignore id (reference: PQ ignores crowd,
                # ``mask_panoptic_segmentation_dataset.py:218-258``).
                continue
            if slot >= self.max_segments:
                break
            seg_map[ids == s["id"]] = slot
            labels[slot] = self.cat_to_idx.get(s["category_id"], 0)
            valid[slot] = True
            slot += 1
        return {
            "images": image,
            "seg_map": seg_map,
            "seg_labels": labels,
            "seg_valid": valid,
        }
