"""Linear semantic segmentation (frozen-backbone probing).

Rebuild of ``src/lightly_train/_task_models/linear_semantic_segmentation/``
(1,268 LoC): frozen backbone, 1x1-conv (Dense) head on the feature map,
bilinear upsample of logits to mask resolution, per-pixel CE with
ignore_index, mIoU via an in-step confusion matrix (the torchmetrics
JaccardIndex analog, ``_metrics/semantic_segmentation/jaccard_index.py``).
Dataset: ``images/`` + ``masks/`` paired by stem
(``mask_semantic_segmentation_dataset.py``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._data.image_dataset import IMAGE_EXTENSIONS, decode_image
from lightly_train_tpu.errors import DatasetError
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.tasks.base import TaskArgs, TaskTrainModel


class LinearSemanticSegmentationArgs(TaskArgs):
    num_classes: int = 21
    ignore_index: int = 255
    freeze_backbone: bool = True
    default_steps: int = 10_000
    default_batch_size: int = 16


class _SegHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        # 1x1 conv == Dense on the channel axis of (B, H, W, D).
        return nn.Dense(self.num_classes, name="seg_head")(feats)


class LinearSemanticSegmentationTrainModel(TaskTrainModel):
    task = "semantic_segmentation"
    transform_kind = "semantic_segmentation"

    def __init__(self, wrapped: WrappedModel, args: LinearSemanticSegmentationArgs):
        super().__init__(wrapped, args)
        self.args: LinearSemanticSegmentationArgs = args
        self.head = _SegHead(args.num_classes)

    def init(self, rng, sample_batch):
        kb, kh = jax.random.split(rng)
        backbone_vars = self.wrapped.init(kb, sample_batch["images"])
        backbone_params = backbone_vars.pop("params")
        model_state = dict(backbone_vars)
        feats = self.wrapped.forward_features(
            {"params": backbone_params, **model_state}, sample_batch["images"]
        )["features"]
        head_params = self.head.init(kh, feats)["params"]
        return {"backbone": backbone_params, "head": head_params}, model_state

    def _logits(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        backbone_train = train and not self.args.freeze_backbone
        rngs = {"droppath": rng} if (train and rng is not None) else None
        # BatchNorm backbones need their running stats mutable when the
        # backbone trains (and the updated state must be RETURNED, not
        # dropped).
        mutable = (
            [k for k in model_state] if (model_state and backbone_train)
            else False
        )
        out = self.wrapped.forward_features(
            variables, images, train=backbone_train, rngs=rngs,
            mutable=mutable,
        )
        if mutable:
            out, new_state = out
            model_state = dict(new_state)
        feats = out["features"]  # (B, h, w, D)
        logits = self.head.apply({"params": params["head"]}, feats)
        B, H, W, _ = images.shape
        logits = jax.image.resize(
            logits.astype(jnp.float32),
            (B, H, W, self.args.num_classes),
            "bilinear",
        )
        return logits, model_state

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        images, masks = batch["images"], batch["masks"]
        if self.args.freeze_backbone:
            params = {
                "backbone": jax.lax.stop_gradient(params["backbone"]),
                "head": params["head"],
            }
        logits, new_model_state = self._logits(
            params, model_state, images, train=True, rng=rng
        )
        valid = masks != self.args.ignore_index
        labels = jnp.where(valid, masks, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, (new_model_state, {})

    def val_step(self, params, model_state, batch):
        images, masks = batch["images"], batch["masks"]
        sample_valid = batch.get("valid")
        # Tile validation above the training resolution (reference tiled
        # validation; ``val_tile_size`` set by ``run_task_training``).
        ts = getattr(self, "val_tile_size", None)
        H, W = images.shape[1:3]
        if ts is not None and (H > ts or W > ts):
            from lightly_train_tpu.tasks.tiling import tiled_logits

            logits = tiled_logits(
                lambda t: self._logits(
                    params, model_state, t, train=False
                )[0],
                images, self.args.num_classes, int(ts),
            )
        else:
            logits, _ = self._logits(params, model_state, images, train=False)
        pred = jnp.argmax(logits, axis=-1)
        valid = masks != self.args.ignore_index
        if sample_valid is not None:
            valid = valid & sample_valid[:, None, None]
        labels = jnp.where(valid, masks, 0)
        nc = self.args.num_classes
        # Confusion matrix accumulated on device (mIoU, PQ-style metrics).
        idx = labels * nc + jnp.where(valid, pred, 0)
        cm = jnp.bincount(
            idx.reshape(-1),
            weights=valid.reshape(-1).astype(jnp.float32),
            length=nc * nc,
        ).reshape(nc, nc)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return {
            "confusion": cm,
            "sum_loss": jnp.sum(ce * valid),
            "count": jnp.sum(valid),
        }

    def val_finalize(self, stats):
        cm = np.asarray(stats["confusion"])
        tp = np.diag(cm)
        union = cm.sum(0) + cm.sum(1) - tp
        present = union > 0
        iou = np.where(present, tp / np.maximum(union, 1e-9), 0.0)
        miou = float(iou[present].mean()) if present.any() else 0.0
        n = max(float(stats["count"]), 1.0)
        return {
            "val_loss": float(stats["sum_loss"]) / n,
            "val_miou": miou,
        }

    def predict(self, variables, images):
        """Returns per-pixel class ids (B, H, W)."""
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        logits, _ = self._logits(params, model_state, images, train=False)
        return jnp.argmax(logits, axis=-1)

    @property
    def watch_metric(self):
        return ("val_miou", "max")


# ---------------------------------------------------------------------------
# Dataset: image/mask pairs
# ---------------------------------------------------------------------------


class MaskSemanticSegmentationDataset:
    """``images/*`` + ``masks/*`` paired by filename stem; masks are
    single-channel PNGs of class ids."""

    def __init__(
        self,
        images_dir: Path,
        masks_dir: Path,
        image_hw: Tuple[int, int] = (512, 512),
        class_lut: "np.ndarray | None" = None,
        ignore_index: int = 255,
    ):
        # Optional raw-id -> train-id remap (reference ``classes`` +
        # ``ignore_classes`` schema); raw ids beyond the table -> ignore.
        self.class_lut = class_lut
        self.ignore_index = ignore_index
        images_dir, masks_dir = Path(images_dir), Path(masks_dir)
        mask_by_stem = {
            p.stem: p
            for p in sorted(masks_dir.rglob("*"))
            if p.suffix.lower() in IMAGE_EXTENSIONS
        }
        self.pairs: List[Tuple[str, str]] = []
        for p in sorted(images_dir.rglob("*")):
            if p.suffix.lower() in IMAGE_EXTENSIONS and p.stem in mask_by_stem:
                self.pairs.append((str(p), str(mask_by_stem[p.stem])))
        if not self.pairs:
            raise DatasetError(
                f"No image/mask pairs between {images_dir} and {masks_dir}"
            )
        self.image_hw = image_hw

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        from PIL import Image

        img_path, mask_path = self.pairs[index]
        image = decode_image(img_path, self.image_hw)
        with Image.open(mask_path) as m:
            # Palette-mode (P) class-id PNGs (VOC style) must be read as raw
            # indices — convert("L") maps them through the palette to
            # luminance, corrupting every label.
            if m.mode not in ("P", "L", "I", "I;16"):
                m = m.convert("L")
            m = m.resize(
                (self.image_hw[1], self.image_hw[0]), Image.NEAREST
            )
            mask = np.asarray(m, dtype=np.int32)
        if self.class_lut is not None:
            lut = self.class_lut
            mask = np.where(
                (mask >= 0) & (mask < len(lut)),
                lut[np.clip(mask, 0, len(lut) - 1)],
                self.ignore_index,
            ).astype(np.int32)
        return {"images": image, "masks": mask}
