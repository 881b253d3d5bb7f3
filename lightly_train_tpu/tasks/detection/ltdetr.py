"""LT-DETR object detection train model.

Rebuild of ``src/lightly_train/_task_models/ltdetr_object_detection/``
(4,135 LoC + components): backbone (ViT single-scale expanded to 3 levels
like ``dino_vit_wrapper.py``, or CNN stage features), HybridEncoder,
DETR decoder with deformable cross-attention and iterative refinement,
VFL+L1+GIoU criterion with Hungarian matching, ModelEMA (``ema.py:28``,
via TaskTrainState.ema_params + warmup momentum), flat-cosine LR.
Denoising-query training (``denoising.py``) is scheduled for a later round.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.tasks.base import TaskArgs, TaskTrainModel
from lightly_train_tpu.tasks.detection.box_utils import cxcywh_to_xyxy
from lightly_train_tpu.tasks.detection.components import (
    ConvBNAct,
    DETRDecoder,
    DetrConfig,
    HybridEncoder,
)
from lightly_train_tpu.tasks.detection.criterion import detection_criterion
from lightly_train_tpu.tasks.detection.metrics import compute_map


class ObjectDetectionArgs(TaskArgs):
    num_classes: int = 80
    num_queries: int = 300
    d_model: int = 256
    num_decoder_layers: int = 3
    num_heads: int = 8
    dim_feedforward: int = 1024
    max_detections: int = 100
    score_threshold: float = 0.0
    # Step-scheduled on-device augs (reference ActivationPolicyArgs windows,
    # ``transform.py:103-279``): (step_start, step_stop) or None.
    mosaic_window: Optional[Tuple[int, int]] = None
    mosaic_prob: float = 0.5
    mixup_window: Optional[Tuple[int, int]] = None
    mixup_prob: float = 0.5
    zoom_out_window: Optional[Tuple[int, int]] = None
    zoom_out_prob: float = 0.3
    default_steps: int = 60_000
    default_batch_size: int = 16


class _LTDETRModule(nn.Module):
    """Backbone feature pyramid + encoder + decoder in one module."""

    wrapped: WrappedModel
    cfg: DetrConfig

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False):
        D = self.cfg.d_model
        # Fresh instance of the backbone module bound under the stable name
        # "trunk" (all backbone modules take a single cfg attribute).
        trunk = type(self.wrapped.module)(self.wrapped.module.cfg, name="trunk")
        out = trunk(images, train=False)  # backbone submodule
        stage_feats = out.get("stage_features")
        if stage_feats is not None and len(stage_feats) >= 3:
            feats = stage_feats[-3:]  # /8, /16, /32 for CNNs
        else:
            # ViT single-scale (stride=patch): build /8, /16, /32 pyramid
            # (reference dino_vit_wrapper.py).
            f = out["features"]
            B, H, W, C = f.shape
            up = nn.ConvTranspose(
                C, (2, 2), strides=(2, 2), dtype=self.cfg.dtype, name="vit_up"
            )(f)
            down = nn.Conv(
                C, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.cfg.dtype, name="vit_down",
            )(f)
            feats = [up, f, down]
        levels = HybridEncoder(self.cfg, name="encoder")(feats, train)
        return DETRDecoder(self.cfg, name="decoder")(levels, train)


class ObjectDetectionTrainModel(TaskTrainModel):
    task = "object_detection"

    def __init__(self, wrapped: WrappedModel, args: ObjectDetectionArgs):
        super().__init__(wrapped, args)
        self.args: ObjectDetectionArgs = args
        self.cfg = DetrConfig(
            d_model=args.d_model,
            num_heads=args.num_heads,
            num_queries=args.num_queries,
            num_decoder_layers=args.num_decoder_layers,
            dim_feedforward=args.dim_feedforward,
            num_classes=args.num_classes,
        )
        self.module = _LTDETRModule(wrapped, self.cfg)

    # val collection mode: outputs are concatenated, not summed.
    val_mode = "collect"

    def wrap_pretrained(self, variables):
        """Backbone trunk lives at params['backbone']['trunk']."""
        return {k: {"trunk": v} for k, v in variables.items()}

    # Set by the runtime before the step is jitted (shard-local augs).
    mesh = None

    def augment_batch(self, batch, key, step):
        """Step-windowed on-device Mosaic / MixUp / zoom-out.

        Composite ops (mosaic/mixup) run SHARD-LOCAL via shard_map: partner
        images come from the same device's slice of the batch — faithful to
        the reference's per-worker mosaic sample cache, and free of
        cross-device communication in the augmentation stage.
        """
        a = self.args
        if not (a.mosaic_window or a.mixup_window or a.zoom_out_window):
            return batch
        from lightly_train_tpu.ops.detection_augs import (
            detection_mixup,
            mosaic,
            random_zoom_out,
            window_gate,
        )

        g_mosaic = (
            window_gate(step, *a.mosaic_window) * a.mosaic_prob
            if a.mosaic_window is not None else None
        )
        g_mixup = (
            window_gate(step, *a.mixup_window) * a.mixup_prob
            if a.mixup_window is not None else None
        )
        g_zoom = (
            window_gate(step, *a.zoom_out_window) * a.zoom_out_prob
            if a.zoom_out_window is not None else None
        )

        def aug(images, boxes, labels, valid, key, g_mosaic=g_mosaic,
                g_mixup=g_mixup, g_zoom=g_zoom):
            k1, k2, k3 = jax.random.split(key[0], 3)
            if g_zoom is not None:
                images, boxes = random_zoom_out(k1, images, boxes, prob=g_zoom)
            if g_mosaic is not None:
                images, boxes, labels, valid = mosaic(
                    k2, images, boxes, labels, valid, prob=g_mosaic
                )
            if g_mixup is not None:
                images, boxes, labels, valid = detection_mixup(
                    k3, images, boxes, labels, valid, prob=g_mixup
                )
            return images, boxes, labels, valid

        args = (batch["images"], batch["boxes"], batch["labels"],
                batch["box_valid"])
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from lightly_train_tpu.parallel.mesh import BATCH_AXIS

            n = self.mesh.shape[BATCH_AXIS]
            keys = jax.random.split(key, n)
            images, boxes, labels, valid = jax.shard_map(
                aug,
                mesh=self.mesh,
                in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS),
                          P(BATCH_AXIS), P(BATCH_AXIS)),
                out_specs=P(BATCH_AXIS),
            )(*args, keys)
        else:
            images, boxes, labels, valid = aug(*args, key[None])
        return {
            **batch,
            "images": images,
            "boxes": boxes,
            "labels": labels,
            "box_valid": valid,
        }

    def init(self, rng, sample_batch):
        k1, k2 = jax.random.split(rng)
        variables = self.module.init(
            {"params": k1, "droppath": k2},
            sample_batch["images"].astype(jnp.float32),
            train=False,
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return {"backbone": params}, model_state

    def _apply(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        mutable = [k for k in model_state] if (model_state and train) else False
        rngs = {"droppath": rng} if (train and rng is not None) else None
        out = self.module.apply(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        if mutable:
            return out
        return out, model_state

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        outputs, new_model_state = self._apply(
            params, model_state, batch["images"], True, rng
        )
        loss, metrics = detection_criterion(
            outputs, batch["labels"], batch["boxes"], batch["box_valid"]
        )
        return loss, (new_model_state, metrics)

    def _decode(self, outputs) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Final-layer predictions -> top-k (boxes xyxy norm, scores, labels)."""
        logits, boxes = outputs[-1]
        C = self.args.num_classes
        scores = jax.nn.sigmoid(logits[..., :C])  # (B, Q, C)
        B, Q, _ = scores.shape
        flat = scores.reshape(B, Q * C)
        k = min(self.args.max_detections, Q * C)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        q_idx = top_idx // C
        cls_idx = top_idx % C
        sel_boxes = jnp.take_along_axis(boxes, q_idx[..., None], axis=1)
        return cxcywh_to_xyxy(sel_boxes), top_scores, cls_idx

    def val_step(self, params, model_state, batch):
        outputs, _ = self._apply(params, model_state, batch["images"], False)
        boxes, scores, labels = self._decode(outputs)
        return {
            "pred_boxes": boxes,
            "pred_scores": scores,
            "pred_labels": labels,
            "tgt_boxes": cxcywh_to_xyxy(batch["boxes"]),
            "tgt_labels": batch["labels"],
            "tgt_valid": batch["box_valid"],
            "sample_valid": batch.get(
                "valid", jnp.ones(batch["images"].shape[0], bool)
            ),
        }

    def val_finalize(self, collected: List[Dict[str, np.ndarray]]):
        predictions, targets = [], []
        for c in collected:
            c = {k: np.asarray(v) for k, v in c.items()}
            for b in range(c["pred_boxes"].shape[0]):
                if not bool(c["sample_valid"][b]):
                    continue
                keep = c["pred_scores"][b] > self.args.score_threshold
                predictions.append(
                    {
                        "boxes": c["pred_boxes"][b][keep],
                        "scores": c["pred_scores"][b][keep],
                        "labels": c["pred_labels"][b][keep],
                    }
                )
                tv = c["tgt_valid"][b]
                targets.append(
                    {
                        "boxes": c["tgt_boxes"][b][tv],
                        "labels": c["tgt_labels"][b][tv],
                    }
                )
        out = compute_map(predictions, targets)
        return {"val_map": out["map"], "val_map50": out["map50"]}

    def predict(self, variables, images):
        """Returns (boxes xyxy normalized, scores, labels)."""
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        outputs, _ = self._apply(params, model_state, images, False)
        return self._decode(outputs)

    def default_optimizer_args(self):
        from lightly_train_tpu._optim import AdamWArgs

        return AdamWArgs(lr=2e-4, weight_decay=1e-4)

    def grad_clip_norm(self):
        return 0.1

    def lr_schedule(self, base_lr, total_steps):
        from lightly_train_tpu._optim import flat_cosine

        return flat_cosine(base_lr, total_steps,
                           warmup_steps=int(0.02 * total_steps))

    def use_ema(self) -> bool:
        return True

    @property
    def watch_metric(self):
        return ("val_map", "max")
