"""LT-DETRv2 instance segmentation: detection decoder + mask head.

Rebuild of ``src/lightly_train/_task_models/ltdetr_instance_segmentation/``
(+ ``instance_segmentation_components/``, 3.7k LoC): the LT-DETR detector
with a mask branch — final decoder query embeddings are projected and
dot-producted with a pixel-embedding map from the highest-resolution
encoder level (/8), giving per-query masks; training adds BCE+dice on
Hungarian-matched pairs to the detection criterion, validation reports
mask mAP.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.tasks.detection.components import (
    DETRDecoder,
    DetrConfig,
    HybridEncoder,
)
from lightly_train_tpu.tasks.detection.criterion import (
    detection_criterion,
    detection_matching_cost,
)
from lightly_train_tpu.tasks.detection.ltdetr import (
    ObjectDetectionArgs,
    ObjectDetectionTrainModel,
    _LTDETRModule,
)
from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
    _dice_loss,
    hungarian_match,
)

NO_SEGMENT = 255


class InstanceSegmentationLTDETRArgs(ObjectDetectionArgs):
    mask_dim: int = 64
    mask_weight: float = 2.0
    dice_weight: float = 2.0
    max_instances: int = 50
    mask_threshold: float = 0.5


class LTDETRInstanceSegmentationTrainModel(ObjectDetectionTrainModel):
    task = "instance_segmentation"

    def __init__(self, wrapped: WrappedModel,
                 args: InstanceSegmentationLTDETRArgs):
        super().__init__(wrapped, args)
        self.args: InstanceSegmentationLTDETRArgs = args

    # The detection module is reused; the mask head params live in
    # an extra flax module applied to sown decoder queries.
    def _apply_with_masks(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        mutable = ["intermediates"] + (
            [k for k in model_state] if (model_state and train) else []
        )
        rngs = {"droppath": rng} if (train and rng is not None) else None
        (outputs), aux = self.module.apply(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        queries = aux["intermediates"]["decoder"]["final_queries"][0]
        # Trunk features sown by _LTDETRModule: the mask head projects them
        # directly — no second backbone forward.
        feats = aux["intermediates"]["trunk_features"][0]
        new_model_state = {
            k: v for k, v in aux.items() if k != "intermediates"
        } or model_state
        # Decoder logits are reference-width (num_classes); the criterion
        # contract carries one extra ignored column (see ltdetr._apply).
        outputs = [
            (jnp.pad(lg, ((0, 0), (0, 0), (0, 1))), bx)
            for lg, bx in outputs
        ]
        return outputs, queries, feats, new_model_state

    def init(self, rng, sample_batch):
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = self.module.init(
            {"params": k1, "droppath": k2},
            sample_batch["images"].astype(jnp.float32),
            train=False,
        )
        params = {"backbone": variables["params"]}
        model_state = {
            k: v for k, v in variables.items()
            if k not in ("params", "intermediates")
        }
        # Mask head params: query proj + pixel proj on backbone features.
        feat_dim = self.wrapped.feature_dim
        D = self.cfg.d_model
        md = self.args.mask_dim
        params["mask_head"] = {
            "query_proj": {
                "kernel": nn.initializers.lecun_normal()(
                    k3, (D, md), jnp.float32
                ),
                "bias": jnp.zeros((md,), jnp.float32),
            },
            "pixel_proj": {
                "kernel": nn.initializers.lecun_normal()(
                    jax.random.fold_in(k3, 1), (feat_dim, md), jnp.float32
                ),
                "bias": jnp.zeros((md,), jnp.float32),
            },
        }
        return params, model_state

    def _mask_logits(self, params, feats, queries):
        """(B, Q, D) queries + (B, gh, gw, Df) trunk features -> mask logits."""
        mh = params["mask_head"]
        q_emb = queries @ mh["query_proj"]["kernel"] + mh["query_proj"]["bias"]
        p_emb = feats @ mh["pixel_proj"]["kernel"] + mh["pixel_proj"]["bias"]
        B, gh, gw, md = p_emb.shape
        masks = jnp.einsum(
            "bqd,bnd->bqn", q_emb, p_emb.reshape(B, gh * gw, md)
        ) / jnp.sqrt(float(md))
        return masks.astype(jnp.float32), (gh, gw)

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        outputs, queries, feats, new_model_state = self._apply_with_masks(
            params, model_state, batch["images"], True, rng
        )
        det_loss, metrics = detection_criterion(
            outputs, batch["seg_labels"], batch["boxes"], batch["seg_valid"]
        )
        mask_logits, (gh, gw) = self._mask_logits(params, feats, queries)
        # Targets at patch resolution from the slot-id map.
        K = batch["seg_labels"].shape[1]
        B = batch["seg_map"].shape[0]
        onehot = jax.nn.one_hot(
            jnp.where(batch["seg_map"] == NO_SEGMENT, K, batch["seg_map"]),
            K + 1,
        )[..., :K]
        t = jax.image.resize(onehot, (B, gh, gw, K), "linear")
        targets = (t > 0.5).astype(jnp.float32).transpose(0, 3, 1, 2).reshape(
            B, K, gh * gw
        )
        # Match on the final detection level.
        logits_f, boxes_f = outputs[-1]
        cost = detection_matching_cost(
            logits_f, boxes_f, batch["seg_labels"], batch["boxes"]
        )
        assignment = hungarian_match(
            jax.lax.stop_gradient(cost), batch["seg_valid"]
        )
        assigned = assignment >= 0
        safe_q = jnp.maximum(assignment, 0)
        pred = jnp.take_along_axis(mask_logits, safe_q[..., None], axis=1)
        sig = jax.nn.sigmoid(pred)
        bce = jnp.mean(
            targets * jax.nn.softplus(-pred)
            + (1 - targets) * jax.nn.softplus(pred),
            axis=-1,
        )
        dice = _dice_loss(sig, targets)
        denom = jnp.maximum(jnp.sum(assigned), 1.0)
        a = self.args
        mask_loss = (
            a.mask_weight * jnp.sum(bce * assigned) / denom
            + a.dice_weight * jnp.sum(dice * assigned) / denom
        )
        metrics = {**metrics, "mask_loss": mask_loss}
        return det_loss + mask_loss, (new_model_state, metrics)

    def val_step(self, params, model_state, batch):
        outputs, queries, feats, _ = self._apply_with_masks(
            params, model_state, batch["images"], False
        )
        mask_logits, (gh, gw) = self._mask_logits(params, feats, queries)
        logits_f, boxes_f = outputs[-1]
        C = self.args.num_classes
        scores = jax.nn.sigmoid(logits_f[..., :C])
        best_score = jnp.max(scores, axis=-1)
        best_label = jnp.argmax(scores, axis=-1)
        return {
            "pred_masks": jax.nn.sigmoid(mask_logits) > self.args.mask_threshold,
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
            B = c["pred_masks"].shape[0]
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
                tv = c["tgt_valid"][b]
                masks = np.stack([(tmap == k) for k in range(K)], axis=0)[tv]
                targets.append(
                    {"masks": masks, "labels": c["tgt_labels"][b][tv]}
                )

        def mask_iou(a, b):
            inter = (a[:, None] & b[None, :]).sum(-1).astype(np.float64)
            union = (a[:, None] | b[None, :]).sum(-1).astype(np.float64)
            return inter / np.maximum(union, 1e-9)

        out = compute_map_generic(predictions, targets, mask_iou, key="masks")
        return {"val_mask_map": out["map"], "val_mask_map50": out["map50"]}

    def predict(self, variables, images):
        """Returns (boxes xyxy norm, scores, labels, masks bool)."""
        params = variables["params"]
        model_state = {
            k: v for k, v in variables.items()
            if k not in ("params", "intermediates")
        }
        outputs, queries, feats, _ = self._apply_with_masks(
            params, model_state, images, False
        )
        boxes, scores, labels = self._decode(outputs)
        mask_logits, (gh, gw) = self._mask_logits(params, feats, queries)
        B, Q = mask_logits.shape[:2]
        masks = (jax.nn.sigmoid(mask_logits) > self.args.mask_threshold)
        return boxes, scores, labels, masks.reshape(B, Q, gh, gw)

    @property
    def watch_metric(self):
        return ("val_mask_map", "max")
