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


class _DepthwiseConvBlock(nn.Module):
    """Reference ``DepthwiseConvBlock`` (``edgecrafter_head.py:34-59``):
    residual dwconv3x3 -> LN(1e-6) -> Linear -> GELU (layer scale disabled
    in every shipped preset). NHWC."""

    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        return x + h


class ECSegMaskHead(nn.Module):
    """Parameter-isomorphic rebuild of the reference EdgeCrafter mask head
    (``instance_segmentation_components/edgecrafter_head.py:91-224``).

    The /8 encoder level is bilinearly resized to image/4, refined by one
    cumulative DepthwiseConvBlock per decoder layer, and dot-producted with
    MLP-refined + projected per-layer query states; a learned scalar bias is
    added. Returns one (B, Q, Hm, Wm) logit tensor per decoder layer."""

    dim: int
    num_blocks: int
    downsample_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        spatial: jax.Array,  # (B, H8, W8, C) NHWC
        query_states,  # sequence of (B, Q, C), one per decoder layer
        image_hw: Tuple[int, int],
    ):
        B = spatial.shape[0]
        th = image_hw[0] // self.downsample_ratio
        tw = image_hw[1] // self.downsample_ratio
        x = jax.image.resize(
            spatial.astype(jnp.float32), (B, th, tw, spatial.shape[-1]),
            "bilinear", antialias=False,
        ).astype(spatial.dtype)
        # bottleneck_ratio=1 in every preset: real 1x1 conv / Linear projs.
        spatial_proj = nn.Conv(
            self.dim, (1, 1), dtype=self.dtype, name="spatial_proj"
        )
        query_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="query_norm"
        )
        query_fc1 = nn.Dense(4 * self.dim, dtype=self.dtype, name="query_fc1")
        query_fc2 = nn.Dense(self.dim, dtype=self.dtype, name="query_fc2")
        query_proj = nn.Dense(self.dim, dtype=self.dtype, name="query_proj")
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)

        out = []
        for i, q in enumerate(query_states[: self.num_blocks]):
            x = _DepthwiseConvBlock(
                self.dim, self.dtype, name=f"block{i}"
            )(x)
            sp = spatial_proj(x)
            qh = q + query_fc2(nn.gelu(query_fc1(query_norm(q)),
                                       approximate=False))
            qp = query_proj(qh)
            logits = jnp.einsum(
                "bhwc,bqc->bqhw", sp.astype(jnp.float32),
                qp.astype(jnp.float32),
            ) + bias[0]
            out.append(logits)
        return out


class InstanceSegmentationLTDETRArgs(ObjectDetectionArgs):
    # Mask head architecture: "edgecrafter" = the reference's cumulative
    # depthwise-refinement head (parameter-isomorphic, convert-on-load for
    # zoo checkpoints); "linear" = the original lightweight query/pixel
    # projection head (kept for pre-r5 artifacts).
    mask_head_arch: str = "edgecrafter"
    mask_dim: int = 64
    # Reference ``loss_weight_dict``: loss_mask 5.0, loss_dice 5.0
    # (``ltdetr_instance_segmentation/train_model.py:86-87``).
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    # Point-sampled mask loss budget: H*W // ratio, floored at H
    # (``edgecrafter_criterion.py:121-126``; train_model.py:154 ratio=16).
    mask_point_sample_ratio: int = 16
    max_instances: int = 50
    mask_threshold: float = 0.5


class LTDETRInstanceSegmentationTrainModel(ObjectDetectionTrainModel):
    task = "instance_segmentation"

    def __init__(self, wrapped: WrappedModel,
                 args: InstanceSegmentationLTDETRArgs):
        super().__init__(wrapped, args)
        self.args: InstanceSegmentationLTDETRArgs = args
        if args.mask_head_arch == "edgecrafter":
            if self.cfg.enc_dim != self.cfg.d_model:
                raise ValueError(
                    "The EdgeCrafter mask head requires encoder and decoder "
                    "widths to match (every reference seg preset does)."
                )
            self.mask_module = ECSegMaskHead(
                dim=self.cfg.d_model,
                num_blocks=self.cfg.num_decoder_layers,
                dtype=self.cfg.dtype,
            )

    # The detection module is reused; the mask head params live in
    # an extra flax module applied to sown decoder queries + features.
    def _apply_with_masks(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        mutable = ["intermediates"] + (
            [k for k in model_state] if (model_state and train) else []
        )
        rngs = {"droppath": rng} if (train and rng is not None) else None
        (outputs), aux = self.module.apply(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        inter = aux["intermediates"]
        if self.args.mask_head_arch == "edgecrafter":
            # Per-layer decoder query states + the /8 encoder level feed the
            # cumulative EdgeCrafter head (torch ``return_query_states``).
            queries = list(inter["decoder"]["query_states"])
            feats = inter["enc_p3"][0]
        else:
            queries = inter["decoder"]["final_queries"][0]
            # Trunk features sown by _LTDETRModule: the mask head projects
            # them directly — no second backbone forward.
            feats = inter["trunk_features"][0]
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
        images = sample_batch["images"].astype(jnp.float32)
        variables = self.module.init(
            {"params": k1, "droppath": k2}, images, train=False,
        )
        params = {"backbone": variables["params"]}
        model_state = {
            k: v for k, v in variables.items()
            if k not in ("params", "intermediates")
        }
        D = self.cfg.d_model
        if self.args.mask_head_arch == "edgecrafter":
            B, H, W = images.shape[0], images.shape[1], images.shape[2]
            spatial = jnp.zeros((B, H // 8, W // 8, D), self.cfg.dtype)
            qs = [
                jnp.zeros((B, self.args.num_queries, D), self.cfg.dtype)
                for _ in range(self.cfg.num_decoder_layers)
            ]
            mh_vars = self.mask_module.init(k3, spatial, qs, (H, W))
            params["mask_head"] = mh_vars["params"]
        else:
            # Legacy head: query proj + pixel proj on backbone features.
            feat_dim = self.wrapped.feature_dim
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
                        jax.random.fold_in(k3, 1), (feat_dim, md),
                        jnp.float32
                    ),
                    "bias": jnp.zeros((md,), jnp.float32),
                },
            }
        return params, model_state

    def _mask_logits(self, params, feats, queries, image_hw=None):
        """-> flattened final-layer mask logits (B, Q, n) + their grid."""
        if self.args.mask_head_arch == "edgecrafter":
            levels = self.mask_module.apply(
                {"params": params["mask_head"]}, feats, queries, image_hw
            )
            final = levels[-1]
            B, Q, th, tw = final.shape
            return final.reshape(B, Q, th * tw), (th, tw)
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
        k_pts, rng = jax.random.split(rng)
        outputs, queries, feats, new_model_state = self._apply_with_masks(
            params, model_state, batch["images"], True, rng
        )
        det_loss, metrics = detection_criterion(
            outputs, batch["seg_labels"], batch["boxes"], batch["seg_valid"]
        )
        a = self.args
        image_hw = batch["images"].shape[1:3]
        mask_logits, (gh, gw) = self._mask_logits(
            params, feats, queries, image_hw
        )
        K = batch["seg_labels"].shape[1]
        B = batch["seg_map"].shape[0]
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
        if a.mask_head_arch == "edgecrafter":
            # Point-sampled CE+dice at importance-sampled coordinates
            # (``edgecrafter_criterion.loss_masks``): budget
            # max(H, H*W//ratio); targets nearest-sampled from the slot map.
            from lightly_train_tpu.ops.point_sampling import (
                bilinear_point_sample,
                uncertainty_point_coords,
            )

            P = max(gh, gh * gw // a.mask_point_sample_ratio)
            flat_pred = pred.reshape(B * K, gh, gw)
            coords = uncertainty_point_coords(
                k_pts, jax.lax.stop_gradient(flat_pred).astype(jnp.float32),
                P, 3.0, 0.75,
            )  # (B*K, P, 2)
            pred_p = bilinear_point_sample(
                flat_pred[:, None], coords
            ).reshape(B, K, P).astype(jnp.float32)
            # Nearest-neighbor target sampling (torch grid_sample
            # mode="nearest", align_corners=False) from the slot-id map.
            id_map = batch["seg_map"].astype(jnp.int32)  # (B, H, W)
            H, W = id_map.shape[1:3]
            c = coords.reshape(B, K * P, 2)
            yi = jnp.clip(
                jnp.round(c[..., 0] * H - 0.5).astype(jnp.int32), 0, H - 1
            )
            xi = jnp.clip(
                jnp.round(c[..., 1] * W - 0.5).astype(jnp.int32), 0, W - 1
            )
            ids = jnp.take_along_axis(
                id_map.reshape(B, H * W), yi * W + xi, axis=1
            ).reshape(B, K, P)
            targets_p = (
                ids == jnp.arange(K, dtype=jnp.int32)[None, :, None]
            ).astype(jnp.float32)
            sig = jax.nn.sigmoid(pred_p)
            bce = jnp.mean(
                targets_p * jax.nn.softplus(-pred_p)
                + (1 - targets_p) * jax.nn.softplus(pred_p),
                axis=-1,
            )
            dice = _dice_loss(sig, targets_p)
        else:
            # Legacy head: full-mask loss at the head's grid resolution.
            onehot = jax.nn.one_hot(
                jnp.where(
                    batch["seg_map"] == NO_SEGMENT, K, batch["seg_map"]
                ),
                K + 1,
            )[..., :K]
            t = jax.image.resize(onehot, (B, gh, gw, K), "linear")
            targets = (
                (t > 0.5).astype(jnp.float32)
                .transpose(0, 3, 1, 2).reshape(B, K, gh * gw)
            )
            sig = jax.nn.sigmoid(pred)
            bce = jnp.mean(
                targets * jax.nn.softplus(-pred)
                + (1 - targets) * jax.nn.softplus(pred),
                axis=-1,
            )
            dice = _dice_loss(sig, targets)
        denom = jnp.maximum(jnp.sum(assigned), 1.0)
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
        mask_logits, (gh, gw) = self._mask_logits(
            params, feats, queries, batch["images"].shape[1:3]
        )
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
        boxes, scores, labels, q_idx = self._decode(outputs, return_q=True)
        mask_logits, (gh, gw) = self._mask_logits(
            params, feats, queries, images.shape[1:3]
        )
        # Align masks with the top-k detections (gather by query index).
        sel = jnp.take_along_axis(mask_logits, q_idx[..., None], axis=1)
        B, k = sel.shape[:2]
        masks = jax.nn.sigmoid(sel) > self.args.mask_threshold
        return boxes, scores, labels, masks.reshape(B, k, gh, gw)

    @property
    def watch_metric(self):
        return ("val_mask_map", "max")
