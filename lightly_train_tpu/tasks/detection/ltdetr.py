"""LT-DETR object detection train model.

Rebuild of ``src/lightly_train/_task_models/ltdetr_object_detection/``
(4,135 LoC + components): backbone (ViT single-scale expanded to 3 levels
like ``dino_vit_wrapper.py``, or CNN stage features), HybridEncoder,
DETR decoder with deformable cross-attention and iterative refinement,
VFL+L1+GIoU criterion with Hungarian matching, ModelEMA (``ema.py:28``,
via TaskTrainState.ema_params + warmup momentum), flat-cosine LR,
denoising-query training (``denoising.py``: noised GT groups with isolated
self-attention and identity-assignment losses), and step-windowed on-device
Mosaic/MixUp/zoom-out.
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
    # Encoder overrides for presets whose HybridEncoder runs at a different
    # width than the decoder (reference CNN/ConvNeXt configs: encoder 384,
    # decoder 256). None = follow d_model / dim_feedforward.
    enc_d_model: Optional[int] = None
    enc_dim_feedforward: Optional[int] = None
    # CSPRepLayer shape knobs (reference ``HybridEncoderConfig.expansion`` /
    # ``depth_mult``; csp_blocks = round(3 * depth_mult)).
    expansion: float = 1.0
    csp_blocks: int = 3
    upsample: bool = True
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
    # RandomRotate90 (reference ``ltdetr_transforms/utils.py:253-256``):
    # per-image k*90-degree rotations with exact box remapping. 0 = off.
    rotate90_prob: float = 0.0
    # Denoising query training (reference ``denoising.py``): number of noised
    # GT groups prepended to the decoder (0 disables).
    dn_groups: int = 2
    dn_box_noise: float = 0.4
    dn_label_noise: float = 0.25
    # Decoder variant: "dfine" (distribution-based refinement + LQE,
    # LT-DETRv2 default in the reference) or "rtdetrv2" (direct deltas).
    decoder: str = "dfine"
    # Per-level deformable sampling points + D-FINE bin count
    # (``DFINETransformerConfig.num_points`` / ``reg_max`` + 1).
    num_points: Tuple[int, int, int] = (4, 4, 4)
    dfine_bins: int = 33
    # ViT backbone adapter (DINOSTAs, ``dino_vit_wrapper.py:125-296``):
    # block tap indexes and STA conv-stem width; None = auto per model
    # size (``config.py:566-640``). Ignored for pyramid (CNN/ECViT)
    # backbones, which already emit (P3, P4, P5).
    interaction_indexes: Optional[Tuple[int, int, int]] = None
    use_sta: bool = True
    conv_inplane: Optional[int] = None
    default_steps: int = 60_000
    default_batch_size: int = 16


class _LTDETRModule(nn.Module):
    """Backbone feature pyramid + encoder + decoder in one module.

    ViT backbones go through the DINOSTAs adapter (three final-norm taps
    + STA conv stem, ``dino_vit_wrapper.py``); pyramid backbones
    (ECViT / ConvNeXt / ResNet / YOLO CSPDarknet) feed their last three
    stages directly (``ecvit_vit_wrapper.py:20-52``)."""

    wrapped: WrappedModel
    cfg: DetrConfig
    interaction_indexes: Optional[Tuple[int, int, int]] = None
    use_sta: bool = True
    conv_inplane: int = 32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False,
                 dn_labels=None, dn_boxes=None, dn_group_size: int = 0):
        from lightly_train_tpu.models.vit import VisionTransformer
        from lightly_train_tpu.tasks.detection.backbone_adapter import (
            DINOSTAs,
        )

        # Fresh instance of the backbone module bound under the stable name
        # "trunk" (all backbone modules take a single cfg attribute).
        trunk = type(self.wrapped.module)(self.wrapped.module.cfg, name="trunk")
        is_vit = isinstance(trunk, VisionTransformer)
        if is_vit and self.interaction_indexes is not None:
            out = trunk(
                images, train=False,
                tap_indices=tuple(self.interaction_indexes),
            )
        else:
            out = trunk(images, train=False)
        # Consumers with mutable=["intermediates"] (the instance-seg mask
        # head) reuse the trunk features instead of a second trunk forward.
        self.sow("intermediates", "trunk_features", out["features"])
        stage_feats = out.get("stage_features")
        if stage_feats is not None and len(stage_feats) >= 3:
            feats = stage_feats[-3:]  # /8, /16, /32 pyramid backbones
        else:
            taps = out.get("taps")
            if taps is None:
                # No tap indexes resolved (custom trunk): reuse the final
                # feature map for all three taps.
                f = out["features"]
                taps = [f, f, f]
            feats = DINOSTAs(
                hidden_dim=self.cfg.enc_dim,
                use_sta=self.use_sta,
                conv_inplane=self.conv_inplane,
                dtype=self.cfg.dtype,
                name="backbone_sta",
            )(images, taps, train)
        levels = HybridEncoder(self.cfg, name="encoder")(feats, train)
        # Highest-resolution encoder level (the torch seg decoder's
        # ``spatial_feat = proj_feats[0]``, ``edgecrafter_decoder.py:112``;
        # the decoder input proj is identity in the ECViT presets).
        self.sow("intermediates", "enc_p3", levels[0])
        return DETRDecoder(self.cfg, name="decoder")(
            levels, train, dn_labels=dn_labels, dn_boxes=dn_boxes,
            dn_group_size=dn_group_size,
        )


class ObjectDetectionTrainModel(TaskTrainModel):
    task = "object_detection"

    def __init__(self, wrapped: WrappedModel, args: ObjectDetectionArgs):
        super().__init__(wrapped, args)
        self.args: ObjectDetectionArgs = args
        self.cfg = DetrConfig(
            d_model=args.d_model,
            enc_d_model=getattr(args, "enc_d_model", None),
            num_heads=args.num_heads,
            num_queries=args.num_queries,
            num_decoder_layers=args.num_decoder_layers,
            dim_feedforward=args.dim_feedforward,
            enc_dim_feedforward=(
                getattr(args, "enc_dim_feedforward", None)
                or args.dim_feedforward
            ),
            expansion=getattr(args, "expansion", 1.0),
            csp_blocks=getattr(args, "csp_blocks", 3),
            upsample=getattr(args, "upsample", True),
            num_classes=args.num_classes,
            use_dfine=getattr(args, "decoder", "dfine") == "dfine",
            num_points=tuple(getattr(args, "num_points", (4, 4, 4))),
            dfine_bins=getattr(args, "dfine_bins", 33),
        )
        # ViT adapter resolution ("auto" per model size,
        # ``config.py:566-640``).
        indexes = getattr(args, "interaction_indexes", None)
        inplane = getattr(args, "conv_inplane", None)
        trunk_cfg = getattr(wrapped.module, "cfg", None)
        if trunk_cfg is not None and hasattr(trunk_cfg, "depth"):
            from lightly_train_tpu.tasks.detection.backbone_adapter import (
                resolve_vit_adapter,
            )

            auto_idx, factor = resolve_vit_adapter(
                trunk_cfg.embed_dim, trunk_cfg.depth
            )
            if indexes is None:
                indexes = auto_idx
            if inplane is None:
                inplane = factor * getattr(trunk_cfg, "patch_size", 16)
        self.module = _LTDETRModule(
            wrapped,
            self.cfg,
            interaction_indexes=(
                tuple(indexes) if indexes is not None else None
            ),
            use_sta=getattr(args, "use_sta", True),
            conv_inplane=inplane if inplane is not None else 32,
        )

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
        mosaic_w = getattr(a, "mosaic_window", None)
        mixup_w = getattr(a, "mixup_window", None)
        zoom_w = getattr(a, "zoom_out_window", None)
        rot90_p = getattr(a, "rotate90_prob", 0.0)
        if not (mosaic_w or mixup_w or zoom_w or rot90_p):
            return batch
        from lightly_train_tpu.ops.detection_augs import (
            detection_mixup,
            mosaic,
            random_rotate90,
            random_zoom_out,
            window_gate,
        )

        g_mosaic = (
            window_gate(step, *mosaic_w) * a.mosaic_prob
            if mosaic_w is not None else None
        )
        g_mixup = (
            window_gate(step, *mixup_w) * a.mixup_prob
            if mixup_w is not None else None
        )
        g_zoom = (
            window_gate(step, *zoom_w) * a.zoom_out_prob
            if zoom_w is not None else None
        )

        def aug(images, boxes, labels, valid, key, g_mosaic=g_mosaic,
                g_mixup=g_mixup, g_zoom=g_zoom):
            k1, k2, k3, k4 = jax.random.split(key[0], 4)
            if rot90_p > 0:
                images, boxes = random_rotate90(
                    k4, images, boxes, prob=rot90_p
                )
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

    def _apply(self, params, model_state, images, train, rng=None,
               want_intermediates=False, **kwargs):
        variables = {"params": params["backbone"], **model_state}
        mutable = [k for k in model_state] if (model_state and train) else []
        if want_intermediates:
            mutable = list(mutable) + ["intermediates"]
        rngs = {"droppath": rng} if (train and rng is not None) else None
        out = self.module.apply(
            variables, images, train=train, rngs=rngs,
            mutable=mutable or False, **kwargs,
        )

        def _pad(outputs):
            # The decoder emits reference-width (num_classes) logits; the
            # criterion/_decode contract carries one extra ignored column.
            return [
                (jnp.pad(lg, ((0, 0), (0, 0), (0, 1))), bx)
                for lg, bx in outputs
            ]

        if mutable:
            outputs, new_vars = out
            new_vars = dict(new_vars)
            inter = new_vars.pop("intermediates", None)
            if want_intermediates:
                return _pad(outputs), new_vars, inter
            return _pad(outputs), new_vars
        if want_intermediates:
            return _pad(out), model_state, None
        return _pad(out), model_state

    def _make_dn_queries(self, key, labels, boxes, valid):
        """Noised GT queries: jittered boxes + flipped labels, G groups."""
        a = self.args
        G = a.dn_groups
        K = labels.shape[1]
        B = labels.shape[0]
        k_box, k_size, k_label, k_flip = jax.random.split(key, 4)
        t_labels = jnp.tile(labels, (1, G))
        t_boxes = jnp.tile(boxes, (1, G, 1))
        t_valid = jnp.tile(valid, (1, G))
        # Center jitter within +-0.5*wh*noise; size scale in [1-n, 1+n].
        wh = t_boxes[..., 2:]
        c_noise = (
            jax.random.uniform(k_box, t_boxes[..., :2].shape) - 0.5
        ) * wh * a.dn_box_noise
        s_noise = 1.0 + (
            jax.random.uniform(k_size, wh.shape) - 0.5
        ) * 2.0 * a.dn_box_noise
        noised_boxes = jnp.clip(
            jnp.concatenate(
                [t_boxes[..., :2] + c_noise, wh * s_noise], axis=-1
            ),
            1e-4, 1.0,
        )
        flip = jax.random.uniform(k_flip, t_labels.shape) < a.dn_label_noise
        rand_label = jax.random.randint(
            k_label, t_labels.shape, 0, a.num_classes
        )
        noised_labels = jnp.where(flip, rand_label, t_labels)
        # Invalid slots use the no-object embedding index.
        noised_labels = jnp.where(t_valid, noised_labels, a.num_classes)
        return noised_labels, noised_boxes, t_labels, t_boxes, t_valid

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        a = self.args
        use_dn = a.dn_groups > 0
        dn_kwargs = {}
        if use_dn:
            k_dn, rng = jax.random.split(rng)
            (dn_labels, dn_boxes, dn_tgt_labels, dn_tgt_boxes,
             dn_tgt_valid) = self._make_dn_queries(
                k_dn, batch["labels"], batch["boxes"], batch["box_valid"]
            )
            dn_kwargs = dict(
                dn_labels=dn_labels, dn_boxes=dn_boxes,
                dn_group_size=batch["labels"].shape[1],
            )
        outputs, new_model_state, inter = self._apply(
            params, model_state, batch["images"], True, rng,
            want_intermediates=True, **dn_kwargs,
        )
        # D-FINE corner distributions (sown per decoder layer) for the
        # FGL/DDF losses; aligned with outputs: the encoder level (index 0)
        # and the pre level (index 1, the layer-0 traditional head) have
        # none (reference: pre_outputs carry no pred_corners).
        dfine_dists = None
        raw = None
        if inter is not None:
            # Walk to the sown tuple list regardless of module nesting.
            stack = [inter]
            while stack:
                node = stack.pop()
                if isinstance(node, dict):
                    if "dfine_dists" in node:
                        raw = node["dfine_dists"]
                        break
                    stack.extend(node.values())
            if raw:
                dfine_dists = [None, None] + list(raw)
        if use_dn:
            n_dn = dn_kwargs["dn_labels"].shape[1]
            # Level 0 (encoder) has no dn slots; decoder levels carry them.
            match_outputs = [outputs[0]] + [
                (l[:, n_dn:], b[:, n_dn:]) for l, b in outputs[1:]
            ]
            dn_outputs = [(l[:, :n_dn], b[:, :n_dn]) for l, b in outputs[1:]]
            if dfine_dists is not None:
                dfine_dists = [None, None] + [
                    (d[:, n_dn:], b[:, n_dn:])
                    for d, b in dfine_dists[2:]
                ]
        else:
            match_outputs = outputs
            dn_outputs = []
        loss, metrics = detection_criterion(
            match_outputs, batch["labels"], batch["boxes"], batch["box_valid"],
            dists=dfine_dists,
        )
        if dn_outputs:
            from lightly_train_tpu.tasks.detection.criterion import (
                detection_loss_from_assignment,
                dfine_fgl_ddf_loss,
            )

            n_dn = dn_kwargs["dn_labels"].shape[1]
            identity = jnp.where(
                dn_tgt_valid,
                jnp.arange(n_dn, dtype=jnp.int32)[None, :],
                -1,
            )
            # dn pairs ARE the identity mapping (get_cdn_matched_indices);
            # dn_num_boxes = num targets * groups (dfine_criterion.py:496).
            dn_num = jnp.maximum(jnp.sum(dn_tgt_valid), 1.0)
            dn_q = jnp.arange(n_dn, dtype=jnp.int32)[None, :].repeat(
                identity.shape[0], 0
            )
            # dn_dists aligned with dn_outputs: [pre (no corners)] + layers.
            dn_dists = (
                [None] + [(d[:, :n_dn], b[:, :n_dn]) for d, b in raw]
                if raw
                else None
            )
            dn_teacher = dn_dists[-1] if dn_dists else None
            dn_total = 0.0
            for lv, (l, b) in enumerate(dn_outputs):
                b = jnp.clip(b, 0.0, 1.0)  # reference box sanitization
                losses = detection_loss_from_assignment(
                    l, b, dn_tgt_labels, dn_tgt_boxes, identity
                )
                lvl = (
                    losses["loss_vfl"] + 5.0 * losses["loss_l1"]
                    + 2.0 * losses["loss_giou"]
                )
                if dn_dists is not None and dn_dists[lv] is not None:
                    fgl, ddf = dfine_fgl_ddf_loss(
                        dn_dists[lv][0], dn_dists[lv][1], b,
                        dn_teacher[0], dn_outputs[-1][0],
                        dn_tgt_boxes, dn_q, dn_q, dn_tgt_valid, dn_num,
                        is_final=(lv == len(dn_outputs) - 1),
                    )
                    lvl = lvl + 0.15 * fgl + 1.5 * ddf
                dn_total = dn_total + lvl
            # Reference sums weighted dn losses over decoder levels
            # (dfine_criterion.py:494-541; per-box normalization already
            # accounts for the group count via dn_num_boxes).
            metrics = {**metrics, "dn_loss": dn_total}
            loss = loss + dn_total
        return loss, (new_model_state, metrics)

    def _decode(self, outputs, return_q: bool = False):
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
        if return_q:
            return cxcywh_to_xyxy(sel_boxes), top_scores, cls_idx, q_idx
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

    def convert_to_deploy(self, variables):
        """RepVgg branch fusion for inference (``hybrid_encoder.py:76-108``).

        Returns (deploy_model, deploy_variables): a model whose CSPRep
        bottlenecks are single biased 3x3 convs and the matching fused
        param tree. Eval-mode outputs are numerically identical (tested).
        """
        import copy
        import dataclasses as _dc

        from lightly_train_tpu.tasks.detection.components import (
            fuse_repvgg,
            strip_fused_batch_stats,
        )

        deploy = copy.copy(self)
        deploy.cfg = _dc.replace(self.cfg, deploy=True)
        deploy.module = _LTDETRModule(
            self.wrapped,
            deploy.cfg,
            interaction_indexes=self.module.interaction_indexes,
            use_sta=self.module.use_sta,
            conv_inplane=self.module.conv_inplane,
        )
        stats = variables.get("batch_stats", {})
        new_vars = {
            k: v
            for k, v in variables.items()
            if k not in ("params", "batch_stats")
        }
        # ``init`` wraps the module params under "backbone"
        # (``_apply`` unwraps); batch_stats are unwrapped. Sibling param
        # groups (e.g. the instance-seg "mask_head") pass through.
        inner = variables["params"]["backbone"]
        new_params = dict(variables["params"])
        new_params["backbone"] = fuse_repvgg(inner, stats)
        new_vars["params"] = new_params
        stripped = strip_fused_batch_stats(inner, stats)
        if stripped:
            new_vars["batch_stats"] = stripped
        return deploy, new_vars

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
