"""Multihead task variants: several heads trained simultaneously.

Rebuild of ``src/lightly_train/_task_models/image_classification_multihead/``
(753 LoC) and ``semantic_segmentation_multihead/`` (1,033 LoC): N heads share
one (usually frozen) backbone forward pass and train at different learning
rates in a single run — the reference uses this for LR sweeps / multi-dataset
probing. Each head gets an LR multiplier applied through the optimizer's
per-leaf scale tree; validation reports per-head metrics and the watch
metric tracks the best head.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.tasks.base import TaskArgs, TaskTrainModel
from lightly_train_tpu.tasks.image_classification import (
    ImageClassificationArgs,
    ImageClassificationTrainModel,
)
from lightly_train_tpu.tasks.semantic_segmentation_linear import (
    LinearSemanticSegmentationArgs,
    LinearSemanticSegmentationTrainModel,
)


class ImageClassificationMultiheadArgs(ImageClassificationArgs):
    # head name -> learning-rate multiplier
    head_lr_multipliers: Dict[str, float] = {"head_1x": 1.0, "head_01x": 0.1}
    freeze_backbone: bool = True


class ImageClassificationMultiheadTrainModel(ImageClassificationTrainModel):
    task = "image_classification_multihead"

    def __init__(self, wrapped: WrappedModel,
                 args: ImageClassificationMultiheadArgs):
        super().__init__(wrapped, args)
        self.args: ImageClassificationMultiheadArgs = args
        self.head_names = sorted(args.head_lr_multipliers)

    def init(self, rng, sample_batch):
        keys = jax.random.split(rng, len(self.head_names) + 1)
        backbone_vars = self.wrapped.init(keys[0], sample_batch["images"])
        backbone_params = backbone_vars.pop("params")
        model_state = dict(backbone_vars)
        heads = {}
        for k, name in zip(keys[1:], self.head_names):
            heads[name] = self.head.init(
                k, jnp.zeros((1, self.wrapped.feature_dim))
            )["params"]
        return {"backbone": backbone_params, "heads": heads}, model_state

    def _pooled(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        mutable = [k for k in model_state] if (model_state and train) else False
        rngs = {"droppath": rng} if (train and rng is not None) else None
        out = self.wrapped.forward_features(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        if mutable:
            out, new_state = out
        else:
            new_state = model_state
        return self.wrapped.forward_pool(out), new_state

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        images, labels = batch["images"], batch["labels"]
        backbone = params["backbone"]
        frozen = self.args.freeze_backbone
        if frozen:
            backbone = jax.lax.stop_gradient(backbone)
        # A frozen probe backbone must run in EVAL mode: train=True would
        # keep updating BatchNorm stats and apply droppath inside the
        # supposedly fixed feature extractor, making per-head LR
        # comparisons (this class's purpose) noisy.
        pooled, new_state = self._pooled(
            {"backbone": backbone}, model_state, images, not frozen, rng
        )
        total = 0.0
        metrics = {}
        for name in self.head_names:
            logits = self.head.apply(
                {"params": params["heads"][name]}, pooled
            ).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            sm = float(getattr(self.args, "label_smoothing", 0.0) or 0.0)
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            if sm > 0.0:
                onehot = onehot * (1.0 - sm) + sm / logits.shape[-1]
            ce = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
            total = total + ce
            metrics[f"loss_{name}"] = ce
        return total / len(self.head_names), (new_state, metrics)

    def val_step(self, params, model_state, batch):
        images, labels = batch["images"], batch["labels"]
        valid = batch.get("valid")
        pooled, _ = self._pooled(params, model_state, images, False)
        w = (
            valid.astype(jnp.float32)
            if valid is not None
            else jnp.ones((labels.shape[0],), jnp.float32)
        )
        stats = {"count": jnp.sum(w)}
        for name in self.head_names:
            logits = self.head.apply({"params": params["heads"][name]}, pooled)
            top1 = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            stats[f"sum_top1_{name}"] = jnp.sum(top1 * w)
        return stats

    def val_finalize(self, stats):
        n = max(float(stats["count"]), 1.0)
        out = {}
        for name in self.head_names:
            out[f"val_top1_{name}"] = float(stats[f"sum_top1_{name}"]) / n
        out["val_top1_best"] = max(
            out[f"val_top1_{n}"] for n in self.head_names
        )
        return out

    def predict(self, variables, images):
        """Probs of the first head (export-time best-head selection TBD)."""
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        pooled, _ = self._pooled(params, model_state, images, False)
        logits = self.head.apply(
            {"params": params["heads"][self.head_names[0]]}, pooled
        )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def lr_scales(self, params):
        scales = jax.tree_util.tree_map(lambda _: 1.0, params)
        scales["heads"] = {
            name: jax.tree_util.tree_map(
                lambda _: float(self.args.head_lr_multipliers[name]),
                params["heads"][name],
            )
            for name in self.head_names
        }
        return scales

    @property
    def watch_metric(self):
        return ("val_top1_best", "max")


class SemanticSegmentationMultiheadArgs(LinearSemanticSegmentationArgs):
    head_lr_multipliers: Dict[str, float] = {"head_1x": 1.0, "head_01x": 0.1}


class SemanticSegmentationMultiheadTrainModel(
    LinearSemanticSegmentationTrainModel
):
    task = "semantic_segmentation_multihead"

    def __init__(self, wrapped: WrappedModel,
                 args: SemanticSegmentationMultiheadArgs):
        super().__init__(wrapped, args)
        self.args: SemanticSegmentationMultiheadArgs = args
        self.head_names = sorted(args.head_lr_multipliers)

    def init(self, rng, sample_batch):
        keys = jax.random.split(rng, len(self.head_names) + 1)
        backbone_vars = self.wrapped.init(keys[0], sample_batch["images"])
        backbone_params = backbone_vars.pop("params")
        model_state = dict(backbone_vars)
        feats = self.wrapped.forward_features(
            {"params": backbone_params, **model_state}, sample_batch["images"]
        )["features"]
        heads = {
            name: self.head.init(k, feats)["params"]
            for k, name in zip(keys[1:], self.head_names)
        }
        return {"backbone": backbone_params, "heads": heads}, model_state

    def _head_logits(self, params, head_name, feats, out_hw):
        logits = self.head.apply({"params": params["heads"][head_name]}, feats)
        B = feats.shape[0]
        return jax.image.resize(
            logits.astype(jnp.float32),
            (B,) + out_hw + (self.args.num_classes,), "bilinear",
        )

    def _feats(self, params, model_state, images):
        variables = {"params": params["backbone"], **model_state}
        return self.wrapped.forward_features(variables, images)["features"]

    def loss_fn(self, params, model_state, batch, rng, step):
        del rng, step
        if not self.args.freeze_backbone:
            raise NotImplementedError(
                "semantic_segmentation_multihead trains linear probes on a "
                "FROZEN backbone (reference semantics); freeze_backbone="
                "False is not supported here — use train_semantic_"
                "segmentation for backbone fine-tuning."
            )
        images, masks = batch["images"], batch["masks"]
        backbone = jax.lax.stop_gradient(params["backbone"])
        feats = self._feats({"backbone": backbone}, model_state, images)
        valid = masks != self.args.ignore_index
        labels = jnp.where(valid, masks, 0)
        total = 0.0
        metrics = {}
        for name in self.head_names:
            logits = self._head_logits(params, name, feats, masks.shape[1:3])
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            total = total + loss
            metrics[f"loss_{name}"] = loss
        return total / len(self.head_names), (model_state, metrics)

    def val_step(self, params, model_state, batch):
        images, masks = batch["images"], batch["masks"]
        sample_valid = batch.get("valid")
        # Tiled validation above the training resolution, like the parent
        # task (``val_tile_size`` set by run_task_training).
        ts = getattr(self, "val_tile_size", None)
        H, W = images.shape[1:3]
        tiled = ts is not None and (H > ts or W > ts)
        feats = None if tiled else self._feats(params, model_state, images)
        valid = masks != self.args.ignore_index
        if sample_valid is not None:
            valid = valid & sample_valid[:, None, None]
        labels = jnp.where(valid, masks, 0)
        nc = self.args.num_classes
        stats = {}
        for name in self.head_names:
            if tiled:
                from lightly_train_tpu.tasks.tiling import tiled_logits

                logits = tiled_logits(
                    lambda t, _n=name: self._head_logits(
                        params, _n,
                        self._feats(params, model_state, t), t.shape[1:3],
                    ),
                    images, nc, int(ts),
                )
            else:
                logits = self._head_logits(
                    params, name, feats, masks.shape[1:3]
                )
            pred = jnp.argmax(logits, axis=-1)
            idx = labels * nc + jnp.where(valid, pred, 0)
            stats[f"confusion_{name}"] = jnp.bincount(
                idx.reshape(-1),
                weights=valid.reshape(-1).astype(jnp.float32),
                length=nc * nc,
            ).reshape(nc, nc)
        return stats

    def val_finalize(self, stats):
        out = {}
        for name in self.head_names:
            cm = np.asarray(stats[f"confusion_{name}"])
            tp = np.diag(cm)
            union = cm.sum(0) + cm.sum(1) - tp
            present = union > 0
            iou = np.where(present, tp / np.maximum(union, 1e-9), 0.0)
            out[f"val_miou_{name}"] = (
                float(iou[present].mean()) if present.any() else 0.0
            )
        out["val_miou_best"] = max(
            out[f"val_miou_{n}"] for n in self.head_names
        )
        return out

    def predict(self, variables, images):
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        feats = self._feats(params, model_state, images)
        logits = self._head_logits(
            params, self.head_names[0], feats, images.shape[1:3]
        )
        return jnp.argmax(logits, axis=-1)

    def lr_scales(self, params):
        scales = jax.tree_util.tree_map(lambda _: 1.0, params)
        scales["heads"] = {
            name: jax.tree_util.tree_map(
                lambda _: float(self.args.head_lr_multipliers[name]),
                params["heads"][name],
            )
            for name in self.head_names
        }
        return scales

    @property
    def watch_metric(self):
        return ("val_miou_best", "max")
