"""Image classification fine-tuning task.

Rebuild of ``src/lightly_train/_task_models/image_classification/``
(1,221 LoC): backbone + linear head, optional backbone freeze, CE loss with
label smoothing, top-1/top-5 accuracy validation; dataset is a class-subdir
ImageFolder (``_data/image_classification_dataset.py``).
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
from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD
from lightly_train_tpu.tasks.base import TaskArgs, TaskTrainModel


class ImageClassificationArgs(TaskArgs):
    num_classes: int = 1000
    freeze_backbone: bool = False
    label_smoothing: float = 0.0
    default_steps: int = 20_000
    default_batch_size: int = 128


class _Head(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.num_classes, name="fc")(x)


class ImageClassificationTrainModel(TaskTrainModel):
    task = "image_classification"
    transform_kind = "image_classification"

    def __init__(self, wrapped: WrappedModel, args: ImageClassificationArgs):
        super().__init__(wrapped, args)
        self.args: ImageClassificationArgs = args
        self.head = _Head(args.num_classes)

    def init(self, rng, sample_batch):
        kb, kh = jax.random.split(rng)
        backbone_vars = self.wrapped.init(kb, sample_batch["images"])
        backbone_params = backbone_vars.pop("params")
        model_state = dict(backbone_vars)
        head_params = self.head.init(
            kh, jnp.zeros((1, self.wrapped.feature_dim))
        )["params"]
        return {"backbone": backbone_params, "head": head_params}, model_state

    def _forward(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        mutable = [k for k in model_state] if (model_state and train) else False
        rngs = {"droppath": rng} if (train and rng is not None) else None
        out = self.wrapped.forward_features(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        if mutable:
            out, new_model_state = out
        else:
            new_model_state = model_state
        pooled = self.wrapped.forward_pool(out)
        logits = self.head.apply({"params": params["head"]}, pooled)
        return logits, new_model_state

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        images, labels = batch["images"], batch["labels"]
        if self.args.freeze_backbone:
            params = {
                "backbone": jax.lax.stop_gradient(params["backbone"]),
                "head": params["head"],
            }
        logits, new_model_state = self._forward(
            params, model_state, images, train=True, rng=rng
        )
        logits = logits.astype(jnp.float32)
        num_classes = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, num_classes)
        if self.args.label_smoothing > 0:
            s = self.args.label_smoothing
            onehot = onehot * (1.0 - s) + s / num_classes
        loss = -jnp.mean(
            jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, (new_model_state, {"train_acc": acc})

    def val_step(self, params, model_state, batch):
        images, labels = batch["images"], batch["labels"]
        valid = batch.get("valid")
        logits, _ = self._forward(params, model_state, images, train=False)
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -logp[jnp.arange(labels.shape[0]), labels]
        top1 = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        k = min(5, logits.shape[-1])
        topk_idx = jax.lax.top_k(logits, k)[1]
        topk = jnp.any(topk_idx == labels[:, None], axis=-1).astype(jnp.float32)
        w = (
            valid.astype(jnp.float32)
            if valid is not None
            else jnp.ones_like(top1)
        )
        # Device-summed confusion for macro-F1 (reference classification
        # metric package: accuracy + F1, ``_metrics/`` SURVEY §2.10).
        nc = logits.shape[-1]
        pred = jnp.argmax(logits, -1)
        cm = jnp.bincount(
            (labels * nc + pred).reshape(-1),
            weights=w.reshape(-1),
            length=nc * nc,
        ).reshape(nc, nc)
        return {
            "sum_loss": jnp.sum(ce * w),
            "sum_top1": jnp.sum(top1 * w),
            "sum_top5": jnp.sum(topk * w),
            "count": jnp.sum(w),
            "confusion": cm,
        }

    def val_finalize(self, stats):
        n = max(float(stats["count"]), 1.0)
        cm = np.asarray(stats["confusion"])
        tp = np.diag(cm)
        fp = cm.sum(0) - tp
        fn = cm.sum(1) - tp
        present = (tp + fn) > 0
        f1 = np.where(
            present, 2 * tp / np.maximum(2 * tp + fp + fn, 1e-9), 0.0
        )
        return {
            "val_loss": float(stats["sum_loss"]) / n,
            "val_top1": float(stats["sum_top1"]) / n,
            "val_top5": float(stats["sum_top5"]) / n,
            "val_f1": float(f1[present].mean()) if present.any() else 0.0,
        }

    def predict(self, variables, images):
        """images: preprocessed (B, H, W, 3) float; returns class probs."""
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        logits, _ = self._forward(params, model_state, images, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    @property
    def watch_metric(self):
        return ("val_top1", "max")


# ---------------------------------------------------------------------------
# Dataset: ImageFolder with class subdirectories
# ---------------------------------------------------------------------------


class ImageClassificationDataset:
    """``root/<class_name>/<image>`` layout -> (image, label)."""

    def __init__(
        self,
        root: Path,
        image_hw: Tuple[int, int] = (224, 224),
        classes: Optional[List[str]] = None,
    ):
        """``classes`` pins the label mapping (pass the TRAIN split's list
        when building a val split: a class dir missing from val would
        otherwise silently shift every later index)."""
        root = Path(root)
        if not root.exists():
            raise DatasetError(f"Dataset root does not exist: {root}")
        present = sorted(d.name for d in root.iterdir() if d.is_dir())
        if not present:
            raise DatasetError(f"No class subdirectories under {root}")
        if classes is None:
            self.classes = present
        else:
            unknown = sorted(set(present) - set(classes))
            if unknown:
                raise DatasetError(
                    f"Classes {unknown} under {root} are not in the train "
                    f"split's class list {sorted(classes)}"
                )
            self.classes = list(classes)
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in [c for c in self.classes if c in present]:
            for p in sorted((root / c).rglob("*")):
                if p.suffix.lower() in IMAGE_EXTENSIONS and p.is_file():
                    self.samples.append((str(p), self.class_to_idx[c]))
        if not self.samples:
            raise DatasetError(f"No images under {root}")
        self.image_hw = image_hw

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        path, label = self.samples[index]
        return {
            "images": decode_image(path, self.image_hw),
            "labels": np.int32(label),
        }
