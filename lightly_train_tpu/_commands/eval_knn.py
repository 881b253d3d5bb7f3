"""``evaluate_knn``: weighted-kNN evaluation of a pretrained backbone.

The DINO eval protocol behind the reference's headline pretrain metric
(ImageNet val kNN accuracy, ``README.md:506-514`` / BASELINE.md): embed the
train and val splits with the frozen backbone, classify val embeddings by
temperature-weighted cosine kNN votes over train embeddings.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Literal

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._checkpoint.checkpoint import load_exported_model
from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD
from lightly_train_tpu.tasks.image_classification import (
    ImageClassificationDataset,
)
from lightly_train_tpu.utils.knn import knn_accuracy

logger = get_logger("knn")


class EvalKnnConfig(PydanticConfig):
    data: Dict[str, str]  # {"train": dir, "val": dir} ImageFolder roots
    checkpoint: str
    image_size: int = 224
    batch_size: int = 256
    k: int = 20
    temperature: float = 0.07
    precision: Literal["bf16", "fp32"] = "fp32"


def evaluate_knn(
    data: Dict[str, str], checkpoint: str, **kwargs: Any
) -> Dict[str, float]:
    config = pydantic_model_validate(
        EvalKnnConfig, {"data": data, "checkpoint": checkpoint, **kwargs}
    )
    set_up_console_logging()
    artifact = load_exported_model(Path(config.checkpoint))
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    wrapped = get_wrapped_model(artifact["model_name"], dtype=dtype)
    variables = artifact["variables"]
    hw = (config.image_size, config.image_size)

    @jax.jit
    def embed_batch(imgs: jax.Array) -> jax.Array:
        x = imgs.astype(jnp.float32) / 255.0
        x = ((x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)).astype(
            dtype
        )
        out = wrapped.forward_features(variables, x, train=False)
        return wrapped.forward_pool(out).astype(jnp.float32)

    def embed_split(root: str, classes=None):
        ds = ImageClassificationDataset(Path(root), hw, classes=classes)
        feats, labels = [], []
        bs = config.batch_size
        for start in range(0, len(ds), bs):
            idx = range(start, min(start + bs, len(ds)))
            items = [ds[i] for i in idx]
            batch = np.stack([it["images"] for it in items])
            pad = bs - len(items)
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)]
                )
            z = np.asarray(embed_batch(jnp.asarray(batch)))[: len(items)]
            feats.append(z)
            labels.extend(int(it["labels"]) for it in items)
        return (
            jnp.asarray(np.concatenate(feats)),
            jnp.asarray(np.asarray(labels, np.int32)),
            ds.classes,
        )

    train_z, train_y, classes = embed_split(config.data["train"])
    # Pin the val split to the train label mapping: a class dir missing
    # from val would otherwise shift every later index silently.
    val_z, val_y, _ = embed_split(config.data["val"], classes=classes)
    acc = knn_accuracy(
        val_z, val_y, train_z, train_y,
        num_classes=len(classes), k=config.k,
        temperature=config.temperature,
    )
    logger.info(
        "kNN top-1: %.4f (%d train, %d val, k=%d)",
        acc, train_z.shape[0], val_z.shape[0], config.k,
    )
    return {"knn_top1": float(acc)}
