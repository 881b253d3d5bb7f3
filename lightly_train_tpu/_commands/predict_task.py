"""``predict_semantic_segmentation``: batch autolabeling to PNG masks.

Rebuild of ``src/lightly_train/_commands/predict_task.py:93-203``: load a
fine-tuned segmentation model, run single-pass inference over a directory,
write one PNG class-id mask per image (the autolabel workflow behind the
README's ADE20K gains, BASELINE.md).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Union

import numpy as np

from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._data import list_image_files
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.tasks.model_io import load_model

logger = get_logger("predict")


class PredictSemanticSegmentationConfig(PydanticConfig):
    out: str
    data: str
    checkpoint: str
    image_size: int = 512
    # Tiled native-resolution inference (EoMT models): images larger than
    # image_size are processed as overlapping image_size tiles with logit
    # averaging instead of being downscaled (the reference's val-time
    # tiling, ``task_model.py:511-583``).
    tiled: bool = False


def predict_semantic_segmentation(
    out: str, data: str, checkpoint: str, **kwargs: Any
) -> Path:
    config = pydantic_model_validate(
        PredictSemanticSegmentationConfig,
        {"out": out, "data": data, "checkpoint": checkpoint, **kwargs},
    )
    set_up_console_logging()
    model = load_model(config.checkpoint, image_size=config.image_size)
    from lightly_train_tpu._events import tracker

    tracker.track_inference_started(
        task_type="semantic_segmentation",
        model=getattr(model, "model_name", "?"),
    )
    if model.task != "semantic_segmentation":
        raise ConfigError(
            f"Checkpoint task is '{model.task}', expected semantic_segmentation."
        )
    from PIL import Image

    out_dir = Path(config.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = list_image_files(Path(config.data))
    tiled_fn = getattr(model.train_model, "predict_tiled", None)
    for f in files:
        if config.tiled and tiled_fn is not None:
            import jax.numpy as jnp

            from lightly_train_tpu.ops.augment import (
                IMAGENET_MEAN, IMAGENET_STD,
            )

            with Image.open(f) as im:
                arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
            arr = (arr - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
            pred = tiled_fn(
                model.variables, jnp.asarray(arr[None], jnp.float32),
                tile_size=config.image_size,
            )
            mask = np.asarray(pred)[0].astype(np.uint8)
        else:
            mask = model.predict(f)["mask"].astype(np.uint8)
        Image.fromarray(mask).save(out_dir / (Path(f).stem + ".png"))
    logger.info("Wrote %d masks to %s", len(files), out_dir)
    return out_dir
