"""Task-model loading + inference (``load_model`` API).

Rebuild of ``src/lightly_train/_task_models/task_model_helpers.py:70-289`` +
``task_model.py`` inference path: an exported fine-tuning artifact carries
``{task, task_args, model_name, params, model_state}`` (the analog of the
reference's ``class_path`` + ``init_args`` + state dict); ``load_model``
reconstructs the task model and returns a predictor with
preprocess -> jitted forward -> postprocess, sized back to the input image.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._checkpoint.checkpoint import load_exported_model
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu.errors import CheckpointError, UnknownTaskError
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD


def _build_train_model(task: str, architecture: str, model_name: str,
                       task_args: Dict[str, Any]):
    wrapped = get_wrapped_model(model_name)
    if task == "image_classification":
        from lightly_train_tpu.tasks.image_classification import (
            ImageClassificationArgs,
            ImageClassificationTrainModel,
        )

        return ImageClassificationTrainModel(
            wrapped, pydantic_model_validate(ImageClassificationArgs, task_args)
        )
    if task == "semantic_segmentation":
        if architecture == "eomt":
            from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
                EoMTSemanticSegmentationArgs,
                EoMTSemanticSegmentationTrainModel,
            )

            return EoMTSemanticSegmentationTrainModel(
                wrapped,
                pydantic_model_validate(
                    EoMTSemanticSegmentationArgs, task_args
                ),
            )
        from lightly_train_tpu.tasks.semantic_segmentation_linear import (
            LinearSemanticSegmentationArgs,
            LinearSemanticSegmentationTrainModel,
        )

        return LinearSemanticSegmentationTrainModel(
            wrapped,
            pydantic_model_validate(LinearSemanticSegmentationArgs, task_args),
        )
    if task == "object_detection":
        from lightly_train_tpu.tasks.detection.ltdetr import (
            ObjectDetectionArgs,
            ObjectDetectionTrainModel,
        )

        return ObjectDetectionTrainModel(
            wrapped, pydantic_model_validate(ObjectDetectionArgs, task_args)
        )
    if task == "instance_segmentation":
        if architecture == "ltdetr":
            from lightly_train_tpu.tasks.detection.ltdetr_seg import (
                InstanceSegmentationLTDETRArgs,
                LTDETRInstanceSegmentationTrainModel,
            )

            return LTDETRInstanceSegmentationTrainModel(
                wrapped,
                pydantic_model_validate(
                    InstanceSegmentationLTDETRArgs, task_args
                ),
            )
        from lightly_train_tpu.tasks.eomt_instance_panoptic import (
            EoMTInstanceSegmentationArgs,
            EoMTInstanceSegmentationTrainModel,
        )

        return EoMTInstanceSegmentationTrainModel(
            wrapped,
            pydantic_model_validate(EoMTInstanceSegmentationArgs, task_args),
        )
    if task == "panoptic_segmentation":
        from lightly_train_tpu.tasks.eomt_instance_panoptic import (
            EoMTPanopticSegmentationArgs,
            EoMTPanopticSegmentationTrainModel,
        )

        return EoMTPanopticSegmentationTrainModel(
            wrapped,
            pydantic_model_validate(EoMTPanopticSegmentationArgs, task_args),
        )
    raise UnknownTaskError(f"Unknown task '{task}' in artifact.")


@dataclasses.dataclass
class LoadedTaskModel:
    """Inference wrapper: ``predict(image)`` like the reference TaskModel."""

    train_model: Any
    variables: Dict[str, Any]
    task: str
    image_size: int = 224

    def __post_init__(self):
        self._jit_predict = jax.jit(
            lambda imgs: self.train_model.predict(self.variables, imgs)
        )

    def preprocess(self, image: Union[str, Path, np.ndarray]) -> Tuple[
        jax.Array, Tuple[int, int]
    ]:
        from PIL import Image

        if isinstance(image, (str, Path)):
            with Image.open(image) as im:
                image = np.asarray(im.convert("RGB"))
        orig_hw = image.shape[:2]
        im = Image.fromarray(image.astype(np.uint8)).resize(
            (self.image_size, self.image_size), Image.BILINEAR
        )
        arr = np.asarray(im, np.float32) / 255.0
        arr = (arr - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        return jnp.asarray(arr[None]), orig_hw

    def predict(self, image: Union[str, Path, np.ndarray]) -> Dict[str, Any]:
        batch, orig_hw = self.preprocess(image)
        out = self._jit_predict(batch)
        return self.postprocess(out, orig_hw)

    def postprocess(self, out: Any, orig_hw: Tuple[int, int]) -> Dict[str, Any]:
        H, W = orig_hw
        if self.task == "image_classification":
            probs = np.asarray(out)[0]
            return {"probs": probs, "label": int(np.argmax(probs))}
        if self.task == "semantic_segmentation":
            mask = np.asarray(out)[0].astype(np.uint8)
            from PIL import Image

            mask = np.asarray(
                Image.fromarray(mask).resize((W, H), Image.NEAREST)
            )
            return {"mask": mask}
        if self.task == "object_detection":
            boxes, scores, labels = out
            boxes = np.asarray(boxes)[0] * np.asarray([W, H, W, H])
            return {
                "boxes": boxes,
                "scores": np.asarray(scores)[0],
                "labels": np.asarray(labels)[0],
            }
        if self.task == "instance_segmentation":
            from PIL import Image

            if len(out) == 4:  # LT-DETR head: (boxes, scores, labels, masks)
                boxes, scores, labels, masks = out
                boxes = np.asarray(boxes)[0] * np.asarray([W, H, W, H])
            else:  # EoMT: (masks, scores, labels)
                masks, scores, labels = out
                boxes = None
            up = np.stack([
                np.asarray(Image.fromarray(m).resize((W, H), Image.NEAREST))
                for m in np.asarray(masks)[0].astype(np.uint8)
            ]).astype(bool)
            result = {
                "masks": up,
                "scores": np.asarray(scores)[0],
                "labels": np.asarray(labels)[0],
            }
            if boxes is not None:
                result["boxes"] = boxes
            return result
        if self.task == "panoptic_segmentation":
            from PIL import Image

            seg_map, labels, scores = out
            seg = np.asarray(
                Image.fromarray(
                    np.asarray(seg_map)[0].astype(np.int32), mode="I"
                ).resize((W, H), Image.NEAREST)
            )
            return {
                "segment_map": seg,
                "labels": np.asarray(labels)[0],
                "scores": np.asarray(scores)[0],
            }
        raise UnknownTaskError(self.task)


def load_model_from_checkpoint(
    checkpoint: Union[str, Path],
    image_size: int = 224,
    artifact: Optional[dict] = None,
) -> LoadedTaskModel:
    """``artifact``: a dict already returned by ``load_exported_model`` for
    this checkpoint — skips a second (potentially multi-GB) orbax restore."""
    if artifact is None:
        artifact = load_exported_model(Path(checkpoint))
    if "task" not in artifact:
        raise CheckpointError(
            f"{checkpoint} is a pretraining artifact (no 'task' metadata); "
            "use it as `checkpoint=` for fine-tuning instead."
        )
    train_model = _build_train_model(
        artifact["task"],
        artifact.get("architecture", "linear"),
        artifact["model_name"],
        artifact.get("task_args", {}),
    )
    variables = artifact["variables"]
    return LoadedTaskModel(
        train_model=train_model,
        variables=variables,
        task=artifact["task"],
        image_size=image_size,
    )


def load_model(
    name_or_path: Union[str, Path], image_size: int = 224
):
    """Load a task model from an exported artifact path OR a model-zoo name.

    Mirrors the reference's resolution order
    (``task_model_helpers.py:166-249``): a local path loads directly; a known
    zoo name downloads its checkpoint (sha256-verified, cached) and converts
    the torch weights into this package's task models on the fly
    (``tasks/task_zoo.py``). Unknown names raise with the known-name list.
    """
    path = Path(name_or_path)
    if path.exists():
        return load_model_from_checkpoint(path, image_size)
    from lightly_train_tpu.tasks.task_zoo import (
        TASK_ZOO,
        load_model_from_torch_zoo,
        resolve_zoo_checkpoint,
    )

    name = str(name_or_path)
    if name not in TASK_ZOO:
        raise CheckpointError(
            f"'{name_or_path}' is neither a local artifact path nor a known "
            f"model-zoo name ({len(TASK_ZOO)} names registered, e.g. "
            "'ltdetrv2-s-coco', 'dinov3/vits16-eomt-coco', "
            "'dinov3/dav3-relative-tiny'). Pass the path of an "
            "exported_models/exported_{best,last} directory or a zoo name."
        )
    ckpt_path = resolve_zoo_checkpoint(name)
    return load_model_from_torch_zoo(name, ckpt_path, image_size)
