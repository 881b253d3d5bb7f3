"""Task transform schemas + on-device pipeline builder (fine-tuning side).

SSL view transforms live in ``ops/augment.py``; detection batch augs in
``ops/detection_augs.py``. This package carries the user-facing per-task
``transform_args`` schemas (reference ``src/lightly_train/_transforms/``).
"""

from lightly_train_tpu._transforms.task_transforms import (
    ChannelDropArgs,
    ColorJitterArgs,
    ImageClassificationTransformArgs,
    NormalizeArgs,
    RandomCropArgs,
    RandomFlipArgs,
    RandomResizeArgs,
    RandomRotate90Args,
    RandomRotationArgs,
    ScaleJitterArgs,
    SemanticSegmentationTransformArgs,
    SmallestMaxSizeArgs,
    TaskTransformArgs,
    build_train_transform,
    resolve_task_transform_args,
)

__all__ = [
    "ChannelDropArgs",
    "ColorJitterArgs",
    "ImageClassificationTransformArgs",
    "NormalizeArgs",
    "RandomCropArgs",
    "RandomFlipArgs",
    "RandomResizeArgs",
    "RandomRotate90Args",
    "RandomRotationArgs",
    "ScaleJitterArgs",
    "SemanticSegmentationTransformArgs",
    "SmallestMaxSizeArgs",
    "TaskTransformArgs",
    "build_train_transform",
    "resolve_task_transform_args",
]
