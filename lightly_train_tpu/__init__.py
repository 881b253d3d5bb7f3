"""lightly_train_tpu: TPU-native vision pretraining & fine-tuning framework.

Public API parity with the reference (``src/lightly_train/__init__.py:31-85``):
``pretrain``/``train``, ``embed``, ``export``, ``list_models``,
``list_methods``, ``load_model`` (+ ``train_*`` task entry points as they
land). Compute is JAX/XLA/Pallas over a GSPMD device mesh.
"""

from lightly_train_tpu._commands.embed import embed
from lightly_train_tpu._commands.export import export
from lightly_train_tpu._commands.train import pretrain, pretrain_from_config
from lightly_train_tpu._commands.benchmark_task import benchmark_object_detection
from lightly_train_tpu._commands.export_task import (
    export_onnx,
    export_savedmodel,
    export_stablehlo,
)
from lightly_train_tpu._commands.eval_knn import evaluate_knn
from lightly_train_tpu._commands.extract_video_frames import extract_video_frames
from lightly_train_tpu._commands.predict_task import predict_semantic_segmentation
from lightly_train_tpu._commands.train_task import (
    train_image_classification,
    train_image_classification_multihead,
    train_instance_segmentation,
    train_object_detection,
    train_panoptic_segmentation,
    train_semantic_segmentation,
    train_semantic_segmentation_multihead,
)
from lightly_train_tpu.tasks.model_io import load_model, load_model_from_checkpoint
from lightly_train_tpu.methods.method_helpers import list_methods
from lightly_train_tpu.models.package_registry import list_models
from lightly_train_tpu.types import (
    BenchmarkResult,
    BenchmarkStatistics,
    DescriptiveStatistics,
    EmbeddingFormat,
    ModelFormat,
    ModelPart,
)

# Deprecated alias kept for reference parity (`train` wraps `pretrain`).
train = pretrain

__all__ = [
    "BenchmarkResult",
    "BenchmarkStatistics",
    "DescriptiveStatistics",
    "EmbeddingFormat",
    "ModelFormat",
    "ModelPart",
    "benchmark_object_detection",
    "embed",
    "evaluate_knn",
    "export",
    "export_onnx",
    "export_savedmodel",
    "export_stablehlo",
    "extract_video_frames",
    "list_methods",
    "list_models",
    "load_model",
    "load_model_from_checkpoint",
    "predict_semantic_segmentation",
    "pretrain",
    "pretrain_from_config",
    "train",
    "train_image_classification",
    "train_image_classification_multihead",
    "train_instance_segmentation",
    "train_object_detection",
    "train_panoptic_segmentation",
    "train_semantic_segmentation",
    "train_semantic_segmentation_multihead",
]

__version__ = "0.1.0"
