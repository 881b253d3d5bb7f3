"""The public API mirrors the reference's __init__ surface
(``src/lightly_train/__init__.py:31-85``)."""

import lightly_train_tpu as lt

REFERENCE_API = [
    "pretrain",
    "train_object_detection",
    "train_instance_segmentation",
    "train_panoptic_segmentation",
    "train_semantic_segmentation",
    "train_semantic_segmentation_multihead",
    "train_image_classification",
    "train_image_classification_multihead",
    "embed",
    "export",
    "export_onnx",
    "predict_semantic_segmentation",
    "benchmark_object_detection",
    "load_model",
    "load_model_from_checkpoint",
    "list_models",
    "list_methods",
]

TPU_NATIVE_EXTRAS = [
    "export_stablehlo",
    "export_savedmodel",
    "evaluate_knn",
    "extract_video_frames",
]

# Reference __all__ type/enum names (non-callable surface).
REFERENCE_TYPES = [
    "BenchmarkResult",
    "BenchmarkStatistics",
    "DescriptiveStatistics",
    "EmbeddingFormat",
    "ModelFormat",
    "ModelPart",
]


def test_reference_types_present():
    missing = [n for n in REFERENCE_TYPES if not hasattr(lt, n)]
    assert missing == []
    assert lt.EmbeddingFormat("lightly_csv").value == "lightly_csv"
    assert lt.ModelPart.EMBEDDING_MODEL == "embedding_model"
    assert lt.ModelFormat.PACKAGE_DEFAULT == "package_default"
    stats = lt.DescriptiveStatistics.from_times([1.0, 2.0, 3.0])
    assert stats.mean == 2.0 and stats.min == 1.0 and stats.p90 == 3.0
    result = lt.BenchmarkResult.from_dict({
        "backend": "jax", "image_size": 640,
        "latency_ms": {"mean": 4.0, "median": 4.0, "min": 3.0, "max": 5.0},
        "map": 0.5,
    })
    assert result.statistics.throughput_img_s == 250.0
    assert result.metric_values["map"] == 0.5


def test_reference_api_complete():
    missing = [n for n in REFERENCE_API if not callable(getattr(lt, n, None))]
    assert missing == []


def test_tpu_native_extras_present():
    missing = [
        n for n in TPU_NATIVE_EXTRAS if not callable(getattr(lt, n, None))
    ]
    assert missing == []


def test_list_models_and_methods_nonempty():
    models = lt.list_models()
    methods = lt.list_methods()
    assert len(models) > 30 and len(methods) >= 7
    for family in ("dinov2/", "dinov3/", "ecvit/", "torchvision/", "timm/",
                   "ultralytics/", "rtdetr/", "rfdetr/", "super_gradients/"):
        assert any(m.startswith(family) for m in models), family
