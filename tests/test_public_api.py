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
