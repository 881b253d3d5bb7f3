"""ONNX export coverage for the flagship task-model families.

Each test builds a test-size model, exports its jitted predict graph to
ONNX, and executes the serialized bytes with the numpy evaluator against
the jax forward — the per-task analog of the reference's
``verify_onnx_export_outputs`` implementations
(``src/lightly_train/_task_models/*/task_model.py``). Exercises the
non-elementwise lowerings: deformable-attention point sampling
(lax.gather -> GatherND), TopK, transposed convolution (lhs_dilation),
Split, and the portable lax attention path (the Pallas kernel gate is
forced off — ONNX has no pallas_call).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu._export.jaxpr_to_onnx import export_fn_to_onnx
from lightly_train_tpu._export.onnx_eval import evaluate_model


@pytest.fixture(autouse=True)
def _no_pallas(monkeypatch):
    monkeypatch.setenv("LIGHTLY_TRAIN_VMEM_ATTENTION", "0")


def _roundtrip(fn, variables, images, atol=5e-5, rtol=1e-3):
    model, _, _ = export_fn_to_onnx(
        lambda x: fn(variables, x), (jnp.asarray(images),), input_names=["images"]
    )
    got = evaluate_model(model, {"images": images})
    with jax.default_matmul_precision("float32"):
        want = jax.tree_util.tree_leaves(fn(variables, jnp.asarray(images)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        w = np.asarray(w)
        if np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(
                g.astype(np.float64), w.astype(np.float64), atol=atol, rtol=rtol
            )
        else:
            # Integer outputs (argmax labels / top-k indices): ties under
            # reordered float accumulation may flip individual entries.
            assert (np.asarray(g) == w).mean() > 0.97
    return model


@pytest.fixture(scope="module")
def images():
    return np.asarray(
        jax.random.uniform(jax.random.key(0), (1, 64, 64, 3), jnp.float32)
    )


def test_eomt_semantic_segmentation_export(images):
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        EoMTSemanticSegmentationArgs,
        EoMTSemanticSegmentationTrainModel,
    )

    wrapped = get_wrapped_model("dinov3/vittest16", dtype=jnp.float32)
    model = EoMTSemanticSegmentationTrainModel(
        wrapped, EoMTSemanticSegmentationArgs(num_classes=7)
    )
    params, state = model.init(jax.random.key(0), {"images": jnp.asarray(images)})
    _roundtrip(
        lambda v, x: model.predict(v, x), {"params": params, **state}, images
    )


def test_ltdetr_deploy_export(images):
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.detection.ltdetr import (
        ObjectDetectionArgs,
        ObjectDetectionTrainModel,
    )

    model = ObjectDetectionTrainModel(
        get_wrapped_model("dinov3/vittest16", dtype=jnp.float32),
        ObjectDetectionArgs(
            num_queries=8,
            num_decoder_layers=1,
            d_model=32,
            num_heads=2,
            dim_feedforward=64,
            max_detections=4,
        ),
    )
    params, state = model.init(jax.random.key(0), {"images": jnp.asarray(images)})
    deploy, deploy_vars = model.convert_to_deploy({"params": params, **state})
    _roundtrip(lambda v, x: deploy.predict(v, x), deploy_vars, images)


def test_classification_dynamic_batch_export(images):
    """Dynamic batch on a ViT head — regression for two bugs the two-trace
    dim inference fixes: (a) the RoPE coordinate constant has a leading
    axis of size 2 that collides with the traced batch and must NOT be
    rewritten to the runtime batch; (b) cls-token slicing must not bake
    the traced batch into Slice ends (which cropped batches > traced)."""
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.image_classification import (
        ImageClassificationArgs,
        ImageClassificationTrainModel,
    )

    wrapped = get_wrapped_model("dinov3/vittest16", dtype=jnp.float32)
    model = ImageClassificationTrainModel(
        wrapped, ImageClassificationArgs(num_classes=3)
    )
    x2 = jnp.asarray(
        jax.random.uniform(jax.random.key(1), (2, 64, 64, 3), jnp.float32)
    )
    params, state = model.init(jax.random.key(0), {"images": x2})
    variables = {"params": params, **state}
    fn = lambda x: model.predict(variables, x)
    model_bytes, _, _ = export_fn_to_onnx(
        fn, (x2,), input_names=["images"], dynamic_batch=True
    )
    for batch in (1, 2, 5):
        xb = np.asarray(
            jax.random.uniform(
                jax.random.key(batch), (batch, 64, 64, 3), jnp.float32
            )
        )
        got = evaluate_model(model_bytes, {"images": xb})
        with jax.default_matmul_precision("float32"):
            want = jax.tree_util.tree_leaves(fn(jnp.asarray(xb)))
        for g, w in zip(got, want):
            w = np.asarray(w)
            if np.issubdtype(w.dtype, np.floating):
                np.testing.assert_allclose(
                    g.astype(np.float64),
                    w.astype(np.float64),
                    atol=5e-5,
                    rtol=1e-3,
                )
            else:
                assert (np.asarray(g) == w).mean() > 0.97


def test_depth_anything_export(images):
    from lightly_train_tpu.tasks.depth_anything import DepthAnythingModel

    model = DepthAnythingModel.build("dinov3/dav3-relative-test", dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.asarray(images))
    _roundtrip(lambda v, x: model.forward(v, x), params, images, atol=1e-4)


def _build_task_model(family):
    from lightly_train_tpu.models.package_registry import get_wrapped_model

    wrapped = get_wrapped_model("dinov3/vittest16", dtype=jnp.float32)
    if family == "eomt_instance":
        from lightly_train_tpu.tasks.eomt_instance_panoptic import (
            EoMTInstanceSegmentationArgs,
            EoMTInstanceSegmentationTrainModel,
        )

        return EoMTInstanceSegmentationTrainModel(
            wrapped, EoMTInstanceSegmentationArgs(num_classes=5, max_instances=8)
        )
    if family == "eomt_panoptic":
        from lightly_train_tpu.tasks.eomt_instance_panoptic import (
            EoMTPanopticSegmentationArgs,
            EoMTPanopticSegmentationTrainModel,
        )

        return EoMTPanopticSegmentationTrainModel(
            wrapped, EoMTPanopticSegmentationArgs(num_classes=5, max_instances=8)
        )
    if family == "picodet":
        from lightly_train_tpu.tasks.detection.picodet import (
            PicoDetArgs,
            PicoDetTrainModel,
        )

        return PicoDetTrainModel(
            get_wrapped_model("torchvision/shufflenet_v2_x0_5", dtype=jnp.float32),
            PicoDetArgs(num_classes=5, max_detections=8),
        )
    if family == "linear_seg":
        from lightly_train_tpu.tasks.semantic_segmentation_linear import (
            LinearSemanticSegmentationArgs,
            LinearSemanticSegmentationTrainModel,
        )

        return LinearSemanticSegmentationTrainModel(
            wrapped, LinearSemanticSegmentationArgs(num_classes=5)
        )
    if family == "multihead_cls":
        from lightly_train_tpu.tasks.multihead import (
            ImageClassificationMultiheadArgs,
            ImageClassificationMultiheadTrainModel,
        )

        return ImageClassificationMultiheadTrainModel(
            wrapped, ImageClassificationMultiheadArgs(num_classes=4)
        )
    from lightly_train_tpu.tasks.detection.ltdetr_seg import (
        InstanceSegmentationLTDETRArgs,
        LTDETRInstanceSegmentationTrainModel,
    )

    return LTDETRInstanceSegmentationTrainModel(
        wrapped,
        InstanceSegmentationLTDETRArgs(
            num_queries=8,
            num_decoder_layers=1,
            d_model=32,
            num_heads=2,
            dim_feedforward=64,
            max_detections=4,
        ),
    )


@pytest.mark.parametrize(
    "family",
    [
        "eomt_instance",
        "eomt_panoptic",
        "picodet",  # also covers the no-op convert_to_deploy override
        "linear_seg",
        "multihead_cls",
        "ltdetr_seg",
    ],
)
def test_all_task_families_export(family, images):
    """Every remaining task family round-trips through ONNX (the reference
    implements verify_onnx_export_outputs per task model)."""
    model = _build_task_model(family)
    params, state = model.init(jax.random.key(0), {"images": jnp.asarray(images)})
    variables = {"params": params, **state}
    if hasattr(model, "convert_to_deploy"):
        model, variables = model.convert_to_deploy(variables)
    _roundtrip(lambda v, x: model.predict(v, x), variables, images, atol=1e-4)
