"""Deployment export: StableHLO, SavedModel, and ONNX artifacts.

Rebuild of ``src/lightly_train/_commands/export_task.py:29-246``. The
reference's deployment artifact is ONNX (+ TensorRT); the TPU-native
equivalent is a serialized StableHLO module from ``jax.export`` — hardware-
portable, loadable by any XLA-based runtime (and by the C++ PJRT runner).
Every export embeds the same numerical verification step as the reference
(artifact vs eager outputs, atol 5e-3 / rtol 1e-1, ``export_task.py:227-239``).

``export_onnx`` serializes the same predict graph as real ONNX via the
bundled jaxpr->ONNX compiler (``lightly_train_tpu._export``) — no torch or
onnx dependency — with the reference's knobs (fp16, dynamic batch) and
verification contract.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.tasks.model_io import load_model

logger = get_logger("export_task")


class ExportStableHLOConfig(PydanticConfig):
    out: str
    checkpoint: str
    image_size: int = 224
    batch_size: int = 1
    precision: Literal["fp32", "bf16"] = "fp32"
    verify: bool = True
    # Deploy-mode graph rewrites before export (RepVgg branch fusion,
    # ``hybrid_encoder.py:76-108`` convert_to_deploy) when the task model
    # supports them.
    deploy: bool = True
    # Lowering platforms recorded in the StableHLO artifact, e.g.
    # ["cpu", "tpu"] for an artifact exported on a CPU box but served by
    # the TPU C++ runner. None = the exporting machine's platform only.
    platforms: Optional[list] = None


def _build_predict_fn(config: ExportStableHLOConfig):
    """(predict_fn, task, input spec, artifact) for a task or pretraining
    artifact. The returned ``artifact`` lets callers reuse the (potentially
    multi-GB) orbax restore for metadata instead of re-reading it."""
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32

    def _cast_params(tree: Any) -> Any:
        if dtype == jnp.float32:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            tree,
        )

    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    artifact = load_exported_model(Path(config.checkpoint))
    if "task" in artifact:
        from lightly_train_tpu.tasks.model_io import load_model_from_checkpoint

        model = load_model_from_checkpoint(
            Path(config.checkpoint),
            image_size=config.image_size,
            artifact=artifact,
        )
        task = model.task
        train_model, variables_ = model.train_model, model.variables
        if config.deploy and hasattr(train_model, "convert_to_deploy"):
            train_model, variables_ = train_model.convert_to_deploy(variables_)
            logger.info("Applied deploy-mode rewrites (RepVgg fusion)")
        variables_ = _cast_params(variables_)

        def predict_fn(images: jax.Array) -> Any:
            return train_model.predict(variables_, images.astype(dtype))
    else:
        # Pretraining artifact: export the backbone feature extractor
        # (pooled embedding + feature map), the `embed` graph.
        from lightly_train_tpu.models.package_registry import get_wrapped_model

        wrapped = get_wrapped_model(artifact["model_name"], dtype=dtype)
        variables = _cast_params(artifact["variables"])
        task = "feature_extractor"

        def predict_fn(images: jax.Array) -> Any:
            out_feats = wrapped.forward_features(
                variables, images.astype(dtype), train=False
            )
            return (
                wrapped.forward_pool(out_feats).astype(jnp.float32),
                out_feats["features"].astype(jnp.float32),
            )

    spec = jax.ShapeDtypeStruct(
        (config.batch_size, config.image_size, config.image_size, 3),
        jnp.float32,
    )
    return predict_fn, task, spec, artifact


def export_stablehlo(out: str, checkpoint: str, **kwargs: Any) -> Path:
    """Serialize the task model's predict graph as a StableHLO artifact."""
    config = pydantic_model_validate(
        ExportStableHLOConfig, {"out": out, "checkpoint": checkpoint, **kwargs}
    )
    set_up_console_logging()
    predict_fn, task, spec, _ = _build_predict_fn(config)
    exported = jax_export.export(
        jax.jit(predict_fn),
        platforms=[str(p) for p in config.platforms] if config.platforms else None,
    )(spec)
    out_path = Path(config.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(exported.serialize())
    # Raw StableHLO module + serialized xla.CompileOptionsProto for the
    # native C++ PJRT runner (``native/src/lt_runner.cpp`` — the analog of
    # the reference's ONNX Runtime / TensorRT C++ examples,
    # ``examples/cpp/onnxruntime/main.cpp``): the runner dlopens a PJRT
    # plugin, compiles this module, and executes it without Python.
    mlir_path = out_path.with_suffix(out_path.suffix + ".mlir")
    mlir_path.write_text(exported.mlir_module())
    try:
        from jax._src.lib import xla_client as _xc

        out_path.with_suffix(out_path.suffix + ".compile_options.pb").write_bytes(
            _xc.CompileOptions().SerializeAsString()
        )
    except Exception:  # pragma: no cover - older jaxlib layouts
        logger.warning("Could not serialize CompileOptions for the C++ runner")
    meta = {
        "task": task,
        "input_shape": list(spec.shape),
        "input_dtype": "float32",
        "precision": config.precision,
        "format": "stablehlo",
        "mlir": mlir_path.name,
    }
    out_path.with_suffix(out_path.suffix + ".json").write_text(
        json.dumps(meta, indent=2)
    )
    if config.verify:
        # Numerical verification: deserialized artifact vs eager predict
        # (reference tolerance: atol 5e-3, rtol 1e-1).
        rng = np.random.default_rng(0)
        sample = jnp.asarray(
            rng.normal(size=spec.shape).astype(np.float32)
        )
        restored = jax_export.deserialize(out_path.read_bytes())
        got = restored.call(sample)
        want = predict_fn(sample)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-3, rtol=1e-1,
            ),
            got,
            want,
        )
        logger.info("StableHLO verification passed (atol 5e-3, rtol 1e-1)")
    logger.info("Exported StableHLO artifact to %s", out_path)
    return out_path


def export_savedmodel(out: str, checkpoint: str, **kwargs: Any) -> Path:
    """Export the predict graph as a TensorFlow SavedModel (via jax2tf).

    A second portable deployment format alongside StableHLO: SavedModels
    serve through TF Serving / TFLite converters — the ecosystem role the
    reference's ONNX artifact plays (``export_task.py:119-246``). Embeds
    the same numerical verification (reload + compare, atol 5e-3 /
    rtol 1e-1).
    """
    config = pydantic_model_validate(
        ExportStableHLOConfig, {"out": out, "checkpoint": checkpoint, **kwargs}
    )
    set_up_console_logging()
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:
        raise ConfigError(
            "SavedModel export requires tensorflow; use export_stablehlo() "
            "for the TPU-native artifact."
        ) from e

    predict_fn, task, spec, _ = _build_predict_fn(config)
    tf_fn = jax2tf.convert(jax.jit(predict_fn), with_gradient=False)
    module = tf.Module()
    module.f = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec(list(spec.shape), tf.float32)],
    )
    out_path = Path(config.out)
    tf.saved_model.save(module, str(out_path))
    (out_path / "lightly_train_metadata.json").write_text(
        json.dumps(
            {
                "task": task,
                "input_shape": list(spec.shape),
                "input_dtype": "float32",
                "precision": config.precision,
                "format": "tf_saved_model",
            },
            indent=2,
        )
    )
    if config.verify:
        rng = np.random.default_rng(0)
        sample = rng.normal(size=spec.shape).astype(np.float32)
        restored = tf.saved_model.load(str(out_path))
        got = jax.tree_util.tree_leaves(restored.f(tf.constant(sample)))
        want = jax.tree_util.tree_leaves(predict_fn(jnp.asarray(sample)))
        assert len(got) == len(want), (len(got), len(want))
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-3, rtol=1e-1,
            )
        logger.info("SavedModel verification passed (atol 5e-3, rtol 1e-1)")
    logger.info("Exported TF SavedModel to %s", out_path)
    return out_path


class ExportONNXConfig(PydanticConfig):
    out: str
    checkpoint: str
    image_size: int = 224
    batch_size: int = 1
    precision: Literal["fp32", "fp16"] = "fp32"
    dynamic_batch_size: bool = True
    verify: bool = True
    deploy: bool = True


def export_onnx(out: str, checkpoint: str, **kwargs: Any) -> Path:
    """Export the task model's predict graph as an ONNX model.

    Rebuild of the reference's ``torch.onnx`` pipeline
    (``src/lightly_train/_export/export_onnx.py:85-246``): same knobs
    (``precision`` fp32/fp16, ``batch_size``, ``dynamic_batch_size``,
    ``verify``), same embedded metadata (classes, normalization, model
    name), same verification contract (run the exported artifact, compare
    against the eager forward, atol 5e-3 / rtol 1e-1). The graph comes
    from the jaxpr of the jitted predict function — the identical program
    XLA compiles — lowered to ONNX opset 17 by
    ``lightly_train_tpu._export.jaxpr_to_onnx``; verification interprets
    the serialized bytes with the bundled numpy evaluator (the ONNX
    Runtime role in ``export_onnx.py:216-246``).

    ``dynamic_batch_size=True`` (the reference default) traces at
    batch >= 2, exports the batch dim as a free ``dim_param`` and verifies
    the graph at two other batch sizes to prove the dynamic axes.
    ``precision='fp16'`` converts the traced fp32 graph to float16 after
    compilation (the reference's post-export conversion,
    ``export_onnx.py:190-214``); graph I/O stays float32 either way,
    matching the reference's TensorRT-facing convention.
    """
    config = pydantic_model_validate(
        ExportONNXConfig, {"out": out, "checkpoint": checkpoint, **kwargs}
    )
    set_up_console_logging()
    from lightly_train_tpu import __version__ as _version
    from lightly_train_tpu._export.jaxpr_to_onnx import export_fn_to_onnx
    from lightly_train_tpu._export.onnx_eval import evaluate_model

    trace_batch = (
        max(2, config.batch_size) if config.dynamic_batch_size else config.batch_size
    )
    base = ExportStableHLOConfig(
        out=config.out,
        checkpoint=config.checkpoint,
        image_size=config.image_size,
        batch_size=trace_batch,
        precision="fp32",
        verify=False,
        deploy=config.deploy,
    )
    predict_fn, task, spec, artifact = _build_predict_fn(base)

    # Metadata parity with the reference's onnx_export_metadata()
    # (export_onnx.py:65-81): version, classes, normalization, model name.
    from lightly_train_tpu.tasks.model_io import IMAGENET_MEAN, IMAGENET_STD
    metadata = {
        "lightly_train_version": str(_version),
        "task": task,
        "precision": config.precision,
        "image_normalize": json.dumps(
            {"mean": list(IMAGENET_MEAN), "std": list(IMAGENET_STD)},
            sort_keys=True,
        ),
    }
    if artifact.get("model_name"):
        metadata["model_name"] = str(artifact["model_name"])
    classes = (artifact.get("task_args") or {}).get("classes")
    if classes is not None:
        metadata["classes"] = json.dumps(classes)

    from lightly_train_tpu.ops.pallas.attention import portable_attention

    with portable_attention():
        model_bytes, output_names, _ = export_fn_to_onnx(
            predict_fn,
            (spec,),
            input_names=["images"],
            dynamic_batch=config.dynamic_batch_size,
            fp16=config.precision == "fp16",
            metadata_props=metadata,
            producer_version=str(_version),
        )
    out_path = Path(config.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(model_bytes)
    out_path.with_suffix(out_path.suffix + ".json").write_text(
        json.dumps(
            {
                "task": task,
                "input_shape": ["batch" if config.dynamic_batch_size else config.batch_size]
                + list(spec.shape[1:]),
                "input_dtype": "float32",
                "precision": config.precision,
                "format": "onnx",
                "opset": 17,
                "output_names": output_names,
            },
            indent=2,
        )
    )
    if config.verify:
        # XLA's default-precision f32 matmuls run bf16 passes; pin full
        # f32 for the eager side so the comparison measures the export,
        # not the backend's matmul mode.
        atol, rtol = (5e-3, 1e-1) if config.precision == "fp32" else (2e-2, 2e-1)
        batches = [trace_batch]
        if config.dynamic_batch_size:
            batches = sorted({1, config.batch_size, trace_batch + 1})
        rng = np.random.default_rng(0)
        with jax.default_matmul_precision("float32"):
            for batch in batches:
                sample = rng.normal(size=(batch,) + spec.shape[1:]).astype(
                    np.float32
                )
                got = evaluate_model(model_bytes, {"images": sample})
                want = jax.tree_util.tree_leaves(predict_fn(jnp.asarray(sample)))
                assert len(got) == len(want), (len(got), len(want))
                for g, w in zip(got, want):
                    np.testing.assert_allclose(
                        np.asarray(g, np.float32),
                        np.asarray(w, np.float32),
                        atol=atol,
                        rtol=rtol,
                    )
        logger.info(
            "ONNX verification passed at batch sizes %s (atol %g, rtol %g)",
            batches,
            atol,
            rtol,
        )
    logger.info("Exported ONNX model to %s", out_path)
    return out_path
