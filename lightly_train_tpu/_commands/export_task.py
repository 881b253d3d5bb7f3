"""Deployment export: StableHLO artifact + ONNX gate.

Rebuild of ``src/lightly_train/_commands/export_task.py:29-246``. The
reference's deployment artifact is ONNX (+ TensorRT); the TPU-native
equivalent is a serialized StableHLO module from ``jax.export`` — hardware-
portable, loadable by any XLA-based runtime (and by the C++ PJRT runner).
The export embeds the same numerical verification step as the reference
(artifact vs eager outputs, atol 5e-3 / rtol 1e-1, ``export_task.py:227-239``).

``export_onnx`` is the API-parity entry point: it requires the optional
onnx toolchain; in environments without it (like this one) it raises with
guidance to use ``export_stablehlo``.
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


def _build_predict_fn(config: ExportStableHLOConfig):
    """(predict_fn, task, input spec) for a task or pretraining artifact."""
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    artifact = load_exported_model(Path(config.checkpoint))
    if "task" in artifact:
        model = load_model(Path(config.checkpoint), image_size=config.image_size)
        task = model.task
        train_model, variables_ = model.train_model, model.variables
        if config.deploy and hasattr(train_model, "convert_to_deploy"):
            train_model, variables_ = train_model.convert_to_deploy(variables_)
            logger.info("Applied deploy-mode rewrites (RepVgg fusion)")

        def predict_fn(images: jax.Array) -> Any:
            return train_model.predict(variables_, images.astype(dtype))
    else:
        # Pretraining artifact: export the backbone feature extractor
        # (pooled embedding + feature map), the `embed` graph.
        from lightly_train_tpu.models.package_registry import get_wrapped_model

        wrapped = get_wrapped_model(artifact["model_name"], dtype=dtype)
        variables = artifact["variables"]
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
    return predict_fn, task, spec


def export_stablehlo(out: str, checkpoint: str, **kwargs: Any) -> Path:
    """Serialize the task model's predict graph as a StableHLO artifact."""
    config = pydantic_model_validate(
        ExportStableHLOConfig, {"out": out, "checkpoint": checkpoint, **kwargs}
    )
    set_up_console_logging()
    predict_fn, task, spec = _build_predict_fn(config)
    exported = jax_export.export(jax.jit(predict_fn))(spec)
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

    predict_fn, task, spec = _build_predict_fn(config)
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
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-3, rtol=1e-1,
            )
        logger.info("SavedModel verification passed (atol 5e-3, rtol 1e-1)")
    logger.info("Exported TF SavedModel to %s", out_path)
    return out_path


def export_onnx(out: str, checkpoint: str, **kwargs: Any) -> Path:
    """ONNX export (API parity with the reference ``export_onnx``).

    Requires an ONNX exporter for JAX; none is bundled in this environment,
    so this raises with guidance. The native deployment path is
    ``export_stablehlo`` (same artifact contract: serialized graph +
    verification).
    """
    try:
        import tf2onnx  # noqa: F401 - optional toolchain probe
    except ImportError:
        raise ConfigError(
            "ONNX export requires the tf2onnx/jax2tf toolchain which is not "
            "installed. Use export_stablehlo() for the TPU-native deployment "
            "artifact (serialized StableHLO + numerical verification)."
        )
    raise NotImplementedError  # pragma: no cover - toolchain not in image
