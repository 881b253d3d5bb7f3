"""``benchmark_object_detection``: latency + accuracy harness.

Rebuild of ``src/lightly_train/_commands/benchmark_task.py:78`` +
``benchmark_backends.py``: measures per-image latency statistics
(mean/median/p90/min/max over timed runs after warmup) of a detection
checkpoint, optionally evaluating mAP over a provided dataset. Backends:
``jax`` (jitted, runs on whatever accelerator is attached), ``stablehlo``
(the exported artifact round-tripped through ``jax.export.deserialize`` —
the deployment path), ``savedmodel`` (jax2tf), ``native`` (the C++ PJRT
runner), and ``onnx`` (the exported ONNX bytes through the bundled numpy
evaluator — portability check, not a speed contender).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.tasks.model_io import load_model

logger = get_logger("benchmark")


class BenchmarkConfig(PydanticConfig):
    checkpoint: str
    data: Optional[Dict[str, Any]] = None  # optional val split for mAP
    image_size: int = 640
    num_warmup: int = 5
    num_runs: int = 30
    # "all" sweeps every available backend and returns a comparison table
    # (reference benchmark_backends.py:71-266 multi-backend sweep);
    # "native" measures the C++ PJRT runner (no-Python serving path);
    # "onnx" runs the exported ONNX bytes through the bundled numpy
    # evaluator — a portability/correctness backend (the ONNX Runtime
    # role in the reference sweep), not a speed contender.
    backend: Literal[
        "jax", "stablehlo", "savedmodel", "native", "onnx", "all"
    ] = "jax"
    # PJRT plugin for the native backend (defaults to the env's TPU plugin).
    pjrt_plugin: str = "/opt/axon/libaxon_pjrt.so"


def benchmark_object_detection(checkpoint: str, **kwargs: Any) -> Dict[str, Any]:
    config = pydantic_model_validate(
        BenchmarkConfig, {"checkpoint": checkpoint, **kwargs}
    )
    set_up_console_logging()
    if config.backend == "all":
        results: Dict[str, Any] = {"backends": {}}
        for be in ("jax", "stablehlo", "native", "onnx"):
            try:
                update: Dict[str, Any] = {"backend": be}
                if be == "onnx":
                    # Interpreter-speed backend: keep the timed window small.
                    update.update(
                        num_warmup=1, num_runs=min(config.num_runs, 3)
                    )
                sub = config.model_copy(update=update)
                results["backends"][be] = benchmark_from_config(sub)
            except Exception as e:  # backend unavailable on this machine
                results["backends"][be] = {"error": f"{type(e).__name__}: {e}"}
                logger.warning("Backend %s unavailable: %s", be, e)
        logger.info("Benchmark sweep: %s", results)
        return results
    return benchmark_from_config(config)


def _benchmark_native(config: BenchmarkConfig) -> Dict[str, Any]:
    """Latency of the C++ PJRT runner (subprocess, timed repeats inside)."""
    import re
    import subprocess
    import tempfile

    from lightly_train_tpu._commands.export_task import export_stablehlo

    repo = Path(__file__).resolve().parents[2]
    runner = repo / "native" / "lt_runner"
    if not runner.exists():
        subprocess.run(["make", "runner"], cwd=repo / "native", check=True)
    if not Path(config.pjrt_plugin).exists():
        raise FileNotFoundError(f"PJRT plugin {config.pjrt_plugin} not found")
    with tempfile.TemporaryDirectory() as tmp:
        shlo = f"{tmp}/m.shlo"
        export_stablehlo(
            out=shlo, checkpoint=config.checkpoint,
            image_size=config.image_size, batch_size=1, verify=False,
        )
        shape = (1, config.image_size, config.image_size, 3)
        np.random.default_rng(0).normal(size=shape).astype(np.float32).tofile(
            f"{tmp}/input.bin"
        )
        proc = subprocess.run(
            [str(runner), config.pjrt_plugin, f"{shlo}.mlir",
             f"{shlo}.compile_options.pb", f"{tmp}/input.bin",
             ",".join(map(str, shape)), f"{tmp}/out",
             str(config.num_warmup + config.num_runs),
             str(config.num_warmup)],
            capture_output=True, text=True, check=True,
        )
        m = re.search(
            r"latency_ms mean=([\d.]+) p50=([\d.]+) p90=([\d.]+) "
            r"min=([\d.]+) max=([\d.]+)",
            proc.stdout,
        )
        if m is None:
            raise RuntimeError(f"runner output unparsable: {proc.stdout}")
        return {
            "backend": "native",
            "image_size": config.image_size,
            "latency_ms": {
                "mean": float(m.group(1)), "median": float(m.group(2)),
                "p90": float(m.group(3)), "min": float(m.group(4)),
                "max": float(m.group(5)),
            },
        }


def benchmark_from_config(config: BenchmarkConfig) -> Dict[str, Any]:
    if config.backend == "native":
        result = _benchmark_native(config)
        logger.info("Benchmark: %s", result)
        return result
    model = load_model(Path(config.checkpoint), image_size=config.image_size)
    spec_shape = (1, config.image_size, config.image_size, 3)
    sample = jnp.asarray(
        np.random.default_rng(0).normal(size=spec_shape).astype(np.float32)
    )

    if config.backend == "onnx":
        from lightly_train_tpu._export.jaxpr_to_onnx import export_fn_to_onnx
        from lightly_train_tpu._export.onnx_eval import evaluate_model

        from lightly_train_tpu.ops.pallas.attention import portable_attention

        with portable_attention():
            model_bytes, _, _ = export_fn_to_onnx(
                lambda x: model.train_model.predict(model.variables, x),
                (jax.ShapeDtypeStruct(spec_shape, jnp.float32),),
                input_names=["images"],
            )

        def fn(x, _bytes=model_bytes):
            return evaluate_model(_bytes, {"images": np.asarray(x)})

    elif config.backend == "stablehlo":
        from jax import export as jax_export

        exported = jax_export.export(
            jax.jit(
                lambda x: model.train_model.predict(model.variables, x)
            )
        )(jax.ShapeDtypeStruct(spec_shape, jnp.float32))
        restored = jax_export.deserialize(exported.serialize())
        fn = restored.call
    elif config.backend == "savedmodel":
        import tempfile

        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = jax2tf.convert(
            jax.jit(lambda x: model.train_model.predict(model.variables, x)),
            with_gradient=False,
        )
        module = tf.Module()
        module.f = tf.function(
            tf_fn, autograph=False,
            input_signature=[tf.TensorSpec(list(spec_shape), tf.float32)],
        )
        tmp = tempfile.mkdtemp(prefix="lt_savedmodel_bench_")
        tf.saved_model.save(module, tmp)
        restored_tf = tf.saved_model.load(tmp)

        def fn(x, _r=restored_tf, _tf=tf):
            out = _r.f(_tf.constant(np.asarray(x)))
            return jax.tree_util.tree_map(lambda t: t.numpy(), out)
    else:
        fn = jax.jit(
            lambda x: model.train_model.predict(model.variables, x)
        )

    for _ in range(config.num_warmup):
        out = fn(sample)
    jax.block_until_ready(out)
    times: List[float] = []
    for _ in range(config.num_runs):
        t0 = time.perf_counter()
        out = fn(sample)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000)

    from lightly_train_tpu.types import DescriptiveStatistics

    result: Dict[str, Any] = {
        "backend": config.backend,
        "device": str(jax.devices()[0].platform),
        "image_size": config.image_size,
        "latency_ms": DescriptiveStatistics.from_times(times).dump(),
    }

    if config.data is not None:
        from lightly_train_tpu.tasks.detection.data import (
            YOLOObjectDetectionDataset,
        )
        from lightly_train_tpu.tasks.detection.metrics import compute_map
        from lightly_train_tpu.tasks.detection.box_utils import cxcywh_to_xyxy

        ds = YOLOObjectDetectionDataset(
            Path(config.data["images"]), Path(config.data["labels"]),
            (config.image_size, config.image_size),
        )
        predictions, targets = [], []
        for i in range(len(ds)):
            item = ds[i]
            img = jnp.asarray(item["images"][None]).astype(jnp.float32)
            from lightly_train_tpu.ops.augment import (
                IMAGENET_MEAN, IMAGENET_STD, normalize,
            )

            img = normalize(img / 255.0)
            boxes, scores, labels = fn(img)
            predictions.append({
                "boxes": np.asarray(boxes)[0],
                "scores": np.asarray(scores)[0],
                "labels": np.asarray(labels)[0],
            })
            tv = item["box_valid"]
            targets.append({
                "boxes": np.asarray(
                    cxcywh_to_xyxy(jnp.asarray(item["boxes"][tv]))
                ),
                "labels": item["labels"][tv],
            })
        result["map"] = compute_map(predictions, targets)

    logger.info("Benchmark: %s", result)
    return result
