"""StableHLO export + benchmark command tests."""

import json

import numpy as np
import pytest

import lightly_train_tpu as lt
from lightly_train_tpu.errors import ConfigError


@pytest.fixture(scope="module")
def cls_run(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("clsrun")
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp / "train" / cls
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    lt.train_image_classification(
        out=str(tmp / "out"), data={"train": str(tmp / "train")},
        model="torchvision/resnettest", steps=1, batch_size=8,
        image_size=32, precision="fp32", num_workers=2,
    )
    return tmp


@pytest.fixture(scope="module")
def det_run(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("detrun")
    rng = np.random.default_rng(0)
    (tmp / "images").mkdir(parents=True)
    (tmp / "labels").mkdir()
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(tmp / "images" / f"{i}.png")
        (tmp / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    lt.train_object_detection(
        out=str(tmp / "out"),
        data={"format": "yolo",
              "train": {"images": str(tmp / "images"),
                        "labels": str(tmp / "labels")},
              "num_classes": 1},
        model="dinov3/vittest16",
        task_args={"num_queries": 8, "num_decoder_layers": 1, "d_model": 32,
                   "num_heads": 2, "dim_feedforward": 64, "max_detections": 4},
        steps=1, batch_size=8, image_size=32, precision="fp32", num_workers=2,
    )
    return tmp


def test_export_stablehlo_classification(tmp_path, cls_run):
    out = lt.export_stablehlo(
        out=str(tmp_path / "model.stablehlo"),
        checkpoint=str(cls_run / "out" / "exported_models" / "exported_last"),
        image_size=32,
    )
    assert out.exists() and out.stat().st_size > 1000
    meta = json.loads(out.with_suffix(out.suffix + ".json").read_text())
    assert meta["format"] == "stablehlo"
    assert meta["task"] == "image_classification"


def test_export_onnx_classification(tmp_path, cls_run):
    out = lt.export_onnx(
        out=str(tmp_path / "model.onnx"),
        checkpoint=str(cls_run / "out" / "exported_models" / "exported_last"),
        image_size=32,
    )
    # verify=True already ran the numpy evaluator against the jax forward
    # at batch sizes {1, 3} (dynamic batch); here check the artifact shape.
    assert out.exists() and out.stat().st_size > 1000
    from lightly_train_tpu._export import onnx_proto as onnx_proto_mod

    dec = onnx_proto_mod.decode_model(out.read_bytes())
    meta = {m["key"]: m["value"] for m in dec["metadata_props"]}
    assert meta["task"] == "image_classification"
    assert meta["model_name"] == "torchvision/resnettest"
    assert onnx_proto_mod.value_info_shape(dec["graph"]["input"][0])[0] == "batch"
    sidecar = json.loads(out.with_suffix(out.suffix + ".json").read_text())
    assert sidecar["format"] == "onnx"


def test_export_onnx_static_fp16(tmp_path, cls_run):
    out = lt.export_onnx(
        out=str(tmp_path / "model_fp16.onnx"),
        checkpoint=str(cls_run / "out" / "exported_models" / "exported_last"),
        image_size=32, precision="fp16", dynamic_batch_size=False,
        batch_size=2,
    )
    from lightly_train_tpu._export import onnx_proto as onnx_proto_mod

    dec = onnx_proto_mod.decode_model(out.read_bytes())
    # fp16 export: weight initializers are stored as float16.
    from lightly_train_tpu._export.onnx_proto import FLOAT16, tensor_to_numpy

    dtypes = {
        tensor_to_numpy(t).dtype.name
        for t in dec["graph"]["initializer"]
        if tensor_to_numpy(t).dtype.kind == "f" and tensor_to_numpy(t).size > 16
    }
    assert "float16" in dtypes
    # Static batch: the input keeps its traced size.
    assert onnx_proto_mod.value_info_shape(dec["graph"]["input"][0])[0] == 2


def test_benchmark_object_detection_jax_backend(det_run):
    result = lt.benchmark_object_detection(
        checkpoint=str(det_run / "out" / "exported_models" / "exported_last"),
        image_size=32, num_warmup=1, num_runs=3,
        data={"images": str(det_run / "images"),
              "labels": str(det_run / "labels")},
    )
    assert result["latency_ms"]["mean"] > 0
    assert "map" in result and 0.0 <= result["map"]["map"] <= 1.0


def test_benchmark_stablehlo_backend(det_run):
    result = lt.benchmark_object_detection(
        checkpoint=str(det_run / "out" / "exported_models" / "exported_last"),
        image_size=32, num_warmup=1, num_runs=2, backend="stablehlo",
    )
    assert result["backend"] == "stablehlo"
    assert result["latency_ms"]["median"] > 0


def test_export_savedmodel_classification(tmp_path, cls_run):
    pytest.importorskip("tensorflow")
    out = lt.export_savedmodel(
        out=str(tmp_path / "savedmodel"),
        checkpoint=str(cls_run / "out" / "exported_models" / "exported_last"),
        image_size=32,
    )
    assert (out / "saved_model.pb").exists()
    meta = json.loads((out / "lightly_train_metadata.json").read_text())
    assert meta["format"] == "tf_saved_model"
    assert meta["task"] == "image_classification"


def test_benchmark_onnx_backend(det_run):
    """ONNX backend: exported bytes through the numpy evaluator, plus mAP
    computed entirely from the ONNX artifact (portability check)."""
    result = lt.benchmark_object_detection(
        checkpoint=str(det_run / "out" / "exported_models" / "exported_last"),
        image_size=32, num_warmup=1, num_runs=2, backend="onnx",
        data={"images": str(det_run / "images"),
              "labels": str(det_run / "labels")},
    )
    assert result["backend"] == "onnx"
    assert result["latency_ms"]["mean"] > 0
    assert "map" in result and 0.0 <= result["map"]["map"] <= 1.0


def test_benchmark_savedmodel_backend(det_run):
    pytest.importorskip("tensorflow")
    result = lt.benchmark_object_detection(
        checkpoint=str(det_run / "out" / "exported_models" / "exported_last"),
        image_size=32, num_warmup=1, num_runs=3, backend="savedmodel",
        data={"images": str(det_run / "images"),
              "labels": str(det_run / "labels")},
    )
    assert result["backend"] == "savedmodel"
    assert result["latency_ms"]["mean"] > 0
    assert "map" in result
