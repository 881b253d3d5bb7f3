"""ECViT backbone, multihead tasks, and depth estimation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lightly_train_tpu as lt
from lightly_train_tpu.models.package_registry import get_wrapped_model


def test_ecvit_forward_multiscale():
    m = get_wrapped_model("ecvit/ecvittest")
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init(jax.random.key(0), x)
    out = m.forward_features(variables, x)
    # ecvittest projects to proj_dim=16; P3/P4/P5 at /8, /16, /32 (the
    # reference wrapper's interpolated pyramid, ``ecvit.py:122-160``).
    assert out["features"].shape == (2, 1, 1, 16)
    assert out["cls_token"].shape == (2, 16)
    assert len(out["stage_features"]) == 3
    assert out["stage_features"][0].shape[1] == 4
    assert out["stage_features"][1].shape[1] == 2
    assert "ecvit/ecvits" in lt.list_models()
    assert "ecvit/ecvitsplus" in lt.list_models()


def test_depth_estimation_inference():
    from lightly_train_tpu.tasks.depth_estimation import (
        DepthEstimationModel,
        DPTHead,
        depth_metrics,
    )

    wrapped = get_wrapped_model("dinov2/vittest14")
    model = DepthEstimationModel(
        wrapped, DPTHead(dim=16, max_depth=10.0), layer_indices=(0, 0, 1, 1)
    )
    x = jnp.zeros((1, 28, 28, 3))
    variables = model.init(jax.random.key(0), x)
    depth = model.predict_depth(variables, x)
    assert depth.shape == (1, 28, 28)
    assert float(depth.min()) >= 0.0 and float(depth.max()) <= 10.0

    m = depth_metrics(np.ones((4, 4)), np.ones((4, 4)))
    assert m["delta1"] == 1.0 and m["rmse"] == 0.0


@pytest.fixture
def classification_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("a", "b"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(6):
                Image.fromarray(
                    rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
                ).save(d / f"{i}.png")
    return tmp_path


def test_multihead_classification(tmp_path, classification_dir):
    state, val = lt.train_image_classification_multihead(
        out=str(tmp_path / "out"),
        data={"train": str(classification_dir / "train"),
              "val": str(classification_dir / "val")},
        model="torchvision/resnettest",
        task_args={"head_lr_multipliers": {"a": 1.0, "b": 0.1}},
        steps=2, batch_size=8, image_size=32, precision="fp32",
        num_workers=2, val_every=2,
    )
    assert int(state.step) == 2
    assert "val_top1_a" in val and "val_top1_b" in val
    assert "val_top1_best" in val


def test_multihead_segmentation(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    (tmp_path / "train" / "images").mkdir(parents=True)
    (tmp_path / "train" / "masks").mkdir(parents=True)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
        ).save(tmp_path / "train" / "images" / f"{i}.png")
        Image.fromarray(
            rng.integers(0, 3, (36, 36), dtype=np.uint8)
        ).save(tmp_path / "train" / "masks" / f"{i}.png")
    state, val = lt.train_semantic_segmentation_multihead(
        out=str(tmp_path / "out"),
        data={
            "train": {"images": str(tmp_path / "train" / "images"),
                      "masks": str(tmp_path / "train" / "masks")},
            "val": {"images": str(tmp_path / "train" / "images"),
                    "masks": str(tmp_path / "train" / "masks")},
            "num_classes": 3,
        },
        model="dinov3/vittest16",
        steps=2, batch_size=8, image_size=32, precision="fp32",
        num_workers=2, val_every=2,
    )
    assert int(state.step) == 2
    assert "val_miou_best" in val
