"""End-to-end fine-tuning tests (classification + semantic segmentation)."""

import json
from pathlib import Path

import numpy as np
import pytest

import lightly_train_tpu as lt


@pytest.fixture
def classification_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            n = 8 if split == "train" else 5  # odd val size -> padding path
            for i in range(n):
                arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return tmp_path


@pytest.fixture
def segmentation_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "masks").mkdir(parents=True)
        for i in range(6):
            arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / split / "images" / f"{i}.png")
            mask = rng.integers(0, 3, size=(40, 40), dtype=np.uint8)
            mask[0, 0] = 255  # exercise ignore_index
            Image.fromarray(mask).save(tmp_path / split / "masks" / f"{i}.png")
    return tmp_path


def test_train_image_classification(tmp_path, classification_dir):
    out = tmp_path / "out"
    state, val = lt.train_image_classification(
        out=str(out),
        data={
            "train": str(classification_dir / "train"),
            "val": str(classification_dir / "val"),
        },
        model="torchvision/resnettest",
        steps=3,
        batch_size=8,
        image_size=32,
        precision="fp32",
        num_workers=2,
        log_every=1,
        val_every=3,
    )
    assert int(state.step) == 3
    assert "val_top1" in val and 0.0 <= val["val_top1"] <= 1.0
    assert "val_top5" in val
    meta = json.loads(
        (out / "exported_models" / "exported_last" / "metadata.json").read_text()
    )
    assert meta["task"] == "image_classification"
    # best artifact written when val improved from None
    assert (out / "exported_models" / "exported_best").exists()


def test_train_semantic_segmentation(tmp_path, segmentation_dir):
    out = tmp_path / "out"
    state, val = lt.train_semantic_segmentation(
        out=str(out),
        data={
            "train": {
                "images": str(segmentation_dir / "train" / "images"),
                "masks": str(segmentation_dir / "train" / "masks"),
            },
            "val": {
                "images": str(segmentation_dir / "val" / "images"),
                "masks": str(segmentation_dir / "val" / "masks"),
            },
            "num_classes": 3,
        },
        model="dinov3/vittest16",
        steps=2,
        batch_size=4,
        image_size=32,
        precision="fp32",
        num_workers=2,
        log_every=1,
        val_every=2,
    )
    assert int(state.step) == 2
    assert "val_miou" in val and 0.0 <= val["val_miou"] <= 1.0


def test_classification_with_pretrained_checkpoint(tmp_path, classification_dir):
    from PIL import Image

    # Pretrain briefly, then fine-tune from the exported artifact.
    pre_data = tmp_path / "pre"
    pre_data.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(pre_data / f"{i}.png")
    pre_out = tmp_path / "pre_out"
    lt.pretrain(
        out=str(pre_out), data=str(pre_data),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, batch_size=8, steps=1,
        precision="fp32", canonical_size=48, num_workers=2,
    )
    out = tmp_path / "ft_out"
    state, val = lt.train_image_classification(
        out=str(out),
        data={"train": str(classification_dir / "train")},
        model="torchvision/resnettest",
        checkpoint=str(pre_out / "exported_models" / "exported_last"),
        steps=2, batch_size=4, image_size=32, precision="fp32",
        num_workers=2, val_every=2,
    )
    assert int(state.step) == 2


def test_grad_accumulation(tmp_path, classification_dir):
    state, val = lt.train_image_classification(
        out=str(tmp_path / "out_accum"),
        data={"train": str(classification_dir / "train")},
        model="torchvision/resnettest",
        steps=2, batch_size=16, grad_accum_steps=2, image_size=32,
        precision="fp32", num_workers=2,
    )
    assert int(state.step) == 2


def test_first_batch_label_grid_saved(tmp_path):
    """Task loop saves a first-batch label grid (reference
    ``train_task.py:1772-1778`` label/prediction visualization)."""
    import numpy as np
    from PIL import Image

    import lightly_train_tpu as lt

    rng = np.random.default_rng(0)
    data = tmp_path / "cls"
    for c in ("a", "b"):
        (data / "train" / c).mkdir(parents=True)
        (data / "val" / c).mkdir(parents=True)
        for i in range(4):
            for split in ("train", "val"):
                Image.fromarray(
                    rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                ).save(data / split / c / f"{i}.png")
    out = tmp_path / "out"
    lt.train_image_classification(
        out=str(out),
        data={"train": str(data / "train"), "val": str(data / "val")},
        model="torchvision/resnettest",
        steps=1, batch_size=8, image_size=32, precision="fp32",
        num_workers=0, log_every=1, val_every=1,
    )
    assert (out / "visualizations" / "first_batch_labels.png").exists()
