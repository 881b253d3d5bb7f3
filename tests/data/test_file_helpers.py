"""Mode-aware image loading (RGB / UNCHANGED), dtype policy."""

import numpy as np
import pytest
from PIL import Image

from lightly_train_tpu._data.file_helpers import (
    ImageMode,
    open_image_numpy,
    open_image_numpy_resized,
)
from lightly_train_tpu._data.image_dataset import ImageDataset


def test_rgb_mode_replicates_grayscale(tmp_path):
    p = tmp_path / "g.png"
    Image.fromarray(np.arange(64, dtype=np.uint8).reshape(8, 8)).save(p)
    arr = open_image_numpy(p, ImageMode.RGB)
    assert arr.shape == (8, 8, 3)
    np.testing.assert_array_equal(arr[..., 0], arr[..., 2])


def test_unchanged_keeps_alpha(tmp_path):
    p = tmp_path / "rgba.png"
    rgba = np.random.default_rng(0).integers(0, 255, (8, 8, 4), dtype=np.uint8)
    Image.fromarray(rgba, "RGBA").save(p)
    arr = open_image_numpy(p, ImageMode.UNCHANGED)
    assert arr.shape == (8, 8, 4)
    np.testing.assert_array_equal(arr, rgba)


def test_unchanged_16bit_scales_to_float(tmp_path):
    p = tmp_path / "d.png"
    depth = (np.arange(64, dtype=np.uint16) * 1000).reshape(8, 8)
    Image.fromarray(depth, "I;16").save(p)
    arr = open_image_numpy(p, ImageMode.UNCHANGED)
    assert arr.dtype == np.float32
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def test_resized_unchanged(tmp_path):
    p = tmp_path / "rgba.png"
    rgba = np.random.default_rng(1).integers(0, 255, (16, 24, 4), dtype=np.uint8)
    Image.fromarray(rgba, "RGBA").save(p)
    arr = open_image_numpy_resized(p, (8, 8), ImageMode.UNCHANGED)
    assert arr.shape == (8, 8, 4)


def test_image_dataset_unchanged_mode(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (12, 12, 4), dtype=np.uint8), "RGBA"
        ).save(tmp_path / f"{i}.png")
    monkeypatch.setenv("LIGHTLY_TRAIN_IMAGE_MODE", "UNCHANGED")
    ds = ImageDataset(
        [str(tmp_path / f"{i}.png") for i in range(3)], canonical_hw=(8, 8)
    )
    assert ds[0].shape == (8, 8, 4)


def test_dicom_raises_actionable_error(tmp_path):
    p = tmp_path / "scan.dcm"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises((ImportError, NotImplementedError), match="pydicom"):
        open_image_numpy(p)
