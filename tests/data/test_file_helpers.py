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


def test_exotic_format_battery(tmp_path):
    """Decode-path coverage across the reference's extension list.

    The reference checks in ~30 sample images (``tests/test_images/``,
    SURVEY.md §4); here the battery is generated: every PIL-writable
    extension from IMAGE_EXTENSIONS round-trips through list_image_files +
    open_image_numpy to a (H, W, 3) uint8 array in RGB mode.
    """
    import numpy as np
    from PIL import Image

    from lightly_train_tpu._data.file_helpers import ImageMode, open_image_numpy
    from lightly_train_tpu._data.image_dataset import (
        IMAGE_EXTENSIONS,
        list_image_files,
    )

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
    written = []
    # PIL can write these directly; read-only formats (dds, pcx-16 etc.)
    # are still accepted by list_image_files.
    writable = [
        ".bmp", ".gif", ".png", ".jpg", ".jpeg", ".jfif", ".jpe",
        ".tif", ".tiff", ".ppm", ".pgm", ".pbm", ".webp", ".tga",
        ".ico", ".im", ".pcx", ".sgi", ".rgb", ".bw", ".jp2",
    ]
    for ext in writable:
        assert ext in IMAGE_EXTENSIONS, ext
        p = tmp_path / f"img{ext}"
        im = Image.fromarray(arr)
        if ext in (".pgm", ".bw"):
            im = im.convert("L")
        elif ext == ".pbm":
            im = im.convert("1")
        try:
            im.save(p)
        except (OSError, ValueError, KeyError):
            continue  # encoder not compiled into this PIL build
        written.append(p)

    assert len(written) >= 12
    files = list_image_files(tmp_path)
    assert len(files) == len(written)
    for p in written:
        out = open_image_numpy(p, ImageMode.RGB)
        assert out.dtype == np.uint8
        assert out.ndim == 3 and out.shape[2] == 3, p.suffix
