"""Image file helpers: mode-aware decode (RGB / UNCHANGED), dtype policy.

Rebuild of ``src/lightly_train/_data/file_helpers.py`` (518 LoC): the
reference loads images through torchvision/PIL/pydicom with an ``ImageMode``
switch — ``RGB`` (3-channel, grayscale replicated) or ``UNCHANGED``
(multispectral/alpha channels kept, used with the ChannelDrop transform).
Non-uint8 images (16-bit TIFF/PNG) become float32 scaled to [0, 1]
(``file_helpers.py:238-246``). DICOM needs pydicom, which this environment
does not ship — the loader raises the same actionable error.
"""

from __future__ import annotations

import enum
from pathlib import Path
from typing import Tuple, Union

import numpy as np


class ImageMode(enum.Enum):
    RGB = "RGB"
    UNCHANGED = "UNCHANGED"


def open_image_numpy(
    image_path: Union[str, Path],
    mode: ImageMode = ImageMode.RGB,
) -> np.ndarray:
    """Returns the image as a (H, W, C) or (H, W) numpy array.

    RGB: 3-channel uint8 (grayscale replicated). UNCHANGED: channels and
    bit depth preserved; non-uint8 becomes float32 in [0, 1].
    """
    image_path = Path(image_path)
    if image_path.suffix.lower() == ".dcm":
        try:
            import pydicom  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "pydicom is required to read DICOM images. Install it with "
                "'pip install lightly-train[dicom]'."
            ) from e
        raise NotImplementedError(
            "DICOM decoding requires pydicom, which is unavailable here."
        )
    from PIL import Image

    with Image.open(image_path) as im:
        if mode == ImageMode.RGB:
            im = im.convert("RGB")
        arr = np.array(im)
    if arr.dtype != np.uint8:
        # Non-uint8 (16-bit masks/TIFF): float32 scaled to [0, 1]
        # (``file_helpers.py:238-246``).
        if np.issubdtype(arr.dtype, np.integer):
            info = np.iinfo(arr.dtype)
            arr = (arr.astype(np.float32) - float(info.min)) / float(
                info.max - info.min
            )
        else:
            arr = arr.astype(np.float32)
    if mode == ImageMode.RGB and arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr


def open_image_numpy_resized(
    image_path: Union[str, Path],
    canonical_hw: Tuple[int, int],
    mode: ImageMode = ImageMode.RGB,
) -> np.ndarray:
    """Mode-aware decode + bilinear resize to the canonical size.

    UNCHANGED multi-channel images resize per channel (PIL handles up to
    4 channels natively; beyond that each channel resizes separately).
    """
    from PIL import Image

    arr = open_image_numpy(image_path, mode)
    h, w = canonical_hw
    if arr.shape[:2] == (h, w):
        return arr
    if arr.ndim == 2 or arr.shape[2] <= 4:
        im = Image.fromarray(
            (arr * 255).astype(np.uint8)
            if arr.dtype == np.float32 and arr.ndim == 3 and arr.shape[2] <= 4
            else arr
        )
        im = im.resize((w, h), Image.BILINEAR)
        out = np.asarray(im)
        if arr.dtype == np.float32 and out.dtype == np.uint8:
            out = out.astype(np.float32) / 255.0
        return out
    chans = [
        np.asarray(
            Image.fromarray(arr[..., c]).resize((w, h), Image.BILINEAR)
        )
        for c in range(arr.shape[2])
    ]
    return np.stack(chans, axis=-1)
