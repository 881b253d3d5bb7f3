"""SSL image dataset: file listing + decode to canonical host batches.

Rebuild of ``src/lightly_train/_data/image_dataset.py:24-93`` +
``file_helpers.py``, restructured for the TPU pipeline: the dataset only
lists + decodes images to a fixed canonical (H0, W0) uint8 array — ALL
augmentation happens on device (``ops/augment.py``), unlike the reference
where albumentations runs per-view on CPU workers.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from lightly_train_tpu.errors import DatasetError

logger = logging.getLogger("lightly_train_tpu.data")

# Reference's supported extension list (``tests/helpers.py:66-112``), minus
# .dcm (pydicom) and .ps/.eps (ghostscript) which need external decoders —
# everything here decodes through PIL.
IMAGE_EXTENSIONS = {
    ".bmp", ".dib", ".pcx", ".dds", ".gif", ".png", ".apng",
    ".jp2", ".j2k", ".jpc", ".jpf", ".jpx", ".j2c",
    ".icns", ".ico", ".im", ".jfif", ".jpe", ".jpg", ".jpeg",
    ".tif", ".tiff", ".pbm", ".pgm", ".ppm", ".pnm",
    ".bw", ".rgb", ".rgba", ".sgi", ".tga", ".icb", ".vda", ".vst",
    ".webp",
}


def list_image_files(data_dir: Path) -> List[str]:
    """Recursively list image files (sorted, deterministic across hosts)."""
    data_dir = Path(data_dir)
    if not data_dir.exists():
        raise DatasetError(f"Data directory does not exist: {data_dir}")
    files = sorted(
        str(p)
        for p in data_dir.rglob("*")
        if p.suffix.lower() in IMAGE_EXTENSIONS and p.is_file()
    )
    if not files:
        raise DatasetError(
            f"No images found under {data_dir} (extensions: "
            f"{sorted(IMAGE_EXTENSIONS)})"
        )
    return files


def decode_image(
    path: str, canonical_hw: Tuple[int, int], mode: str = "RGB"
) -> np.ndarray:
    """Decode one image to uint8 (H0, W0, 3).

    The resize to the canonical size uses PIL bilinear; random-resized-crop
    geometry is applied later on device. For crops much smaller than the
    canonical size this matches the reference pipeline's fidelity.
    """
    from PIL import Image

    with Image.open(path) as im:
        # JPEG draft mode: decode directly at a reduced DCT scale (1/2, 1/4,
        # 1/8) — 2-4x faster decode for big photos. Only engaged at >= 2x
        # downscale (draft is a no-op with ~1ms overhead below that).
        if (
            mode == "RGB"
            and im.size[0] >= 2 * canonical_hw[1]
            and im.size[1] >= 2 * canonical_hw[0]
        ):
            try:
                im.draft("RGB", (canonical_hw[1], canonical_hw[0]))
            except Exception:
                pass
        im = im.convert(mode)
        im = im.resize((canonical_hw[1], canonical_hw[0]), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr


class ImageDataset:
    """Filename-backed dataset producing canonical uint8 images.

    With ``mask_dir`` set, each image is paired by stem with a single-channel
    mask PNG (region/segment ids — the reference's mask inputs for DetCon,
    ``_data/image_dataset.py:56-93`` ``masks`` support) and items become
    ``{"images": u8 HWC, "masks": int32 HW}`` dicts.
    """

    def __init__(
        self,
        filenames: Sequence[str],
        canonical_hw: Tuple[int, int] = (256, 256),
        mode: Optional[str] = None,
        mask_dir: Optional[Path] = None,
    ):
        if len(filenames) == 0:
            raise DatasetError("Empty dataset.")
        self.filenames = filenames
        self.canonical_hw = canonical_hw
        if mode is None:
            # LIGHTLY_TRAIN_IMAGE_MODE: "RGB" (default) or "UNCHANGED"
            # (multispectral/alpha channels kept — pair with the
            # channel_drop transform), reference file_helpers ImageMode.
            from lightly_train_tpu._env import Env

            mode = Env.LIGHTLY_TRAIN_IMAGE_MODE.value
        self.mode = mode
        self.mask_by_stem = None
        if mask_dir is not None:
            mask_dir = Path(mask_dir)
            self.mask_by_stem = {
                p.stem: p
                for p in sorted(mask_dir.rglob("*"))
                if p.suffix.lower() in IMAGE_EXTENSIONS
            }
            if not self.mask_by_stem:
                raise DatasetError(f"No masks under {mask_dir}")

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, index: int):
        if self.mode == "UNCHANGED":
            from lightly_train_tpu._data.file_helpers import (
                ImageMode,
                open_image_numpy_resized,
            )

            image = open_image_numpy_resized(
                self.filenames[index], self.canonical_hw, ImageMode.UNCHANGED
            )
        else:
            image = decode_image(
                self.filenames[index], self.canonical_hw, self.mode
            )
        if self.mask_by_stem is None:
            return image
        from PIL import Image

        stem = Path(self.filenames[index]).stem
        mask_path = self.mask_by_stem.get(stem)
        if mask_path is None:
            mask = np.zeros(self.canonical_hw, np.int32)
        else:
            with Image.open(mask_path) as m:
                # Palette-mode (P) class-id PNGs must be read as raw indices
                # (convert("L") would map through the palette to luminance).
                if m.mode not in ("P", "L", "I", "I;16"):
                    m = m.convert("L")
                m = m.resize(
                    (self.canonical_hw[1], self.canonical_hw[0]), Image.NEAREST
                )
                mask = np.asarray(m, dtype=np.int32)
        return {"images": image, "masks": mask}
