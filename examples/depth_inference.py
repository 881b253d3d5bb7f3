"""Depth-Anything inference: zoo checkpoint -> per-pixel depth maps.

The reference's depth workflow (``docs/source/depth_estimation.md``): load a
DAv3 model by zoo name (downloads + converts the torch checkpoint on the
fly) and predict depth for a directory of images. Metric variants accept a
focal length; relative variants return unit-free inverse depth.
"""

from pathlib import Path

import numpy as np
from PIL import Image

from lightly_train_tpu.tasks.model_io import load_model


def main(images_dir: str, out_dir: str = "out/depth") -> None:
    # Any of the dav3/dav2 zoo names, e.g. dinov3/dav3-metric-tiny for
    # metric depth. Downloads once into LIGHTLY_TRAIN_CACHE_DIR.
    model = load_model("dinov3/dav3-relative-tiny")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(Path(images_dir).glob("*.jpg")):
        depth = model.predict(f)["depth"]  # (H, W) float32
        # normalize for visualization
        d = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-9)
        Image.fromarray((d * 255).astype(np.uint8)).save(
            out / f"{f.stem}_depth.png"
        )
        print(f, "->", out / f"{f.stem}_depth.png")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "data/images")
