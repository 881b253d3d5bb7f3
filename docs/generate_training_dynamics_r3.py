#!/usr/bin/env python
"""Round-3 training-dynamics artifact: EoMT-tiny semantic segmentation on a
synthetic shapes dataset (VERDICT r2 #8).

Two runs from the same init: the reference default train transforms
(scale-jitter + crop + color jitter + flip) and the round-2 hflip-only
baseline. Writes docs/training_dynamics_r3.json with both val_miou curves —
the first end-to-end evidence that the task loop LEARNS and that the new
augmentation pipeline trains at least as well as the old one.

Run on the 8-device CPU mesh:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python docs/generate_training_dynamics_r3.py
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

IMG = 48
N_TRAIN, N_VAL = 64, 16
STEPS = int(__import__("os").environ.get("DYN_STEPS", "120"))
CLASSES = 3  # background, circle, box


def make_shapes(root: Path, n: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "masks").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = Image.fromarray(
            rng.integers(0, 80, (IMG, IMG, 3), dtype=np.uint8)
        )
        mask = Image.new("L", (IMG, IMG), 0)
        d = ImageDraw.Draw(img)
        dm = ImageDraw.Draw(mask)
        for _ in range(rng.integers(1, 4)):
            cls = int(rng.integers(1, CLASSES))
            x0, y0 = rng.integers(0, IMG - 16, 2)
            w, h = rng.integers(8, 20, 2)
            box = (int(x0), int(y0), int(min(x0 + w, IMG - 1)),
                   int(min(y0 + h, IMG - 1)))
            color = tuple(int(c) for c in rng.integers(120, 256, 3))
            if cls == 1:
                d.ellipse(box, fill=color)
                dm.ellipse(box, fill=cls)
            else:
                d.rectangle(box, fill=color)
                dm.rectangle(box, fill=cls)
        img.save(root / "images" / f"{i}.png")
        mask.save(root / "masks" / f"{i}.png")


def run(data_root: Path, out: Path, transform_args: dict) -> list:
    import lightly_train_tpu as lt

    state, metrics = lt.train_semantic_segmentation(
        out=str(out),
        data={
            "train": {"images": str(data_root / "train/images"),
                      "masks": str(data_root / "train/masks")},
            "val": {"images": str(data_root / "val/images"),
                    "masks": str(data_root / "val/masks")},
            "num_classes": CLASSES,
        },
        model="dinov3/vittest16-eomt",
        steps=STEPS,
        batch_size=8,
        image_size=IMG,
        precision="fp32",
        val_every=24,
        log_every=24,
        transform_args=transform_args,
        task_args={"num_queries": 8},
    )
    curve = []
    for line in (out / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        if "val_miou" in rec:
            curve.append({"step": rec["step"], "val_miou": rec["val_miou"]})
    return curve


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_shapes(root / "train", N_TRAIN, 0)
        make_shapes(root / "val", N_VAL, 1)
        default_curve = run(root, root / "out_default", {})
        hflip_only = run(
            root, root / "out_hflip",
            {"scale_jitter": None, "random_crop": None, "color_jitter": None},
        )
    out = {
        "what": "EoMT-tiny semantic segmentation on synthetic shapes: "
                "val_miou with the reference default train transforms vs "
                "the round-2 hflip-only baseline, same init/data/steps",
        "model": "dinov3/vittest16-eomt",
        "steps": STEPS,
        "classes": CLASSES,
        "default_transforms": default_curve,
        "hflip_only": hflip_only,
        "chance_miou": 1.0 / CLASSES,
    }
    path = Path(__file__).parent / "training_dynamics_r3.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({
        "default_final": default_curve[-1] if default_curve else None,
        "hflip_final": hflip_only[-1] if hflip_only else None,
    }))


if __name__ == "__main__":
    main()
