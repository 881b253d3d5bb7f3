"""Task-side convergence + matcher-quality evidence (VERDICT r5 #6/#7).

Generates a procedural shapes dataset (this image has zero egress, so no
public benchmark downloads; the dataset is non-trivial — colored, occluding
circles / rectangles / triangles over textured backgrounds with noise — and
a model must genuinely learn shape/color boundaries to score):

1. EoMT semantic segmentation fine-tune through the PUBLIC API
   (`train_semantic_segmentation`, model="<backbone>-eomt") — commits the
   val_miou curve. Run on TPU with LIGHTLY_TRAIN_MATCHER=greedy (the axon
   relay has no host callbacks) or on CPU.
2. LT-DETR object detection trained twice on the same data — host
   Hungarian vs greedy device matcher — committing both loss/mAP curves
   (the evidence VERDICT r4 weak #5 asked for). CPU-only (the Hungarian arm
   needs pure_callback).

Usage:
  python docs/generate_task_convergence_r5.py seg [steps]
  python docs/generate_task_convergence_r5.py det [steps]
Outputs docs/task_convergence_r5_{seg,det}.json.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "docs"
N_CLASSES = 4  # background, circle, rectangle, triangle


def _texture(r, h, w):
    base = r.uniform(40, 180, size=3)
    noise = r.normal(0, 12, size=(h, w, 3))
    gy = np.linspace(-20, 20, h)[:, None, None]
    return np.clip(base + noise + gy, 0, 255)


def make_shapes_image(r, size):
    img = _texture(r, size, size)
    mask = np.zeros((size, size), np.uint8)
    boxes, labels = [], []
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(int(r.integers(2, 6))):
        kind = int(r.integers(1, 4))
        c = r.uniform(60, 255, size=3)
        cx, cy = r.uniform(0.15, 0.85, 2) * size
        s = r.uniform(0.08, 0.22) * size
        if kind == 1:  # circle
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= s**2
        elif kind == 2:  # rectangle
            ar = r.uniform(0.5, 2.0)
            m = (np.abs(yy - cy) <= s) & (np.abs(xx - cx) <= s * ar)
        else:  # triangle (upward)
            m = (yy <= cy + s) & (
                np.abs(xx - cx) <= (yy - (cy - s)) * 0.5
            ) & (yy >= cy - s)
        if not m.any():
            continue
        img[m] = c + r.normal(0, 6, size=(int(m.sum()), 3))
        mask[m] = kind
        ys, xs = np.where(m)
        boxes.append(
            [xs.min() / size, ys.min() / size, (xs.max() + 1) / size,
             (ys.max() + 1) / size]
        )
        labels.append(kind - 1)
    return (
        np.clip(img, 0, 255).astype(np.uint8),
        mask,
        np.asarray(boxes, np.float32).reshape(-1, 4),
        np.asarray(labels, np.int64),
    )


def build_seg_dataset(root: Path, n_train=256, n_val=64, size=128):
    from PIL import Image

    r = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "masks" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, mask, _, _ = make_shapes_image(r, size)
            Image.fromarray(img).save(root / "images" / split / f"{i}.png")
            Image.fromarray(mask).save(root / "masks" / split / f"{i}.png")


def build_det_dataset(root: Path, n_train=96, n_val=32, size=64):
    from PIL import Image

    r = np.random.default_rng(1)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, _, boxes, labels = make_shapes_image(r, size)
            Image.fromarray(img).save(root / "images" / split / f"{i}.png")
            rows = []
            for b, l in zip(boxes, labels):
                cx = (b[0] + b[2]) / 2
                cy = (b[1] + b[3]) / 2
                w, h = b[2] - b[0], b[3] - b[1]
                rows.append(f"{l} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
            (root / "labels" / split / f"{i}.txt").write_text(
                "\n".join(rows)
            )


def read_curve(out_dir: Path, keys):
    curve = []
    for line in (out_dir / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        row = {k: rec[k] for k in keys if k in rec}
        if "step" in rec and row:
            row["step"] = rec["step"]
            curve.append(row)
    return curve


def run_seg(steps=400):
    import tempfile

    import lightly_train_tpu as lt

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "shapes"
        build_seg_dataset(root)
        out = Path(tmp) / "run"
        state, metrics = lt.train_semantic_segmentation(
            out=str(out),
            model="dinov3/vittest16-eomt",
            data={
                "train": {"images": str(root / "images/train"),
                          "masks": str(root / "masks/train")},
                "val": {"images": str(root / "images/val"),
                        "masks": str(root / "masks/val")},
                "classes": {0: "bg", 1: "circle", 2: "rect", 3: "tri"},
            },
            steps=steps, batch_size=16, image_size=128,
            val_every=max(steps // 8, 25),
        )
        curve = read_curve(out, ("train_loss", "val_miou"))
        art = {
            "task": "eomt_semantic_segmentation",
            "dataset": "procedural shapes (256 train / 64 val, 128^2, 4 classes)",
            "model": "dinov3/vittest16-eomt",
            "steps": steps,
            "matcher": os.environ.get("LIGHTLY_TRAIN_MATCHER", "auto"),
            "final": {k: float(v) for k, v in metrics.items()},
            "curve": curve,
        }
    path = OUT / "task_convergence_r5_seg.json"
    path.write_text(json.dumps(art, indent=1))
    print("wrote", path)
    print("final:", art["final"])


def run_det(steps=400):
    import tempfile

    import lightly_train_tpu as lt

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "shapes"
        build_det_dataset(root)
        for matcher in ("hungarian", "greedy"):
            os.environ["LIGHTLY_TRAIN_MATCHER"] = matcher
            out = Path(tmp) / f"run_{matcher}"
            state, metrics = lt.train_object_detection(
                out=str(out),
                model="ecvit/ecvittest",
                data={
                    "format": "yolo",
                    "train": {"images": str(root / "images/train"),
                              "labels": str(root / "labels/train")},
                    "val": {"images": str(root / "images/val"),
                            "labels": str(root / "labels/val")},
                    "classes": {0: "circle", 1: "rect", 2: "tri"},
                },
                steps=steps, batch_size=8, image_size=64,
                val_every=max(steps // 4, 15),
            )
            results[matcher] = {
                "final": {k: float(v) for k, v in metrics.items()},
                "curve": read_curve(out, ("train_loss", "val_map", "val_map50")),
            }
        os.environ.pop("LIGHTLY_TRAIN_MATCHER", None)
    art = {
        "task": "ltdetr_object_detection",
        "dataset": "procedural shapes (96 train / 32 val, 64^2, 3 classes)",
        "model": "ecvit/ecvittest",
        "steps": steps,
        "comparison": "host Hungarian vs greedy device matcher, same data/seed",
        "results": results,
    }
    path = OUT / "task_convergence_r5_det.json"
    path.write_text(json.dumps(art, indent=1))
    print("wrote", path)
    for m, r in results.items():
        print(m, r["final"])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "seg"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    if which == "seg":
        run_seg(steps)
    else:
        run_det(steps)
