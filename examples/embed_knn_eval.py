"""Embed a dataset and run kNN classification on the embeddings.

The reference's embed -> downstream-eval workflow
(``docs/source/embed.md``): pretrain (or reuse) a backbone, export
embeddings with ``lt.embed``, then evaluate them with a simple kNN — no
fine-tuning, a direct measure of representation quality.

Runs on the CPU mesh with test-size models; swap the model/name and data
paths for a real run.
"""

from pathlib import Path

import numpy as np

import lightly_train_tpu as lt


def main(data_dir: str, out_dir: str = "out/embed_knn") -> None:
    out = Path(out_dir)

    # 1) Pretrain a small model (skip if you already have an export).
    lt.pretrain(
        out=str(out / "pretrain"),
        data=data_dir,
        model="torchvision/resnet18",
        method="simclr",
        batch_size=64,
        steps=1000,
    )

    # 2) Embed every image.
    emb_path = lt.embed(
        out=str(out / "embeddings.npz"),
        data=data_dir,
        checkpoint=str(out / "pretrain" / "exported_models" / "exported_last"),
        batch_size=128,
    )
    blob = np.load(emb_path, allow_pickle=True)
    emb, files = blob["embeddings"], blob["filenames"]
    print(f"{len(files)} embeddings of dim {emb.shape[1]}")

    # 3) kNN eval: labels from parent directory names (ImageFolder layout).
    labels = np.asarray([Path(f).parent.name for f in files])
    classes, y = np.unique(labels, return_inverse=True)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = emb @ emb.T
    np.fill_diagonal(sim, -np.inf)  # leave-one-out
    k = 20
    nn_idx = np.argsort(-sim, axis=1)[:, :k]
    votes = y[nn_idx]
    pred = np.apply_along_axis(
        lambda v: np.bincount(v, minlength=len(classes)).argmax(), 1, votes
    )
    print(f"kNN(k={k}) accuracy: {(pred == y).mean():.4f}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "data/train")
