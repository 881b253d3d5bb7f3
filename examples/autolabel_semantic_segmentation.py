"""Autolabel: predict pseudo-masks with a trained model, then fine-tune on
them.

The reference's autolabel workflow (``predict_semantic_segmentation`` ->
``train_semantic_segmentation``, docs ``semantic_segmentation.md``): a model
trained on a labeled subset (or a zoo checkpoint such as
``dinov3/vits16-eomt-ade20k``) labels an unlabeled pool; the pseudo-labeled
pool then trains a larger/faster model.
"""

from pathlib import Path

import lightly_train_tpu as lt


def main(
    labeled: dict,
    unlabeled_images: str,
    out_dir: str = "out/autolabel",
    num_classes: int = 3,
) -> None:
    out = Path(out_dir)

    # 1) Teacher: fine-tune EoMT on the labeled subset
    #    (or skip and use lt.load_model("dinov3/vits16-eomt-ade20k")).
    lt.train_semantic_segmentation(
        out=str(out / "teacher"),
        data={**labeled, "num_classes": num_classes},
        model="dinov3/vits16-eomt",
        steps=1000,
        batch_size=8,
    )

    # 2) Autolabel the unlabeled pool.
    lt.predict_semantic_segmentation(
        out=str(out / "pseudo_masks"),
        data=unlabeled_images,
        checkpoint=str(out / "teacher" / "exported_models" / "exported_last"),
    )

    # 3) Student: train on the pseudo-labels.
    lt.train_semantic_segmentation(
        out=str(out / "student"),
        data={
            "train": {
                "images": unlabeled_images,
                "masks": str(out / "pseudo_masks"),
            },
            "val": labeled["val"],
            "num_classes": num_classes,
        },
        model="dinov3/vitb16-eomt",
        steps=4000,
        batch_size=8,
    )


if __name__ == "__main__":
    main(
        labeled={
            "train": {"images": "data/train/images",
                      "masks": "data/train/masks"},
            "val": {"images": "data/val/images", "masks": "data/val/masks"},
        },
        unlabeled_images="data/unlabeled/images",
    )
