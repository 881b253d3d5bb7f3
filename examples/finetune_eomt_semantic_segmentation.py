"""Fine-tune EoMT semantic segmentation from a pretrained backbone, then
autolabel a new dataset with the trained model (the reference's autolabel
workflow, BASELINE.md)."""

import lightly_train_tpu as lt

if __name__ == "__main__":
    state, val = lt.train_semantic_segmentation(
        out="runs/eomt_ade20k",
        data={
            "train": {"images": "datasets/ade20k/images/training",
                      "masks": "datasets/ade20k/annotations/training"},
            "val": {"images": "datasets/ade20k/images/validation",
                    "masks": "datasets/ade20k/annotations/validation"},
            "num_classes": 150,
        },
        model="dinov3/vits16-eomt",
        checkpoint="runs/dinov2_vitb14/exported_models/exported_last",
        image_size=512,
        batch_size=16,
        steps=40_000,
    )
    print("val mIoU:", val["val_miou"])

    # Autolabel an unlabeled dataset with the best checkpoint.
    lt.predict_semantic_segmentation(
        out="runs/autolabels",
        data="datasets/unlabeled_images",
        checkpoint="runs/eomt_ade20k/exported_models/exported_best",
        image_size=512,
    )
