"""Fine-tune LT-DETRv2 object detection on COCO, benchmark, and export.

Includes the reference's training recipe pieces: denoising query groups,
step-windowed Mosaic/MixUp, EMA weights, flat-cosine LR, D-FINE decoder.
"""

import lightly_train_tpu as lt

if __name__ == "__main__":
    state, val = lt.train_object_detection(
        out="runs/ltdetr_coco",
        data={
            "format": "coco",
            "train": {"images": "datasets/coco/train2017",
                      "annotations": "datasets/coco/annotations/instances_train2017.json"},
            "val": {"images": "datasets/coco/val2017",
                    "annotations": "datasets/coco/annotations/instances_val2017.json"},
        },
        model="dinov3/vits16-ltdetr",
        checkpoint="runs/dinov2_vitb14/exported_models/exported_last",
        image_size=640,
        batch_size=16,
        steps=60_000,
        task_args={
            "mosaic_window": (0, 30_000),
            "mixup_window": (0, 30_000),
            "dn_groups": 2,
            "decoder": "dfine",
        },
    )
    print("val mAP:", val["val_map"])

    result = lt.benchmark_object_detection(
        checkpoint="runs/ltdetr_coco/exported_models/exported_best",
        image_size=640,
    )
    print("latency:", result["latency_ms"])

    lt.export_stablehlo(
        out="runs/ltdetr_coco/model.stablehlo",
        checkpoint="runs/ltdetr_coco/exported_models/exported_best",
        image_size=640,
    )
