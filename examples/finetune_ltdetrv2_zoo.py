"""Fine-tune an LT-DETRv2 zoo model (ECViT backbone) on a COCO dataset.

The ``ltdetrv2-{s,m,l,x}`` names resolve to the EdgeCrafter ECViT backbone
sizes of the reference's model zoo
(``ltdetr_object_detection/config.py:1111-1207``).
"""

import lightly_train_tpu as lt

if __name__ == "__main__":
    state, val = lt.train_object_detection(
        out="runs/ltdetrv2_s",
        model="ltdetrv2-s",
        data={
            "format": "coco",
            "train": {"images": "coco/train2017",
                      "annotations": "coco/annotations/instances_train2017.json"},
            "val": {"images": "coco/val2017",
                    "annotations": "coco/annotations/instances_val2017.json"},
        },
        image_size=640,
        batch_size=16,
        precision="bf16",
    )
    print("val mAP:", val.get("val_map"))
