"""Pretrain an ultralytics YOLOv8 backbone, then export it back.

The reference wraps installed ultralytics models
(``_models/ultralytics/ultralytics.py``); here the CSPDarknet backbone is
native, loads real ``yolov8s.pt`` checkpoints via the converter, and the
pretrained weights export back into ultralytics ``model.{i}.*`` naming for
downstream YOLO fine-tuning.
"""

import numpy as np

import lightly_train_tpu as lt

if __name__ == "__main__":
    state = lt.pretrain(
        out="runs/yolov8s_pretrain",
        data="datasets/my_images",
        model="ultralytics/yolov8s",
        method="distillation",
        method_args={"teacher": "dinov3/vitb16"},
        batch_size=1024,
        epochs=100,
        precision="bf16",
    )

    # Export the pretrained backbone in ultralytics state-dict naming.
    from lightly_train_tpu.models.convert import (
        convert_yolov8_to_ultralytics_state_dict,
    )

    variables = {
        "params": state.params["student"],
        "batch_stats": state.model_state.get("batch_stats", {}),
    }
    sd = convert_yolov8_to_ultralytics_state_dict(variables)
    np.savez("runs/yolov8s_pretrain/ultralytics_backbone.npz", **sd)
