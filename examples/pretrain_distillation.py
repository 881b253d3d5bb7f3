"""Pretrain a ResNet-50 by distilling a frozen DINOv3 teacher (default method).

Mirrors the reference quick-start (``lightly_train.pretrain``). Point ``data``
at any folder of images; pass ``teacher_weights`` (a Meta torch .pth or an
exported artifact directory) for a pretrained teacher.
"""

import lightly_train_tpu as lt

if __name__ == "__main__":
    lt.pretrain(
        out="runs/distill_resnet50",
        data="datasets/my_images",
        model="torchvision/resnet50",
        method="distillation",
        method_args={
            "teacher": "dinov3/vitb16",
            # "teacher_weights": "checkpoints/dinov3_vitb16.pth",
        },
        batch_size=1536,
        epochs=100,
        precision="bf16",
    )
