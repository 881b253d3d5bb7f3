"""DINOv2 ViT-B/14 multi-crop pretraining (the BASELINE.json north star).

One fused jitted step: on-device 2x224 + 8x96 multi-crop augmentation, EMA
teacher, DINO + iBOT + KoLeo losses, AdamW with layerwise LR decay and
weight-decay cosine. Scales over all attached chips via GSPMD; add fsdp=N
for parameter sharding at ViT-g+ scale.
"""

import lightly_train_tpu as lt

if __name__ == "__main__":
    lt.pretrain(
        out="runs/dinov2_vitb14",
        data="datasets/imagenet/train",
        model="dinov2/vitb14",
        method="dinov2",
        batch_size=1024,
        steps=125_000,
        precision="bf16",
        loggers=["jsonl", "tensorboard"],
        profile=True,  # jax.profiler trace of steps 10-15 into out/profile
    )
