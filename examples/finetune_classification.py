"""Fine-tune an image classifier from pretrained DINOv2 weights.

Shows the round-3 task surface: checkpoint sources (pretrain artifact,
raw torch .pth, or "auto" public-weights fetch) and the typed per-task
``transform_args`` schema (reference recipe defaults; override any
component or disable it with None).
"""

import lightly_train_tpu as lt

state, metrics = lt.train_image_classification(
    out="out/cls",
    data={"train": "data/train", "val": "data/val"},  # ImageFolder roots
    model="dinov2/vitb14",
    # One of: a pretrain export dir, a raw torch .pth (Meta/timm layouts
    # convert automatically), or "auto" to download the registered public
    # checkpoint into the cache.
    checkpoint="auto",
    steps=2_000,
    batch_size=256,
    image_size=224,
    transform_args={
        # RandomResizedCrop area range (reference default 0.2-1.0).
        "random_crop": {"min_scale": 0.08, "max_scale": 1.0},
        "color_jitter": None,  # disable a component entirely
        "random_rotate_90": {"prob": 0.25},
    },
)
print(metrics)  # {'val_loss': ..., 'val_top1': ..., 'val_top5': ..., 'val_f1': ...}
