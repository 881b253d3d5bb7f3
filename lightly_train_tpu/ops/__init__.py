from lightly_train_tpu.ops import (
    augment,
    detection_augs,
    ema,
    losses,
    masking,
    sinkhorn,
)

__all__ = [
    "augment",
    "detection_augs",
    "ema",
    "losses",
    "masking",
    "sinkhorn",
]
