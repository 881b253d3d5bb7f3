from lightly_train_tpu._optim.optimizers import (
    OPTIMIZER_ARGS_TYPES,
    AdamWArgs,
    LARSArgs,
    OptimizerArgs,
    SGDArgs,
    build_optimizer,
    layerwise_lr_scales,
    no_weight_decay_mask,
)
from lightly_train_tpu._optim.schedules import (
    cosine_warmup,
    flat_cosine,
    poly_schedule,
    scale_lr_for_batch_size,
)

__all__ = [
    "OPTIMIZER_ARGS_TYPES",
    "AdamWArgs",
    "LARSArgs",
    "OptimizerArgs",
    "SGDArgs",
    "build_optimizer",
    "cosine_warmup",
    "flat_cosine",
    "layerwise_lr_scales",
    "no_weight_decay_mask",
    "poly_schedule",
    "scale_lr_for_batch_size",
]
