from lightly_train_tpu.ops import augment, ema, losses, masking, sinkhorn

__all__ = ["augment", "ema", "losses", "masking", "sinkhorn"]
