from lightly_train_tpu._events import tracker

__all__ = ["tracker"]
