from lightly_train_tpu._debug.nan_guard import NaNGuard, OverflowStats

__all__ = ["NaNGuard", "OverflowStats"]
