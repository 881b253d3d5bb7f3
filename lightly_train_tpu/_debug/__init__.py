from lightly_train_tpu._debug.nan_guard import NaNGuard, OverflowStats
from lightly_train_tpu._debug.replay import replay_nan_capture

__all__ = ["NaNGuard", "OverflowStats", "replay_nan_capture"]
