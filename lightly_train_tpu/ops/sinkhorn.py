"""Sinkhorn-Knopp re-export (kept as its own module for discoverability).

The implementation lives in :mod:`lightly_train_tpu.ops.losses` next to the
losses that consume it; see ``sinkhorn_knopp_teacher`` for the rebuild of
``src/lightly_train/_methods/dinov2/dinov2_loss.py:85-115``.
"""

from lightly_train_tpu.ops.losses import sinkhorn_knopp_teacher

__all__ = ["sinkhorn_knopp_teacher"]
