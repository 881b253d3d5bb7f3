"""Pallas TPU kernels for the hot compute path."""

from lightly_train_tpu.ops.pallas.attention import (
    flat_attention,
    use_vmem_attention,
    vmem_attention,
)

__all__ = ["flat_attention", "use_vmem_attention", "vmem_attention"]
