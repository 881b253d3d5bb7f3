"""Pallas TPU kernels for the hot compute path."""

from lightly_train_tpu.ops.pallas.attention import (
    use_vmem_attention,
    vmem_attention,
)

__all__ = ["use_vmem_attention", "vmem_attention"]
