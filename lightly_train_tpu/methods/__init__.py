from lightly_train_tpu.methods.base import Method, MethodArgs, TrainState, ViewSpec
from lightly_train_tpu.methods.dino import DINO, DINOArgs
from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
from lightly_train_tpu.methods.distillationv3 import DistillationV3, DistillationV3Args
from lightly_train_tpu.methods.method_helpers import get_method_cls, list_methods
from lightly_train_tpu.methods.simclr import SimCLR, SimCLRArgs

__all__ = [
    "DINO",
    "DINOArgs",
    "DINOv2",
    "DINOv2Args",
    "DistillationV3",
    "DistillationV3Args",
    "Method",
    "MethodArgs",
    "SimCLR",
    "SimCLRArgs",
    "TrainState",
    "ViewSpec",
    "get_method_cls",
    "list_methods",
]
