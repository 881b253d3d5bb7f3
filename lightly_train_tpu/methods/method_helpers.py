"""Method registry: name -> (Method class, Args class).

Rebuild of ``src/lightly_train/_methods/method_helpers.py:54-69``: public
methods plus hidden/aliased entries ("distillation" aliases DistillationV3).
"""

from __future__ import annotations

from typing import Dict, List, Tuple, Type

from lightly_train_tpu.errors import UnknownMethodError
from lightly_train_tpu.methods.base import Method, MethodArgs
from lightly_train_tpu.methods.densecl import DenseCL, DenseCLArgs
from lightly_train_tpu.methods.detcon import DetConB, DetConBArgs, DetConS
from lightly_train_tpu.methods.dino import DINO, DINOArgs
from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
from lightly_train_tpu.methods.dinov31 import DINOv31, DINOv31Args
from lightly_train_tpu.methods.distillation_v1v2 import (
    DistillationV1,
    DistillationV1Args,
    DistillationV2,
    DistillationV2Args,
)
from lightly_train_tpu.methods.distillationv3 import (
    DistillationV3,
    DistillationV3Args,
)
from lightly_train_tpu.methods.simclr import SimCLR, SimCLRArgs

_METHODS: Dict[str, Tuple[Type[Method], Type[MethodArgs]]] = {
    "distillationv3": (DistillationV3, DistillationV3Args),
    "distillationv2": (DistillationV2, DistillationV2Args),
    "distillationv1": (DistillationV1, DistillationV1Args),
    "dinov2": (DINOv2, DINOv2Args),
    "dinov31": (DINOv31, DINOv31Args),
    "dino": (DINO, DINOArgs),
    "simclr": (SimCLR, SimCLRArgs),
    "densecl": (DenseCL, DenseCLArgs),
    "detconb": (DetConB, DetConBArgs),
    "detcons": (DetConS, DetConBArgs),
}

_ALIASES: Dict[str, str] = {
    "distillation": "distillationv3",  # reference default alias
}

# Hidden methods (reference hides densecl/detcon from list_methods).
_HIDDEN: set = {"densecl", "detconb", "detcons"}


def get_method_cls(name: str) -> Tuple[Type[Method], Type[MethodArgs]]:
    resolved = _ALIASES.get(name, name)
    if resolved not in _METHODS:
        raise UnknownMethodError(
            f"Unknown method '{name}'. Options: {list_methods()}"
        )
    return _METHODS[resolved]


def list_methods() -> List[str]:
    public = [n for n in _METHODS if n not in _HIDDEN]
    return sorted(public + list(_ALIASES))
