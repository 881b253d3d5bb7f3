"""Mount the torch reference tree for task-model golden/trajectory tests.

The reference (`/root/reference/src/lightly_train`) is imported as a golden
ORACLE (the same pattern as ``tests/methods/trajectory_harness.py``): its
task models and criteria run side-by-side with the rebuild so per-step losses
can be compared. The reference's heavy runtime deps (pytorch_lightning,
lightning_fabric, torchvision) are not installed in this image; they are
stubbed with the minimal surface the *model/criterion code paths* touch.
The stubs never fake numerics — any code path that would actually need
torchvision math raises instead of silently lying.
"""

from __future__ import annotations

import enum
import sys
import types
from pathlib import Path

import torch

REF = Path("/root/reference/src/lightly_train")


def _stub(name: str, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
        for k, v in attrs.items():
            if not hasattr(m, k):
                setattr(m, k, v)
        return m
    m = types.ModuleType(name)
    m.__path__ = []  # mark as package so submodule stubs attach
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _raise_stub(*_a, **_k):
    raise RuntimeError(
        "torchvision stub: this code path needs real torchvision, which is "
        "not installed; the harness must not reach it"
    )


def mount_reference_tasks() -> None:
    """Make `lightly_train._task_models.*` importable with stubbed deps."""
    # Repair spec-less stub modules other test files may have installed
    # earlier in the pytest session (e.g. tests/models/test_ecvit_golden.py's
    # torchvision stub): importlib.util.find_spec RAISES on a sys.modules
    # entry whose __spec__ is None, which breaks the transformers import
    # probe below. Giving the stub a loader-less spec makes find_spec
    # return it; the dist-metadata check then correctly reports "absent".
    import importlib.machinery

    for _name in ("torchvision", "torchvision.tv_tensors",
                  "lightning_utilities", "lightly_train"):
        _m = sys.modules.get(_name)
        if _m is not None and getattr(_m, "__spec__", None) is None:
            _m.__spec__ = importlib.machinery.ModuleSpec(
                _name, loader=None, is_package=hasattr(_m, "__path__")
            )

    # transformers probes torchvision availability at import; import its
    # Mask2Former module BEFORE the torchvision stubs confuse the probe.
    import transformers.models.mask2former.modeling_mask2former  # noqa: F401

    if "lightly_train" not in sys.modules:
        pkg = types.ModuleType("lightly_train")
        pkg.__path__ = [str(REF)]
        sys.modules["lightly_train"] = pkg

    # lightning_utilities (same stub as the methods harness).
    if "lightning_utilities" not in sys.modules:
        class RequirementCache:
            def __init__(self, *a, **k):
                pass

            def __bool__(self):
                return False

        _stub("lightly_train_stub_marker")
        _stub("lightning_utilities")
        _stub("lightning_utilities.core")
        _stub("lightning_utilities.core.imports",
              RequirementCache=RequirementCache)

    # torchvision: only preprocess/IO helpers touch it; forward paths don't.
    _stub("torchvision")
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.v2",
          Transform=object)
    tvf = _stub("torchvision.transforms.v2.functional")
    for fname in ("to_dtype", "normalize", "resize", "to_image",
                  "pil_to_tensor", "hflip", "crop"):
        setattr(tvf, fname, _raise_stub)

    class ImageReadMode(enum.Enum):
        UNCHANGED = 0
        GRAY = 1
        RGB = 3

    _stub("torchvision.io", ImageReadMode=ImageReadMode,
          decode_image=_raise_stub, read_image=_raise_stub)

    # torchvision.ops: the detection criterion imports box_area and
    # sigmoid_focal_loss — both are 3-line exact formulas (mirrored from
    # torchvision/ops/{boxes,focal_loss}.py), not faked numerics.
    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2,
                           reduction="none"):
        p = torch.sigmoid(inputs)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none"
        )
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    _stub("torchvision.ops", box_area=box_area,
          sigmoid_focal_loss=sigmoid_focal_loss)
    _stub("torchvision.ops.boxes", box_area=box_area)
    _stub("torchvision.ops.focal_loss", sigmoid_focal_loss=sigmoid_focal_loss)

    class _TVTensor(torch.Tensor):
        pass

    class BoundingBoxFormat(enum.Enum):
        XYXY = "XYXY"
        XYWH = "XYWH"
        CXCYWH = "CXCYWH"

    _stub(
        "torchvision.tv_tensors",
        BoundingBoxes=_TVTensor,
        BoundingBoxFormat=BoundingBoxFormat,
        Image=_TVTensor,
        Mask=_TVTensor,
        wrap=lambda x, **k: x,
    )

    # pytorch_lightning / lightning_fabric: rank helpers + Fabric type only.
    def rank_zero_only(fn=None, *a, **k):
        return fn

    _stub("pytorch_lightning")
    _stub("pytorch_lightning.utilities", rank_zero_only=rank_zero_only)

    class Fabric:  # typing-only in the reference train models
        pass

    _stub("lightning_fabric", Fabric=Fabric)
    _stub("lightning_fabric.loggers", Logger=object)
    _stub("lightning_fabric.utilities")

    # torchvision.models: the reference's torchvision package only needs the
    # class objects for registry/isinstance checks at import time.
    class _ResNet(torch.nn.Module):
        pass

    class _ConvNeXt(torch.nn.Module):
        pass

    class _ShuffleNetV2(torch.nn.Module):
        pass

    _stub("torchvision.models", ResNet=_ResNet, ConvNeXt=_ConvNeXt,
          ShuffleNetV2=_ShuffleNetV2, list_models=lambda: [],
          get_model=_raise_stub)
    _stub("torchvision.models._utils", IntermediateLayerGetter=_raise_stub)

    # omegaconf: imported at module top of the vendored DINOv2 configs but
    # only called inside config-loading functions the harness never uses.
    class _OmegaConf:
        def __getattr__(self, name):
            return _raise_stub

    _stub("omegaconf", OmegaConf=_OmegaConf(), DictConfig=dict)

    # lightly (OSS SSL package, not installed): the task-model import chain
    # only touches the ImageNet normalization constant; optimizer_helpers
    # imports the LARS class for an isinstance-style registry only.
    _stub("lightly")
    _stub("lightly.transforms")
    _stub(
        "lightly.transforms.utils",
        IMAGENET_NORMALIZE={
            "mean": [0.485, 0.456, 0.406],
            "std": [0.229, 0.224, 0.225],
        },
    )
    _stub("lightly.utils")

    class _LARS(torch.optim.Optimizer):
        def __init__(self, *a, **k):
            raise RuntimeError("LARS stub: not runnable in the harness")

    _stub("lightly.utils.lars", LARS=_LARS)
