"""Model name registry: ``pkg/model`` -> WrappedModel builder.

Rebuild of the reference package framework
(``src/lightly_train/_models/package_helpers.py:34-157``): model names parse as
``package/model_name``, each package owns construction + wrapping, test-size
models are registered but hidden from ``list_models``. Weight download /
torch-checkpoint conversion hooks live with each package entry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax.numpy as jnp

from lightly_train_tpu.errors import UnknownModelError
from lightly_train_tpu.models.convnext import (
    ConvNeXt,
    _CONVNEXT_SIZES,
    convnext_config,
)
from lightly_train_tpu.models.resnet import (
    ResNet,
    _RESNET_SIZES,
    resnet_config,
    resnet_feature_dim,
)
from lightly_train_tpu.models.vit import VisionTransformer, _SIZES, vit_config
from lightly_train_tpu.models.wrapper import WrappedModel


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    build: Callable[..., WrappedModel]
    hidden: bool = False  # test models excluded from list_models


_REGISTRY: Dict[str, ModelEntry] = {}


def register_model(
    name: str, build: Callable[..., WrappedModel], hidden: bool = False
) -> None:
    _REGISTRY[name] = ModelEntry(name=name, build=build, hidden=hidden)


def list_models() -> List[str]:
    """Public model names (test models hidden, like the reference)."""
    return sorted(n for n, e in _REGISTRY.items() if not e.hidden)


def resolve_model_name(model: Any) -> str:
    """Normalize a user model argument to a registry name.

    Strings pass through; a ``WrappedModel`` or bare Flax module (the custom
    package, reference ``custom_package.py:1-66``) is wrapped, registered
    under its name, and that name returned — so configs stay serializable.
    """
    if isinstance(model, str):
        return model
    wrapped = get_wrapped_model(model)
    if wrapped.name not in _REGISTRY:
        register_model(wrapped.name, lambda dtype=None, **kw: wrapped,
                       hidden=True)
    return wrapped.name


def get_wrapped_model(name: Any, dtype: Any = jnp.float32, **kwargs: Any) -> WrappedModel:
    """Build a backbone by its ``pkg/model`` name, or wrap a custom module.

    Accepts a registry name string, a ready ``WrappedModel`` (returned
    as-is), or any user Flax module implementing the feature protocol
    (wrapped via the custom package, reference ``custom_package.py:1-66``).
    """
    if isinstance(name, WrappedModel):
        return name
    if not isinstance(name, str):
        import flax.linen as nn

        if isinstance(name, nn.Module):
            from lightly_train_tpu.models.custom import wrap_custom_module

            return wrap_custom_module(name)
        try:
            import torch as _torch
        except ImportError:
            _torch = None
        if _torch is not None and isinstance(name, _torch.nn.Module):
            # Any torch module (timm, ultralytics, custom): export-compiled
            # to XLA via the torch bridge (reference analog: the live-torch
            # wrapper packages, _models/package_helpers.py).
            from lightly_train_tpu.models.torch_bridge import (
                wrap_torch_module,
            )

            return wrap_torch_module(name)
        raise UnknownModelError(
            f"Model must be a name string, WrappedModel, Flax module, or "
            f"torch module; got {type(name)!r}."
        )
    entry = _REGISTRY.get(name)
    if entry is None and name.startswith("timm/"):
        resolved = _resolve_timm(name, dtype)
        if resolved is not None:
            return resolved
        # Not a native family: wrap the live timm model through the torch
        # bridge (reference: _models/timm/timm.py accepts any timm name).
        from lightly_train_tpu.models.torch_packages import (
            timm_available,
            wrap_timm_model,
        )

        if timm_available():
            return wrap_timm_model(name.removeprefix("timm/"), **kwargs)
    if entry is None and name.startswith("ultralytics/"):
        from lightly_train_tpu.models.torch_packages import (
            ultralytics_available,
            wrap_ultralytics_model,
        )

        if ultralytics_available():
            return wrap_ultralytics_model(
                name.removeprefix("ultralytics/"), **kwargs
            )
    if entry is None:
        import difflib

        match = difflib.get_close_matches(name, list(_REGISTRY), n=3)
        hint = f" Did you mean: {match}?" if match else ""
        raise UnknownModelError(
            f"Unknown model '{name}'.{hint} See list_models() for options."
        )
    return entry.build(dtype=dtype, **kwargs)


# ---------------------------------------------------------------------------
# dinov2 / dinov3 ViT families (reference: dinov2_vit_package.py:46-131,
# dinov3_package.py:240-428)
# ---------------------------------------------------------------------------


def _build_vit(
    size: str, patch: int, flavor: str, dtype: Any,
    model_name: str = None, **kwargs: Any
) -> WrappedModel:
    cfg = vit_config(size, patch, flavor=flavor, dtype=dtype, **kwargs)
    return WrappedModel(
        name=model_name or f"{flavor}/{size}{patch}",
        module=VisionTransformer(cfg),
        feature_dim=cfg.embed_dim,
        patch_size=patch,
        architecture="transformer",
        supports_mask=True,
    )


for _size in _SIZES:
    _hidden = _size == "vittest"
    register_model(
        f"dinov2/{_size}14",
        (lambda size: lambda dtype=jnp.float32, **kw: _build_vit(
            size, 14, "dinov2", dtype, **kw
        ))(_size),
        hidden=_hidden,
    )

# DINOv3 hub naming (dinov3_vits16plus etc., ``hub/backbones.py``):
# size key "vitsplus" -> model name "dinov3/vits16plus".
from lightly_train_tpu.models.vit import _DINOV3_SIZES  # noqa: E402

for _size in _DINOV3_SIZES:
    _base = _size[:-4] if _size.endswith("plus") else _size
    _suffix = "plus" if _size.endswith("plus") else ""
    _name = f"dinov3/{_base}16{_suffix}"
    register_model(
        _name,
        (lambda size, name: lambda dtype=jnp.float32, **kw: _build_vit(
            size, 16, "dinov3", dtype, model_name=name, **kw
        ))(_size, _name),
        hidden=_size == "vittest",
    )

# dinov3 vitt32 used by the fastest EoMT config (BASELINE.md)
register_model(
    "dinov3/vitt32",
    lambda dtype=jnp.float32, **kw: _build_vit("vitt", 32, "dinov3", dtype, **kw),
)


# ---------------------------------------------------------------------------
# dinov3 ConvNeXt family
# ---------------------------------------------------------------------------


def _build_convnext(size: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    cfg = convnext_config(size, dtype=dtype)
    return WrappedModel(
        name=f"dinov3/convnext-{size}",
        module=ConvNeXt(cfg),
        feature_dim=cfg.dims[-1],
        patch_size=None,
        architecture="conv",
        supports_mask=False,
    )


for _size in _CONVNEXT_SIZES:
    register_model(
        f"dinov3/convnext-{_size}",
        (lambda size: lambda dtype=jnp.float32, **kw: _build_convnext(
            size, dtype, **kw
        ))(_size),
        hidden=_size == "test",
    )


# ---------------------------------------------------------------------------
# ECViT (EdgeCrafter) hybrid family (reference: _models/ecvit/)
# ---------------------------------------------------------------------------


def _build_ecvit(name: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    from lightly_train_tpu.models.ecvit import (
        ECViT,
        ecvit_config,
        ecvit_feature_dim,
    )

    cfg = ecvit_config(name, dtype=dtype)
    return WrappedModel(
        name=f"ecvit/{name}",
        module=ECViT(cfg),
        feature_dim=ecvit_feature_dim(cfg),
        patch_size=16,
        architecture="hybrid",
        supports_mask=False,
    )


from lightly_train_tpu.models.ecvit import _ECVIT_SIZES  # noqa: E402

for _name in _ECVIT_SIZES:
    register_model(
        f"ecvit/{_name}",
        (lambda n: lambda dtype=jnp.float32, **kw: _build_ecvit(n, dtype, **kw))(
            _name
        ),
        hidden=_name == "ecvittest",
    )


# ---------------------------------------------------------------------------
# torchvision-parity ResNets (native Flax, reference: _models/torchvision/)
# ---------------------------------------------------------------------------


def _build_resnet(name: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    cfg = resnet_config(name, dtype=dtype)
    return WrappedModel(
        name=f"torchvision/{name}",
        module=ResNet(cfg),
        feature_dim=resnet_feature_dim(name),
        patch_size=None,
        architecture="conv",
        supports_mask=False,
    )


for _name in _RESNET_SIZES:
    register_model(
        f"torchvision/{_name}",
        (lambda n: lambda dtype=jnp.float32, **kw: _build_resnet(n, dtype, **kw))(
            _name
        ),
        hidden=_name.startswith("resnettest") or _name.endswith("vd"),
    )


# ---------------------------------------------------------------------------
# torchvision ShuffleNetV2 family (reference: _models/torchvision/)
# ---------------------------------------------------------------------------

from lightly_train_tpu.models.shufflenet import (  # noqa: E402
    _SHUFFLENET_SIZES,
    ShuffleNetV2,
    shufflenet_config,
)


def _build_shufflenet(name: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    cfg = shufflenet_config(name, dtype=dtype)
    return WrappedModel(
        name=f"torchvision/{name}",
        module=ShuffleNetV2(cfg),
        feature_dim=cfg.out_channels,
        patch_size=None,
        architecture="conv",
        supports_mask=False,
    )


for _name in _SHUFFLENET_SIZES:
    register_model(
        f"torchvision/{_name}",
        (lambda n: lambda dtype=jnp.float32, **kw: _build_shufflenet(
            n, dtype, **kw
        ))(_name),
        hidden=_name == "shufflenettest",
    )


# ---------------------------------------------------------------------------
# timm package: pattern-driven names onto the native families (the
# reference's timm package wraps arbitrary timm torch models; here the
# architecturally equivalent native modules answer to the standard names —
# vit_{size}_patch{P}_{res}, resnet{depth}, convnext_{size},
# shufflenet_v2_x*).
# ---------------------------------------------------------------------------

_TIMM_VIT_SIZES = {
    "tiny": "vitt", "small": "vits", "base": "vitb",
    "large": "vitl", "giant": "vitg",
}


def _resolve_timm(name: str, dtype: Any = jnp.float32) -> Optional[WrappedModel]:
    """Map a ``timm/<model>`` name onto a native builder (None if unknown)."""
    import re

    model = name.removeprefix("timm/")
    m = re.fullmatch(r"vit_(\w+?)_patch(\d+)(?:_\d+)?", model)
    if m and m.group(1) in _TIMM_VIT_SIZES:
        size = _TIMM_VIT_SIZES[m.group(1)]
        patch = int(m.group(2))
        return _build_vit(size, patch, "dinov2", dtype, model_name=name)
    if model in _RESNET_SIZES:
        return _build_resnet(model, dtype)
    m = re.fullmatch(r"convnext_(\w+)", model)
    if m and m.group(1) in _CONVNEXT_SIZES:
        return _build_convnext(m.group(1), dtype)
    if model in _SHUFFLENET_SIZES:
        return _build_shufflenet(model, dtype)
    return None


for _alias, _target in {
    "timm/resnet18": "torchvision/resnet18",
    "timm/resnet50": "torchvision/resnet50",
    "timm/convnext_tiny": "dinov3/convnext-tiny",
    "timm/convnext_small": "dinov3/convnext-small",
    "timm/convnext_base": "dinov3/convnext-base",
    "timm/vit_base_patch16_224": "dinov3/vitb16",
    "timm/vit_small_patch16_224": "dinov3/vits16",
}.items():
    register_model(
        _alias,
        (lambda t: lambda dtype=jnp.float32, **kw: get_wrapped_model(
            t, dtype=dtype, **kw
        ))(_target),
    )


# ---------------------------------------------------------------------------
# ultralytics family: native YOLOv8 CSPDarknet backbones (the reference
# wraps installed ultralytics YOLO models, slicing the Sequential before
# SPPF — ultralytics/ultralytics.py:57-235; here the same backbone is a
# native Flax module with a checkpoint converter, models/yolo.py).
# ---------------------------------------------------------------------------

from lightly_train_tpu.models.yolo import (  # noqa: E402
    _YOLOV8_SIZES,
    YOLOv8Backbone,
    yolov8_config,
    yolov8_feature_dim,
)


def _build_yolov8(name: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    cfg = yolov8_config(name, dtype=dtype)
    return WrappedModel(
        name=f"ultralytics/{name}",
        module=YOLOv8Backbone(cfg),
        feature_dim=yolov8_feature_dim(cfg),
        patch_size=None,
        architecture="conv",
        supports_mask=False,
    )


for _name in _YOLOV8_SIZES:
    for _suffix in ("", ".pt", "-cls.pt", "-seg.pt"):
        register_model(
            f"ultralytics/{_name}{_suffix}",
            (lambda n: lambda dtype=jnp.float32, **kw: _build_yolov8(
                n, dtype, **kw
            ))(_name),
            hidden=_name == "yolov8test" or _suffix != "",
        )

# YOLOv5 (C3 backbone, cut before SPPF) and YOLO11 (C3k2 + SPPF + C2PSA)
# families — the reference wraps YOLOv5-26 via installed ultralytics
# (ultralytics.py:57-235); these are the native equivalents.
from lightly_train_tpu.models.yolo import (  # noqa: E402
    _YOLO11_SIZES,
    _YOLOV5_SIZES,
    YOLO11Backbone,
    YOLOv5Backbone,
    yolo_family_config,
)


def _build_yolo_family(name: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    cfg = yolo_family_config(name, dtype=dtype)
    module = (
        YOLOv5Backbone(cfg) if name.startswith("yolov5")
        else YOLO11Backbone(cfg)
    )
    return WrappedModel(
        name=f"ultralytics/{name}",
        module=module,
        feature_dim=cfg.ch(1024),
        patch_size=None,
        architecture="conv",
        supports_mask=False,
    )


for _name in list(_YOLOV5_SIZES) + list(_YOLO11_SIZES):
    for _suffix in ("", ".pt", "u", "u.pt", "-cls.pt", "-seg.pt"):
        register_model(
            f"ultralytics/{_name}{_suffix}",
            (lambda n: lambda dtype=jnp.float32, **kw: _build_yolo_family(
                n, dtype, **kw
            ))(_name),
            hidden="test" in _name or _suffix != "",
        )


# ---------------------------------------------------------------------------
# rtdetr family: RT-DETR PResNet (ResNet-vd) backbones (the reference wraps
# the rtdetr pypi package's backbone, _models/rtdetr/rtdetr.py:1-45; here
# the vd variant is native in models/resnet.py).
# ---------------------------------------------------------------------------

for _name in ("resnet18vd", "resnet34vd", "resnet50vd", "resnet101vd",
              "resnettestvd"):
    register_model(
        f"rtdetr/rtdetr_{_name.replace('resnet', 'r')}",
        (lambda n: lambda dtype=jnp.float32, **kw: _build_resnet(
            n, dtype, **kw
        ))(_name),
        hidden="test" in _name,
    )


# ---------------------------------------------------------------------------
# rfdetr family: RF-DETR's encoder is a DINOv2 ViT (the reference extracts
# model.backbone[0].encoder, _models/rfdetr/rfdetr.py:1-90); the native ViT
# answers to the rf-detr names at the matching sizes.
# ---------------------------------------------------------------------------

for _alias, _target in {
    "rfdetr/rf-detr-nano": "dinov2/vits14",
    "rfdetr/rf-detr-small": "dinov2/vits14",
    "rfdetr/rf-detr-base": "dinov2/vitb14",
    "rfdetr/rf-detr-medium": "dinov2/vitb14",
    "rfdetr/rf-detr-large": "dinov2/vitl14",
}.items():
    register_model(
        _alias,
        (lambda t: lambda dtype=jnp.float32, **kw: get_wrapped_model(
            t, dtype=dtype, **kw
        ))(_target),
        hidden=False,
    )


# ---------------------------------------------------------------------------
# super_gradients family: native YOLO-NAS backbones (models/yolo_nas.py).
# ---------------------------------------------------------------------------

from lightly_train_tpu.models.yolo_nas import (  # noqa: E402
    _YOLO_NAS_SIZES,
    YoloNASBackbone,
    yolo_nas_config,
)


def _build_yolo_nas(name: str, dtype: Any, **kwargs: Any) -> WrappedModel:
    if kwargs:
        raise ValueError(
            f"Unsupported model_args for this family: {sorted(kwargs)}"
        )
    cfg = yolo_nas_config(name, dtype=dtype)
    return WrappedModel(
        name=f"super_gradients/{name}",
        module=YoloNASBackbone(cfg),
        feature_dim=cfg.stage_channels[-1],
        patch_size=None,
        architecture="conv",
        supports_mask=False,
    )


for _name in _YOLO_NAS_SIZES:
    register_model(
        f"super_gradients/{_name}",
        (lambda n: lambda dtype=jnp.float32, **kw: _build_yolo_nas(
            n, dtype, **kw
        ))(_name),
        hidden=_name == "yolo_nas_test",
    )
