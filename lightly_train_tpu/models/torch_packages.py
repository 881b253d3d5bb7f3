"""Live timm / ultralytics model wrapping through the torch bridge.

Reference parity targets:
- timm package (``src/lightly_train/_models/timm/timm.py``): accepts ANY
  timm model via ``features_only=True``. Here the created timm module is
  export-compiled to XLA by :mod:`lightly_train_tpu.models.torch_bridge`,
  so the same "any timm name" surface works — but the compute is a single
  jitted TPU program and the timm parameters train as JAX arrays.
- ultralytics package (``src/lightly_train/_models/ultralytics/
  ultralytics.py:57-235``): wraps YOLOv5..26 / RT-DETR DetectionModels by
  slicing the layer graph before the detection head. The same slicing is
  done here on the torch side (:class:`UltralyticsBackbone` replicates the
  ``f``/``i`` layer-routing of ultralytics ``BaseModel.forward``), and the
  sliced backbone is bridged.

Both paths are gated on the optional packages being importable; the graph
slicing and bridging themselves are tested with structural stand-ins (see
``tests/models/test_torch_packages.py``) so the logic is verified even in
environments without timm/ultralytics.
"""

from __future__ import annotations

import importlib.util
from typing import Any, List, Optional, Tuple

from lightly_train_tpu.errors import ConfigError

__all__ = [
    "timm_available",
    "ultralytics_available",
    "wrap_timm_model",
    "wrap_ultralytics_model",
    "UltralyticsBackbone",
]


def timm_available() -> bool:
    return importlib.util.find_spec("timm") is not None


def ultralytics_available() -> bool:
    return importlib.util.find_spec("ultralytics") is not None


def wrap_timm_model(
    model_name: str,
    pretrained: bool = False,
    sample_hw: Optional[Tuple[int, int]] = None,
    **timm_kwargs: Any,
):
    """``timm/<name>`` -> WrappedModel via timm ``features_only`` + bridge."""
    if not timm_available():
        raise ConfigError(
            f"Model 'timm/{model_name}' is not a native family and the timm "
            "package is not installed. Install timm to wrap arbitrary timm "
            "models (they are export-compiled to XLA), or pick a native "
            "name from list_models()."
        )
    import timm

    module = timm.create_model(
        model_name, pretrained=pretrained, features_only=True, **timm_kwargs
    )
    module.eval()
    if sample_hw is None:
        cfg = getattr(module, "pretrained_cfg", None) or {}
        size = cfg.get("input_size", (3, 224, 224))
        sample_hw = (int(size[1]), int(size[2]))

    from lightly_train_tpu.models.torch_bridge import wrap_torch_module

    return wrap_torch_module(
        module, name=f"timm/{model_name}", sample_hw=sample_hw
    )


class UltralyticsBackbone:
    """Slice an ultralytics DetectionModel's layer graph before its head.

    Replicates ultralytics ``BaseModel._predict_once`` routing: each layer
    carries ``f`` (input source: -1 = previous, int = layer index, list =
    multiple inputs e.g. Concat/Detect). The final detection head (last
    layer) is dropped; the forward returns the last 4D feature map — the
    deepest backbone/neck output, matching the reference's feature cut
    (``ultralytics.py:57-235``).

    Implemented lazily as a real ``torch.nn.Module`` subclass via
    ``__new__`` so importing this module never requires torch.
    """

    def __new__(cls, layers: Any):
        import torch.nn as nn

        class _Backbone(nn.Module):
            def __init__(self, layer_list: Any) -> None:
                super().__init__()
                modules = list(layer_list)
                if not modules:
                    raise ConfigError("ultralytics model has no layers")
                # Drop the head (last layer: Detect/Segment/RTDETRDecoder).
                modules = modules[:-1]
                self.layers = nn.ModuleList(modules)
                self.froms: List[Any] = [
                    getattr(m, "f", -1) for m in modules
                ]

            def forward(self, x):  # type: ignore[no-untyped-def]
                saved: List[Any] = []
                out = x
                for layer, f in zip(self.layers, self.froms):
                    if f != -1:
                        if isinstance(f, int):
                            out = saved[f]
                        else:
                            out = [
                                out if j == -1 else saved[j] for j in f
                            ]
                    out = layer(out)
                    saved.append(out)
                # Deepest 4D map (pre-head SPPF/neck output).
                for candidate in reversed(saved):
                    if hasattr(candidate, "ndim") and candidate.ndim == 4:
                        return candidate
                raise ConfigError(
                    "ultralytics backbone produced no 4D feature map"
                )

        return _Backbone(layers)


def wrap_ultralytics_model(
    model_name: str,
    sample_hw: Tuple[int, int] = (640, 640),
):
    """``ultralytics/<name>`` -> WrappedModel via graph slicing + bridge.

    ``model_name`` is anything ultralytics ``YOLO(...)`` accepts: a config
    (``yolo11s.yaml``), a checkpoint (``yolov8s.pt``), or a model name.
    """
    if not ultralytics_available():
        raise ConfigError(
            f"Model 'ultralytics/{model_name}' is not a native family and "
            "the ultralytics package is not installed. Install ultralytics "
            "to wrap any YOLO/RT-DETR model (export-compiled to XLA), or "
            "use the native yolov5/yolov8/yolo11 backbones."
        )
    from ultralytics import YOLO

    det = YOLO(model_name).model
    det.eval()
    backbone = UltralyticsBackbone(det.model)

    from lightly_train_tpu.models.torch_bridge import wrap_torch_module

    return wrap_torch_module(
        backbone, name=f"ultralytics/{model_name}", sample_hw=sample_hw
    )
