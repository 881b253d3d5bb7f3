from lightly_train_tpu.models.embedding import ProjectedFeaturesModule, project_wrapped
from lightly_train_tpu.models.package_registry import (
    get_wrapped_model,
    list_models,
    register_model,
)
from lightly_train_tpu.models.torch_bridge import (
    TorchBridged,
    bridge_torch_module,
    wrap_torch_module,
)
from lightly_train_tpu.models.wrapper import WrappedModel

__all__ = [
    "ProjectedFeaturesModule",
    "project_wrapped",
    "TorchBridged",
    "WrappedModel",
    "bridge_torch_module",
    "get_wrapped_model",
    "list_models",
    "register_model",
    "wrap_torch_module",
]
