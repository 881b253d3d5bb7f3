from lightly_train_tpu.models.embedding import ProjectedFeaturesModule, project_wrapped
from lightly_train_tpu.models.package_registry import (
    get_wrapped_model,
    list_models,
    register_model,
)
from lightly_train_tpu.models.wrapper import WrappedModel

__all__ = [
    "ProjectedFeaturesModule",
    "project_wrapped",
    "WrappedModel",
    "get_wrapped_model",
    "list_models",
    "register_model",
]
