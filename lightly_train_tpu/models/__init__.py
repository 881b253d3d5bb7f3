from lightly_train_tpu.models.embedding import EmbeddingModel
from lightly_train_tpu.models.package_registry import (
    get_wrapped_model,
    list_models,
    register_model,
)
from lightly_train_tpu.models.wrapper import WrappedModel

__all__ = [
    "EmbeddingModel",
    "WrappedModel",
    "get_wrapped_model",
    "list_models",
    "register_model",
]
