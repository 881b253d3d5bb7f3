from lightly_train_tpu._configs.config import AUTO, Auto, PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate

__all__ = ["AUTO", "Auto", "PydanticConfig", "pydantic_model_validate"]
