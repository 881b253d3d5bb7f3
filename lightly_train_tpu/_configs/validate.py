"""Validation helpers turning user dicts/kwargs into typed configs.

Rebuild of ``src/lightly_train/_configs/validate.py``: wraps pydantic
validation errors into framework ``ConfigValidationError`` with readable
messages, including "did you mean" suggestions for unknown keys.
"""

from __future__ import annotations

import difflib
from typing import Any, Mapping, Type, TypeVar

from pydantic import BaseModel, ValidationError

from lightly_train_tpu.errors import ConfigUnknownKeyError, ConfigValidationError

TConfig = TypeVar("TConfig", bound=BaseModel)


def pydantic_model_validate(model_cls: Type[TConfig], obj: Mapping[str, Any]) -> TConfig:
    try:
        return model_cls.model_validate(dict(obj))
    except ValidationError as err:
        for e in err.errors():
            if e.get("type") == "extra_forbidden":
                key = ".".join(str(p) for p in e["loc"])
                valid = sorted(model_cls.model_fields)
                match = difflib.get_close_matches(str(e["loc"][-1]), valid, n=1)
                hint = f" Did you mean '{match[0]}'?" if match else ""
                raise ConfigUnknownKeyError(
                    f"Unknown config key '{key}' for {model_cls.__name__}.{hint} "
                    f"Valid keys: {valid}"
                ) from err
        raise ConfigValidationError(
            f"Invalid config for {model_cls.__name__}:\n{err}"
        ) from err
