"""Strict pydantic config base with "auto" resolution.

Rebuild of ``src/lightly_train/_configs/config.py:23-60``: every user-facing
knob is a pydantic model field that may hold the literal ``"auto"`` and is
filled in by a ``resolve_auto(...)`` method from dataset size / model /
step-count context before training starts.
"""

from __future__ import annotations

from typing import Any, Literal, TypeVar, Union

from pydantic import BaseModel, ConfigDict

Auto = Literal["auto"]
AUTO: Auto = "auto"

T = TypeVar("T")


def no_auto(value: Union[T, Auto]) -> T:
    """Assert that an "auto" value has been resolved."""
    if isinstance(value, str) and value == AUTO:
        raise ValueError(
            "Config value is still 'auto'; resolve_auto() must run before use."
        )
    return value  # type: ignore[return-value]


class PydanticConfig(BaseModel):
    """Strict base: unknown keys are errors, assignment re-validates."""

    model_config = ConfigDict(
        extra="forbid",
        validate_assignment=True,
        arbitrary_types_allowed=True,
    )

    def has_auto(self) -> bool:
        """True if any field (recursively) still holds the literal "auto"."""

        def _check(value: Any) -> bool:
            if isinstance(value, str) and value == AUTO:
                return True
            if isinstance(value, PydanticConfig):
                return value.has_auto()
            if isinstance(value, (list, tuple)):
                return any(_check(v) for v in value)
            if isinstance(value, dict):
                return any(_check(v) for v in value.values())
            return False

        return any(_check(getattr(self, name)) for name in self.__class__.model_fields)

    def dump(self) -> dict[str, Any]:
        """Plain-dict dump suitable for logging as hyperparams."""
        return self.model_dump()
