"""Framework exception hierarchy.

Mirrors the error surface of the reference (``src/lightly_train/errors.py``):
typed errors for config validation, unknown models/methods, and checkpoint
issues so callers can catch framework failures distinctly from library bugs.
"""

from __future__ import annotations


class LightlyTrainError(Exception):
    """Base class for all framework errors."""


class ConfigError(LightlyTrainError):
    """Invalid user configuration."""


class ConfigValidationError(ConfigError):
    """Pydantic validation of a user config failed."""


class ConfigUnknownKeyError(ConfigError):
    """User passed a key that does not exist in the config."""


class UnknownModelError(ConfigError):
    """Requested model name is not registered."""


class UnknownMethodError(ConfigError):
    """Requested SSL method name is not registered."""


class UnknownTaskError(ConfigError):
    """Requested fine-tuning task is not registered."""


class CheckpointError(LightlyTrainError):
    """Checkpoint missing, corrupt, or incompatible."""


class NaNDetectedError(LightlyTrainError):
    """A NaN/Inf was detected in losses or gradients during training."""


class DatasetError(LightlyTrainError):
    """Dataset is empty, malformed, or has unsupported layout."""
