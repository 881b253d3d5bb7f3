"""Typed environment-variable registry.

TPU-native rebuild of the reference env registry
(``src/lightly_train/_env.py:19-174``): every operational knob the framework
reads from the environment is declared once, with a type and default, and
accessed as ``Env.<VAR>.value``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Generic, TypeVar

T = TypeVar("T")


def _parse_bool(raw: str) -> bool:
    return raw.strip().lower() in {"1", "true", "yes", "on"}


@dataclass(frozen=True)
class EnvVar(Generic[T]):
    name: str
    default: T
    parse: Callable[[str], T]

    @property
    def value(self) -> T:
        raw = os.environ.get(self.name)
        if raw is None:
            return self.default
        return self.parse(raw)

    @property
    def is_set(self) -> bool:
        return self.name in os.environ


def _default_cache_dir() -> Path:
    return Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")) / (
        "lightly_train_tpu"
    )


class Env:
    """All environment knobs. Access with ``Env.<NAME>.value``."""

    # Cache dir for downloaded weights / mmap artifacts.
    LIGHTLY_TRAIN_CACHE_DIR: EnvVar[Path] = EnvVar(
        "LIGHTLY_TRAIN_CACHE_DIR", _default_cache_dir(), Path
    )
    # Reuse an existing mmap file list instead of re-scanning the dataset.
    LIGHTLY_TRAIN_MMAP_REUSE_FILE: EnvVar[bool] = EnvVar(
        "LIGHTLY_TRAIN_MMAP_REUSE_FILE", False, _parse_bool
    )
    # Timeout (s) waiting for rank-0 to produce shared artifacts.
    LIGHTLY_TRAIN_MMAP_TIMEOUT_SEC: EnvVar[int] = EnvVar(
        "LIGHTLY_TRAIN_MMAP_TIMEOUT_SEC", 600, int
    )
    # Image decode mode: RGB or UNCHANGED.
    LIGHTLY_TRAIN_IMAGE_MODE: EnvVar[str] = EnvVar(
        "LIGHTLY_TRAIN_IMAGE_MODE", "RGB", str
    )
    # Disable anonymous usage events (always disabled in this rebuild unless
    # explicitly turned on; we default to no telemetry).
    LIGHTLY_TRAIN_EVENTS_DISABLED: EnvVar[bool] = EnvVar(
        "LIGHTLY_TRAIN_EVENTS_DISABLED", True, _parse_bool
    )
    # Number of host-side data workers ("auto" handled by loader when 0).
    LIGHTLY_TRAIN_NUM_WORKERS: EnvVar[int] = EnvVar(
        "LIGHTLY_TRAIN_NUM_WORKERS", 0, int
    )
    # Dataloader collection timeout in seconds.
    LIGHTLY_TRAIN_DATALOADER_TIMEOUT_SEC: EnvVar[int] = EnvVar(
        "LIGHTLY_TRAIN_DATALOADER_TIMEOUT_SEC", 300, int
    )
    # Verbosity of console logging (DEBUG/INFO/WARNING/ERROR).
    LIGHTLY_TRAIN_LOG_LEVEL: EnvVar[str] = EnvVar(
        "LIGHTLY_TRAIN_LOG_LEVEL", "INFO", str
    )
    # Force a matmul precision for f32 ops: "highest" | "high" | "default".
    LIGHTLY_TRAIN_MATMUL_PRECISION: EnvVar[str] = EnvVar(
        "LIGHTLY_TRAIN_MATMUL_PRECISION", "default", str
    )
    # VMEM-resident Pallas attention kernel on TPU ("0" disables, falling
    # back to jax.nn.dot_product_attention).
    LIGHTLY_TRAIN_VMEM_ATTENTION: EnvVar[str] = EnvVar(
        "LIGHTLY_TRAIN_VMEM_ATTENTION", "1", str
    )
    # Fused AdamW+EMA update mode override: "pallas", "jnp" or "off"
    # (default "": auto — pallas on a single TPU chip, jnp elsewhere).
    LIGHTLY_TRAIN_FUSED_UPDATE: EnvVar[str] = EnvVar(
        "LIGHTLY_TRAIN_FUSED_UPDATE", "", str
    )
