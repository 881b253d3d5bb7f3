"""System information logging at run start.

Rebuild of ``src/lightly_train/_system.py:53-170``: OS/CPU/memory, JAX
devices, dependency versions, and git state of the working directory —
logged once at the start of every run for reproducibility.
"""

from __future__ import annotations

import os
import platform
import subprocess
import sys
from typing import Any, Dict

from lightly_train_tpu._logging import get_logger

logger = get_logger("system")


def get_system_information() -> Dict[str, Any]:
    import jax

    info: Dict[str, Any] = {
        "platform": platform.platform(),
        "python": sys.version.split()[0],
        "cpu_count": os.cpu_count(),
        "jax_version": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "device_kind": str(
            getattr(jax.devices()[0], "device_kind", "unknown")
        ),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    for mod in ("flax", "optax", "numpy"):
        try:
            info[f"{mod}_version"] = __import__(mod).__version__
        except Exception:
            pass
    try:
        import psutil

        info["memory_gb"] = round(psutil.virtual_memory().total / 1e9, 1)
    except ImportError:
        pass
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        if rev.returncode == 0:
            info["git_commit"] = rev.stdout.strip()
    except Exception:
        pass
    return info


def apply_matmul_precision() -> None:
    """Apply LIGHTLY_TRAIN_MATMUL_PRECISION (the reference's
    ``_float32_matmul_precision.py`` analog): maps to JAX's default matmul
    precision — "default" leaves XLA's bf16-input behavior, "high"/"highest"
    force higher-precision f32 matmul passes."""
    from lightly_train_tpu._env import Env
    import jax

    value = Env.LIGHTLY_TRAIN_MATMUL_PRECISION.value
    mapping = {
        "default": None,
        "high": "bfloat16_3x",
        "highest": "float32",
    }
    if value not in mapping:
        logger.warning(
            "Unknown LIGHTLY_TRAIN_MATMUL_PRECISION=%r (default|high|highest)",
            value,
        )
        return
    if mapping[value] is not None:
        jax.config.update("jax_default_matmul_precision", mapping[value])
        logger.info("Set default matmul precision: %s", mapping[value])


def log_system_information() -> Dict[str, Any]:
    apply_matmul_precision()
    info = get_system_information()
    logger.info(
        "System: %s | python %s | jax %s | %d x %s",
        info.get("platform"), info.get("python"), info.get("jax_version"),
        len(info.get("devices", [])), info.get("device_kind"),
    )
    return info
