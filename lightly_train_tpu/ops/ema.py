"""Fused EMA (momentum) updates for teacher/model averaging.

Rebuild of the reference's teacher-momentum update
(``src/lightly_train/_methods/dinov2/dinov2.py:641-660``) and detection
``ModelEMA`` (``_task_models/ltdetr_object_detection/ema.py:28``). The update
is a tree-level ``p_t = m * p_t + (1-m) * p_s`` executed inside the jitted
step — XLA fuses it with the optimizer update, which is the BASELINE.json
"fused EMA update" requirement.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_update(teacher_params: Any, student_params: Any, momentum: jax.Array) -> Any:
    """In-step EMA: teacher <- m * teacher + (1 - m) * student."""
    return jax.tree_util.tree_map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher_params,
        student_params,
    )


def cosine_schedule(
    step: jax.Array | int,
    total_steps: int,
    start_value: float,
    end_value: float,
    warmup_steps: int = 0,
    warmup_start: float = 0.0,
) -> jax.Array:
    """Cosine interpolation from start_value to end_value with linear warmup.

    Used for teacher momentum (0.992 -> 1.0), weight decay (0.04 -> 0.4),
    teacher temperature (0.04 -> 0.07) schedules (``dinov2.py`` schedules).
    """
    step_f = jnp.asarray(step, dtype=jnp.float32)
    total = max(total_steps, 1)
    if warmup_steps > 0:
        warm = warmup_start + (start_value - warmup_start) * (
            step_f / max(warmup_steps, 1)
        )
    else:
        warm = jnp.asarray(start_value, dtype=jnp.float32)
    denom = max(total - warmup_steps, 1)
    progress = jnp.clip((step_f - warmup_steps) / denom, 0.0, 1.0)
    cos = end_value + (start_value - end_value) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * progress)
    )
    return jnp.where(step_f < warmup_steps, warm, cos)


def ema_warmup_momentum(
    step: jax.Array | int, decay: float, warmup_steps: int = 2000
) -> jax.Array:
    """Detection-style EMA decay warmup: ``d * (1 - exp(-step/tau))`` (``ema.py:28``)."""
    step_f = jnp.asarray(step, dtype=jnp.float32)
    return decay * (1.0 - jnp.exp(-step_f / max(warmup_steps, 1)))
