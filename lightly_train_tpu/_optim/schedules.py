"""Learning-rate schedules.

Rebuilds the reference schedule zoo (SURVEY.md §2.6): CosineWarmup (pretrain
default), linear warmup (``_methods/dinov2/scheduler.py``), poly (EoMT), and
flat-cosine (detection, ``ltdetr .../flat_cosine.py``). All are optax-style
``step -> lr`` callables usable inside jit.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

Schedule = Callable


def cosine_warmup(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    end_lr_factor: float = 0.0,
    warmup_start_factor: float = 0.0,
) -> optax.Schedule:
    """Linear warmup then cosine decay to ``base_lr * end_lr_factor``."""
    warmup_steps = min(warmup_steps, max(total_steps - 1, 0))

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = base_lr * (
            warmup_start_factor
            + (1.0 - warmup_start_factor) * step / max(warmup_steps, 1)
        )
        progress = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = base_lr * (
            end_lr_factor
            + (1.0 - end_lr_factor) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def poly_schedule(
    base_lr: float, total_steps: int, power: float = 0.9, warmup_steps: int = 0
) -> optax.Schedule:
    """Polynomial decay (EoMT: poly 0.9, ``eomt .../scheduler.py``)."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        progress = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        poly = base_lr * (1.0 - progress) ** power
        return jnp.where(step < warmup_steps, warm, poly)

    return schedule


def flat_cosine(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    flat_fraction: float = 0.5,
    end_lr_factor: float = 0.0,
) -> optax.Schedule:
    """Warmup -> flat at base_lr -> cosine decay over the last part.

    Detection fine-tuning schedule (``ltdetr .../flat_cosine.py``).
    """
    flat_end = warmup_steps + int(flat_fraction * max(total_steps - warmup_steps, 0))

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        progress = jnp.clip(
            (step - flat_end) / max(total_steps - flat_end, 1), 0.0, 1.0
        )
        cos = base_lr * (
            end_lr_factor
            + (1.0 - end_lr_factor) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        )
        out = jnp.where(step < flat_end, base_lr, cos)
        return jnp.where(step < warmup_steps, warm, out)

    return schedule


def two_stage_warmup_poly(
    base_lr: float,
    total_steps: int,
    warmup_steps: tuple = (500, 1000),
    poly_power: float = 0.9,
) -> tuple:
    """EoMT's two-stage warmup (reference ``TwoStageWarmupPolySchedule``,
    ``dinov3_eomt_semantic_segmentation/scheduler.py:14-52``).

    Returns ``(backbone_schedule, head_schedule)``:
    - heads (non-backbone params): linear warmup over ``warmup_steps[0]``,
      then poly decay over the remaining horizon;
    - backbone: lr 0 during the head warmup, then linear warmup over
      ``warmup_steps[1]``, then poly decay over what remains.
    """
    head_warm, bb_warm = int(warmup_steps[0]), int(warmup_steps[1])

    def head_schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(head_warm, 1)
        adjusted = jnp.maximum(step - head_warm, 0.0)
        poly = base_lr * (
            1.0 - adjusted / max(total_steps - head_warm, 1)
        ) ** poly_power
        return jnp.where(step < head_warm, warm, poly)

    def backbone_schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step - head_warm) / max(bb_warm, 1)
        adjusted = jnp.maximum(step - head_warm - bb_warm, 0.0)
        poly = base_lr * (
            1.0 - adjusted / max(total_steps - head_warm - bb_warm, 1)
        ) ** poly_power
        return jnp.where(
            step < head_warm,
            0.0,
            jnp.where(step < head_warm + bb_warm, warm, poly),
        )

    return backbone_schedule, head_schedule


def scale_lr_for_batch_size(
    base_lr: float,
    global_batch_size: int,
    reference_batch_size: int,
    method: str = "linear",
) -> float:
    """Global-batch LR scaling (``_methods/method.py:90-122``).

    ``method``: "linear" (lr * B/B_ref) or "sqrt" (lr * sqrt(B/B_ref)).
    """
    ratio = global_batch_size / reference_batch_size
    if method == "linear":
        return base_lr * ratio
    if method == "sqrt":
        return base_lr * math.sqrt(ratio)
    raise ValueError(f"Unknown lr scale method '{method}' (linear|sqrt)")
