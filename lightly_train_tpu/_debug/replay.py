"""Automated NaN-capture replay driver.

Rebuild of the reference's ``NaNCaptureState.replay()``
(``_debug/nan_capture.py:8-80``): reconstruct the training program from a
run's artifacts and deterministically re-run the captured failing step.

Inputs are all on disk in the run's out directory:
- ``debug/nan_capture_step{N}.npz`` — the failing batch + the step's base
  RNG key (written by ``NaNGuard.check``),
- ``metrics.jsonl`` — the resolved hyperparameters record (model, method,
  resolved method/optimizer args, steps),
- ``checkpoints/`` — the nearest Orbax train state.

``replay_nan_capture(out)`` rebuilds the method + optimizer + jitted step
exactly like ``pretrain`` did, restores the nearest checkpoint, overrides
``state.step`` to the captured step (the per-step key is
``fold_in(base_key, step)``), recomputes loss AND per-leaf gradients for
the captured microbatch, and returns an offender report naming every
non-finite gradient/parameter leaf.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._debug.nan_guard import OverflowStats, replay_capture
from lightly_train_tpu._logging import get_logger

logger = get_logger("debug")


def _load_hyperparams(out_dir: Path) -> Dict[str, Any]:
    for line in (out_dir / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        payload = rec.get("hyperparams", rec)
        if "model" in payload and "method" in payload:
            return payload
    raise FileNotFoundError(
        f"No hyperparameters record found in {out_dir / 'metrics.jsonl'}"
    )


def replay_nan_capture(
    out: Any, capture: Optional[Any] = None
) -> Dict[str, Any]:
    """Re-run a captured step; return {step, loss, finite, offenders}."""
    from lightly_train_tpu._checkpoint.checkpoint import CheckpointManager
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu._configs.validate import pydantic_model_validate
    from lightly_train_tpu._optim import build_optimizer, cosine_warmup
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.method_helpers import get_method_cls
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._optim.optimizers import OPTIMIZER_ARGS_TYPES

    out_dir = Path(out)
    if capture is None:
        captures = sorted((out_dir / "debug").glob("nan_capture_step*.npz"))
        if not captures:
            raise FileNotFoundError(f"No captures under {out_dir / 'debug'}")
        capture = captures[-1]
    data = replay_capture(Path(capture))
    step = int(data["step"])
    base_key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
    images = jnp.asarray(data.get("batch", data.get("batch_images")))
    masks = (
        jnp.asarray(data["batch_masks"]) if "batch_masks" in data else None
    )

    hp = _load_hyperparams(out_dir)
    dtype = jnp.bfloat16 if hp.get("precision") == "bf16" else jnp.float32
    wrapped = get_wrapped_model(hp["model"], dtype=dtype)
    method_cls, method_args_cls = get_method_cls(hp["method"])
    method_args = pydantic_model_validate(method_args_cls, hp["method_args"])
    method = method_cls(wrapped, method_args)
    total_steps = int(hp["resolved_steps"])

    optim_dump = dict(hp["optim_args"])
    optim_type = optim_dump.pop("type", "adamw")
    optim_args = pydantic_model_validate(
        OPTIMIZER_ARGS_TYPES[optim_type], {"type": optim_type, **optim_dump}
    )
    canonical = int(hp.get("canonical_size", images.shape[1]))
    rng = jax.random.key(int(hp.get("seed", 0)))
    sample = jnp.zeros((2, canonical, canonical, 3), dtype=jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    lr = float(hp.get("resolved_lr", 1e-3))
    warmup = int(float(hp.get("warmup_fraction", 0.1)) * total_steps)
    optimizer = build_optimizer(
        optim_args,
        cosine_warmup(lr, total_steps, warmup),
        params,
        grad_clip_norm=method.grad_clip_norm(),
        lr_scales=method.lr_scales(params),
        weight_decay_schedule=method.weight_decay_schedule(total_steps),
    )
    template = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        method_state=method_state,
    )
    mgr = CheckpointManager(out_dir / "checkpoints")
    restored_step = mgr.latest_step()
    state = mgr.restore(template) if restored_step is not None else template
    mgr.close()
    # The per-step key is fold_in(base_key, state.step): pin the captured step.
    state = state.replace(step=jnp.asarray(step, jnp.int32))

    accum = int(hp.get("grad_accum_steps", 1) or 1)
    train_step = make_train_step(
        method, optimizer, total_steps, aug_dtype=dtype,
        grad_accum_steps=accum,
        transform_args=hp.get("transform_args") or None,
    )
    step_key = jax.random.fold_in(base_key, state.step)
    if accum > 1 and images.shape[0] % accum == 0:
        # Reproduce training exactly: the step key splits per microbatch
        # (train_loop.py mb_keys = split(step_key, k)); running the whole
        # batch under the unsplit key would draw different augmentations.
        mb_images = images.reshape(accum, -1, *images.shape[1:])
        mb_masks = (
            masks.reshape(accum, -1, *masks.shape[1:])
            if masks is not None
            else [None] * accum
        )
        mb_keys = jax.random.split(step_key, accum)
        losses, grads, metrics = [], None, None
        for i in range(accum):
            l_i, g_i, _, _, m_i = train_step.grads_for_microbatch(
                state.params, state.model_state, state.method_state,
                mb_images[i], mb_masks[i], mb_keys[i], state.step,
            )
            losses.append(l_i)
            grads = (
                g_i if grads is None
                else jax.tree_util.tree_map(jnp.add, grads, g_i)
            )
            metrics = (
                m_i if metrics is None
                else jax.tree_util.tree_map(jnp.add, metrics, m_i)
            )
        inv = 1.0 / accum
        loss = sum(jnp.asarray(l) for l in losses) * inv
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
    else:
        loss, grads, _, _, metrics = train_step.grads_for_microbatch(
            state.params, state.model_state, state.method_state,
            images, masks, step_key, state.step,
        )
    grad_stats = OverflowStats.tree_abs_stats(grads)
    param_stats = OverflowStats.tree_abs_stats(state.params)
    offenders = sorted(
        [f"grads/{n}" for n, (_, _, fin) in grad_stats.items() if not fin]
        + [f"params/{n}" for n, (_, _, fin) in param_stats.items() if not fin]
    )
    report = {
        "step": step,
        "restored_checkpoint_step": restored_step,
        "loss": float(np.asarray(loss, np.float64)),
        "finite": bool(np.isfinite(np.asarray(loss, np.float64)))
        and not offenders,
        "offenders": offenders,
        "metrics": {
            k: float(np.asarray(v))
            for k, v in metrics.items()
            if np.asarray(v).ndim == 0
        },
    }
    logger.info(
        "Replayed step %d (ckpt step %s): loss=%s offenders=%d",
        step, restored_step, report["loss"], len(offenders),
    )
    return report
