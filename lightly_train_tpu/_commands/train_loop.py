"""Pretraining runtime: jitted train step + host step loop.

TPU-native replacement for the reference's Lightning ``Trainer.fit`` runtime
(``src/lightly_train/_commands/train.py:433-521``): one pure, donated,
jit-compiled step function closes over the method and optimizer and performs
augmentation -> teacher/student forward -> loss -> grads -> optimizer ->
EMA/queue updates as a single XLA program over the globally-sharded batch.
The host loop only feeds uint8 batches and reads back metrics.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lightly_train_tpu._logging import get_logger
from lightly_train_tpu.methods.base import Method, TrainState
from lightly_train_tpu.ops.augment import augment_view_with_geometry

logger = get_logger("train_loop")


def make_train_step(
    method: Method,
    optimizer: optax.GradientTransformation,
    total_steps: int,
    aug_dtype: Any = jnp.float32,
    grad_accum_steps: int = 1,
    transform_args: Any = None,
    fused_updater: Any = None,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Dict]]:
    """Build the fused step: augment + loss + update in one program.

    ``grad_accum_steps`` > 1 splits the incoming batch into that many
    microbatches and accumulates gradients over a ``lax.scan`` before one
    optimizer update — the reference's accumulate-grad-batches
    (``src/lightly_train/_commands/train.py:62,463``) as a single compiled
    program (the HLO stays microbatch-sized, so effective batch can exceed
    the per-program compile/memory ceiling).
    """
    from lightly_train_tpu.ops.augment import override_view_specs

    view_specs = override_view_specs(method.view_specs(), transform_args)
    n_views = sum(s.count for s in view_specs)
    # Methods with dense-geometric losses (DINOv31 PaKA) receive the per-view
    # crop geometry arrays appended after the view arrays; mask-conditioned
    # methods (DetCon) additionally receive geometry-consistent mask crops
    # appended before the geometry arrays.
    needs_geometry = getattr(method, "needs_geometry", False)
    needs_masks = getattr(method, "needs_masks", False)
    if (needs_geometry or needs_masks) and any(
        s.config.vflip_prob > 0 or s.config.rotation_prob > 0
        for s in view_specs
    ):
        raise ValueError(
            "vertical_prob/rotation > 0 is not supported with geometry/"
            "mask-consuming methods (DetCon, DINOv31): the recorded crop "
            "geometry carries hflip only, so vflipped/rotated views would "
            "pair with unflipped masks/teacher features."
        )

    def _grads_for_microbatch(
        params: Any,
        model_state: Any,
        method_state: Any,
        images_u8: jax.Array,
        masks: Any,
        mb_key: jax.Array,
        step: jax.Array,
    ):
        k_aug, k_loss = jax.random.split(mb_key)
        aug_keys = jax.random.split(k_aug, n_views)
        views = []
        geoms = []
        mask_views = []
        i = 0
        for spec in view_specs:
            for _ in range(spec.count):
                view, geom = augment_view_with_geometry(
                    aug_keys[i], images_u8, spec.config, aug_dtype
                )
                views.append(view)
                geoms.append(geom)
                if needs_masks and masks is not None:
                    from lightly_train_tpu.ops.augment import (
                        crop_resize_nearest,
                    )

                    mv = crop_resize_nearest(
                        masks, geom[:, 0], geom[:, 1], geom[:, 2],
                        geom[:, 3], spec.config.out_size,
                    )
                    mv = jnp.where(
                        geom[:, 4][:, None, None] > 0.5, mv[:, :, ::-1], mv
                    )
                    mask_views.append(mv)
                i += 1
        if needs_masks and mask_views:
            views = views + mask_views
        if needs_geometry:
            views = views + geoms

        def loss_wrapper(params):
            return method.loss_fn(
                params,
                model_state,
                method_state,
                views,
                k_loss,
                step,
                total_steps,
            )

        (loss, (new_model_state, new_method_state, metrics)), grads = (
            jax.value_and_grad(loss_wrapper, has_aux=True)(params)
        )
        return loss, grads, new_model_state, new_method_state, metrics

    def train_step(
        state: TrainState, batch: Any, base_key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if isinstance(batch, dict):
            images_u8 = batch["images"]
            masks = batch.get("masks")
        else:
            images_u8 = batch
            masks = None
        step_key = jax.random.fold_in(base_key, state.step)

        if grad_accum_steps <= 1:
            loss, grads, model_state, method_state, metrics = (
                _grads_for_microbatch(
                    state.params, state.model_state, state.method_state,
                    images_u8, masks, step_key, state.step,
                )
            )
        else:
            k = grad_accum_steps
            b = images_u8.shape[0]
            if b % k != 0:
                raise ValueError(
                    f"batch size {b} not divisible by grad_accum_steps {k}"
                )
            mb_images = images_u8.reshape(k, b // k, *images_u8.shape[1:])
            mb_masks = (
                masks.reshape(k, b // k, *masks.shape[1:])
                if masks is not None
                else None
            )
            mb_keys = jax.random.split(step_key, k)

            def body(carry, xs):
                model_state, method_state, grads_acc, loss_acc, metrics_acc = (
                    carry
                )
                imgs_i, masks_i, key_i = xs
                loss, grads, model_state, method_state, metrics = (
                    _grads_for_microbatch(
                        state.params, model_state, method_state,
                        imgs_i, masks_i, key_i, state.step,
                    )
                )
                grads_acc = jax.tree_util.tree_map(
                    jnp.add, grads_acc, grads
                )
                metrics_acc = jax.tree_util.tree_map(
                    jnp.add, metrics_acc, metrics
                )
                return (
                    model_state, method_state, grads_acc,
                    loss_acc + loss, metrics_acc,
                ), None

            # Shapes/dtypes of grads + metrics for the zero init (one
            # abstract trace of the forward+backward, not two).
            def _gm_shapes(p):
                out = _grads_for_microbatch(
                    p, state.model_state, state.method_state,
                    mb_images[0], None if mb_masks is None else mb_masks[0],
                    mb_keys[0], state.step,
                )
                return out[1], out[4]

            grads_shape, metrics_shape = jax.eval_shape(
                _gm_shapes, state.params
            )
            zeros = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree
            )
            xs = (
                mb_images,
                mb_masks if mb_masks is not None else jnp.zeros((k,)),
                mb_keys,
            )
            init = (
                state.model_state, state.method_state,
                zeros(grads_shape), jnp.zeros((), jnp.float32),
                zeros(metrics_shape),
            )

            def body_dispatch(carry, xs):
                imgs_i, masks_i, key_i = xs
                return body(
                    carry,
                    (imgs_i, masks_i if mb_masks is not None else None, key_i),
                )

            (model_state, method_state, grads, loss, metrics), _ = (
                jax.lax.scan(body_dispatch, init, xs)
            )
            inv_k = 1.0 / k
            grads = jax.tree_util.tree_map(lambda g: g * inv_k, grads)
            metrics = jax.tree_util.tree_map(lambda m: m * inv_k, metrics)
            loss = loss * inv_k

        if fused_updater is not None:
            # Single-pass AdamW + EMA (replaces optimizer.update,
            # mask_updates, apply_updates AND method.post_update; see
            # _optim/fused_update.py).
            params, teacher, opt_state, grad_norm = (
                fused_updater.update_and_apply(
                    grads, state.opt_state, state.params,
                    method_state["teacher"], state.step,
                )
            )
            method_state = {**method_state, "teacher": teacher}
            finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        else:
            grad_norm = optax.global_norm(grads)
            finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            updates = method.mask_updates(updates, state.step)
            params = optax.apply_updates(state.params, updates)
            method_state = method.post_update(
                params, method_state, state.step, total_steps
            )
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            method_state=method_state,
        )
        out_metrics = {
            "train_loss": loss,
            "grad_norm": grad_norm,
            "finite": finite,
            **metrics,
        }
        return new_state, out_metrics

    jitted = jax.jit(train_step, donate_argnums=(0,))
    # Seam for the NaN-capture replay driver (_debug/replay.py): compute the
    # exact per-leaf gradients of one captured microbatch outside the donated
    # step so the offender report can name leaves.
    jitted.grads_for_microbatch = _grads_for_microbatch  # type: ignore[attr-defined]
    return jitted


def fit(
    train_step: Callable,
    state: TrainState,
    batches: Iterable[jax.Array],
    total_steps: int,
    seed: int = 0,
    log_every: int = 50,
    on_log: Optional[Callable[[int, Dict[str, float]], None]] = None,
    on_checkpoint: Optional[Callable[[int, TrainState], None]] = None,
    checkpoint_every: Optional[int] = None,
    nan_guard: Optional[Any] = None,
    on_first_batch: Optional[Callable[[jax.Array], None]] = None,
    profile_dir: Optional[str] = None,
    profile_start: int = 10,
    profile_steps: int = 5,
) -> TrainState:
    """Host step loop: feed batches, log throughput, checkpoint.

    The host-side step counter mirrors the device counter (both advance by 1
    per call), so no device sync is needed except when metrics are actually
    logged — the loop stays ahead of the device (async dispatch) and the TPU
    never waits on Python. Burn-in log steps follow the reference
    (``train_task.py:1696-1704``).
    """
    base_key = jax.random.key(seed)
    burn_in = {1, 2, 5, 10, 50, 100}
    current = int(state.step)
    pending: Optional[Dict[str, jax.Array]] = None
    t_window = time.perf_counter()
    window_steps = 0
    batch_size: Optional[int] = None

    batch_iter = iter(batches)
    data_wait = 0.0
    profiling = False
    profiled = False
    # One-step-lagged NaN check: (finite flag, device step, batch) of the
    # PREVIOUS dispatched step. Fetching the scalar blocks only on a step
    # that has a successor queued, so the device pipeline stays fed, and
    # the capture holds the batch/step that actually produced the NaN (a
    # boundary-only check captured whatever batch the boundary ran).
    prev_check: Optional[tuple] = None

    def _nan_check(entry) -> None:
        flag, dev_step, prev_batch = entry
        if float(flag) < 0.5:
            nan_guard.check(
                jnp.asarray(False), dev_step, prev_batch, base_key,
                state.params,
            )

    while current < total_steps:
        if profile_dir is not None:
            if not profiling and not profiled and current >= profile_start:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            elif profiling and current >= profile_start + profile_steps:
                jax.block_until_ready(pending)
                jax.profiler.stop_trace()
                profiling = False
                profiled = True
                logger.info("Wrote profiler trace to %s", profile_dir)
        t_data = time.perf_counter()
        batch = next(batch_iter)
        data_wait += time.perf_counter() - t_data
        if batch_size is None:
            batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if on_first_batch is not None:
                on_first_batch(batch)
        state, pending = train_step(state, batch, base_key)
        current += 1
        window_steps += 1
        if nan_guard is not None and nan_guard.enabled:
            if prev_check is not None:
                _nan_check(prev_check)
            # The step just dispatched ran with device step current-1.
            prev_check = (pending["finite"], current - 1, batch)
        if current in burn_in or current % log_every == 0 or current == total_steps:
            metrics = {k: float(v) for k, v in pending.items()}  # device sync
            dt = time.perf_counter() - t_window
            metrics["profiling/images_per_sec"] = (
                batch_size * window_steps / max(dt, 1e-9)
            )
            metrics["profiling/step_time"] = dt / max(window_steps, 1)
            metrics["profiling/data_time"] = data_wait / max(window_steps, 1)
            # Device duty cycle over the window (the TPU analog of the
            # reference's NVML utilization thread,
            # ``_training_step_timer.py:172``): fraction of wall time the
            # device pipeline is fed rather than waiting on host data.
            metrics["profiling/device_duty_cycle"] = max(
                0.0, 1.0 - data_wait / max(dt, 1e-9)
            )
            if on_log is not None:
                on_log(current, metrics)
            t_window = time.perf_counter()
            window_steps = 0
            data_wait = 0.0
        if (
            checkpoint_every is not None
            and on_checkpoint is not None
            and current % checkpoint_every == 0
            and current < total_steps
        ):
            on_checkpoint(current, state)
    if profiling:
        jax.block_until_ready(pending)
        jax.profiler.stop_trace()
    if nan_guard is not None and nan_guard.enabled and prev_check is not None:
        _nan_check(prev_check)  # the final step's flag
    if on_checkpoint is not None:
        on_checkpoint(current, state)
    return state
