"""Fine-tuning runtime + per-task entry points.

Rebuild of the reference Fabric loop
(``src/lightly_train/_commands/train_task.py:1269-2004``): explicit step loop
with a jitted train step (device-side flip+normalize, loss, optimizer, EMA),
timed validation every N steps with device-summed statistics, last/best
checkpointing by ``watch_metric``, JSONL logging. Entry points mirror the
reference API: ``train_image_classification``, ``train_semantic_segmentation``
(``train_task.py:80-1230``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import field_validator
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from lightly_train_tpu._checkpoint.checkpoint import (
    CheckpointManager,
    export_model,
)
from lightly_train_tpu._configs.config import AUTO, Auto, PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._data.task_loader import TaskTrainLoader, TaskValLoader
from lightly_train_tpu._loggers.multi import build_loggers
from lightly_train_tpu._logging import (
    get_logger,
    set_up_console_logging,
    set_up_file_logging,
)
from lightly_train_tpu._optim import OPTIMIZER_ARGS_TYPES, build_optimizer
from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD
from lightly_train_tpu.ops.ema import ema_update, ema_warmup_momentum
from lightly_train_tpu.parallel import (
    get_default_mesh,
    initialize_distributed,
    is_main_process,
)
from lightly_train_tpu.tasks.base import TaskTrainModel, TaskTrainState

logger = get_logger("train_task")


class TrainTaskConfig(PydanticConfig):
    out: str
    model: str
    task_args: Dict[str, Any] = {}

    @field_validator("model", mode="before")
    @classmethod
    def _resolve_model(cls, v: Any) -> str:
        # Custom package: a WrappedModel or bare Flax module is registered
        # and replaced by its name (reference custom_package.py:1-66).
        from lightly_train_tpu.models.package_registry import resolve_model_name

        return resolve_model_name(v)
    checkpoint: Optional[str] = None  # pretrained backbone artifact
    steps: Union[int, Auto] = AUTO
    batch_size: Union[int, Auto] = AUTO
    optim: str = "auto"
    optim_args: Dict[str, Any] = {}
    learning_rate: Union[float, Auto] = AUTO
    precision: Literal["bf16", "fp32"] = "bf16"
    grad_accum_steps: int = 1
    image_size: int = 224
    # Validation staging resolution; above ``image_size`` the semantic-seg
    # val loop runs tiled at the training tile size (AUTO = image_size).
    val_image_size: Union[int, Auto] = AUTO
    num_workers: int = 8
    seed: int = 0
    log_every: int = 50
    # List of names or reference-style dict (name -> kwargs | None)
    # (``_loggers/multi.py`` build_loggers).
    loggers: Union[List[str], Dict[str, Optional[Dict[str, Any]]]] = ["jsonl"]
    val_every: Union[int, Auto] = AUTO
    save_every: Union[int, Auto] = AUTO
    # Per-task transform schema overrides (reference ``TaskTransformArgs``,
    # ``task_transform.py:25-60``); keys validated against the task's schema
    # (``_transforms/task_transforms.py``).
    transform_args: Dict[str, Any] = {}
    # Legacy scalar knob (pre-schema surface): overrides
    # transform_args.random_flip.horizontal_prob when set.
    hflip_prob: Optional[float] = None
    resume_interrupted: bool = False
    overwrite: bool = False


def _device_train_transform(
    batch: Dict[str, jax.Array], key: jax.Array, hflip_prob: float, dtype: Any
) -> Dict[str, jax.Array]:
    """Shared device-side train transform: hflip (joint with every spatial
    label — masks, seg_map, and normalized cxcywh boxes) and normalize."""
    images = batch["images"].astype(jnp.float32) / 255.0
    out = dict(batch)
    if hflip_prob > 0:
        do = (
            jax.random.uniform(key, (images.shape[0], 1, 1, 1)) < hflip_prob
        )
        images = jnp.where(do, images[:, :, ::-1, :], images)
        for mk in ("masks", "seg_map"):
            if mk in batch:
                m = batch[mk]
                out[mk] = jnp.where(do[..., 0], m[:, :, ::-1], m)
        if "boxes" in batch:
            # Normalized cxcywh: mirroring the image sends cx -> 1 - cx.
            b = batch["boxes"]
            flipped = jnp.concatenate(
                [1.0 - b[..., :1], b[..., 1:]], axis=-1
            )
            out["boxes"] = jnp.where(do[..., 0], flipped, b)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    out["images"] = ((images - mean) / std).astype(dtype)
    return out


def _device_val_transform(
    batch: Dict[str, jax.Array], dtype: Any
) -> Dict[str, jax.Array]:
    images = batch["images"].astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    out = dict(batch)
    out["images"] = ((images - mean) / std).astype(dtype)
    return out


def _merge_pretrained(
    init_params: Any, pretrained: Any, _path: str = "", _stats: Any = None
) -> Any:
    """Key-wise overlay of pretrained trunk params onto an initialized tree.

    Task heads (queries, prediction heads) keep their fresh init; trunk keys
    present in the pretrained artifact are taken from it. A shape mismatch is
    an ERROR (a wrong checkpoint must not silently fine-tune from scratch) —
    except resolution-dependent tables (``pos_embed``, interpolated at
    runtime), and ``LIGHTLY_TRAIN_ALLOW_SHAPE_MISMATCH=1`` downgrades all
    mismatches to warnings.
    """
    if not isinstance(init_params, dict) or not isinstance(pretrained, dict):
        init_shape = getattr(init_params, "shape", None)
        pre_shape = getattr(pretrained, "shape", None)
        if init_shape is not None and init_shape != pre_shape:
            import os

            if "pos_embed" in _path or os.environ.get(
                "LIGHTLY_TRAIN_ALLOW_SHAPE_MISMATCH"
            ) == "1":
                logger.warning(
                    "Pretrained param %s shape %s != model shape %s; keeping "
                    "fresh init for this leaf", _path, pre_shape, init_shape,
                )
                return init_params
            raise ConfigError(
                f"Pretrained checkpoint param '{_path}' has shape "
                f"{pre_shape} but the model expects {init_shape}. This "
                "checkpoint does not match the model. Set "
                "LIGHTLY_TRAIN_ALLOW_SHAPE_MISMATCH=1 to keep the fresh "
                "init for mismatched leaves instead."
            )
        if _stats is not None:
            _stats["matched"] += 1
        return pretrained
    out = dict(init_params)
    for k, v in pretrained.items():
        if k in out:
            out[k] = _merge_pretrained(out[k], v, f"{_path}/{k}", _stats)
    if _path == "":
        # Top-level call: a checkpoint whose key set is fully disjoint from
        # the model would "merge" as a silent no-op and fine-tune from
        # random init while logging success.
        if _stats is not None and _stats["matched"] == 0:
            raise ConfigError(
                "The pretrained checkpoint shares no parameter names with "
                "this model — it was exported for a different architecture "
                "or nesting. Nothing was loaded."
            )
    return out


def _save_label_grid(out_dir: Path, batch: Any) -> None:
    """Save a grid of the first train batch with its labels overlaid."""
    try:
        import numpy as np

        from lightly_train_tpu._visualize.grids import (
            colorize_mask,
            image_grid,
        )

        images = np.asarray(batch["images"], np.float32)
        if images.max() <= 8.0:  # normalized — undo roughly for display
            images = images * np.asarray(IMAGENET_STD) + np.asarray(
                IMAGENET_MEAN
            )
            images = images * 255.0
        images = np.clip(images, 0, 255).astype(np.uint8)
        n = min(8, images.shape[0])
        tiles = [images[i] for i in range(n)]
        if "masks" in batch:
            masks = np.asarray(batch["masks"])
            num_classes = int(masks.max()) + 1 if masks.size else 1
            tiles = [
                (0.6 * tiles[i] + 0.4 * colorize_mask(
                    masks[i], max(num_classes, 2)
                )).astype(np.uint8)
                for i in range(n)
            ]
        elif "boxes" in batch:
            boxes = np.asarray(batch["boxes"])
            valid = np.asarray(
                batch.get("box_valid", np.ones(boxes.shape[:2], bool))
            )
            H, W = images.shape[1:3]
            for i in range(n):
                t = tiles[i].copy()
                for b, ok in zip(boxes[i], valid[i]):
                    if not ok:
                        continue
                    cx, cy, w, h = b[:4]
                    x0 = int(max(0, (cx - w / 2) * W))
                    x1 = int(min(W - 1, (cx + w / 2) * W))
                    y0 = int(max(0, (cy - h / 2) * H))
                    y1 = int(min(H - 1, (cy + h / 2) * H))
                    t[y0:y1 + 1, [x0, x1]] = (255, 32, 32)
                    t[[y0, y1], x0:x1 + 1] = (255, 32, 32)
                tiles[i] = t
        grid = image_grid(np.stack(tiles))
        vis_dir = out_dir / "visualizations"
        vis_dir.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        Image.fromarray(grid).save(vis_dir / "first_batch_labels.png")
    except Exception as e:  # visualization must never break training
        logger.debug("Label-grid visualization skipped: %s", e)


def run_task_training(
    config: TrainTaskConfig,
    train_model: TaskTrainModel,
    train_dataset: Any,
    val_dataset: Optional[Any],
    model_meta: Dict[str, Any],
    pretrained_variables: Optional[Dict[str, Any]] = None,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """The generic fine-tuning loop shared by every task entry point."""
    initialize_distributed()
    # Validation above the training resolution runs tiled at the training
    # tile size (reference tiled validation; see tasks/tiling.py).
    train_model.val_tile_size = config.image_size
    out_dir = Path(config.out)
    if out_dir.exists() and any(out_dir.iterdir()):
        if not (config.overwrite or config.resume_interrupted):
            raise ConfigError(
                f"Output directory {out_dir} is not empty. Pass overwrite=True "
                "or resume_interrupted=True."
            )
    if is_main_process():
        out_dir.mkdir(parents=True, exist_ok=True)
    set_up_console_logging()
    set_up_file_logging(out_dir / "train.log")
    from lightly_train_tpu._system import log_system_information

    log_system_information()

    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    args = train_model.args
    batch_size = (
        config.batch_size if config.batch_size != AUTO else args.default_batch_size
    )
    from lightly_train_tpu._events import tracker

    tracker.track_training_started(
        task_type=train_model.task, model=model_meta.get("model_name", "?"),
        method=type(train_model).__name__, batch_size=batch_size,
        devices=jax.device_count(), steps=config.steps,
    )
    total_steps = config.steps if config.steps != AUTO else args.default_steps
    mesh = get_default_mesh()
    from lightly_train_tpu.ops.pallas.attention import set_active_mesh

    set_active_mesh(mesh)
    n_dev = jax.device_count()
    if batch_size % n_dev != 0:
        rounded = -(-batch_size // n_dev) * n_dev
        logger.warning(
            "batch_size %d not divisible by %d devices; rounding up to %d",
            batch_size, n_dev, rounded,
        )
        batch_size = rounded

    # Give the task model mesh access for shard-local augmentations, and the
    # resolved step budget for step-based schedules (EoMT attention-mask
    # annealing must reach zero at the END of THIS run, not at the family's
    # default_steps — a custom steps= would otherwise end training with
    # masking still active while inference runs unmasked).
    train_model.mesh = mesh
    train_model.total_steps = total_steps
    train_loader = TaskTrainLoader(
        train_dataset, batch_size, mesh, config.seed, config.num_workers
    )
    val_loader = (
        TaskValLoader(val_dataset, batch_size, mesh, config.num_workers)
        if val_dataset is not None
        else None
    )

    # ---- optimizer --------------------------------------------------------
    if config.optim == "auto" and not config.optim_args:
        optim_args = train_model.default_optimizer_args()
    else:
        optim_type = (
            config.optim
            if config.optim != "auto"
            else train_model.default_optimizer_args().type
        )
        optim_args = pydantic_model_validate(
            OPTIMIZER_ARGS_TYPES[optim_type], config.optim_args
        )
    base_lr = (
        float(config.learning_rate)
        if config.learning_rate != AUTO
        else float(optim_args.lr)
        if optim_args.lr != AUTO
        else 1e-4
    )
    base_lr = train_model.scaled_lr(base_lr, batch_size)
    lr_schedule = train_model.lr_schedule(base_lr, total_steps)

    # ---- init -------------------------------------------------------------
    rng = jax.random.key(config.seed)
    sample_item = train_dataset[0]
    sample_batch = {
        k: jnp.zeros((2,) + np.asarray(v).shape, dtype=np.asarray(v).dtype)
        for k, v in sample_item.items()
    }
    sample_batch["images"] = sample_batch["images"].astype(dtype)
    params, model_state = train_model.init(rng, sample_batch)
    if pretrained_variables is not None:
        pretrained_variables = train_model.wrap_pretrained(pretrained_variables)
        params = {
            **params,
            "backbone": _merge_pretrained(
                params["backbone"], pretrained_variables["params"],
                _stats={"matched": 0},
            ),
        }
        for k, v in pretrained_variables.items():
            if k != "params":
                model_state[k] = (
                    _merge_pretrained(model_state[k], v)
                    if k in model_state
                    else v
                )
        logger.info("Initialized backbone from pretrained checkpoint")
    optimizer = build_optimizer(
        optim_args,
        lr_schedule,
        params,
        grad_clip_norm=train_model.grad_clip_norm(),
        lr_scales=train_model.lr_scales(params),
        schedule_groups=train_model.lr_schedule_groups(
            base_lr, total_steps, params
        ),
    )
    state = TaskTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, params)
            if train_model.use_ema()
            else None
        ),
    )
    state = jax.device_put(state, NamedSharding(mesh, P()))

    # ---- jitted steps -----------------------------------------------------
    accum = max(1, config.grad_accum_steps)
    if batch_size % accum != 0:
        raise ConfigError(
            f"batch_size {batch_size} (after device round-up) must be "
            f"divisible by grad_accum_steps {accum}."
        )

    # Per-task train transform: tasks that declare a ``transform_kind`` get
    # the reference recipe (scale-jitter/crop/jitter for segmentation,
    # RandomResizedCrop for classification) resolved from the schema +
    # user overrides; detection tasks keep their dedicated pipeline inside
    # ``augment_batch`` and fall back to flip+normalize here.
    transform_kind = getattr(train_model, "transform_kind", None)
    train_tf = None
    if transform_kind is not None:
        from lightly_train_tpu._transforms import (
            build_train_transform,
            resolve_task_transform_args,
        )

        user_tf_args = dict(config.transform_args)
        task_ignore = getattr(train_model.args, "ignore_index", None)
        if (
            transform_kind != "image_classification"
            and task_ignore is not None
            and "ignore_index" not in user_tf_args
        ):
            user_tf_args["ignore_index"] = int(task_ignore)
        resolved_tf_args = resolve_task_transform_args(
            transform_kind, user_tf_args,
            (config.image_size, config.image_size), config.hflip_prob,
        )
        train_tf = build_train_transform(resolved_tf_args, dtype)
        logger.info(
            "Train transform (%s): %s", transform_kind,
            resolved_tf_args.model_dump(),
        )
    elif config.transform_args:
        raise ConfigError(
            f"transform_args is not supported for task "
            f"'{train_model.task}' (its pipeline is configured via "
            "task_args; see ops/detection_augs.py)"
        )
    hflip = config.hflip_prob if config.hflip_prob is not None else 0.5

    # Batch preparation (shared flip+normalize + task augs) runs as its OWN
    # jitted program: mixing the augmentation collectives into the step
    # program that already hosts the Hungarian pure_callback deadlocks XLA
    # CPU's in-process collectives (observed on the 8-device test mesh);
    # the split costs one HBM round-trip of the batch and removes the
    # interaction entirely.
    @jax.jit
    def prepare_batch(batch, base_key, step):
        k = jax.random.fold_in(base_key, step)
        k_aug, k_task_aug = jax.random.split(k)
        if train_tf is not None:
            batch = train_tf(batch, k_aug)
        else:
            batch = _device_train_transform(batch, k_aug, hflip, dtype)
        return train_model.augment_batch(batch, k_task_aug, step)

    @jax.jit
    def train_step(s: TaskTrainState, batch, base_key):
        k = jax.random.fold_in(base_key, s.step)
        # Distinct stream from prepare_batch's split(k) children — the
        # previous split(k)[1] was bitwise identical to k_task_aug,
        # correlating mosaic gates with DN-query noise every step.
        k_loss = jax.random.fold_in(k, 1)

        def lw(p, b, kl, ms):
            return train_model.loss_fn(p, ms, b, kl, s.step)

        if accum > 1:
            # Gradient accumulation via lax.scan over microbatches
            # (reference grad-accum loop, ``train_task.py:1749-1769``).
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, -1) + x.shape[1:]), batch
            )

            def body(carry, mb_key):
                mb, kl = mb_key
                g_sum, ms, loss_sum, metrics_sum = carry
                (loss, (ms2, metrics)), g = jax.value_and_grad(
                    lw, has_aux=True
                )(s.params, mb, kl, ms)
                g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
                metrics_sum = jax.tree_util.tree_map(
                    jnp.add, metrics_sum, metrics
                )
                return (g_sum, ms2, loss_sum + loss, metrics_sum), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, s.params)
            keys = jax.random.split(k_loss, accum)
            first_mb = jax.tree_util.tree_map(lambda x: x[0], micro)
            metrics_shapes = jax.eval_shape(
                lambda: lw(s.params, first_mb, keys[0], s.model_state)
            )[1][1]
            zero_metrics = jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), metrics_shapes
            )
            (g_sum, model_state, loss_sum, metrics_sum), _ = jax.lax.scan(
                body,
                (zero_g, s.model_state, jnp.zeros((), jnp.float32),
                 zero_metrics),
                (micro, keys),
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            loss = loss_sum / accum
            metrics = jax.tree_util.tree_map(
                lambda m: m / accum, metrics_sum
            )
        else:
            (loss, (model_state, metrics)), grads = jax.value_and_grad(
                lw, has_aux=True
            )(s.params, batch, k_loss, s.model_state)
        updates, opt_state = optimizer.update(grads, s.opt_state, s.params)
        params = optax.apply_updates(s.params, updates)
        ema_params = s.ema_params
        if ema_params is not None:
            m = ema_warmup_momentum(s.step, 0.9998)
            ema_params = ema_update(ema_params, params, m)
        new_state = TaskTrainState(
            step=s.step + 1,
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = {
            "train_loss": loss,
            "grad_norm": optax.global_norm(grads),
            **metrics,
        }
        return new_state, metrics

    @jax.jit
    def val_step(params, model_state, batch):
        batch = _device_val_transform(batch, dtype)
        return train_model.val_step(params, model_state, batch)

    def run_validation(s: TaskTrainState) -> Dict[str, float]:
        if val_loader is None:
            return {}
        eval_params = s.ema_params if s.ema_params is not None else s.params
        if getattr(train_model, "val_mode", "sum") == "collect":
            collected = []
            for batch in val_loader:
                collected.append(
                    jax.device_get(val_step(eval_params, s.model_state, batch))
                )
            return train_model.val_finalize(collected) if collected else {}
        total: Optional[Dict[str, jax.Array]] = None
        for batch in val_loader:
            stats = val_step(eval_params, s.model_state, batch)
            total = (
                stats
                if total is None
                else jax.tree_util.tree_map(lambda a, b: a + b, total, stats)
            )
        return train_model.val_finalize(total) if total is not None else {}

    # ---- checkpointing ----------------------------------------------------
    ckpt_mgr = CheckpointManager(out_dir / "checkpoints")
    if config.resume_interrupted and ckpt_mgr.latest_step() is not None:
        state = ckpt_mgr.restore(jax.device_get(state))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        # Continue the same shuffled stream (skip the consumed batches)
        # instead of retraining on epoch 0's first batches.
        train_loader.start_step = int(state.step)
        logger.info("Resumed from step %d", int(state.step))

    jsonl = build_loggers(out_dir, config.loggers)
    jsonl.log_hyperparams(
        {
            **config.dump(),
            "task": train_model.task,
            "resolved_steps": total_steps,
            "resolved_batch_size": batch_size,
            **model_meta,
        }
    )

    val_every = (
        config.val_every
        if config.val_every != AUTO
        else max(total_steps // 10, 1)
    )
    save_every = (
        config.save_every if config.save_every != AUTO else val_every
    )
    watch_name, watch_mode = train_model.watch_metric
    best_value: Optional[float] = None
    last_val: Dict[str, float] = {}
    base_key = jax.random.key(config.seed)
    burn_in = {1, 2, 5, 10, 50, 100}

    def export_artifact(name: str, s: TaskTrainState) -> None:
        if not is_main_process():
            return
        eval_params = s.ema_params if s.ema_params is not None else s.params
        export_model(
            out_dir / "exported_models" / name,
            model_meta.get("model_name", config.model),
            jax.device_get(eval_params),
            model_state=jax.device_get(s.model_state) or None,
            extra_meta={
                **{k: v for k, v in model_meta.items() if k != "model_name"},
                "task": train_model.task,
                "task_args": train_model.args.dump(),
                "steps": int(s.step),
            },
        )

    # ---- loop -------------------------------------------------------------
    current = int(state.step)
    start_step = current
    t_window = time.perf_counter()
    window = 0
    pending = None
    train_iter = iter(train_loader)
    logger.info(
        "Fine-tuning %s: model=%s steps=%d batch=%d",
        train_model.task, config.model, total_steps, batch_size,
    )
    data_wait = 0.0
    while current < total_steps:
        t_data = time.perf_counter()
        batch = next(train_iter)
        data_wait += time.perf_counter() - t_data
        batch = prepare_batch(batch, base_key, jnp.asarray(current, jnp.int32))
        if current == start_step and is_main_process():
            # Label grid from the first batch only (reference logs label/
            # prediction grids for the first steps,
            # ``train_task.py:1772-1778``). `int(state.step)` here would be
            # true EVERY step (both counters advance in lockstep) and its
            # device sync would also stall the dispatch pipeline.
            _save_label_grid(out_dir, batch)
        state, pending = train_step(state, batch, base_key)
        current += 1
        window += 1
        if current in burn_in or current % config.log_every == 0 or (
            current == total_steps
        ):
            metrics = {k: float(v) for k, v in pending.items()}
            dt = time.perf_counter() - t_window
            metrics["profiling/images_per_sec"] = batch_size * window / max(
                dt, 1e-9
            )
            metrics["profiling/data_time"] = data_wait / max(window, 1)
            # NVML-utilization-thread analog (``_training_step_timer.py:172``).
            metrics["profiling/device_duty_cycle"] = max(
                0.0, 1.0 - data_wait / max(dt, 1e-9)
            )
            data_wait = 0.0
            jsonl.log_metrics(metrics, current)
            logger.info(
                "step %d/%d loss=%.4f img/s=%.1f",
                current, total_steps, metrics.get("train_loss", float("nan")),
                metrics["profiling/images_per_sec"],
            )
            t_window = time.perf_counter()
            window = 0
        if current % val_every == 0 or current == total_steps:
            val_metrics = run_validation(state)
            if val_metrics:
                last_val = val_metrics
                jsonl.log_metrics(val_metrics, current)
                logger.info(
                    "val @ %d: %s", current,
                    {k: round(v, 4) for k, v in val_metrics.items()},
                )
                value = val_metrics.get(watch_name)
                improved = value is not None and (
                    best_value is None
                    or (watch_mode == "max" and value > best_value)
                    or (watch_mode == "min" and value < best_value)
                )
                if improved:
                    best_value = value
                    export_artifact("exported_best", state)
        if current % save_every == 0 and current < total_steps:
            ckpt_mgr.save(current, jax.device_get(state))
    ckpt_mgr.save(current, jax.device_get(state), force=True)
    ckpt_mgr.wait()
    ckpt_mgr.close()
    export_artifact("exported_last", state)
    jsonl.close()
    if best_value is not None:
        logger.info("Best %s: %.4f", watch_name, best_value)
    return state, last_val


# ---------------------------------------------------------------------------
# Entry points (reference: train_task.py:80-1230)
# ---------------------------------------------------------------------------


def _load_backbone(config: TrainTaskConfig):
    """Build the backbone, optionally initialized from pretrained weights.

    ``checkpoint`` accepts: a lightly_train_tpu exported-artifact directory,
    a raw torch ``.pth``/``.pt`` file (converted for the named model), or
    the literal ``"auto"`` to fetch the model's registered public weights
    (``models/pretrained_urls.py`` — the reference's auto-download
    behavior; requires network egress).
    """
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    pretrained = None
    model_name = config.model
    if config.checkpoint is not None:
        from lightly_train_tpu._checkpoint.checkpoint import (
            resolve_pretrained_source,
        )

        pretrained, model_name, _ = resolve_pretrained_source(
            config.checkpoint, model_name
        )
    else:
        from lightly_train_tpu.models.pretrained_urls import PRETRAINED_URLS

        hint = PRETRAINED_URLS.get(model_name)
        logger.warning(
            "No checkpoint given: the %s backbone fine-tunes from RANDOM "
            "init. Pass checkpoint=<pretrain artifact or torch .pth>%s.",
            model_name,
            f' or checkpoint="auto" to fetch {hint}' if hint else "",
        )
    wrapped = get_wrapped_model(model_name, dtype=dtype)
    return wrapped, pretrained, {"model_name": model_name}


def _resolve_mask_classes(
    data: Dict[str, Any], ignore_index: int = 255
) -> Tuple[int, Optional[np.ndarray]]:
    """Resolve the reference's mask-dataset class schema.

    The reference takes ``classes`` ({raw mask id: name}) plus optional
    ``ignore_classes`` (``mask_semantic_segmentation_dataset.py:478-503``):
    raw ids remap to contiguous train ids, ignored/unlisted ids map to
    ``ignore_index``. Returns (num_classes, lut) where ``lut`` is a raw-id ->
    train-id lookup table (None when the plain ``num_classes`` form is used).
    """
    if "classes" not in data:
        return int(data["num_classes"]), None
    classes = {int(k): v for k, v in dict(data["classes"]).items()}
    ignore = {int(i) for i in (data.get("ignore_classes") or ())}
    included = [cid for cid in sorted(classes) if cid not in ignore]
    if not included:
        raise ConfigError(
            "data['classes'] minus data['ignore_classes'] left no classes."
        )
    size = max(max(classes), ignore_index) + 1
    lut = np.full(size, ignore_index, np.int32)
    for tid, cid in enumerate(included):
        lut[cid] = tid
    return len(included), lut


def train_image_classification(
    out: str,
    data: Dict[str, str],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """data: {"train": <dir>, "val": <dir>} ImageFolder roots."""
    from lightly_train_tpu.tasks.image_classification import (
        ImageClassificationArgs,
        ImageClassificationDataset,
        ImageClassificationTrainModel,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    hw = (config.image_size, config.image_size)
    train_ds = ImageClassificationDataset(Path(data["train"]), hw)
    val_ds = (
        ImageClassificationDataset(
            Path(data["val"]), hw, classes=train_ds.classes
        )
        if "val" in data
        else None
    )
    task_args = pydantic_model_validate(
        ImageClassificationArgs,
        {"num_classes": len(train_ds.classes), **config.task_args},
    )
    wrapped, pretrained, meta = _load_backbone(config)
    train_model = ImageClassificationTrainModel(wrapped, task_args)
    meta["classes"] = train_ds.classes
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )


def train_object_detection(
    out: str,
    data: Dict[str, Any],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """Object detection (LT-DETR) fine-tuning.

    data (YOLO): {"format": "yolo", "train": {"images": dir, "labels": dir},
                  "val": {...}, "num_classes": int}
    data (COCO): {"format": "coco", "train": {"images": dir,
                  "annotations": path}, "val": {...}}
    """
    from lightly_train_tpu.tasks.detection.data import (
        COCOObjectDetectionDataset,
        YOLOObjectDetectionDataset,
    )
    from lightly_train_tpu.tasks.detection.ltdetr import (
        ObjectDetectionArgs,
        ObjectDetectionTrainModel,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    use_picodet = config.model.startswith("picodet")
    # ltdetrv2-{s,m,l,x} zoo names resolve to EdgeCrafter ECViT backbones
    # (reference ltdetr_object_detection/config.py:1111-1207); the hidden
    # _ltdetrv2-test name mirrors "_ltdetrv2-s-notpretrained".
    _LTDETRV2_ZOO = {
        "ltdetrv2-s": "ecvit/ecvitt",
        "ltdetrv2-m": "ecvit/ecvittplus",
        "ltdetrv2-l": "ecvit/ecvits",
        "ltdetrv2-x": "ecvit/ecvitsplus",
        "_ltdetrv2-test": "ecvit/ecvittest",
    }
    zoo_name = config.model.removesuffix("-coco")
    backbone_name = _LTDETRV2_ZOO.get(
        zoo_name, config.model.removesuffix("-ltdetr")
    )
    if not use_picodet:
        config = config.model_copy(update={"model": backbone_name})
    hw = (config.image_size, config.image_size)
    fmt = data.get("format", "yolo")

    def build(split: Dict[str, str]):
        if fmt == "coco":
            return COCOObjectDetectionDataset(
                Path(split["images"]), Path(split["annotations"]), hw,
                skip_if_annotations_missing=bool(
                    data.get("skip_if_annotations_missing", True)
                ),
            )
        return YOLOObjectDetectionDataset(
            Path(split["images"]), Path(split["labels"]), hw
        )

    train_ds = build(data["train"])
    val_ds = build(data["val"]) if "val" in data else None
    num_classes = int(
        data.get("num_classes")
        or len(data.get("classes") or ())  # reference schema: {id: name}
        or len(getattr(train_ds, "class_names", []) or [])
        or 0
    )
    if num_classes <= 0:
        raise ConfigError(
            "num_classes could not be determined: pass data={'classes':"
            " {id: name, ...}, ...} or data={'num_classes': N, ...} (YOLO"
            " datasets carry no category list)."
        )
    if use_picodet:
        # picodet-s / picodet-l model names (reference config.py:53-70).
        from lightly_train_tpu.tasks.detection.picodet import (
            PicoDetArgs,
            PicoDetTrainModel,
        )

        model_size = "l" if config.model.endswith("-l") else "s"
        task_args = pydantic_model_validate(
            PicoDetArgs,
            {"num_classes": num_classes, "model_size": model_size,
             **config.task_args},
        )
        train_model: Any = PicoDetTrainModel(None, task_args)
        meta = {"model_name": config.model, "architecture": "picodet"}
        if config.checkpoint is not None:
            # PicoDet's ESNet backbone has no pretrain package; silently
            # dropping the user's checkpoint= would fine-tune from scratch
            # while they believe otherwise.
            raise ConfigError(
                "checkpoint= is not supported for picodet models (the "
                "ESNet backbone trains from scratch like the reference "
                "PicoDet recipe); remove checkpoint= or pick a "
                "'<backbone>-ltdetr' model."
            )
        return run_task_training(
            config, train_model, train_ds, val_ds, meta, None
        )
    task_args = pydantic_model_validate(
        ObjectDetectionArgs, {"num_classes": num_classes, **config.task_args}
    )
    wrapped, pretrained, meta = _load_backbone(config)
    train_model = ObjectDetectionTrainModel(wrapped, task_args)
    meta["architecture"] = "ltdetr"
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )


def train_image_classification_multihead(
    out: str,
    data: Dict[str, str],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """Several classification heads at different LRs in one run."""
    from lightly_train_tpu.tasks.image_classification import (
        ImageClassificationDataset,
    )
    from lightly_train_tpu.tasks.multihead import (
        ImageClassificationMultiheadArgs,
        ImageClassificationMultiheadTrainModel,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    hw = (config.image_size, config.image_size)
    train_ds = ImageClassificationDataset(Path(data["train"]), hw)
    val_ds = (
        ImageClassificationDataset(
            Path(data["val"]), hw, classes=train_ds.classes
        )
        if "val" in data
        else None
    )
    task_args = pydantic_model_validate(
        ImageClassificationMultiheadArgs,
        {"num_classes": len(train_ds.classes), **config.task_args},
    )
    wrapped, pretrained, meta = _load_backbone(config)
    train_model = ImageClassificationMultiheadTrainModel(wrapped, task_args)
    meta["classes"] = train_ds.classes
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )


def train_semantic_segmentation_multihead(
    out: str,
    data: Dict[str, Any],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """Several linear segmentation heads at different LRs in one run."""
    from lightly_train_tpu.tasks.multihead import (
        SemanticSegmentationMultiheadArgs,
        SemanticSegmentationMultiheadTrainModel,
    )
    from lightly_train_tpu.tasks.semantic_segmentation_linear import (
        MaskSemanticSegmentationDataset,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    hw = (config.image_size, config.image_size)
    val_size = (
        config.val_image_size
        if config.val_image_size != AUTO
        else config.image_size
    )
    num_classes, class_lut = _resolve_mask_classes(data)
    train_ds = MaskSemanticSegmentationDataset(
        Path(data["train"]["images"]), Path(data["train"]["masks"]), hw,
        class_lut=class_lut,
    )
    val_ds = (
        MaskSemanticSegmentationDataset(
            Path(data["val"]["images"]), Path(data["val"]["masks"]),
            (val_size, val_size), class_lut=class_lut,
        )
        if "val" in data
        else None
    )
    task_args = pydantic_model_validate(
        SemanticSegmentationMultiheadArgs,
        {"num_classes": num_classes, **config.task_args},
    )
    wrapped, pretrained, meta = _load_backbone(config)
    train_model = SemanticSegmentationMultiheadTrainModel(wrapped, task_args)
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )


def train_instance_segmentation(
    out: str,
    data: Dict[str, Any],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """Instance segmentation (COCO polygon JSON or YOLO-seg labels).

    data (COCO): {"train": {"images": dir, "annotations": json}, "val": ...}
    data (YOLO): {"format": "yolo", "num_classes": int,
                  "train": {"images": dir, "labels": dir}, "val": {...}}
    ``model`` names ending in ``-ltdetr`` train the LT-DETR detector + mask
    head; otherwise (or with ``-eomt``) the EoMT mask transformer.
    """
    from lightly_train_tpu.tasks.eomt_instance_panoptic import (
        COCOInstanceSegmentationDataset,
        EoMTInstanceSegmentationArgs,
        EoMTInstanceSegmentationTrainModel,
        YOLOInstanceSegmentationDataset,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    use_ltdetr = config.model.endswith("-ltdetr")
    backbone_name = config.model.removesuffix("-eomt").removesuffix("-ltdetr")
    config = config.model_copy(update={"model": backbone_name})
    hw = (config.image_size, config.image_size)
    max_inst = int(config.task_args.get("max_instances", 50))
    if data.get("format") == "yolo":
        n_cls = int(data["num_classes"])
        _mk = lambda split: YOLOInstanceSegmentationDataset(
            Path(split["images"]), Path(split["labels"]), n_cls, hw, max_inst
        )
    else:
        _mk = lambda split: COCOInstanceSegmentationDataset(
            Path(split["images"]), Path(split["annotations"]), hw, max_inst
        )
    train_ds = _mk(data["train"])
    val_ds = (
        _mk(data["val"])
        if "val" in data
        else None
    )
    num_classes = int(data.get("num_classes", train_ds.num_classes))
    wrapped, pretrained, meta = _load_backbone(config)
    if use_ltdetr:
        from lightly_train_tpu.tasks.detection.ltdetr_seg import (
            InstanceSegmentationLTDETRArgs,
            LTDETRInstanceSegmentationTrainModel,
        )

        task_args = pydantic_model_validate(
            InstanceSegmentationLTDETRArgs,
            {"num_classes": num_classes, **config.task_args},
        )
        train_model: Any = LTDETRInstanceSegmentationTrainModel(
            wrapped, task_args
        )
        meta["architecture"] = "ltdetr"
    else:
        task_args = pydantic_model_validate(
            EoMTInstanceSegmentationArgs,
            {"num_classes": num_classes, **config.task_args},
        )
        train_model = EoMTInstanceSegmentationTrainModel(wrapped, task_args)
        meta["architecture"] = "eomt"
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )


def train_panoptic_segmentation(
    out: str,
    data: Dict[str, Any],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """EoMT panoptic segmentation (COCO panoptic format).

    data: {"train": {"images": dir, "panoptic": dir, "annotations": json},
           "val": {...}}.
    """
    from lightly_train_tpu.tasks.eomt_instance_panoptic import (
        COCOPanopticSegmentationDataset,
        EoMTPanopticSegmentationArgs,
        EoMTPanopticSegmentationTrainModel,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    backbone_name = config.model.removesuffix("-eomt")
    config = config.model_copy(update={"model": backbone_name})
    hw = (config.image_size, config.image_size)
    max_seg = int(config.task_args.get("max_instances", 50))

    def build(split):
        return COCOPanopticSegmentationDataset(
            Path(split["images"]), Path(split["panoptic"]),
            Path(split["annotations"]), hw, max_seg,
        )

    train_ds = build(data["train"])
    val_ds = build(data["val"]) if "val" in data else None
    task_args = pydantic_model_validate(
        EoMTPanopticSegmentationArgs,
        {"num_classes": int(data.get("num_classes", train_ds.num_classes)),
         **config.task_args},
    )
    wrapped, pretrained, meta = _load_backbone(config)
    train_model = EoMTPanopticSegmentationTrainModel(wrapped, task_args)
    meta["architecture"] = "eomt"
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )


def train_semantic_segmentation(
    out: str,
    data: Dict[str, Any],
    model: str,
    **kwargs: Any,
) -> Tuple[TaskTrainState, Dict[str, float]]:
    """data: {"train": {"images": dir, "masks": dir},
              "val": {"images": dir, "masks": dir}, "num_classes": int}.

    ``model`` names ending in ``-eomt`` (reference model-zoo convention, e.g.
    ``dinov3/vits16-eomt``) train the EoMT mask transformer; ``-linear`` (or
    no suffix) trains the frozen-backbone linear probe.
    """
    from lightly_train_tpu.tasks.semantic_segmentation_linear import (
        LinearSemanticSegmentationArgs,
        LinearSemanticSegmentationTrainModel,
        MaskSemanticSegmentationDataset,
    )

    config = pydantic_model_validate(
        TrainTaskConfig, {"out": out, "model": model, **kwargs}
    )
    use_eomt = config.model.endswith("-eomt")
    backbone_name = config.model.removesuffix("-eomt").removesuffix("-linear")
    config = config.model_copy(update={"model": backbone_name})
    hw = (config.image_size, config.image_size)
    val_size = (
        config.val_image_size
        if config.val_image_size != AUTO
        else config.image_size
    )
    hw_val = (val_size, val_size)
    num_classes, class_lut = _resolve_mask_classes(data)
    train_ds = MaskSemanticSegmentationDataset(
        Path(data["train"]["images"]), Path(data["train"]["masks"]), hw,
        class_lut=class_lut,
    )
    val_ds = (
        MaskSemanticSegmentationDataset(
            Path(data["val"]["images"]), Path(data["val"]["masks"]), hw_val,
            class_lut=class_lut,
        )
        if "val" in data
        else None
    )
    wrapped, pretrained, meta = _load_backbone(config)
    if use_eomt:
        from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
            EoMTSemanticSegmentationArgs,
            EoMTSemanticSegmentationTrainModel,
        )

        task_args = pydantic_model_validate(
            EoMTSemanticSegmentationArgs,
            {"num_classes": num_classes, **config.task_args},
        )
        train_model: Any = EoMTSemanticSegmentationTrainModel(wrapped, task_args)
        meta["architecture"] = "eomt"
    else:
        task_args = pydantic_model_validate(
            LinearSemanticSegmentationArgs,
            {"num_classes": num_classes, **config.task_args},
        )
        train_model = LinearSemanticSegmentationTrainModel(wrapped, task_args)
        meta["architecture"] = "linear"
    return run_task_training(
        config, train_model, train_ds, val_ds, meta, pretrained
    )
