"""``pretrain`` command: end-to-end SSL pretraining.

Rebuild of ``src/lightly_train/_commands/train.py:53-292`` with the call
stack of SURVEY.md §3.1, TPU-native: out-dir handling, logging, mmap file
list, dataset + loader, model/method/optimizer resolution with "auto"
cascade, mesh setup, jitted train loop, Orbax checkpointing, and model
export.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Literal, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import field_validator, model_validator

from lightly_train_tpu._checkpoint.checkpoint import (
    CheckpointManager,
    export_model,
)
from lightly_train_tpu._configs.config import AUTO, Auto, PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._data import (
    ImageDataset,
    MemoryMappedSequence,
    PretrainLoader,
    SyntheticLoader,
    list_image_files,
    write_items_to_file,
)
from lightly_train_tpu._debug.nan_guard import NaNGuard
from lightly_train_tpu._loggers.multi import build_loggers
from lightly_train_tpu._logging import (
    get_logger,
    set_up_console_logging,
    set_up_file_logging,
)
from lightly_train_tpu._optim import (
    OPTIMIZER_ARGS_TYPES,
    build_optimizer,
    cosine_warmup,
)
from lightly_train_tpu._scaling import ScalingInfo
from lightly_train_tpu._commands.train_loop import fit, make_train_step
from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.methods.base import TrainState
from lightly_train_tpu.methods.method_helpers import get_method_cls
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.parallel import initialize_distributed, is_main_process

logger = get_logger("pretrain")


class TrainConfig(PydanticConfig):
    out: str
    # One directory or a list of directories scanned recursively for images
    # (reference ``data: PathLike | Sequence[PathLike]``).
    data: Union[str, List[str], None] = None
    model: str = "dinov2/vitb14"

    @field_validator("model", mode="before")
    @classmethod
    def _resolve_model(cls, v: Any) -> str:
        # Custom package: a WrappedModel or bare Flax module is registered
        # and replaced by its name (reference custom_package.py:1-66).
        from lightly_train_tpu.models.package_registry import resolve_model_name

        return resolve_model_name(v)
    # Forwarded to the model builder (reference ``train.py:82,239-243``
    # model_args): e.g. {"drop_path_rate": 0.3, "remat_every": 2} for ViTs.
    model_args: Dict[str, Any] = {}
    method: str = "distillation"
    method_args: Dict[str, Any] = {}
    # Pretrain an embedding model of this dimension: a trainable linear
    # projection (1x1 conv on the NHWC feature map) sits between the
    # backbone and the SSL heads, and ``embed`` applies it at inference
    # (reference ``_commands/train.py:60,113-115,394`` EmbeddingModel).
    # None = raw backbone features.
    embed_dim: Optional[int] = None
    # Reference-style transform overrides applied to every view (plus
    # optional "global_view"/"local_view" sub-dicts) — the user-facing
    # ``transform_args`` of ``lightly_train.pretrain``
    # (``_transforms/transform.py:306-387``).
    transform_args: Dict[str, Any] = {}
    optim: str = "auto"
    optim_args: Dict[str, Any] = {}
    batch_size: Union[int, Auto] = AUTO
    # Split each batch into this many microbatches and accumulate gradients
    # over a lax.scan before the optimizer update (reference
    # accumulate-grad-batches, ``train.py:62,463``). batch_size stays the
    # effective global batch; LR scaling uses it unchanged.
    grad_accum_steps: int = 1
    steps: Union[int, Auto] = AUTO
    epochs: Optional[int] = None
    learning_rate: Union[float, Auto] = AUTO
    warmup_fraction: float = 0.1
    precision: Literal["bf16", "fp32"] = "bf16"
    # FSDP axis size (1 = pure data parallel); large params + optimizer
    # moments shard over it (ZeRO-3 style) for ViT-g+ scale.
    fsdp: int = 1
    canonical_size: int = 256
    # Optional mask dir (stem-paired PNG region ids) for mask-conditioned
    # methods (DetCon) — the reference's dataset mask inputs.
    mask_dir: Optional[str] = None
    num_workers: int = 8
    seed: int = 0
    log_every: int = 50
    # List of names, or reference-style dict (name -> kwargs | None: None
    # disables a default backend) — ``_commands/train.py:179-182``.
    loggers: Union[List[str], Dict[str, Optional[Dict[str, Any]]]] = ["jsonl"]
    log_augmentations: bool = True
    nan_check: bool = True
    checkpoint_every: Union[int, Auto] = AUTO
    # Further-pretrain from a previous run: load MODEL WEIGHTS ONLY (student
    # backbone + EMA-teacher refresh) from an exported artifact, a raw torch
    # .pth, or "auto" (registered public weights); optimizer state and
    # schedules start fresh (reference ``_commands/train.py:134-141``).
    # Mutually exclusive with resume_interrupted.
    checkpoint: Optional[str] = None
    # Capture a jax.profiler trace of steps [profile_start, profile_start+
    # profile_steps) into out/profile (TensorBoard/XProf-viewable) — the
    # TPU-native upgrade of the reference's step timer (SURVEY.md §5.1).
    profile: bool = False
    profile_start: int = 10
    profile_steps: int = 5
    resume_interrupted: bool = False
    overwrite: bool = False

    @model_validator(mode="after")
    def _checkpoint_xor_resume(self) -> "TrainConfig":
        if self.checkpoint is not None and self.resume_interrupted:
            raise ValueError(
                "checkpoint= and resume_interrupted=True cannot be combined: "
                "checkpoint starts a NEW run from previous weights, "
                "resume_interrupted continues an interrupted run. Set one."
            )
        return self


def pretrain(
    out: str,
    data: Union[str, List[str], None] = None,
    model: str = "dinov2/vitb14",
    method: str = "distillation",
    **kwargs: Any,
) -> TrainState:
    """Pretrain ``model`` with ``method`` on images under ``data``.

    Public API parity with ``lightly_train.pretrain``
    (``src/lightly_train/__init__.py:31-85``).
    """
    config = pydantic_model_validate(
        TrainConfig,
        {"out": out, "data": data, "model": model, "method": method, **kwargs},
    )
    return pretrain_from_config(config)


def pretrain_from_config(config: TrainConfig) -> TrainState:
    """Entry: wraps the run in the mmap file lifecycle (filelock + refcount
    + reuse + concurrent-run detection, reference
    ``common_helpers.py:395-523``)."""
    initialize_distributed()
    if config.data is not None:
        from lightly_train_tpu._data.mmap_lifecycle import dataset_mmap_path

        with dataset_mmap_path(
            config.data, config.out, config.resume_interrupted,
            config.overwrite,
        ) as mmap_path:
            return _pretrain_body(config, mmap_path)
    return _pretrain_body(config, None)


def _pretrain_body(config: TrainConfig, mmap_path: Optional[Path]) -> TrainState:
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
    logger.info("Devices: %d x %s", jax.device_count(), jax.devices()[0].platform)
    from lightly_train_tpu._system import log_system_information

    log_system_information()

    # ---- data -------------------------------------------------------------
    canonical_hw = (config.canonical_size, config.canonical_size)
    if config.data is not None:
        if is_main_process() and not mmap_path.exists():
            dirs = (
                [config.data]
                if isinstance(config.data, str)
                else list(config.data)
            )
            files = [f for d in dirs for f in list_image_files(Path(d))]
            write_items_to_file(files, mmap_path)
        filenames = MemoryMappedSequence(mmap_path)
        dataset = ImageDataset(
            filenames, canonical_hw,
            mask_dir=Path(config.mask_dir) if config.mask_dir else None,
        )
        dataset_size = len(dataset)
    else:
        dataset = None
        dataset_size = 0

    # ---- model + method ---------------------------------------------------
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    wrapped = get_wrapped_model(config.model, dtype=dtype, **config.model_args)
    if config.embed_dim is not None:
        from lightly_train_tpu.models.embedding import project_wrapped

        wrapped = project_wrapped(wrapped, config.embed_dim, dtype)
        logger.info(
            "Training an embedding model: %s features project to dim %d",
            config.model, config.embed_dim,
        )
    method_cls, method_args_cls = get_method_cls(config.method)
    method_args = pydantic_model_validate(method_args_cls, config.method_args)

    from lightly_train_tpu._events import tracker

    tracker.track_training_started(
        task_type="ssl_pretraining", model=config.model,
        method=config.method, batch_size=config.batch_size,
        devices=jax.device_count(), steps=config.steps,
    )

    batch_size = (
        config.batch_size
        if config.batch_size != AUTO
        else min(method_cls.default_batch_size, max(dataset_size, 8))
    )
    n_dev = jax.device_count()
    if batch_size % n_dev != 0:
        rounded = -(-batch_size // n_dev) * n_dev
        logger.warning(
            "batch_size %d not divisible by %d devices; rounding up to %d",
            batch_size, n_dev, rounded,
        )
        batch_size = rounded
    steps_per_epoch = max(dataset_size // batch_size, 1) if dataset else 1
    if config.steps != AUTO:
        total_steps = int(config.steps)
    elif config.epochs is not None:
        total_steps = config.epochs * steps_per_epoch
    else:
        total_steps = method_cls.default_steps
    epochs = total_steps // steps_per_epoch if steps_per_epoch else 0
    scaling_info = ScalingInfo(
        dataset_size=dataset_size or 1, epochs=max(epochs, 1)
    )
    method_args.resolve_auto(scaling_info)
    method = method_cls(wrapped, method_args)

    # ---- mesh + loader ----------------------------------------------------
    from lightly_train_tpu.parallel.mesh import MeshConfig

    mesh = MeshConfig(fsdp=config.fsdp).build()
    from lightly_train_tpu.ops.pallas.attention import set_active_mesh

    set_active_mesh(mesh)
    if dataset is not None:
        loader = PretrainLoader(
            dataset,
            global_batch_size=batch_size,
            mesh=mesh,
            seed=config.seed,
            num_workers=config.num_workers,
        )
    else:
        loader = SyntheticLoader(batch_size, mesh, canonical_hw, config.seed)

    # ---- optimizer --------------------------------------------------------
    if config.optim == "auto" and not config.optim_args:
        optim_args = method.default_optimizer_args()
    else:
        optim_type = (
            config.optim
            if config.optim != "auto"
            else method.default_optimizer_args().type
        )
        if optim_type not in OPTIMIZER_ARGS_TYPES:
            raise ConfigError(
                f"Unknown optimizer '{optim_type}'. "
                f"Options: {sorted(OPTIMIZER_ARGS_TYPES)}"
            )
        defaults = method.default_optimizer_args()
        merged = {**({"lr": defaults.lr} if defaults.type == optim_type else {}),
                  **config.optim_args}
        optim_args = pydantic_model_validate(
            OPTIMIZER_ARGS_TYPES[optim_type], merged
        )

    base_lr = (
        config.learning_rate
        if config.learning_rate != AUTO
        else (optim_args.lr if optim_args.lr != AUTO else 1e-3)
    )
    lr = method.learning_rate_for(batch_size, float(base_lr))
    warmup_steps = int(config.warmup_fraction * total_steps)
    lr_schedule = cosine_warmup(lr, total_steps, warmup_steps)

    # ---- init state -------------------------------------------------------
    rng = jax.random.key(config.seed)
    sample = jnp.zeros(
        (2, config.canonical_size, config.canonical_size, 3), dtype=jnp.uint8
    )
    params, model_state, method_state = method.init(rng, sample)
    if config.checkpoint is not None:
        from lightly_train_tpu._checkpoint.checkpoint import (
            resolve_pretrained_source,
        )
        from lightly_train_tpu._commands.train_task import _merge_pretrained

        pretrained, src_name, src_embed_head = resolve_pretrained_source(
            config.checkpoint, config.model
        )
        if src_name != config.model:
            # A disjoint param tree would merge as a silent no-op; refuse
            # loudly instead of "pretraining from checkpoint" from scratch.
            raise ConfigError(
                f"checkpoint was exported for model '{src_name}' but this "
                f"run pretrains '{config.model}'. Pass model='{src_name}' "
                "or a matching checkpoint."
            )
        if config.embed_dim is not None:
            # Projected model: the artifact's bare backbone lands in the
            # "backbone" subtree; the artifact's trained projection (when
            # its width matches) continues too, else it re-initializes.
            student = dict(params["student"])
            student["backbone"] = _merge_pretrained(
                student["backbone"], pretrained["params"]
            )
            if src_embed_head is not None:
                head = src_embed_head["params"]["embed"]
                if head["kernel"].shape == student["embed"]["kernel"].shape:
                    student["embed"] = head
                else:
                    logger.warning(
                        "Checkpoint embed head %s does not match embed_dim="
                        "%d; the projection re-initializes.",
                        head["kernel"].shape, config.embed_dim,
                    )
            params = {**params, "student": student}
            for k, v in pretrained.items():
                if k != "params" and k in model_state:
                    model_state[k] = _merge_pretrained(
                        model_state[k], {"backbone": v}
                    )
        else:
            params = {
                **params,
                "student": _merge_pretrained(
                    params["student"], pretrained["params"]
                ),
            }
            for k, v in pretrained.items():
                if k != "params":
                    model_state[k] = (
                        _merge_pretrained(model_state[k], v)
                        if k in model_state
                        else v
                    )
        # EMA-teacher methods snapshot the student at init; refresh the
        # snapshot so the teacher starts from the loaded weights too (the
        # reference loads weights before its teacher conversion).
        if (
            isinstance(method_state, dict)
            and isinstance(method_state.get("teacher"), dict)
            and "student" in method_state["teacher"]
        ):
            method_state = {
                **method_state,
                "teacher": {
                    **method_state["teacher"],
                    "student": jax.tree_util.tree_map(
                        jnp.copy, params["student"]
                    ),
                },
            }
        logger.info(
            "Initialized student weights from checkpoint '%s'",
            config.checkpoint,
        )
    optimizer = build_optimizer(
        optim_args,
        lr_schedule,
        params,
        grad_clip_norm=method.grad_clip_norm(),
        lr_scales=method.lr_scales(params),
        weight_decay_schedule=method.weight_decay_schedule(total_steps),
        wd_mask=method.wd_mask(params),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        method_state=method_state,
    )
    # Place state on the mesh (replicated for DP; large leaves sharded
    # over the fsdp axis when enabled); batches arrive batch-axis-sharded.
    from lightly_train_tpu.parallel.mesh import shard_train_state

    state = shard_train_state(state, mesh)

    # ---- checkpointing + logging ------------------------------------------
    ckpt_mgr = CheckpointManager(out_dir / "checkpoints")
    if config.resume_interrupted and ckpt_mgr.latest_step() is not None:
        state = ckpt_mgr.restore(state)
        state = shard_train_state(state, mesh)
        # Continue the same shuffled stream (skip the consumed batches).
        if hasattr(loader, "start_step"):
            loader.start_step = int(state.step)
        logger.info("Resumed from step %d", int(state.step))

    jsonl = build_loggers(out_dir, config.loggers)
    jsonl.log_hyperparams(
        {
            **config.dump(),
            "resolved_batch_size": batch_size,
            "resolved_steps": total_steps,
            "resolved_lr": lr,
            "method_args": method_args.dump(),
            "optim_args": optim_args.dump(),
            "devices": jax.device_count(),
        }
    )

    checkpoint_every = (
        config.checkpoint_every
        if config.checkpoint_every != AUTO
        else max(total_steps // 10, 1)
    )

    def on_log(step: int, metrics: Dict[str, float]) -> None:
        jsonl.log_metrics(metrics, step)
        logger.info(
            "step %d/%d loss=%.4f img/s=%.1f",
            step,
            total_steps,
            metrics.get("train_loss", float("nan")),
            metrics.get("profiling/images_per_sec", 0.0),
        )

    def _export_student(step: int, student_params: Any, model_state: Any) -> None:
        extra: Dict[str, Any] = {"method": config.method, "steps": step}
        embed_head = None
        if config.embed_dim is not None:
            # Split the projected model back into the bare-backbone artifact
            # (fine-tune compatible) + the embedding head sidecar.
            embed_head = {"params": {"embed": student_params["embed"]}}
            student_params = student_params["backbone"]
            model_state = {
                coll: sub.get("backbone", sub)
                for coll, sub in (model_state or {}).items()
            }
            extra["embed_dim"] = config.embed_dim
        export_model(
            out_dir / "exported_models" / "exported_last",
            config.model,
            student_params,
            model_state=model_state or None,
            extra_meta=extra,
            embed_head=embed_head,
        )

    def on_checkpoint(step: int, s: TrainState) -> None:
        host_state = jax.device_get(s)
        ckpt_mgr.save(step, host_state)
        # Refresh the user-facing artifact alongside every periodic
        # checkpoint so a usable backbone exists mid-run (the reference's
        # ModelExport callback rewrites exported_last.pt every n epochs,
        # _callbacks/export.py:28-60).
        if is_main_process():
            _export_student(step, host_state.params["student"], host_state.model_state)

    # ---- train ------------------------------------------------------------
    from lightly_train_tpu._optim.fused_update import build_fused_updater

    fused_updater = build_fused_updater(
        method, optim_args, lr_schedule, params, total_steps
    )
    train_step = make_train_step(
        method, optimizer, total_steps, aug_dtype=dtype,
        grad_accum_steps=config.grad_accum_steps,
        transform_args=config.transform_args or None,
        fused_updater=fused_updater,
    )
    if fused_updater is not None:
        logger.info("Fused AdamW+EMA update enabled (%s)", fused_updater.mode)
    logger.info(
        "Starting pretraining: model=%s method=%s steps=%d batch=%d lr=%.2e",
        config.model, config.method, total_steps, batch_size, lr,
    )
    def on_first_batch(batch: Any) -> None:
        # Augmentation grid at step 0 (``method.py:169-191``).
        if not (config.log_augmentations and is_main_process()):
            return
        from lightly_train_tpu._visualize.grids import save_augmentation_grid
        from lightly_train_tpu.ops.augment import (
            augment_view,
            override_view_specs,
        )

        images = batch["images"] if isinstance(batch, dict) else batch
        views = []
        key = jax.random.key(config.seed + 1)
        for spec in override_view_specs(
            method.view_specs(), config.transform_args or None
        ):
            views.append(
                np.asarray(
                    augment_view(key, images[:8], spec.config, jnp.float32)
                )
            )
        save_augmentation_grid(views, out_dir / "augmentations.png")

    state = fit(
        train_step,
        state,
        loader,
        total_steps=total_steps,
        seed=config.seed,
        log_every=config.log_every,
        on_log=on_log,
        on_checkpoint=on_checkpoint,
        checkpoint_every=checkpoint_every,
        nan_guard=NaNGuard(out_dir, enabled=config.nan_check),
        on_first_batch=on_first_batch,
        profile_dir=str(out_dir / "profile") if config.profile else None,
        profile_start=config.profile_start,
        profile_steps=config.profile_steps,
    )
    ckpt_mgr.wait()
    ckpt_mgr.close()

    # ---- export -----------------------------------------------------------
    if is_main_process():
        _export_student(
            int(state.step),
            jax.device_get(state.params)["student"],
            jax.device_get(state.model_state),
        )
    jsonl.close()
    return state
