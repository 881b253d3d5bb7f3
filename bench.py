#!/usr/bin/env python
"""Benchmark: DINOv2 ViT-B/14 multi-crop pretraining throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is images/sec/chip for the full fused train step (on-device
multi-crop augmentation + EMA teacher + DINO/iBOT/KoLeo losses + AdamW),
matching BASELINE.json's north star. ``vs_baseline`` reports measured MFU
relative to the 45%-MFU target (BASELINE.json; the reference publishes no
throughput numbers, SURVEY.md §6).
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

_START = time.monotonic()
# Total wall budget for the WHOLE bench. Optional sections (host pipeline,
# fine-tune rows) are skipped once the budget runs low so the mandatory
# JSON line always prints inside the driver's timeout.
_TOTAL_BUDGET = float(os.environ.get("LIGHTLY_BENCH_TOTAL_BUDGET", "2100"))
# Set once the mandatory pretrain measurement exists; a SIGTERM after that
# point prints the partial result instead of dying silently.
_RESULT = None


def _budget_left() -> float:
    return _TOTAL_BUDGET - (time.monotonic() - _START)


def _phase(msg: str) -> None:
    print(f"# [{time.monotonic() - _START:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)


def _on_term(signum, frame):
    if _RESULT is not None:
        _phase("SIGTERM — emitting partial result")
        _emit(_RESULT)
        sys.stdout.flush()
        os._exit(0)
    os._exit(143)


signal.signal(signal.SIGTERM, _on_term)


# Rough peak bf16 FLOP/s per chip by device kind.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
    "cpu": 1e11,
}

# Peak HBM bandwidth per chip (bytes/s) for the roofline residual.
_PEAK_HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v5": 2765e9,
    "TPU v6e": 1640e9,
    "TPU v6 lite": 1640e9,
    "cpu": 50e9,
}


def _lookup(table, device, default):
    kind = getattr(device, "device_kind", "cpu")
    for k, v in table.items():
        if k.lower() in str(kind).lower():
            return v
    return default


def peak_flops(device) -> float:
    return _lookup(_PEAK_FLOPS, device, 275e12)


def peak_hbm_bw(device) -> float:
    return _lookup(_PEAK_HBM_BW, device, 1228e9)


def _bench_task_step(train_model, batch, n_iters, n_windows, label):
    """Time a jitted fine-tune train step (loss + grads + optimizer) and
    report img/s/chip + MFU, mirroring the pretrain methodology."""
    import optax

    from lightly_train_tpu._optim import build_optimizer

    total_steps = 60_000
    rng = jax.random.key(0)
    sample = jax.tree_util.tree_map(lambda x: x[:2], batch)
    params, model_state = train_model.init(rng, sample)
    base_lr = 1e-4
    optimizer = build_optimizer(
        train_model.default_optimizer_args(),
        train_model.lr_schedule(base_lr, total_steps),
        params,
        grad_clip_norm=train_model.grad_clip_norm(),
        lr_scales=train_model.lr_scales(params),
        schedule_groups=train_model.lr_schedule_groups(
            base_lr, total_steps, params
        ),
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, model_state, b, key):
        (loss, (ms, _)), grads = jax.value_and_grad(
            lambda p: train_model.loss_fn(
                p, model_state, b, key, jnp.zeros((), jnp.int32)
            ),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, ms, loss

    flops = 0.0
    try:
        cost = step.lower(
            params, opt_state, model_state, batch, rng
        ).compile().cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    params, opt_state, model_state, loss = step(
        params, opt_state, model_state, batch, rng
    )
    float(loss)
    times = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_state, model_state, loss = step(
                params, opt_state, model_state, batch,
                jax.random.fold_in(rng, i),
            )
        # Force a device->host VALUE readback: through the axon relay,
        # block_until_ready can acknowledge before execution finishes
        # (measured 3.3 ms "steps" at MFU 3.8 — physically impossible);
        # fetching the scalar is the only trustworthy sync.
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_iters
    n_chips = jax.device_count()
    b = batch["images"].shape[0]
    return {
        "label": label,
        "img_s_chip": round(b / dt / n_chips, 2),
        "step_time_s": round(dt, 4),
        "mfu": round(flops / dt / (peak_flops(jax.devices()[0]) * n_chips), 4),
        "batch": b,
    }


def bench_finetune(on_tpu: bool) -> dict:
    """Training-step benches for the fine-tune runtimes (VERDICT r3 #2):
    EoMT semantic segmentation (ViT-S/16 at 512^2) and LT-DETRv2-S detection
    (ECViT-T at 640^2). The axon relay does not support host callbacks, so
    the Hungarian matcher runs its device-native greedy variant here
    (LIGHTLY_TRAIN_MATCHER=greedy); a real TPU VM supports the host LSA."""
    import numpy as np

    import contextlib
    import signal

    @contextlib.contextmanager
    def _deadline(seconds):
        """Hard per-row timeout: a hung remote compile must not cost the
        whole bench output."""

        def _raise(signum, frame):
            raise TimeoutError(f"bench row exceeded {seconds}s")

        old = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(seconds)
        try:
            yield
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    env_budget = int(os.environ.get("LIGHTLY_BENCH_FINETUNE_TIMEOUT", "1500"))

    def row_deadline() -> int:
        # A row may use at most the env budget AND what is left of the
        # global bench budget (minus a margin to emit the JSON line).
        return max(1, min(env_budget, int(_budget_left() - 45)))

    rows = {}
    os.environ["LIGHTLY_TRAIN_MATCHER"] = "greedy"
    try:
        from lightly_train_tpu.models.package_registry import (
            get_wrapped_model,
        )
        from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
            EoMTSemanticSegmentationArgs,
            EoMTSemanticSegmentationTrainModel,
        )

        size, b = (512, 8) if on_tpu else (64, 2)
        wrapped = get_wrapped_model(
            "dinov3/vits16" if on_tpu else "dinov3/vittest16",
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        m = EoMTSemanticSegmentationTrainModel(
            wrapped,
            EoMTSemanticSegmentationArgs(
                num_classes=150 if on_tpu else 4,
            ),
        )
        m.total_steps = 60_000
        r = np.random.default_rng(0)
        # Region-structured masks with ~12 classes per image (real ADE20K
        # images average ~10 present classes; per-pixel-random masks would
        # put all 150 in every image — a workload the reference, which
        # builds targets only for PRESENT classes, never sees either).
        ncls = 150 if on_tpu else 4
        per_img = min(12, ncls)
        masks_np = np.empty((b, size, size), np.int32)
        for i in range(b):
            ids = r.choice(ncls, size=per_img, replace=False)
            coarse = r.integers(0, per_img, (8, 8))
            rep = size // 8
            masks_np[i] = ids[np.repeat(np.repeat(coarse, rep, 0), rep, 1)]
        batch = {
            "images": jnp.asarray(
                r.random((b, size, size, 3), dtype=np.float32)
            ),
            "masks": jnp.asarray(masks_np, jnp.int32),
        }
        with _deadline(row_deadline()):
            rows["eomt_vits16_semseg"] = _bench_task_step(
                m, batch, 8 if on_tpu else 2, 3 if on_tpu else 1,
                f"EoMT ViT-S/16 {size}^2 train step",
            )
    except Exception as e:
        print(f"# eomt bench unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        from lightly_train_tpu.models.package_registry import (
            get_wrapped_model,
        )
        from lightly_train_tpu.tasks.detection.ltdetr import (
            ObjectDetectionArgs,
            ObjectDetectionTrainModel,
        )

        size, b = (640, 16) if on_tpu else (64, 2)
        wrapped = get_wrapped_model(
            "ecvit/ecvitt" if on_tpu else "ecvit/ecvittest",
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        m = ObjectDetectionTrainModel(
            wrapped,
            ObjectDetectionArgs(num_classes=80 if on_tpu else 4),
        )
        m.total_steps = 60_000
        r = np.random.default_rng(0)
        K = 24
        cw = r.random((b, K, 2), dtype=np.float32) * 0.4 + 0.05
        wh = r.random((b, K, 2), dtype=np.float32) * 0.2 + 0.02
        batch = {
            "images": jnp.asarray(
                r.random((b, size, size, 3), dtype=np.float32)
            ),
            "boxes": jnp.asarray(
                np.concatenate([cw + wh / 2, wh], axis=-1), jnp.float32
            ),
            "labels": jnp.asarray(
                r.integers(0, 80 if on_tpu else 4, (b, K)), jnp.int32
            ),
            "box_valid": jnp.asarray(
                r.random((b, K)) < 0.5
            ),
        }
        with _deadline(row_deadline()):
            rows["ltdetrv2_s_det"] = _bench_task_step(
                m, batch, 8 if on_tpu else 2, 3 if on_tpu else 1,
                f"LT-DETRv2-S (ECViT-T) {size}^2 train step",
            )
    except Exception as e:
        print(f"# ltdetr bench unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
    os.environ.pop("LIGHTLY_TRAIN_MATCHER", None)
    return rows


def main() -> None:
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu._optim import build_optimizer, cosine_warmup

    on_tpu = jax.devices()[0].platform == "tpu"
    # Batch must split over the data axis; round the smoke batch up to the
    # device count (multi-chip TPU hosts scale the global batch likewise).
    n_dev = jax.device_count()
    batch = max(32 if on_tpu else 4, n_dev)
    batch = -(-batch // n_dev) * n_dev
    canonical = 256 if on_tpu else 64
    model_name = "dinov2/vitb14" if on_tpu else "dinov2/vittest14"
    args = (
        DINOv2Args()
        if on_tpu
        else DINOv2Args(
            output_dim=64, hidden_dim=32, bottleneck_dim=16,
            local_view_count=2, global_image_size=28, local_image_size=14,
        )
    )

    wrapped = get_wrapped_model(model_name, dtype=jnp.bfloat16)
    method = DINOv2(wrapped, args)
    total_steps = 125_000

    rng = jax.random.key(0)
    sample = jnp.zeros((2, canonical, canonical, 3), dtype=jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    optimizer = build_optimizer(
        method.default_optimizer_args(),
        cosine_warmup(1e-3, total_steps, 10_000),
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
    from lightly_train_tpu._optim.fused_update import build_fused_updater

    fused_updater = build_fused_updater(
        method, method.default_optimizer_args(),
        cosine_warmup(1e-3, total_steps, 10_000), params, total_steps,
    )
    train_step = make_train_step(
        method, optimizer, total_steps, aug_dtype=jnp.bfloat16,
        fused_updater=fused_updater,
    )

    # Shard exactly like the training runtime (train.py): state replicated
    # (+fsdp axis when configured), batch over the data axis. On one chip
    # this is identity; on a multi-chip host the step actually uses every
    # chip, matching the per-chip normalization below.
    from lightly_train_tpu.ops.pallas.attention import set_active_mesh
    from lightly_train_tpu.parallel.mesh import (
        MeshConfig, batch_sharding, shard_train_state,
    )

    mesh = MeshConfig().build()
    set_active_mesh(mesh)
    state = shard_train_state(state, mesh)

    imgs = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).integers(
                0, 256, size=(batch, canonical, canonical, 3), dtype=np.uint8
            )
        ),
        batch_sharding(mesh),
    )
    key = jax.random.key(1)

    # FLOPs of the compiled step for MFU — lower the SAME donated jit before
    # the first call (a separate non-donated lowering needs two copies of the
    # train state and OOMs at batch >= 64).
    flops = 0.0
    bytes_accessed = 0.0
    try:
        cost = train_step.lower(state, imgs, key).compile().cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0))
            bytes_accessed = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass

    # Compile (cached from the lowering above) + warmup.
    state, metrics = train_step(state, imgs, key)
    float(metrics["train_loss"])

    # Secondary metric: augmentation-stage throughput (BASELINE "aug GB/s").
    aug_gbps = 0.0
    try:
        from lightly_train_tpu.ops.augment import ViewAugmentConfig, augment_view

        cfg = (
            ViewAugmentConfig(out_size=(224, 224))
            if on_tpu
            else ViewAugmentConfig(out_size=(28, 28))
        )
        aug_fn = jax.jit(
            lambda k, x: jnp.sum(augment_view(k, x, cfg, jnp.bfloat16))
        )
        out = aug_fn(key, imgs)
        float(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = aug_fn(key, imgs)
        float(out)  # scalar readback sync (relay-safe)
        aug_dt = (time.perf_counter() - t0) / 20
        aug_gbps = imgs.size / aug_dt / 1e9
    except Exception:
        pass

    # Best-of-N windows: the timing environment (shared chip / relay) is
    # noisy; the fastest window is the closest to the hardware's
    # capability. Runs BEFORE any host-loader work so decode threads
    # never contend with the windows.
    n_iters = 10 if on_tpu else 3
    n_windows = 5 if on_tpu else 1
    _phase("pretrain timing windows")
    window_times = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = train_step(state, imgs, key)
        # Scalar readback, not block_until_ready: the axon relay can ack
        # before execution completes (see _bench_task_step).
        float(metrics["train_loss"])
        window_times.append(time.perf_counter() - t0)
    dt = min(window_times)

    # ---- mandatory metric is now measurable: register the partial result
    # so a SIGTERM during the optional sections still emits a JSON line.
    global _RESULT
    imgs_per_sec = batch * n_iters / dt
    n_chips = jax.device_count()
    imgs_per_sec_chip = imgs_per_sec / n_chips
    mfu = (flops * n_iters / dt) / (peak_flops(jax.devices()[0]) * n_chips)
    step_time = dt / n_iters
    flop_time = flops / peak_flops(jax.devices()[0])
    hbm_time = bytes_accessed / peak_hbm_bw(jax.devices()[0])
    mfu_ceiling = (
        flop_time / max(flop_time, hbm_time) if flop_time > 0 else 0.0
    )
    roofline = {
        "bytes_accessed_gb": round(bytes_accessed / 1e9, 2),
        "flop_time_ms": round(flop_time * 1e3, 2),
        "hbm_time_ms": round(hbm_time * 1e3, 2),
        "mfu_ceiling": round(mfu_ceiling, 4),
        "unexplained_ms": round(
            (step_time - max(flop_time, hbm_time)) * 1e3, 2
        ),
    }
    _RESULT = {
        "metric": "dinov2_vitb14_pretrain_images_per_sec_per_chip",
        "value": round(imgs_per_sec_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(mfu / 0.45, 4),
        "detail": {
            "model": model_name,
            "batch": batch,
            "mfu": round(mfu, 4),
            "step_time_s": round(dt / n_iters, 4),
            "aug_gbps": round(aug_gbps, 2),
            "host_img_s": 0.0,
            "sustained_img_s": 0.0,
            "device": str(getattr(jax.devices()[0], "device_kind", "?")),
            "n_chips": n_chips,
            # r5: every window ends in a scalar readback; block_until_ready
            # acks early through the axon relay and flattered r3/r4 numbers
            # by ~15-20% (and reported impossible sub-ms fine-tune steps).
            "timing": "scalar-readback-synced",
            "overlap_efficiency": 0.0,
            "roofline": roofline,
            "finetune": {},
        },
    }
    _phase(f"pretrain row done: {imgs_per_sec_chip:.1f} img/s/chip, "
           f"mfu {mfu:.4f}")

    # Host input pipeline: decode->collate img/s from disk (real JPEGs via
    # the persistent-pool PretrainLoader), proving the host feeds the device
    # rate (SURVEY §7 "host pipeline feeding >=45% MFU"). sustained_img_s
    # additionally times the REAL end-to-end loop: loader-fed batches
    # through the fused train step. CAVEAT: in this dev environment the
    # device sits behind a network relay, so per-step host->device batch
    # transfers measure TUNNEL bandwidth, not the PCIe DMA of a TPU VM —
    # on real hardware sustained ~= min(host_img_s, device rate).
    host_img_s = 0.0
    sustained_img_s = 0.0
    try:
        if _budget_left() < 240:
            raise TimeoutError(
                f"budget low ({_budget_left():.0f}s left), skipping"
            )
        _phase("host pipeline / sustained section")
        import tempfile

        from PIL import Image

        from lightly_train_tpu._data import (
            ImageDataset,
            MemoryMappedSequence,
            PretrainLoader,
            list_image_files,
            write_items_to_file,
        )
        from lightly_train_tpu.parallel.mesh import MeshConfig

        with tempfile.TemporaryDirectory() as tmp:
            rng_h = np.random.default_rng(0)
            n_files = 256 if on_tpu else 32
            for i in range(n_files):
                Image.fromarray(
                    rng_h.integers(0, 256, (480, 640, 3), dtype=np.uint8)
                ).save(f"{tmp}/{i}.jpg", quality=90)
            flist = f"{tmp}/files.arrow"
            write_items_to_file(list_image_files(tmp), flist)
            ds = ImageDataset(
                MemoryMappedSequence(flist), (canonical, canonical)
            )
            loader = iter(PretrainLoader(
                ds, global_batch_size=batch,
                mesh=mesh, num_workers=8,
            ))
            next(loader)  # warm the pool
            t0 = time.perf_counter()
            n_batches = 12
            for _ in range(n_batches):
                jax.block_until_ready(next(loader))
            host_img_s = batch * n_batches / (time.perf_counter() - t0)

            # End-to-end sustained rate: loader-fed fused train steps.
            n_sustained = 8 if on_tpu else 3
            state, metrics = train_step(state, next(loader), key)
            float(metrics["train_loss"])
            t0 = time.perf_counter()
            for _ in range(n_sustained):
                state, metrics = train_step(state, next(loader), key)
            float(metrics["train_loss"])
            sustained_img_s = (
                batch * n_sustained / (time.perf_counter() - t0)
            )
    except Exception as e:
        # Never hide a broken end-to-end path behind a silent 0.0.
        print(f"# sustained/host pipeline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Host->device overlap proof (VERDICT r3 weak #3): with the loader's
    # producer-side device_put, sustained ~= min(host rate, device rate).
    overlap_efficiency = 0.0
    if sustained_img_s > 0 and host_img_s > 0:
        overlap_efficiency = round(
            sustained_img_s / min(host_img_s, imgs_per_sec), 4
        )
    _RESULT["detail"]["host_img_s"] = round(host_img_s, 1)
    _RESULT["detail"]["sustained_img_s"] = round(sustained_img_s, 1)
    _RESULT["detail"]["overlap_efficiency"] = overlap_efficiency
    _RESULT["detail"]["aug_gbps"] = round(aug_gbps, 2)

    # Free the pretrain train state + batch BEFORE the fine-tune rows: the
    # ViT-B state (params+EMA teacher+opt moments, ~3 GB) plus the LT-DETR
    # step's 14.7 GB temp does not fit a 16 GB v5e — this is exactly the
    # RESOURCE_EXHAUSTED the r4 ltdetr row died of.
    del state, imgs
    import gc

    gc.collect()

    # Fine-tune training-step rows (EoMT + LT-DETR); opt out with
    # LIGHTLY_BENCH_FINETUNE=0 if the round driver's budget is tight.
    if os.environ.get("LIGHTLY_BENCH_FINETUNE", "1") != "0":
        if _budget_left() < 300:
            _phase(f"budget low ({_budget_left():.0f}s), skipping fine-tune rows")
        else:
            _phase("fine-tune rows")
            _RESULT["detail"]["finetune"] = bench_finetune(on_tpu)

    _phase("done")
    _emit(_RESULT)


if __name__ == "__main__":
    main()
