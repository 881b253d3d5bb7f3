"""Per-op self-time profile of a training step (xprof hlo_stats).

Traces N jitted steps with jax.profiler, converts the xspace to the
hlo_stats tool table, and writes a category + top-op breakdown. This is
the workflow behind docs/eomt_step_profile_r5.txt and
docs/pretrain_step_profile_r5.txt (docs/performance.md "Profiling").

Usage (real TPU):  python docs/generate_step_profile.py pretrain|eomt
"""
from __future__ import annotations

import csv
import glob
import io
import json
import sys
import tempfile
from collections import defaultdict


def profile_step(run_steps, out_txt: str, header: str, n_steps: int = 2):
    """run_steps(n) executes n already-compiled steps (readback-synced)."""
    import jax

    trace_dir = tempfile.mkdtemp(prefix="xprof_")
    jax.profiler.start_trace(trace_dir)
    run_steps(n_steps)
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data

    xspace = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(xspace, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))

    def fld(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] != "":
                return r[n]
        return default

    by_cat = defaultdict(float)
    ops = []
    total = 0.0
    for r in rows:
        t = float(fld(r, "total_self_time_in_us", "Total self time (us)",
                      default=0.0)) / 1e6
        cat = fld(r, "hlo_category", "HLO category", default="?")
        name = fld(r, "hlo_op_expression", "HLO op", default="?")
        occ = fld(r, "occurrences", "#Occurrences", default="")
        bound = fld(r, "bound_by", "Bound by", default="")
        total += t
        by_cat[cat] += t
        ops.append((t, occ, cat, str(name)[:90], bound))
    ops.sort(reverse=True)

    with open(out_txt, "w") as f:
        f.write(header + "\n\n")
        f.write(f"total self time {total:.3f} s "
                f"({n_steps} steps -> {total / n_steps:.3f} s/step)\n\n")
        f.write("by category (s/step):\n")
        for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            f.write(f"    {t / n_steps:7.4f}  {cat}\n")
        f.write("\ntop 25 ops (s/step):\n")
        for t, occ, cat, name, bound in ops[:25]:
            f.write(f"    {t / n_steps:7.4f}  x{occ:>4}  [{cat}]  {name}"
                    f"  bound={bound}\n")
    print(f"wrote {out_txt}")
    return {k: v / n_steps for k, v in by_cat.items()}


def _pretrain():
    """The bench's exact pretrain step (DINOv2 ViT-B/14 batch 32,
    mirroring bench.py main())."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu._optim import build_optimizer, cosine_warmup
    from lightly_train_tpu._optim.fused_update import build_fused_updater
    from lightly_train_tpu.ops.pallas.attention import set_active_mesh
    from lightly_train_tpu.parallel.mesh import (
        MeshConfig, batch_sharding, shard_train_state,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    batch, canonical = (32, 256) if on_tpu else (4, 64)
    model_name = "dinov2/vitb14" if on_tpu else "dinov2/vittest14"
    args = DINOv2Args() if on_tpu else DINOv2Args(
        output_dim=64, hidden_dim=32, bottleneck_dim=16,
        local_view_count=2, global_image_size=28, local_image_size=14,
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
        step=jnp.zeros((), jnp.int32), params=params,
        model_state=model_state, opt_state=optimizer.init(params),
        method_state=method_state,
    )
    fused_updater = build_fused_updater(
        method, method.default_optimizer_args(),
        cosine_warmup(1e-3, total_steps, 10_000), params, total_steps,
    )
    train_step = make_train_step(
        method, optimizer, total_steps, aug_dtype=jnp.bfloat16,
        fused_updater=fused_updater,
    )
    mesh = MeshConfig().build()
    set_active_mesh(mesh)
    state = shard_train_state(state, mesh)
    imgs = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(
            0, 256, size=(batch, canonical, canonical, 3), dtype=np.uint8
        )),
        batch_sharding(mesh),
    )
    key = jax.random.key(1)
    state, metrics = train_step(state, imgs, key)
    float(metrics["train_loss"])

    def run(n):
        nonlocal state
        m = None
        for _ in range(n):
            state, m = train_step(state, imgs, key)
        float(m["train_loss"])

    cats = profile_step(
        run, "docs/pretrain_step_profile_r5.txt",
        "DINOv2 ViT-B/14 batch-32 pretrain step - per-op self-time profile\n"
        "(TPU v5e, jax.profiler trace -> xprof hlo_stats; round 5)",
    )
    print(json.dumps(cats, indent=2))


def _finetune(which: str):
    """The bench's exact fine-tune step (EoMT ViT-S/512 b8 or LT-DETRv2-S
    640 b16), mirroring bench.bench_finetune()."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._optim import build_optimizer

    os.environ["LIGHTLY_TRAIN_MATCHER"] = "greedy"
    on_tpu = jax.devices()[0].platform == "tpu"
    r = np.random.default_rng(0)
    if which == "eomt":
        from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
            EoMTSemanticSegmentationArgs,
            EoMTSemanticSegmentationTrainModel,
        )

        size, b = (512, 8) if on_tpu else (64, 2)
        ncls = 150 if on_tpu else 4
        wrapped = get_wrapped_model(
            "dinov3/vits16" if on_tpu else "dinov3/vittest16",
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        m = EoMTSemanticSegmentationTrainModel(
            wrapped, EoMTSemanticSegmentationArgs(num_classes=ncls)
        )
        per_img = min(12, ncls)
        masks_np = np.empty((b, size, size), np.int32)
        for i in range(b):
            ids = r.choice(ncls, size=per_img, replace=False)
            coarse = r.integers(0, per_img, (8, 8))
            rep = size // 8
            masks_np[i] = ids[np.repeat(np.repeat(coarse, rep, 0), rep, 1)]
        batch = {
            "images": jnp.asarray(r.random((b, size, size, 3),
                                           dtype=np.float32)),
            "masks": jnp.asarray(masks_np, jnp.int32),
        }
    else:
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
            wrapped, ObjectDetectionArgs(num_classes=80 if on_tpu else 4)
        )
        K = 24
        cw = r.random((b, K, 2), dtype=np.float32) * 0.4 + 0.05
        wh = r.random((b, K, 2), dtype=np.float32) * 0.2 + 0.02
        batch = {
            "images": jnp.asarray(r.random((b, size, size, 3),
                                           dtype=np.float32)),
            "boxes": jnp.asarray(np.concatenate([cw + wh / 2, wh], -1)),
            "labels": jnp.asarray(r.integers(0, 80 if on_tpu else 4, (b, K)),
                                  jnp.int32),
            "box_valid": jnp.asarray(r.random((b, K)) < 0.5),
        }
    m.total_steps = 60_000
    rng = jax.random.key(0)
    sample = jax.tree_util.tree_map(lambda x: x[:2], batch)
    params, model_state = m.init(rng, sample)
    optimizer = build_optimizer(
        m.default_optimizer_args(), m.lr_schedule(1e-4, 60_000), params,
        grad_clip_norm=m.grad_clip_norm(), lr_scales=m.lr_scales(params),
        schedule_groups=m.lr_schedule_groups(1e-4, 60_000, params),
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, model_state, bt, key):
        (loss, (ms, _)), grads = jax.value_and_grad(
            lambda p: m.loss_fn(p, model_state, bt, key,
                                jnp.zeros((), jnp.int32)),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, ms, loss

    params, opt_state, model_state, loss = step(
        params, opt_state, model_state, batch, rng
    )
    float(loss)

    def run(n):
        nonlocal params, opt_state, model_state
        loss = None
        for _ in range(n):
            params, opt_state, model_state, loss = step(
                params, opt_state, model_state, batch, rng
            )
        float(loss)

    label = ("EoMT ViT-S/16 512^2 batch-8" if which == "eomt"
             else "LT-DETRv2-S (ECViT-T) 640^2 batch-16")
    cats = profile_step(
        run, f"docs/{which}_step_profile_r5.txt",
        f"{label} train step - per-op self-time profile\n"
        "(TPU v5e, jax.profiler trace -> xprof hlo_stats; round 5)",
    )
    print(json.dumps(cats, indent=2))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "pretrain"
    if which == "pretrain":
        _pretrain()
    elif which in ("eomt", "ltdetr"):
        _finetune(which)
    else:
        raise SystemExit(f"unknown target {which}")
