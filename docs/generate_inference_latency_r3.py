#!/usr/bin/env python
"""Inference latency of flagship task models on real TPU vs the reference's
published T4 numbers.

The reference's headline benchmarks (BASELINE.md) are per-model inference
latencies measured with TensorRT fp16 on an NVIDIA T4 at batch 1. This script
times the TPU rebuild's jitted ``predict`` paths for the same model/input
combinations on whatever accelerator is attached (bf16 compute — the TPU
analog of the fp16 TensorRT engines), and additionally reports batched
throughput for two flagship configs (TPUs are throughput machines; batch-1
latency is the reference's metric, not the serving optimum).

Methodology notes recorded in the artifact:
- weights are random-init (latency does not depend on weight values);
- timing is device-only: inputs staged once, ``block_until_ready`` fences;
- detection runs the deploy-fused model (``convert_to_deploy``, the analog
  of the reference exporting RepVgg-fused graphs to TensorRT);
- depth times the jitted forward (sky-fill postprocess is host-side numpy
  in both frameworks and excluded).

Run: python docs/generate_inference_latency_r3.py            (real TPU)
Env: LT_LAT_CONFIGS=comma,separated,names to select a subset.
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).parent / "inference_latency_r3.json"
WARMUP = 5
ITERS = 20   # chained calls per timing window
WINDOWS = 5


def _profile_device_ms(fn, variables, images, iters=12):
    """Per-call DEVICE execution time from a ``jax.profiler`` trace.

    Wall-clock timing through the TPU relay is unreliable at ms scale
    (round-trip noise and value-memoization artifacts produced run-to-run
    swings of 1.5-4x on identical programs — measured while building this
    artifact). The profile is ground truth: capture ITERS executions with
    distinct inputs, parse the xplane with xprof's ``framework_op_stats``,
    and sum per-op device self-time / ITERS. This is the TPU-side analog
    of the reference's TensorRT engine execution time (BASELINE.md's T4
    numbers are engine latency, not host round-trips).
    """
    import glob
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    tmp = tempfile.mkdtemp(prefix="lat_prof_")
    try:
        jax.profiler.start_trace(tmp)
        outs = []
        for i in range(iters):
            x = images + jnp.asarray((i + 1) * 1e-6, images.dtype)
            outs.append(fn(variables, x))
        jax.block_until_ready(outs)
        jax.profiler.stop_trace()
        xs = glob.glob(tmp + "/**/*.xplane.pb", recursive=True)
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
        s = data.decode() if isinstance(data, bytes) else data
        j = json.loads(s)
        tbl = j[0] if isinstance(j, list) else j
        cols = [c["label"] for c in tbl["cols"]]
        # Device-side total self time column (us); exclude host ops.
        t_idx = next(
            i for i, c in enumerate(cols)
            if "self" in c.lower() and "time" in c.lower()
            and "%" not in c and "avg" not in c.lower()
        )
        host_idx = next(
            (i for i, c in enumerate(cols) if c.lower() in
             ("host/device", "host or device", "device type")), None
        )
        total_us = 0.0
        for row in tbl["rows"]:
            cells = row["c"]
            if host_idx is not None:
                hd = str(cells[host_idx]["v"]).lower()
                if "host" in hd:
                    continue
            v = cells[t_idx]["v"]
            if v is not None:
                total_us += float(v)
        return {"device_ms_per_call": total_us / 1000.0 / iters,
                "profiled_calls": iters,
                "self_time_column": cols[t_idx]}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _time_fn(fn, variables, images):
    """Wall-window latency (secondary) + profile device time (primary).

    Window methodology: each window chains ITERS calls through a data
    dependency (the next input adds a zero derived from the previous
    output, so the device must execute them serially) and the window wall
    time / ITERS is the per-call latency; best-of-WINDOWS discards relay
    noise. Every chained input also adds a distinct tiny constant so no
    two calls in the run see bitwise-identical inputs (repeated identical
    executions through the relay return in round-trip time, not execution
    time). Even so, relay wall times at ms scale swing run-to-run; the
    profile-derived ``device_ms_per_call`` from ``_profile_device_ms`` is
    the headline number.
    """
    import jax
    import jax.numpy as jnp

    def feedback(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return (leaf.ravel()[0] * 0).astype(images.dtype)

    out = None
    for _ in range(WARMUP):
        out = fn(variables, images)
    jax.block_until_ready(out)
    # Throwaway chained call: compiles the tiny feedback/add programs so
    # the first timed window doesn't absorb their relay compile time.
    x = images + jnp.asarray(1e-6, images.dtype) + feedback(out)
    jax.block_until_ready(fn(variables, x))
    times = []
    step = 0
    for _ in range(WINDOWS):
        x = images
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(variables, x)
            step += 1
            x = (
                images
                + jnp.asarray(step * 1e-6, images.dtype)
                + feedback(out)
            )
        jax.block_until_ready((out, x))
        times.append((time.perf_counter() - t0) * 1000 / ITERS)
    res = {
        "mean": statistics.mean(times),
        "median": statistics.median(times),
        "best_window": min(times),
        "windows_ms_per_call": [round(t, 3) for t in times],
    }
    try:
        res.update(_profile_device_ms(fn, variables, images))
    except Exception as e:  # profile tooling absent (e.g. CPU smoke runs)
        res["profile_error"] = f"{type(e).__name__}: {e}"
    return res


def _eomt(backbone, num_classes, size, task="semantic"):
    import jax
    import jax.numpy as jnp

    from lightly_train_tpu.models.package_registry import get_wrapped_model

    wrapped = get_wrapped_model(backbone, dtype=jnp.bfloat16)
    if task == "semantic":
        from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
            EoMTSemanticSegmentationArgs as Args,
            EoMTSemanticSegmentationTrainModel as Model,
        )
    else:
        from lightly_train_tpu.tasks.eomt_instance_panoptic import (
            EoMTPanopticSegmentationArgs as Args,
            EoMTPanopticSegmentationTrainModel as Model,
        )
    model = Model(wrapped, Args(num_classes=num_classes))
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (1, size, size, 3), jnp.float32)
    params, state = model.init(rng, {"images": images})
    fn = jax.jit(lambda v, x: model.predict(v, x))
    variables = {"params": params, **state}
    return _time_fn(fn, variables, images)


def _ltdetr(backbone, size):
    import jax
    import jax.numpy as jnp

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.detection.ltdetr import (
        ObjectDetectionArgs,
        ObjectDetectionTrainModel,
    )

    wrapped = get_wrapped_model(backbone, dtype=jnp.bfloat16)
    model = ObjectDetectionTrainModel(wrapped, ObjectDetectionArgs())
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (1, size, size, 3), jnp.float32)
    params, state = model.init(rng, {"images": images})
    variables = {"params": params, **state}
    deploy_model, deploy_vars = model.convert_to_deploy(variables)
    fn = jax.jit(lambda v, x: deploy_model.predict(v, x))
    return _time_fn(fn, deploy_vars, images)


def _ltdetr_seg(backbone, size):
    import jax
    import jax.numpy as jnp

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.detection.ltdetr_seg import (
        InstanceSegmentationLTDETRArgs,
        LTDETRInstanceSegmentationTrainModel,
    )

    wrapped = get_wrapped_model(backbone, dtype=jnp.bfloat16)
    model = LTDETRInstanceSegmentationTrainModel(
        wrapped, InstanceSegmentationLTDETRArgs()
    )
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (1, size, size, 3), jnp.float32)
    params, state = model.init(rng, {"images": images})
    variables = {"params": params, **state}
    deploy_model, deploy_vars = model.convert_to_deploy(variables)
    fn = jax.jit(lambda v, x: deploy_model.predict(v, x))
    return _time_fn(fn, deploy_vars, images)


def _depth(name, size):
    import jax
    import jax.numpy as jnp

    from lightly_train_tpu.tasks.depth_anything import DepthAnythingModel

    model = DepthAnythingModel.build(name, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (1, size, size, 3), jnp.float32)
    params = model.init(rng, images)
    fn = jax.jit(model.forward)
    return _time_fn(fn, params, images)


def _throughput(builder, batch):
    """img/s at a serving batch size for a builder returning (fn, args)."""
    import jax

    fn, args = builder(batch)
    lat = _time_fn(fn, *args)
    return {"batch": batch, "img_s": batch / (lat["best_window"] / 1000.0),
            "latency_ms": lat}


def _eomt_batched(backbone, num_classes, size):
    def build(batch):
        import jax
        import jax.numpy as jnp

        from lightly_train_tpu.models.package_registry import (
            get_wrapped_model,
        )
        from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
            EoMTSemanticSegmentationArgs as Args,
            EoMTSemanticSegmentationTrainModel as Model,
        )

        wrapped = get_wrapped_model(backbone, dtype=jnp.bfloat16)
        model = Model(wrapped, Args(num_classes=num_classes))
        rng = jax.random.key(0)
        images = jax.random.uniform(rng, (batch, size, size, 3), jnp.float32)
        params, state = model.init(rng, {"images": images})
        fn = jax.jit(lambda v, x: model.predict(v, x))
        return fn, ({"params": params, **state}, images)

    return build


# (name, runner, reference T4 TensorRT-fp16 ms, BASELINE.md source row)
CONFIGS = {
    "eomt_vits16_512": (
        lambda: _eomt("dinov3/vits16", 171, 512),
        11.3, "dinov3/vits16-eomt-coco @512 (COCO-Stuff)",
    ),
    "eomt_vitb16_512": (
        lambda: _eomt("dinov3/vitb16", 171, 512),
        23.1, "dinov3/vitb16-eomt-coco @512 (COCO-Stuff)",
    ),
    "eomt_vits16_1024": (
        lambda: _eomt("dinov3/vits16", 19, 1024),
        53.8, "dinov3/vits16-eomt-cityscapes @1024",
    ),
    "eomt_panoptic_vitt16_640": (
        lambda: _eomt("dinov3/vitt16", 80, 640, task="panoptic"),
        13.5, "dinov3/vitt16-eomt-panoptic-coco @640",
    ),
    "ltdetr_vitt16_640": (
        lambda: _ltdetr("dinov3/vitt16", 640),
        5.4, "dinov3/vitt16-ltdetr-coco @640",
    ),
    "ltdetr_vits16_640": (
        lambda: _ltdetr("dinov3/vits16", 640),
        10.5, "dinov3/vits16-ltdetr-coco @640",
    ),
    "dav3_relative_tiny_576": (
        lambda: _depth("dinov3/dav3-relative-tiny", 576),
        5.27, "dinov3/dav3-relative-tiny @576",
    ),
    "ltdetrv2_seg_s_640": (
        lambda: _ltdetr_seg("ecvit/ecvitt", 640),
        6.96, "ltdetrv2-seg-s-coco @640 (COCO instance seg)",
    ),
    "eomt_vits16_512_b16": (
        lambda: _throughput(_eomt_batched("dinov3/vits16", 171, 512), 16),
        None, "throughput config (no reference analog)",
    ),
}


def main():
    import jax

    selected = os.environ.get("LT_LAT_CONFIGS")
    names = selected.split(",") if selected else list(CONFIGS)
    artifact = {
        "what": "batch-1 inference latency of flagship task models, "
                "jitted predict, bf16 compute, random-init weights; "
                "headline = profile-derived device execution time "
                "(device_ms_per_call), wall windows secondary",
        "device": str(jax.devices()[0]),
        "reference_hardware": "NVIDIA T4, TensorRT fp16 (BASELINE.md)",
        "warmup": WARMUP, "iters_per_window": ITERS, "windows": WINDOWS,
        "results": {},
    }
    if OUT.exists():
        try:
            artifact["results"] = json.loads(OUT.read_text())["results"]
        except Exception:
            pass
    for name in names:
        runner, ref_ms, row = CONFIGS[name]
        print(f"=== {name} ({row}) ===", flush=True)
        t0 = time.time()
        try:
            res = runner()
        except Exception as e:
            res = {"error": f"{type(e).__name__}: {e}"}
        entry = {"row": row, "ref_t4_ms": ref_ms, "compile_plus_run_s":
                 round(time.time() - t0, 1)}
        if "error" in res:
            entry["error"] = res["error"]
        elif name.endswith("_b16"):
            entry.update(res)
            lat = res.get("latency_ms", {})
            if "device_ms_per_call" in lat:
                entry["img_s_device"] = res["batch"] / (
                    lat["device_ms_per_call"] / 1000.0
                )
        else:
            entry["latency_ms"] = res
            # Headline = profile-derived device execution time; the wall
            # windows stay recorded as a secondary (relay-noisy) signal.
            ms = res.get("device_ms_per_call") or res["best_window"]
            if ref_ms:
                entry["speedup_vs_t4"] = round(ref_ms / ms, 2)
        artifact["results"][name] = entry
        OUT.write_text(json.dumps(artifact, indent=1))
        print(json.dumps(entry), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
