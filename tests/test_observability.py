"""Loggers, NaN guard, kNN eval, visualization grid tests."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_build_loggers_jsonl_and_tensorboard(tmp_path):
    from lightly_train_tpu._loggers import build_loggers

    ml = build_loggers(tmp_path, ["jsonl", "tensorboard"])
    ml.log_hyperparams({"lr": 0.1, "model": "x"})
    ml.log_metrics({"loss": 1.5}, step=1)
    ml.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert any("loss" in l for l in lines)


def test_build_loggers_unknown_raises(tmp_path):
    from lightly_train_tpu._loggers import build_loggers

    with pytest.raises(ValueError, match="Unknown logger"):
        build_loggers(tmp_path, ["nope"])


def test_nan_guard_captures_and_raises(tmp_path):
    from lightly_train_tpu._debug import NaNGuard
    from lightly_train_tpu.errors import NaNDetectedError

    guard = NaNGuard(tmp_path)
    batch = {"images": np.zeros((2, 4, 4, 3), np.uint8)}
    params = {"w": jnp.asarray([1.0, jnp.nan])}
    with pytest.raises(NaNDetectedError, match="step 7"):
        guard.check(jnp.asarray(False), 7, batch, jax.random.key(0), params)
    captures = list((tmp_path / "debug").glob("nan_capture_step7.npz"))
    assert len(captures) == 1
    from lightly_train_tpu._debug.nan_guard import replay_capture

    payload = replay_capture(captures[0])
    assert payload["step"] == 7
    assert payload["batch_images"].shape == (2, 4, 4, 3)


def test_nan_guard_passes_finite():
    from lightly_train_tpu._debug import NaNGuard

    guard = NaNGuard(Path("/nonexistent"))
    guard.check(jnp.asarray(True), 1, {}, jax.random.key(0))  # no raise


def test_all_finite():
    from lightly_train_tpu._debug.nan_guard import all_finite

    assert bool(all_finite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
    assert not bool(all_finite({"a": jnp.asarray([1.0, jnp.inf])}))


def test_knn_eval_separable_clusters():
    from lightly_train_tpu.utils.knn import knn_accuracy

    rng = np.random.default_rng(0)
    c0 = rng.normal(0, 0.1, (50, 8)) + np.array([1] + [0] * 7)
    c1 = rng.normal(0, 0.1, (50, 8)) + np.array([0, 1] + [0] * 6)
    train = jnp.asarray(np.concatenate([c0, c1]), jnp.float32)
    labels = jnp.asarray([0] * 50 + [1] * 50)
    q0 = rng.normal(0, 0.1, (10, 8)) + np.array([1] + [0] * 7)
    q1 = rng.normal(0, 0.1, (10, 8)) + np.array([0, 1] + [0] * 6)
    query = jnp.asarray(np.concatenate([q0, q1]), jnp.float32)
    qlabels = jnp.asarray([0] * 10 + [1] * 10)
    acc = knn_accuracy(query, qlabels, train, labels, num_classes=2, k=5)
    assert acc > 0.95


def test_augmentation_grid(tmp_path):
    from lightly_train_tpu._visualize.grids import (
        image_grid,
        save_augmentation_grid,
    )

    views = [np.random.default_rng(0).normal(size=(4, 16, 16, 3)),
             np.random.default_rng(1).normal(size=(4, 8, 8, 3))]
    out = save_augmentation_grid(views, tmp_path / "aug.png")
    assert out is not None and out.exists()
    g = image_grid(np.zeros((5, 4, 4, 3), np.uint8), cols=3)
    assert g.shape[0] > 4 and g.shape[1] > 4


def test_extract_video_frames_requires_ffmpeg_or_works(tmp_path):
    import shutil

    from lightly_train_tpu._commands.extract_video_frames import (
        extract_video_frames,
    )
    from lightly_train_tpu.errors import ConfigError, DatasetError

    if shutil.which("ffmpeg") is None:
        with pytest.raises(ConfigError, match="ffmpeg"):
            extract_video_frames(str(tmp_path / "o"), str(tmp_path))
    else:
        with pytest.raises(DatasetError, match="No videos"):
            extract_video_frames(str(tmp_path / "o"), str(tmp_path))


def test_replay_nan_capture_end_to_end(tmp_path):
    """Replay driver reconstructs the run and re-runs a captured step."""
    from PIL import Image

    import lightly_train_tpu as lt
    from lightly_train_tpu._debug.replay import replay_nan_capture

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(data / f"{i}.png")
    out = tmp_path / "out"
    lt.pretrain(
        out=str(out), data=str(data), model="torchvision/resnettest",
        method="simclr", method_args={"image_size": 32}, batch_size=8,
        steps=2, precision="fp32", canonical_size=64, num_workers=0,
        log_every=1,
    )
    # Manufacture a capture for step 1 (the guard only writes on real NaNs).
    debug_dir = out / "debug"
    debug_dir.mkdir()
    batch = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    key = jax.random.key(123)
    np.savez_compressed(
        debug_dir / "nan_capture_step1.npz",
        step=np.asarray(1),
        key=np.asarray(jax.random.key_data(key)),
        batch=batch,
    )
    report = replay_nan_capture(out)
    assert report["step"] == 1
    assert np.isfinite(report["loss"])
    assert report["finite"] is True
    assert report["offenders"] == []
    assert report["restored_checkpoint_step"] is not None


def test_fit_loop_captures_the_failing_step_and_batch(tmp_path):
    """The guard must capture the batch and DEVICE step of the step that
    produced the non-finite flag — not whatever ran at a log boundary —
    and the step value must match the fold_in key the device used."""
    from lightly_train_tpu._commands.train_loop import fit
    from lightly_train_tpu._debug.nan_guard import NaNGuard
    from lightly_train_tpu.errors import NaNDetectedError
    from lightly_train_tpu.methods.base import TrainState

    def fake_step(state, batch, key):
        # Non-finite exactly at device step 2 (the third dispatched step).
        finite = jnp.asarray(state.step != 2)
        new_state = TrainState(
            step=state.step + 1, params=state.params,
            model_state=state.model_state, opt_state=state.opt_state,
            method_state=state.method_state,
        )
        return new_state, {"train_loss": jnp.asarray(1.0), "finite": finite}

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params={"w": jnp.ones((2,))},
        model_state={}, opt_state={}, method_state={},
    )

    def batches():
        i = 0
        while True:
            yield jnp.full((4, 8, 8, 3), i, jnp.uint8)
            i += 1

    with pytest.raises(NaNDetectedError):
        fit(
            fake_step, state, batches(), total_steps=50,
            log_every=50,  # boundary far after the failure
            nan_guard=NaNGuard(tmp_path, enabled=True),
        )
    captures = sorted((tmp_path / "debug").glob("nan_capture_step*.npz"))
    assert len(captures) == 1
    with np.load(captures[0]) as data:
        assert int(data["step"]) == 2  # the device step that failed
        # The batch is the one fed to that step (fill value == index 2).
        assert int(data["batch"].ravel()[0]) == 2
