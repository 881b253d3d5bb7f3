"""End-to-end pretrain tests on tiny synthetic datasets.

Mirrors the reference integration-test strategy (SURVEY.md §4): real
``pretrain(...)`` calls for a few steps on tiny datasets in tmp dirs, using
test-size models, on the virtual 8-device mesh.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import lightly_train_tpu as lt


@pytest.fixture
def image_dir(tmp_path):
    from PIL import Image

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        arr = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(data / f"img_{i}.png")
    return data


def _common_kwargs():
    return dict(
        batch_size=8,
        steps=2,
        precision="fp32",
        canonical_size=64,
        num_workers=2,
        log_every=1,
    )


def test_pretrain_distillation_end_to_end(tmp_path, image_dir):
    out = tmp_path / "out"
    state = lt.pretrain(
        out=str(out),
        data=str(image_dir),
        model="torchvision/resnettest",
        method="distillation",
        method_args={
            "teacher": "dinov3/vittest16",
            "image_size": 32,
            "queue_size": 16,
        },
        **_common_kwargs(),
    )
    assert int(state.step) == 2
    # Artifacts: metrics.jsonl, checkpoints, exported model.
    metrics = [
        json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    steps_logged = [m["step"] for m in metrics if "train_loss" in m]
    assert 1 in steps_logged and 2 in steps_logged
    losses = [m["train_loss"] for m in metrics if "train_loss" in m]
    assert all(np.isfinite(l) for l in losses)
    assert (out / "exported_models" / "exported_last" / "metadata.json").exists()
    meta = json.loads(
        (out / "exported_models" / "exported_last" / "metadata.json").read_text()
    )
    assert meta["model_name"] == "torchvision/resnettest"


def test_pretrain_dinov2_tiny(tmp_path, image_dir):
    out = tmp_path / "out"
    state = lt.pretrain(
        out=str(out),
        data=str(image_dir),
        model="dinov3/vittest16",
        method="dinov2",
        method_args={
            "output_dim": 64,
            "hidden_dim": 32,
            "bottleneck_dim": 16,
            "local_view_count": 2,
            "global_image_size": 32,
            "local_image_size": 16,
        },
        **_common_kwargs(),
    )
    assert int(state.step) == 2
    metrics = [
        json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    m = [x for x in metrics if "train_loss" in x][-1]
    assert np.isfinite(m["train_loss"])
    assert "dino_loss" in m and "ibot_loss" in m and "koleo_loss" in m


def test_pretrain_out_dir_not_empty_raises(tmp_path, image_dir):
    out = tmp_path / "out"
    out.mkdir()
    (out / "junk.txt").write_text("x")
    from lightly_train_tpu.errors import ConfigError

    with pytest.raises(ConfigError, match="not empty"):
        lt.pretrain(
            out=str(out), data=str(image_dir),
            model="torchvision/resnettest", method="simclr",
            method_args={"image_size": 32}, **_common_kwargs(),
        )


def test_pretrain_resume(tmp_path, image_dir):
    out = tmp_path / "out"
    kwargs = _common_kwargs()
    kwargs["steps"] = 2
    lt.pretrain(
        out=str(out), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, **kwargs,
    )
    kwargs["steps"] = 3
    state = lt.pretrain(
        out=str(out), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, resume_interrupted=True, **kwargs,
    )
    assert int(state.step) == 3


def test_pretrain_exports_at_every_checkpoint(tmp_path, image_dir, monkeypatch):
    """exported_last refreshes at each periodic checkpoint, not only at the
    end of the run (reference ModelExport callback, _callbacks/export.py:28),
    so a usable backbone exists if training is interrupted."""
    from lightly_train_tpu._commands import train as train_mod

    real_export = train_mod.export_model
    exported_steps = []

    def spy(out_path, model, params, **kw):
        exported_steps.append(kw.get("extra_meta", {}).get("steps"))
        return real_export(out_path, model, params, **kw)

    monkeypatch.setattr(train_mod, "export_model", spy)
    out = tmp_path / "out"
    kwargs = _common_kwargs()
    kwargs["steps"] = 3
    lt.pretrain(
        out=str(out), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, checkpoint_every=2, **kwargs,
    )
    # Mid-run export at the step-2 checkpoint, final export at step 3.
    assert 2 in exported_steps
    assert exported_steps[-1] == 3
    meta = json.loads(
        (out / "exported_models" / "exported_last" / "metadata.json").read_text()
    )
    assert meta["steps"] == 3


def test_pretrain_further_from_checkpoint(tmp_path, image_dir):
    """checkpoint= starts a NEW run from a previous run's exported weights
    (weights only — fresh optimizer/schedule; reference
    _commands/train.py:134-141). With lr=0 the loaded weights must survive a
    step bit-for-bit, proving the merge happened."""
    import jax

    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    out_a = tmp_path / "a"
    lt.pretrain(
        out=str(out_a), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, **_common_kwargs(),
    )
    artifact = out_a / "exported_models" / "exported_last"
    kwargs = _common_kwargs()
    kwargs.update(steps=1, learning_rate=0.0)
    out_b = tmp_path / "b"
    lt.pretrain(
        out=str(out_b), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, checkpoint=str(artifact), **kwargs,
    )
    pa = load_exported_model(artifact)["params"]
    pb = load_exported_model(out_b / "exported_models" / "exported_last")[
        "params"
    ]
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(pb))
    assert flat_a and len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))


def test_pretrain_checkpoint_model_mismatch_raises(tmp_path, image_dir):
    """A checkpoint exported for another model must refuse loudly — the
    disjoint-tree merge would otherwise silently train from scratch."""
    from lightly_train_tpu.errors import ConfigError

    out_a = tmp_path / "a"
    lt.pretrain(
        out=str(out_a), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, **_common_kwargs(),
    )
    with pytest.raises(ConfigError, match="resnettest"):
        lt.pretrain(
            out=str(tmp_path / "b"), data=str(image_dir),
            model="dinov3/vittest16", method="simclr",
            method_args={"image_size": 32},
            checkpoint=str(out_a / "exported_models" / "exported_last"),
            **_common_kwargs(),
        )


def test_pretrain_checkpoint_continues_embed_head(tmp_path, image_dir):
    """Further-pretraining with embed_dim continues the artifact's TRAINED
    projection head instead of re-initializing it."""
    import jax

    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    out_a = tmp_path / "a"
    lt.pretrain(
        out=str(out_a), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, embed_dim=24, **_common_kwargs(),
    )
    artifact = out_a / "exported_models" / "exported_last"
    kwargs = _common_kwargs()
    kwargs.update(steps=1, learning_rate=0.0)
    lt.pretrain(
        out=str(tmp_path / "b"), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, embed_dim=24,
        checkpoint=str(artifact), **kwargs,
    )
    head_a = load_exported_model(artifact)["embed_head"]
    head_b = load_exported_model(
        tmp_path / "b" / "exported_models" / "exported_last"
    )["embed_head"]
    for pa, pb in zip(
        jax.tree_util.tree_leaves(head_a), jax.tree_util.tree_leaves(head_b)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_pretrain_checkpoint_conflicts_with_resume(tmp_path, image_dir):
    from lightly_train_tpu.errors import ConfigError

    with pytest.raises(ConfigError, match="resume_interrupted"):
        lt.pretrain(
            out=str(tmp_path / "out"), data=str(image_dir),
            model="torchvision/resnettest", method="simclr",
            method_args={"image_size": 32},
            checkpoint=str(tmp_path / "nowhere"),
            resume_interrupted=True, **_common_kwargs(),
        )


def test_pretrain_embed_dim_trains_head_and_embeds(tmp_path, image_dir):
    """embed_dim inserts a trainable projection between backbone and SSL
    heads (reference _commands/train.py:60,394 EmbeddingModel); the artifact
    carries the head as a sidecar, embed applies it, and the bare backbone
    stays fine-tune compatible."""
    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    out = tmp_path / "out"
    lt.pretrain(
        out=str(out), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, embed_dim=24, **_common_kwargs(),
    )
    artifact_dir = out / "exported_models" / "exported_last"
    artifact = load_exported_model(artifact_dir)
    assert artifact["embed_dim"] == 24
    head = artifact["embed_head"]["params"]["embed"]
    assert head["kernel"].shape[-1] == 24
    # Bare backbone layout: no "backbone"/"embed" nesting in params.
    assert "embed" not in artifact["params"] and "backbone" not in artifact["params"]

    emb_path = tmp_path / "emb.csv"
    lt.embed(
        out=str(emb_path), data=str(image_dir),
        checkpoint=str(artifact_dir), format="csv", image_size=32,
        batch_size=8, precision="fp32",
    )
    row = emb_path.read_text().splitlines()[0].split(",")
    assert len(row) == 1 + 24  # filename + embed_dim values


def test_pretrain_embed_dim_with_ema_teacher(tmp_path, image_dir):
    """EMA-teacher methods train with the projected model (teacher mirrors
    the projected params tree) and still export a bare-backbone artifact."""
    out = tmp_path / "out"
    lt.pretrain(
        out=str(out), data=str(image_dir),
        model="torchvision/resnettest", method="dino",
        method_args={
            "global_image_size": 32, "local_image_size": 16,
            "local_view_count": 2,
            "hidden_dim": 32, "bottleneck_dim": 16, "output_dim": 32,
        },
        embed_dim=24, **_common_kwargs(),
    )
    meta = json.loads(
        (out / "exported_models" / "exported_last" / "metadata.json").read_text()
    )
    assert meta["embed_dim"] == 24


def test_pretrain_multiple_data_dirs(tmp_path):
    """data accepts a list of directories (reference data:
    PathLike | Sequence[PathLike]). epochs=1 over 8+8 images at batch 8
    must resolve to 2 steps — proof both dirs were scanned."""
    from PIL import Image

    rng = np.random.default_rng(0)
    dirs = []
    for name in ("a", "b"):
        d = tmp_path / name
        d.mkdir()
        for i in range(8):
            arr = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
        dirs.append(str(d))
    kwargs = _common_kwargs()
    kwargs.pop("steps")
    state = lt.pretrain(
        out=str(tmp_path / "out"), data=dirs,
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, epochs=1, **kwargs,
    )
    assert int(state.step) == 2


def test_pretrain_loggers_dict_form(tmp_path, image_dir):
    """Reference loggers= semantics: dict of name -> kwargs | None, where
    None disables a default backend (_commands/train.py:179-182)."""
    out = tmp_path / "out"
    lt.pretrain(
        out=str(out), data=str(image_dir),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32},
        loggers={"jsonl": None, "tensorboard": {}},
        **_common_kwargs(),
    )
    assert not (out / "metrics.jsonl").exists()
    assert (out / "tensorboard").exists()


def test_list_models_and_methods_api():
    assert "dinov2/vitb14" in lt.list_models()
    assert "distillation" in lt.list_methods()
    assert "dinov2" in lt.list_methods()


def test_evaluate_knn_after_pretrain(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    # Two visually distinct classes (bright vs dark) so kNN has signal.
    for split, n in (("train", 8), ("val", 4)):
        for cls, base in (("bright", 200), ("dark", 30)):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = np.clip(
                    base + rng.integers(-20, 20, (40, 40, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    pre = tmp_path / "pre"
    lt.pretrain(
        out=str(pre), data=str(tmp_path / "train"),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, batch_size=8, steps=1,
        precision="fp32", canonical_size=48, num_workers=2,
    )
    result = lt.evaluate_knn(
        data={"train": str(tmp_path / "train"), "val": str(tmp_path / "val")},
        checkpoint=str(pre / "exported_models" / "exported_last"),
        image_size=32, batch_size=8, k=3,
    )
    assert result["knn_top1"] > 0.7  # brightness is trivially separable


def test_pretrain_detcon_with_dataset_masks(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    masks = tmp_path / "masks"
    data.mkdir(); masks.mkdir()
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(data / f"img_{i}.png")
        Image.fromarray(
            rng.integers(0, 4, (48, 48), dtype=np.uint8)
        ).save(masks / f"img_{i}.png")
    state = lt.pretrain(
        out=str(tmp_path / "out"), data=str(data), mask_dir=str(masks),
        model="torchvision/resnettest", method="detconb",
        method_args={"image_size": 32, "num_masks": 4,
                     "use_dataset_masks": True, "hidden_dim": 16,
                     "output_dim": 8},
        batch_size=8, steps=2, precision="fp32", canonical_size=48,
        num_workers=2, log_every=1,
    )
    assert int(state.step) == 2
    import json
    ms = [json.loads(l) for l in (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()
          if "train_loss" in l]
    assert all(np.isfinite(m["train_loss"]) for m in ms)


def test_pretrain_model_args_reach_builder(tmp_path, image_dir):
    """model_args forwards to the model builder (reference train.py:82)."""
    state = lt.pretrain(
        out=str(tmp_path / "out_margs"),
        data=str(image_dir),
        model="dinov2/vittest14",
        method="simclr",
        method_args={"image_size": 28},
        model_args={"drop_path_rate": 0.1},
        **_common_kwargs(),
    )
    assert int(state.step) == 2
    from lightly_train_tpu.errors import ConfigError

    with pytest.raises((ConfigError, ValueError), match="model_args"):
        lt.pretrain(
            out=str(tmp_path / "out_margs2"),
            data=str(image_dir),
            model="torchvision/resnettest",
            method="simclr",
            method_args={"image_size": 32},
            model_args={"drop_path_rate": 0.1},
            **_common_kwargs(),
        )
