"""Model-zoo resolution + conversion-on-load for ``load_model``
(VERDICT r3 missing #1).

A synthetic torch checkpoint in the reference exporter's exact format
(``task_model_helpers.init_model_from_checkpoint:252-281``: model_class_path
+ model_init_args + 'model.'-prefixed train_model state dict) is served over
``file://`` and loaded end-to-end: registry hit -> sha256-verified fetch ->
torch->flax conversion -> forward parity against the actual reference model.
"""

import hashlib
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


NUM_CLASSES = 4
NUM_QUERIES = 8
NUM_JOINT = 2


@pytest.fixture(scope="module")
def torch_zoo_checkpoint(tmp_path_factory):
    """Tiny reference EoMT (dinov3/vittest16 dims) saved in zoo format."""
    from ref_mount import mount_reference_tasks

    mount_reference_tasks()
    import importlib

    import torch

    torch.manual_seed(0)
    vt3 = importlib.import_module(
        "lightly_train._models.dinov3.dinov3_src.models.vision_transformer"
    )
    backbone = vt3.DinoVisionTransformer(
        img_size=224, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        ffn_ratio=4.0, qkv_bias=True, layerscale_init=1e-5,
        norm_layer="layernormbf16", ffn_layer="mlp", n_storage_tokens=4,
        mask_k_bias=True, pos_embed_rope_base=100.0,
        pos_embed_rope_dtype="fp32",
    )
    backbone.init_weights()
    with torch.no_grad():
        for p in backbone.parameters():
            if p.ndim >= 1:
                p.add_(torch.randn_like(p) * 0.02)
        for blk in backbone.blocks:
            m = blk.attn.qkv.bias_mask
            d = m.shape[0] // 3
            m.fill_(1.0)
            m[d: 2 * d] = 0.0

    tm = importlib.import_module(
        "lightly_train._task_models.dinov3_eomt_semantic_segmentation"
        ".task_model"
    )
    orig = tm.DINOV3_PACKAGE.get_model
    tm.DINOV3_PACKAGE.get_model = classmethod(
        lambda cls, **kw: backbone
    ).__get__(None, type(tm.DINOV3_PACKAGE))
    try:
        model = tm.DINOv3EoMTSemanticSegmentation(
            model_name="dinov3/vitt16-eomt-coco",  # registry key only
            classes={i: f"c{i}" for i in range(NUM_CLASSES)},
            class_ignore_index=None,
            image_size=(64, 64),
            image_normalize={"mean": [0.0] * 3, "std": [1.0] * 3},
            num_queries=NUM_QUERIES,
            num_joint_blocks=NUM_JOINT,
            load_weights=False,
        )
    finally:
        tm.DINOV3_PACKAGE.get_model = orig
    with torch.no_grad():
        for name, p in model.named_parameters():
            if not name.startswith("backbone."):
                p.add_(torch.randn_like(p) * 0.05)
    model.eval()

    path = tmp_path_factory.mktemp("zoo") / "tiny_eomt_zoo.pt"
    torch.save({
        "model_class_path": (
            "lightly_train._task_models.dinov3_eomt_semantic_segmentation"
            ".task_model.DINOv3EoMTSemanticSegmentation"
        ),
        "model_init_args": {
            "model_name": "dinov3/vittest16-eomt-coco",
            "classes": {i: f"c{i}" for i in range(NUM_CLASSES)},
            "num_queries": NUM_QUERIES,
            "num_joint_blocks": NUM_JOINT,
        },
        "train_model": {
            f"model.{k}": v for k, v in model.state_dict().items()
        },
    }, path)
    return model, path


def test_zoo_registry_covers_reference_names():
    from lightly_train_tpu.tasks.task_zoo import TASK_ZOO

    for name in ("ltdetrv2-s-coco", "ltdetrv2-m-coco", "ltdetrv2-l-coco",
                 "dinov3/vits16-eomt-coco", "dinov3/vitl16-eomt-ade20k",
                 "dinov3/vits16-eomt-panoptic-coco", "picodet-s-coco",
                 "dinov3/dav3-relative-tiny", "dinov2/dav3-metric-large",
                 "ltdetrv2-seg-s-coco"):
        assert name in TASK_ZOO, name
        url, sha, family = TASK_ZOO[name]
        assert len(sha) == 64
    assert len(TASK_ZOO) >= 60


def test_unknown_name_raises_with_guidance():
    from lightly_train_tpu.errors import CheckpointError
    from lightly_train_tpu.tasks.model_io import load_model

    with pytest.raises(CheckpointError, match="model-zoo name"):
        load_model("not-a-model")


def test_zoo_name_resolves_to_url_and_hash(monkeypatch, tmp_path):
    """load_model('ltdetrv2-s-coco') reaches the fetch boundary with the
    registry's exact URL + sha256 (no network in tests)."""
    import lightly_train_tpu.models.pretrained_urls as pu
    from lightly_train_tpu.tasks import task_zoo

    seen = {}

    def fake_fetch(name, url=None, sha256=None, dest_dir=None):
        seen.update(name=name, url=url, sha256=sha256)
        raise ConnectionError("offline test boundary")

    monkeypatch.setattr(pu, "fetch_pretrained", fake_fetch)
    with pytest.raises(ConnectionError):
        task_zoo.resolve_zoo_checkpoint("ltdetrv2-s-coco")
    assert seen["url"] == (
        "https://lightly-train-checkpoints.s3.us-east-1.amazonaws.com/"
        "edgecrafter_ecvitt_ltdetr_coco_260624_f8aefe49.pt"
    )
    # the exact constant from the reference registry
    # (ltdetr_object_detection/config.py:35-36)
    assert seen["sha256"] == (
        "f8aefe499be1579c55bfcb288f623399ea5f4efef0c5a5f00960663efeda4f49"
    )


@pytest.mark.long_running
def test_file_url_roundtrip_eomt(torch_zoo_checkpoint, monkeypatch, tmp_path):
    """file:// zoo entry -> download+verify -> convert -> forward parity."""
    import torch

    import jax.numpy as jnp

    from lightly_train_tpu.tasks import task_zoo
    from lightly_train_tpu.tasks.model_io import load_model

    model, path = torch_zoo_checkpoint
    sha = hashlib.sha256(path.read_bytes()).hexdigest()
    monkeypatch.setitem(
        task_zoo.TASK_ZOO, "_test/vittest16-eomt-coco",
        (f"file://{path}", sha, "semantic_segmentation_eomt"),
    )
    monkeypatch.setenv("LIGHTLY_TRAIN_CACHE_DIR", str(tmp_path / "cache"))

    loaded = load_model("_test/vittest16-eomt-coco", image_size=64)
    assert loaded.task == "semantic_segmentation"

    # forward parity vs the actual torch reference model
    rng = np.random.default_rng(0)
    img = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref_logits = model._forward_logits(torch.from_numpy(img)).numpy()
    ref_mask = ref_logits[:, :-1].argmax(1)[0]

    sem = loaded.train_model._semantic_logits(
        loaded.variables["params"], jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    got_mask = np.asarray(jnp.argmax(sem, -1))[0]
    agree = (got_mask == ref_mask).mean()
    assert agree > 0.99, agree

    # end-to-end predictor API
    out = loaded.predict((img[0].transpose(1, 2, 0) * 255).astype(np.uint8))
    assert out["mask"].shape == (64, 64)
