"""Zoo conversion-on-load round trips for LT-DETR det/seg checkpoints.

Each test composes the ACTUAL reference torch modules
(``_models/ecvit/ecvit.py`` ECViTModelWrapper, ``object_detection_components/
{hybrid_encoder,dfine_decoder,rtdetrv2_decoder}.py``, ``instance_segmentation
_components/edgecrafter_decoder.py``) with random weights into a checkpoint
file laid out like the reference exporter
(``task_model_helpers.init_model_from_checkpoint:251-281``: model_class_path +
model_init_args + ``train_model`` with ``model.``-prefixed keys), points the
zoo registry at it via ``file://``, and asserts ``load_model(name)`` returns a
model whose final-layer logits/boxes (and masks) match the torch pipeline.
"""

import hashlib
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

REF = Path("/root/reference/src/lightly_train")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference source tree not available"
)

IMG = 128  # multiple of 32; keeps the 12-block ECViT forward fast on CPU


def _mount():
    from ref_mount import mount_reference_tasks

    mount_reference_tasks()


def _randomize(module, scale=0.05, seed=0):
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.ndim >= 1 and p.requires_grad:
                p.add_(torch.randn_like(p) * scale)
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.add_(torch.rand_like(b) * 0.5)
            elif name.endswith("running_mean"):
                b.add_(torch.randn_like(b) * 0.1)


def _build_torch_ecvit_pipeline(num_classes=7, with_masks=False):
    """Reference ecvitt (ltdetrv2-s) pipeline at the real preset sizes."""
    import importlib

    import torch

    ecvit_mod = importlib.import_module("lightly_train._models.ecvit.ecvit")
    he_mod = importlib.import_module(
        "lightly_train._task_models.object_detection_components.hybrid_encoder"
    )
    backbone = ecvit_mod.ECViTModelWrapper(name="ecvitt")
    encoder = he_mod.HybridEncoder(
        upsample=True,
        in_channels=[192, 192, 192],
        feat_strides=[8, 16, 32],
        hidden_dim=192,
        nhead=8,
        dim_feedforward=512,
        dropout=0.0,
        enc_act="gelu",
        use_encoder_idx=[2],
        num_encoder_layers=1,
        expansion=0.34,
        depth_mult=0.67,
        act="silu",
    )
    # num_queries == anchor count at IMG so encoder top-k has no
    # discrete tie boundary (random-weight scores cluster, flipping ~10%
    # of top-300-of-336 picks between frameworks; same device as the r4
    # trajectory harness).
    n_anchors = (IMG // 8) ** 2 + (IMG // 16) ** 2 + (IMG // 32) ** 2
    dec_kwargs = dict(
        num_classes=num_classes,
        feat_channels=[192, 192, 192],
        feat_strides=[8, 16, 32],
        hidden_dim=192,
        num_levels=3,
        num_layers=4,
        num_queries=n_anchors,
        num_denoising=100,
        num_points=[3, 6, 3],
        dim_feedforward=512,
        reg_max=32,
        eval_spatial_size=(IMG, IMG),
    )
    if with_masks:
        seg_mod = importlib.import_module(
            "lightly_train._task_models.instance_segmentation_components."
            "edgecrafter_decoder"
        )
        decoder = seg_mod.ECSegTransformer(
            **dec_kwargs,
            mask_bottleneck_ratio=1,
            mask_downsample_ratio=4,
        )
    else:
        dfine_mod = importlib.import_module(
            "lightly_train._task_models.object_detection_components."
            "dfine_decoder"
        )
        decoder = dfine_mod.DFINETransformer(**dec_kwargs)
    for m, seed in ((backbone, 0), (encoder, 1), (decoder, 2)):
        _randomize(m, seed=seed)
        m.eval()
    return backbone, encoder, decoder


def _write_checkpoint(tmp_path, backbone, encoder, decoder, model_name,
                      class_path, num_classes):
    import torch

    sd = {}
    for k, v in backbone.state_dict().items():
        sd[f"model.backbone._model_wrapper.{k}"] = v
    for k, v in encoder.state_dict().items():
        sd[f"model.encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"model.decoder.{k}"] = v
    ckpt = {
        "model_class_path": class_path,
        "model_init_args": {
            "model_name": model_name,
            "classes": {i: f"c{i}" for i in range(num_classes)},
            "image_size": (IMG, IMG),
            "num_queries": (IMG // 8) ** 2 + (IMG // 16) ** 2
            + (IMG // 32) ** 2,
        },
        "train_model": sd,
    }
    path = tmp_path / "ckpt.pt"
    torch.save(ckpt, path)
    sha = hashlib.sha256(path.read_bytes()).hexdigest()
    return path, sha


def _register_and_load(monkeypatch, tmp_path, name, family, path, sha):
    from lightly_train_tpu.tasks import task_zoo
    from lightly_train_tpu.tasks.model_io import load_model

    monkeypatch.setitem(
        task_zoo.TASK_ZOO, name, (f"file://{path}", sha, family)
    )
    monkeypatch.setenv("LIGHTLY_TRAIN_CACHE_DIR", str(tmp_path / "cache"))
    return load_model(name)


def _torch_pipeline_forward(backbone, encoder, decoder, x_nhwc):
    import torch

    with torch.no_grad():
        x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
        feats = list(backbone(x))
        levels = encoder(feats)
        out = decoder(levels)
    return out


def test_zoo_ltdetrv2_s_det_roundtrip(tmp_path, monkeypatch):
    _mount()
    num_classes = 7
    backbone, encoder, decoder = _build_torch_ecvit_pipeline(num_classes)
    path, sha = _write_checkpoint(
        tmp_path, backbone, encoder, decoder,
        "edgecrafter/ecvitt-ltdetr",
        "lightly_train._task_models.ltdetr_object_detection.task_model."
        "LTDETRObjectDetection",
        num_classes,
    )
    loaded = _register_and_load(
        monkeypatch, tmp_path, "ltdetrv2-s-coco", "object_detection",
        path, sha,
    )
    assert loaded.task == "object_detection"
    assert loaded.image_size == IMG

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32) * 0.5
    ref = _torch_pipeline_forward(backbone, encoder, decoder, x)
    ref_logits = ref["pred_logits"].numpy()
    ref_boxes = ref["pred_boxes"].numpy()

    tm = loaded.train_model
    params = loaded.variables["params"]
    state = {k: v for k, v in loaded.variables.items() if k != "params"}
    outputs, _ = tm._apply(params, state, jnp.asarray(x), False)
    logits, boxes = outputs[-1]
    # The decoder emits a SET of queries ordered by encoder score; near-
    # equal scores (random weights) swap positions between frameworks, so
    # compare under a one-to-one nearest-logit matching rather than by
    # query index (q99 of the raw elementwise diff stays < 2e-3).
    got_logits = np.asarray(logits)[..., :num_classes]
    got_boxes = np.asarray(boxes)
    diff = np.abs(got_logits - ref_logits)
    assert float(np.quantile(diff, 0.99)) < 2e-3, np.quantile(diff, 0.99)
    for b_i in range(got_logits.shape[0]):
        d = np.abs(
            got_logits[b_i][:, None, :] - ref_logits[b_i][None, :, :]
        ).max(-1)  # (Q, Q)
        best = d.argmin(axis=0)
        assert float(d.min(axis=0).max()) < 2e-3, d.min(axis=0).max()
        assert len(set(best.tolist())) == len(best)  # a true permutation
        np.testing.assert_allclose(
            got_boxes[b_i][best], ref_boxes[b_i], atol=2e-3
        )

    # Prediction-level agreement: the top-scoring query's class + box match.
    ref_scores = 1.0 / (1.0 + np.exp(-ref_logits))
    got_scores = 1.0 / (
        1.0 + np.exp(-np.asarray(logits)[..., :num_classes])
    )
    for b_i in range(x.shape[0]):
        rq, rc = np.unravel_index(
            np.argmax(ref_scores[b_i]), ref_scores[b_i].shape
        )
        gq, gc = np.unravel_index(
            np.argmax(got_scores[b_i]), got_scores[b_i].shape
        )
        assert (rq, rc) == (gq, gc)
        np.testing.assert_allclose(
            np.asarray(boxes)[b_i, gq], ref_boxes[b_i, rq], atol=2e-3
        )

    # Full predict decode runs.
    b, s, l = tm.predict(loaded.variables, jnp.asarray(x))
    assert np.asarray(s).shape[0] == 2


def test_zoo_ltdetrv2_seg_roundtrip(tmp_path, monkeypatch):
    _mount()
    num_classes = 5
    backbone, encoder, decoder = _build_torch_ecvit_pipeline(
        num_classes, with_masks=True
    )
    path, sha = _write_checkpoint(
        tmp_path, backbone, encoder, decoder,
        "edgecrafter/ecvitt-ltdetr-seg",
        "lightly_train._task_models.ltdetr_instance_segmentation.task_model."
        "LTDETRInstanceSegmentation",
        num_classes,
    )
    loaded = _register_and_load(
        monkeypatch, tmp_path, "ltdetrv2-seg-s-coco",
        "instance_segmentation_ltdetr", path, sha,
    )
    assert loaded.task == "instance_segmentation"

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32) * 0.5
    ref = _torch_pipeline_forward(backbone, encoder, decoder, x)
    ref_logits = ref["pred_logits"].numpy()
    ref_boxes = ref["pred_boxes"].numpy()
    ref_masks = ref["pred_masks"].numpy()  # (B, Q, Hm, Wm) final layer

    tm = loaded.train_model
    params = loaded.variables["params"]
    state = {k: v for k, v in loaded.variables.items() if k != "params"}
    outputs, queries, feats, _ = tm._apply_with_masks(
        params, state, jnp.asarray(x), False
    )
    logits, boxes = outputs[-1]
    np.testing.assert_allclose(
        np.asarray(logits)[..., :num_classes], ref_logits,
        atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes, atol=2e-3)
    mask_logits, (mh, mw) = tm._mask_logits(
        params, feats, queries, (IMG, IMG)
    )
    got_masks = np.asarray(mask_logits).reshape(1, -1, mh, mw)
    assert got_masks.shape == ref_masks.shape
    np.testing.assert_allclose(got_masks, ref_masks, atol=5e-3, rtol=1e-3)


def test_zoo_vit_rtdetrv2_det_roundtrip(tmp_path, monkeypatch):
    """dinov3/vitt16 LT-DETR (v1: DINOSTAs backbone + RT-DETRv2 decoder)."""
    _mount()
    import importlib

    import torch

    num_classes = 6
    bb = importlib.import_module(
        "lightly_train._models.dinov3.dinov3_src.hub.backbones"
    )
    dv = importlib.import_module("lightly_train._models.dinov3.dinov3_vit")
    wrap_mod = importlib.import_module(
        "lightly_train._task_models.ltdetr_object_detection.dino_vit_wrapper"
    )
    he_mod = importlib.import_module(
        "lightly_train._task_models.object_detection_components.hybrid_encoder"
    )
    rt_mod = importlib.import_module(
        "lightly_train._task_models.object_detection_components."
        "rtdetrv2_decoder"
    )

    vit = bb.dinov3_vitt16(pretrained=False)  # dinov3/vitt16
    backbone = wrap_mod.DINOSTAs(
        model_wrapper=dv.DINOv3ViTModelWrapper(vit),
        interaction_indexes=[3, 7, 11],
        finetune=True,
        use_sta=True,
        conv_inplane=16,  # factor 1 * patch 16
        hidden_dim=192,
        project_features=True,
    )
    encoder = he_mod.HybridEncoder(
        upsample=True,
        in_channels=[192, 192, 192],
        feat_strides=[8, 16, 32],
        hidden_dim=192,
        nhead=8,
        dim_feedforward=512,
        dropout=0.0,
        enc_act="gelu",
        use_encoder_idx=[2],
        num_encoder_layers=1,
        expansion=0.34,
        depth_mult=0.67,
        act="silu",
    )
    decoder = rt_mod.RTDETRTransformerv2(
        num_classes=num_classes,
        feat_channels=[192, 192, 192],
        feat_strides=[8, 16, 32],
        hidden_dim=192,
        num_levels=3,
        num_layers=4,
        num_queries=300,
        num_denoising=100,
        num_points=[3, 6, 3],
        dim_feedforward=512,
        eval_spatial_size=(IMG, IMG),
    )
    for m, seed in ((backbone, 3), (encoder, 4), (decoder, 5)):
        _randomize(m, seed=seed)
        m.eval()

    sd = {}
    for k, v in backbone.state_dict().items():
        sd[f"model.backbone.{k}"] = v
    for k, v in encoder.state_dict().items():
        sd[f"model.encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"model.decoder.{k}"] = v
    ckpt = {
        "model_class_path": (
            "lightly_train._task_models.ltdetr_object_detection.task_model."
            "LTDETRObjectDetection"
        ),
        "model_init_args": {
            "model_name": "dinov3/vitt16-ltdetr",
            "classes": {i: f"c{i}" for i in range(num_classes)},
            "image_size": (IMG, IMG),
        },
        "train_model": sd,
    }
    path = tmp_path / "ckpt.pt"
    torch.save(ckpt, path)
    sha = hashlib.sha256(path.read_bytes()).hexdigest()

    loaded = _register_and_load(
        monkeypatch, tmp_path, "dinov3/vitt16-ltdetr-coco",
        "object_detection", path, sha,
    )

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        feats = list(backbone(xt))
        levels = encoder(feats)
        out = decoder(levels)
    ref_logits = out["pred_logits"].numpy()
    ref_boxes = out["pred_boxes"].numpy()

    tm = loaded.train_model
    params = loaded.variables["params"]
    state = {k: v for k, v in loaded.variables.items() if k != "params"}
    outputs, _ = tm._apply(params, state, jnp.asarray(x), False)
    logits, boxes = outputs[-1]
    np.testing.assert_allclose(
        np.asarray(logits)[..., :num_classes], ref_logits,
        atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes, atol=2e-3)
