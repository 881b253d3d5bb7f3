"""Zoo conversion-on-load round trip for PicoDet checkpoints.

Composes the ACTUAL reference torch modules
(``picodet_object_detection/{esnet,csp_pan,pico_head}.py``) with random
weights into a reference-format checkpoint, loads it through
``load_model("picodet-s-coco")`` (file:// URL), and asserts the flax module
reproduces the torch (backbone -> neck -> o2o head) forward exactly.
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

IMG = 128


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


def _build_torch_picodet(num_classes=5):
    import importlib

    esnet_mod = importlib.import_module(
        "lightly_train._task_models.picodet_object_detection.esnet"
    )
    pan_mod = importlib.import_module(
        "lightly_train._task_models.picodet_object_detection.csp_pan"
    )
    head_mod = importlib.import_module(
        "lightly_train._task_models.picodet_object_detection.pico_head"
    )
    backbone = esnet_mod.ESNet(model_size="s", out_indices=(2, 9, 12))
    neck = pan_mod.CSPPAN(
        in_channels=backbone.out_channels, out_channels=96, kernel_size=5,
        num_features=4, expansion=1.0, num_csp_blocks=1, use_depthwise=True,
    )
    head_kwargs = dict(
        in_channels=96, num_classes=num_classes, feat_channels=96,
        stacked_convs=2, kernel_size=5, reg_max=7,
        strides=(8, 16, 32, 64), share_cls_reg=True, use_depthwise=True,
    )
    o2m_head = head_mod.PicoHead(**head_kwargs)
    o2o_head = head_mod.PicoHead(**head_kwargs)
    for m, seed in ((backbone, 0), (neck, 1), (o2m_head, 2), (o2o_head, 3)):
        _randomize(m, seed=seed)
        m.eval()
    return backbone, neck, o2m_head, o2o_head


def test_zoo_picodet_s_roundtrip(tmp_path, monkeypatch):
    _mount()
    import torch

    num_classes = 5
    backbone, neck, o2m, o2o = _build_torch_picodet(num_classes)
    sd = {}
    for prefix, mod in (
        ("backbone", backbone), ("neck", neck),
        ("head", o2m), ("o2o_head", o2o),
    ):
        for k, v in mod.state_dict().items():
            sd[f"model.{prefix}.{k}"] = v
    ckpt = {
        "model_class_path": (
            "lightly_train._task_models.picodet_object_detection.task_model."
            "PicoDetObjectDetection"
        ),
        "model_init_args": {
            "model_name": "picodet-s",
            "classes": {i: f"c{i}" for i in range(num_classes)},
            "image_size": (IMG, IMG),
        },
        "train_model": sd,
    }
    path = tmp_path / "ckpt.pt"
    torch.save(ckpt, path)
    sha = hashlib.sha256(path.read_bytes()).hexdigest()

    from lightly_train_tpu.tasks import task_zoo
    from lightly_train_tpu.tasks.model_io import load_model

    monkeypatch.setitem(
        task_zoo.TASK_ZOO, "picodet-s-coco",
        (f"file://{path}", sha, "object_detection_picodet"),
    )
    monkeypatch.setenv("LIGHTLY_TRAIN_CACHE_DIR", str(tmp_path / "cache"))
    loaded = load_model("picodet-s-coco")
    assert loaded.task == "object_detection"
    assert loaded.image_size == IMG

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        feats = list(backbone(xt))
        levels = list(neck(feats))
        ref_cls, ref_reg = o2o(levels)

    tm = loaded.train_model
    params = loaded.variables["params"]
    model_state = {
        k: v for k, v in loaded.variables.items() if k != "params"
    }
    cls_outs, reg_outs, _ = tm._forward(params, model_state, jnp.asarray(x),
                                        False)
    assert len(cls_outs) == len(ref_cls) == 4
    for li, (gc, gr, rc, rr) in enumerate(
        zip(cls_outs, reg_outs, ref_cls, ref_reg)
    ):
        np.testing.assert_allclose(
            np.asarray(gc), rc.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=1e-3, err_msg=f"cls level {li}",
        )
        np.testing.assert_allclose(
            np.asarray(gr), rr.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=1e-3, err_msg=f"reg level {li}",
        )

    # The decode path runs end to end on the converted weights.
    boxes, scores, labels = tm.predict(loaded.variables, jnp.asarray(x))
    assert np.asarray(scores).shape[0] == 1
