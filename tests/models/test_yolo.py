"""ultralytics YOLOv8 backbone: shapes, converter golden parity, round-trip.

The golden test builds a torch mirror of ultralytics' backbone blocks
(Conv+BN+SiLU / C2f / SPPF, matching ``ultralytics/nn/modules`` semantics and
the ``model.model.{i}.*`` state-dict naming), converts its random weights via
``convert_ultralytics_state_dict`` and asserts the Flax forward matches the
torch forward — the same fidelity contract as the ViT/ConvNeXt golden tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.models.convert import (
    convert_ultralytics_state_dict,
    convert_yolov8_to_ultralytics_state_dict,
)
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.models.yolo import yolov8_config

torch = pytest.importorskip("torch")
nn = torch.nn


# ------------------------- torch mirror (ultralytics semantics) -------------


class TConv(nn.Module):
    def __init__(self, ci, co, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(co)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, ci, co, shortcut=True):
        super().__init__()
        self.cv1 = TConv(ci, co, 3)
        self.cv2 = TConv(co, co, 3)
        self.add = shortcut and ci == co

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, ci, co, n=1, shortcut=True):
        super().__init__()
        self.c = co // 2
        self.cv1 = TConv(ci, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, co, 1)
        self.m = nn.ModuleList(
            TBottleneck(self.c, self.c, shortcut) for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, ci, co, k=5):
        super().__init__()
        c_ = ci // 2
        self.cv1 = TConv(ci, c_, 1)
        self.cv2 = TConv(c_ * 4, co, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


def _torch_backbone(cfg):
    ch = cfg.ch
    n = cfg.n
    layers = [
        TConv(3, ch(64), 3, 2),
        TConv(ch(64), ch(128), 3, 2),
        TC2f(ch(128), ch(128), n(3)),
        TConv(ch(128), ch(256), 3, 2),
        TC2f(ch(256), ch(256), n(6)),
        TConv(ch(256), ch(512), 3, 2),
        TC2f(ch(512), ch(512), n(6)),
        TConv(ch(512), ch(1024), 3, 2),
        TC2f(ch(1024), ch(1024), n(3)),
        TSPPF(ch(1024), ch(1024)),
    ]
    return nn.Sequential(*layers)


def test_yolov8_forward_shapes():
    w = get_wrapped_model("ultralytics/yolov8test")
    v = w.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    out = w.forward_features(v, jnp.zeros((2, 64, 64, 3)))
    assert out["features"].shape == (2, 2, 2, w.feature_dim)
    s = out["stage_features"]
    assert [t.shape[1] for t in s] == [8, 4, 2]  # strides 8/16/32


def test_yolov8_converter_golden_parity():
    cfg = yolov8_config("yolov8test")
    tm = _torch_backbone(cfg).eval()
    # randomize BN stats so running stats are exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {f"model.model.{k}": v for k, v in tm.state_dict().items()}
    n_per_c2f = {i: cfg.n(3 if i in (2, 8) else 6) for i in (2, 4, 6, 8)}
    variables = convert_ultralytics_state_dict(sd, n_per_c2f)

    w = get_wrapped_model("ultralytics/yolov8test")
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    ref_p5 = tm[:9](torch.from_numpy(x).permute(0, 3, 1, 2))
    ref_sppf = tm[9](ref_p5)
    got = w.forward_features(jax.device_put(variables), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["features"]),
        ref_p5.detach().permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["stage_features"][-1]),
        ref_sppf.detach().permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-4,
    )


def test_yolov8_export_round_trip():
    cfg = yolov8_config("yolov8test")
    tm = _torch_backbone(cfg)
    sd = {f"model.model.{k}": v for k, v in tm.state_dict().items()}
    n_per_c2f = {i: cfg.n(3 if i in (2, 8) else 6) for i in (2, 4, 6, 8)}
    variables = convert_ultralytics_state_dict(sd, n_per_c2f)
    back = convert_yolov8_to_ultralytics_state_dict(variables)
    for k, v in back.items():
        ref = sd["model." + k]
        np.testing.assert_allclose(v, ref.numpy(), atol=1e-6)
    # every torch tensor except BN num_batches_tracked round-trips
    expect = {
        k.removeprefix("model.") for k in sd if "num_batches_tracked" not in k
    }
    assert set(back) == expect


def test_yolov8_pretrains_end_to_end(tmp_path):
    """A YOLO backbone runs through the SSL pretrain path (distillation)."""
    import json

    import lightly_train_tpu as lt
    from PIL import Image

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(data / f"{i}.png")
    out = tmp_path / "out"
    state = lt.pretrain(
        out=str(out),
        data=str(data),
        model="ultralytics/yolov8test",
        method="distillation",
        method_args={
            "teacher": "dinov3/vittest16",
            "image_size": 32,
            "queue_size": 16,
        },
        batch_size=4,
        steps=2,
        precision="fp32",
        canonical_size=64,
        num_workers=0,
        log_every=1,
    )
    assert int(state.step) == 2
    meta = json.loads(
        (out / "exported_models" / "exported_last" / "metadata.json").read_text()
    )
    assert meta["model_name"] == "ultralytics/yolov8test"


def test_load_torch_checkpoint_for_yolov8(tmp_path):
    """load_torch_checkpoint_for_model routes ultralytics names."""
    from lightly_train_tpu.models.convert import load_torch_checkpoint_for_model

    cfg = yolov8_config("yolov8test")
    tm = _torch_backbone(cfg)
    path = tmp_path / "yolov8test.pt"
    torch.save({f"model.model.{k}": v for k, v in tm.state_dict().items()}, path)
    variables = load_torch_checkpoint_for_model(path, "ultralytics/yolov8test")
    assert "layer0" in variables["params"]
    assert "batch_stats" in variables
