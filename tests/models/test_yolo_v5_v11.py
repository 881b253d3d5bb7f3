"""YOLOv5 (C3) and YOLO11 (C3k2 + C2PSA) backbones: golden converter parity.

torch mirrors follow ``ultralytics/nn/modules/block.py`` semantics exactly
(C3 parallel branches, C3k2's e=0.5 bottlenecks / C3k children, C2PSA's
per-head attention with key_dim = head_dim/2 and the depthwise positional
branch) and the ``model.model.{i}.*`` state-dict naming, mirroring the
YOLOv8 golden-test pattern (tests/models/test_yolo.py). Reference SSL cut
contracts: v5 before SPPF, v11 after C2PSA
(``_models/ultralytics/ultralytics.py:108-153``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.models.convert import (
    convert_yolo11_state_dict,
    convert_yolov5_state_dict,
)
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.models.yolo import yolo_family_config

torch = pytest.importorskip("torch")
nn = torch.nn


class TConv(nn.Module):
    def __init__(self, ci, co, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(
            ci, co, k, s, k // 2 if p is None else p, groups=g, bias=False
        )
        self.bn = nn.BatchNorm2d(co)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, ci, co, shortcut=True, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(co * e)
        self.cv1 = TConv(ci, c_, k[0])
        self.cv2 = TConv(c_, co, k[1])
        self.add = shortcut and ci == co

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(nn.Module):
    def __init__(self, ci, co, n=1, shortcut=True, k=1):
        super().__init__()
        c_ = co // 2
        self.cv1 = TConv(ci, c_, 1)
        self.cv2 = TConv(ci, c_, 1)
        self.cv3 = TConv(2 * c_, co, 1)
        self.m = nn.Sequential(
            *(TBottleneck(c_, c_, shortcut, k=(k, 3), e=1.0)
              for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TC3k(TC3):
    def __init__(self, ci, co, n=2, shortcut=True, k=3):
        super().__init__(ci, co, n, shortcut, k=k)


class TC3k2(nn.Module):
    def __init__(self, ci, co, n=1, c3k=False, e=0.5, shortcut=True):
        super().__init__()
        self.c = int(co * e)
        self.cv1 = TConv(ci, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, co, 1)
        self.m = nn.ModuleList(
            TC3k(self.c, self.c, 2, shortcut) if c3k
            else TBottleneck(self.c, self.c, shortcut)
            for _ in range(n)
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


class TAttention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        h = dim + self.key_dim * num_heads * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class TPSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4):
        super().__init__()
        self.attn = TAttention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = nn.Sequential(
            TConv(c, c * 2, 1), TConv(c * 2, c, 1, act=False)
        )

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(nn.Module):
    def __init__(self, ci, co, n=1, e=0.5):
        super().__init__()
        self.c = int(ci * e)
        self.cv1 = TConv(ci, 2 * self.c, 1)
        self.cv2 = TConv(2 * self.c, ci, 1)
        self.m = nn.Sequential(
            *(TPSABlock(self.c, num_heads=max(1, self.c // 64))
              for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


def _randomize_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)


def test_yolov5_converter_golden_parity():
    cfg = yolo_family_config("yolov5test")
    ch, n = cfg.ch, cfg.n
    torch.manual_seed(0)
    tm = nn.Sequential(
        TConv(3, ch(64), 6, 2, p=2),
        TConv(ch(64), ch(128), 3, 2),
        TC3(ch(128), ch(128), n(3)),
        TConv(ch(128), ch(256), 3, 2),
        TC3(ch(256), ch(256), n(6)),
        TConv(ch(256), ch(512), 3, 2),
        TC3(ch(512), ch(512), n(9)),
        TConv(ch(512), ch(1024), 3, 2),
        TC3(ch(1024), ch(1024), n(3)),
    ).eval()
    _randomize_bn(tm)
    sd = {f"model.model.{k}": v for k, v in tm.state_dict().items()}
    n_per_c3 = {i: n({2: 3, 4: 6, 6: 9, 8: 3}[i]) for i in (2, 4, 6, 8)}
    variables = convert_yolov5_state_dict(sd, n_per_c3)

    w = get_wrapped_model("ultralytics/yolov5test")
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = w.forward_features(jax.device_put(variables), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["features"]),
        ref.permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-4,
    )


def test_yolo11_converter_golden_parity():
    cfg = yolo_family_config("yolo11test")
    ch, n = cfg.ch, cfg.n
    torch.manual_seed(1)
    tm = nn.Sequential(
        TConv(3, ch(64), 3, 2),
        TConv(ch(64), ch(128), 3, 2),
        TC3k2(ch(128), ch(256), n(2), c3k=False, e=0.25),
        TConv(ch(256), ch(256), 3, 2),
        TC3k2(ch(256), ch(512), n(2), c3k=False, e=0.25),
        TConv(ch(512), ch(512), 3, 2),
        TC3k2(ch(512), ch(512), n(2), c3k=True),
        TConv(ch(512), ch(1024), 3, 2),
        TC3k2(ch(1024), ch(1024), n(2), c3k=True),
        TSPPF(ch(1024), ch(1024)),
        TC2PSA(ch(1024), ch(1024), n(2)),
    ).eval()
    _randomize_bn(tm)
    sd = {f"model.model.{k}": v for k, v in tm.state_dict().items()}
    n_per_block = {i: n(2) for i in (2, 4, 6, 8, 10)}
    variables = convert_yolo11_state_dict(sd, n_per_block)

    w = get_wrapped_model("ultralytics/yolo11test")
    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = w.forward_features(jax.device_put(variables), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["features"]),
        ref.permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-4,
    )


def test_yolo_family_forward_shapes():
    for name, stride_feats in (
        ("ultralytics/yolov5test", [8, 4, 2]),
        ("ultralytics/yolo11test", [8, 4, 2]),
    ):
        w = get_wrapped_model(name)
        v = w.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        out = w.forward_features(v, jnp.zeros((2, 64, 64, 3)))
        assert out["features"].shape[-1] == w.feature_dim
        assert [t.shape[1] for t in out["stage_features"]] == stride_feats
