"""YOLOv8 CSPDarknet backbone in Flax (ultralytics family).

TPU-native rebuild of the reference's ultralytics package
(``src/lightly_train/_models/ultralytics/ultralytics.py:57-235``): the
reference wraps an installed ``ultralytics`` YOLO model and slices its
Sequential at the C2f-before-SPPF boundary to obtain an SSL feature
extractor. Here the same backbone family is implemented natively —
Conv(+BN+SiLU) stem, C2f cross-stage-partial blocks, SPPF — so YOLO
backbones pretrain on TPU without torch in the loop, and
``convert_ultralytics_state_dict`` (models/convert.py) loads real
ultralytics checkpoints (``model.model.{i}.*`` naming) into it.

Feature contract mirrors the reference cut (``ultralytics.py:100-135``):
``features`` is the last C2f output (pre-SPPF, the reference's SSL
feature_dim); ``stage_features`` are [P3, P4, P5-after-SPPF] strides
{8, 16, 32} for detection necks.

All convs are channels-last SAME convolutions; C2f's chunked dense
connectivity is expressed as a list of concatenated branches so XLA fuses
the BN+SiLU chains into the convs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class YOLOv8Config:
    depth: float = 0.33  # block-count multiple (d)
    width: float = 0.25  # channel multiple (w)
    max_channels: int = 1024  # stage-5 channel cap (r ratio in ultralytics)
    dtype: Any = jnp.float32

    def ch(self, c: int) -> int:
        return int(round(min(c, self.max_channels) * self.width / 8) * 8) or 8

    def n(self, n: int) -> int:
        return max(1, round(n * self.depth))


class ConvBNSiLU(nn.Module):
    """ultralytics ``Conv``: conv(bias=False) + BN + SiLU (optionally no act
    or grouped, for the YOLO11 attention's qkv/proj/pe convs)."""

    out_ch: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32
    pad: int = -1  # -1 = torch autopad (k // 2); YOLOv5's 6x6 stem uses 2
    act: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = self.kernel // 2 if self.pad < 0 else self.pad
        # torch-style symmetric padding: for stride-2 even inputs XLA's SAME
        # pads (0,1) while ultralytics' Conv2d pads (1,1) — explicit padding
        # keeps converted checkpoints bit-faithful.
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn"
        )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """ultralytics ``Bottleneck``: cv1 (k1) -> cv2 (k2), optional residual.

    ``hidden_e`` is the expansion of the hidden width (ultralytics ``e``):
    C2f/C3 bottlenecks use e=1.0, the default/standalone and C3k2's
    non-c3k bottlenecks use e=0.5."""

    out_ch: int
    shortcut: bool
    dtype: Any
    k1: int = 3
    k2: int = 3
    hidden_e: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c_ = int(self.out_ch * self.hidden_e)
        h = ConvBNSiLU(c_, self.k1, dtype=self.dtype, name="cv1")(x, train)
        h = ConvBNSiLU(
            self.out_ch, self.k2, dtype=self.dtype, name="cv2"
        )(h, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            h = h + x
        return h


class C2f(nn.Module):
    """Cross-stage-partial block with n bottlenecks and dense concat."""

    out_ch: int
    n: int
    shortcut: bool
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = self.out_ch // 2
        h = ConvBNSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = list(jnp.split(h, 2, axis=-1))
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, self.dtype, name=f"m{i}")(
                    parts[-1], train
                )
            )
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class C3(nn.Module):
    """ultralytics ``C3`` (YOLOv5): two parallel 1x1 branches, n bottlenecks
    (1x1 -> 3x3, e=1.0 on the hidden half-width) on the first, 1x1 fuse."""

    out_ch: int
    n: int
    shortcut: bool
    dtype: Any
    k: int = 1  # bottleneck cv1 kernel (C3k uses 3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c_ = self.out_ch // 2
        a = ConvBNSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBNSiLU(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.dtype, k1=self.k, k2=3,
                name=f"m{i}",
            )(a, train)
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """ultralytics ``C3k2`` (YOLO11): a C2f whose inner modules are either
    plain Bottlenecks (e=0.5) or ``C3k`` blocks (a C3 with 3x3 bottleneck
    cv1), with hidden width ``int(out * e)``."""

    out_ch: int
    n: int
    shortcut: bool
    dtype: Any
    c3k: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = int(self.out_ch * self.e)
        h = ConvBNSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = list(jnp.split(h, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                m = C3(c, 2, self.shortcut, self.dtype, k=3, name=f"m{i}")
            else:
                m = Bottleneck(
                    c, self.shortcut, self.dtype, hidden_e=0.5,
                    name=f"m{i}",
                )
            parts.append(m(parts[-1], train))
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class PSAAttention(nn.Module):
    """ultralytics ``Attention`` (YOLO11 C2PSA): 1x1-conv qkv over the
    spatial map, per-head attention with key_dim = head_dim * ratio, plus a
    depthwise 3x3 positional branch on v."""

    dim: int
    num_heads: int
    dtype: Any
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        kd = int(hd * self.attn_ratio)
        h_total = self.dim + nh * kd * 2
        qkv = ConvBNSiLU(
            h_total, 1, dtype=self.dtype, act=False, name="qkv"
        )(x, train)
        qkv = qkv.reshape(B, H * W, nh, kd * 2 + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) / jnp.sqrt(float(kd))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            x.dtype
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(
            B, H, W, self.dim
        )
        pe = ConvBNSiLU(
            self.dim, 3, dtype=self.dtype, act=False, groups=self.dim,
            name="pe",
        )(v.reshape(B, H, W, self.dim), train)
        return ConvBNSiLU(
            self.dim, 1, dtype=self.dtype, act=False, name="proj"
        )(out + pe, train)


class PSABlock(nn.Module):
    """ultralytics ``PSABlock``: residual attention + residual conv FFN."""

    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = x + PSAAttention(
            self.dim, max(1, self.dim // 64), self.dtype, name="attn"
        )(x, train)
        h = ConvBNSiLU(self.dim * 2, 1, dtype=self.dtype, name="ffn0")(
            x, train
        )
        h = ConvBNSiLU(
            self.dim, 1, dtype=self.dtype, act=False, name="ffn1"
        )(h, train)
        return x + h


class C2PSA(nn.Module):
    """ultralytics ``C2PSA`` (YOLO11 layer 10): split, n PSA blocks on one
    half, 1x1 fuse."""

    out_ch: int
    n: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = self.out_ch // 2
        h = ConvBNSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(h, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(c, self.dtype, name=f"m{i}")(b, train)
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class SPPF(nn.Module):
    out_ch: int
    dtype: Any
    pool: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1] // 2
        h = ConvBNSiLU(c, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [h]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1],
                    (self.pool, self.pool),
                    strides=(1, 1),
                    padding="SAME",
                )
            )
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class YOLOv8Backbone(nn.Module):
    """Layers 0-9 of the ultralytics YOLOv8 backbone; WrappedModel contract."""

    cfg: YOLOv8Config

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        # Indices mirror ultralytics' Sequential so the converter is 1:1.
        x = ConvBNSiLU(cfg.ch(64), 3, 2, cfg.dtype, name="layer0")(x, train)
        x = ConvBNSiLU(cfg.ch(128), 3, 2, cfg.dtype, name="layer1")(x, train)
        x = C2f(cfg.ch(128), cfg.n(3), True, cfg.dtype, name="layer2")(x, train)
        x = ConvBNSiLU(cfg.ch(256), 3, 2, cfg.dtype, name="layer3")(x, train)
        p3 = C2f(cfg.ch(256), cfg.n(6), True, cfg.dtype, name="layer4")(x, train)
        x = ConvBNSiLU(cfg.ch(512), 3, 2, cfg.dtype, name="layer5")(p3, train)
        p4 = C2f(cfg.ch(512), cfg.n(6), True, cfg.dtype, name="layer6")(x, train)
        x = ConvBNSiLU(cfg.ch(1024), 3, 2, cfg.dtype, name="layer7")(p4, train)
        p5 = C2f(cfg.ch(1024), cfg.n(3), True, cfg.dtype, name="layer8")(x, train)
        sppf = SPPF(cfg.ch(1024), cfg.dtype, name="layer9")(p5, train)
        B, H, W, D = p5.shape
        return {
            # Reference SSL cut: backbone sliced before SPPF
            # (ultralytics.py:100-135) — pretrain features come from the
            # last C2f.
            "features": p5,
            "cls_token": jnp.mean(p5, axis=(1, 2)),
            "patch_tokens": p5.reshape(B, H * W, D),
            "stage_features": [p3, p4, sppf],
        }


class YOLOv5Backbone(nn.Module):
    """ultralytics YOLOv5 backbone (layers 0-8, cut BEFORE SPPF — the
    reference's v5 SSL slice ends at the last C3,
    ``ultralytics.py:108-113``). Layer 0 is the 6x6/2 stem with pad 2."""

    cfg: YOLOv8Config

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        x = ConvBNSiLU(cfg.ch(64), 6, 2, cfg.dtype, pad=2, name="layer0")(
            x, train
        )
        x = ConvBNSiLU(cfg.ch(128), 3, 2, cfg.dtype, name="layer1")(x, train)
        x = C3(cfg.ch(128), cfg.n(3), True, cfg.dtype, name="layer2")(x, train)
        x = ConvBNSiLU(cfg.ch(256), 3, 2, cfg.dtype, name="layer3")(x, train)
        p3 = C3(cfg.ch(256), cfg.n(6), True, cfg.dtype, name="layer4")(x, train)
        x = ConvBNSiLU(cfg.ch(512), 3, 2, cfg.dtype, name="layer5")(p3, train)
        p4 = C3(cfg.ch(512), cfg.n(9), True, cfg.dtype, name="layer6")(x, train)
        x = ConvBNSiLU(cfg.ch(1024), 3, 2, cfg.dtype, name="layer7")(p4, train)
        p5 = C3(cfg.ch(1024), cfg.n(3), True, cfg.dtype, name="layer8")(x, train)
        B, H, W, D = p5.shape
        return {
            "features": p5,
            "cls_token": jnp.mean(p5, axis=(1, 2)),
            "patch_tokens": p5.reshape(B, H * W, D),
            "stage_features": [p3, p4, p5],
        }


class YOLO11Backbone(nn.Module):
    """ultralytics YOLO11 backbone (layers 0-10, cut before Upsample — the
    reference's v11 slice INCLUDES SPPF and C2PSA,
    ``ultralytics.py:143-153``; features = C2PSA output)."""

    cfg: YOLOv8Config

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        x = ConvBNSiLU(cfg.ch(64), 3, 2, cfg.dtype, name="layer0")(x, train)
        x = ConvBNSiLU(cfg.ch(128), 3, 2, cfg.dtype, name="layer1")(x, train)
        x = C3k2(cfg.ch(256), cfg.n(2), True, cfg.dtype, c3k=False, e=0.25,
                 name="layer2")(x, train)
        x = ConvBNSiLU(cfg.ch(256), 3, 2, cfg.dtype, name="layer3")(x, train)
        p3 = C3k2(cfg.ch(512), cfg.n(2), True, cfg.dtype, c3k=False, e=0.25,
                  name="layer4")(x, train)
        x = ConvBNSiLU(cfg.ch(512), 3, 2, cfg.dtype, name="layer5")(p3, train)
        p4 = C3k2(cfg.ch(512), cfg.n(2), True, cfg.dtype, c3k=True,
                  name="layer6")(x, train)
        x = ConvBNSiLU(cfg.ch(1024), 3, 2, cfg.dtype, name="layer7")(p4, train)
        x = C3k2(cfg.ch(1024), cfg.n(2), True, cfg.dtype, c3k=True,
                 name="layer8")(x, train)
        x = SPPF(cfg.ch(1024), cfg.dtype, name="layer9")(x, train)
        p5 = C2PSA(cfg.ch(1024), cfg.n(2), cfg.dtype, name="layer10")(x, train)
        B, H, W, D = p5.shape
        return {
            "features": p5,
            "cls_token": jnp.mean(p5, axis=(1, 2)),
            "patch_tokens": p5.reshape(B, H * W, D),
            "stage_features": [p3, p4, p5],
        }


# name -> (depth, width, max_channels); ultralytics yolov5.yaml scales.
_YOLOV5_SIZES = {
    "yolov5n": (0.33, 0.25, 1024),
    "yolov5s": (0.33, 0.50, 1024),
    "yolov5m": (0.67, 0.75, 1024),
    "yolov5l": (1.00, 1.00, 1024),
    "yolov5x": (1.33, 1.25, 1024),
    "yolov5test": (0.33, 0.05, 128),  # hidden tiny test size
}

# name -> (depth, width, max_channels); ultralytics yolo11.yaml scales.
_YOLO11_SIZES = {
    "yolo11n": (0.50, 0.25, 1024),
    "yolo11s": (0.50, 0.50, 1024),
    "yolo11m": (0.50, 1.00, 512),
    "yolo11l": (1.00, 1.00, 512),
    "yolo11x": (1.00, 1.50, 512),
    "yolo11test": (0.50, 0.125, 1024),  # hidden tiny test size
}


def yolo_family_config(size: str, dtype: Any = jnp.float32) -> YOLOv8Config:
    key = size.removesuffix(".pt").removesuffix("-cls").removesuffix("-seg")
    for table in (_YOLOV8_SIZES, _YOLOV5_SIZES, _YOLO11_SIZES):
        if key in table:
            d, w, mc = table[key]
            return YOLOv8Config(depth=d, width=w, max_channels=mc, dtype=dtype)
    raise ValueError(f"Unknown YOLO size '{size}'.")


# name -> (depth, width, max_channels); ultralytics yolov8.yaml scales.
_YOLOV8_SIZES = {
    "yolov8n": (0.33, 0.25, 1024),
    "yolov8s": (0.33, 0.50, 1024),
    "yolov8m": (0.67, 0.75, 768),
    "yolov8l": (1.00, 1.00, 512),
    "yolov8x": (1.00, 1.25, 512),
    "yolov8test": (0.33, 0.05, 64),  # hidden tiny test size
}


def yolov8_config(size: str, dtype: Any = jnp.float32) -> YOLOv8Config:
    key = size.removesuffix(".pt").removesuffix("-cls").removesuffix("-seg")
    if key not in _YOLOV8_SIZES:
        raise ValueError(
            f"Unknown YOLOv8 size '{size}'. Options: {sorted(_YOLOV8_SIZES)}"
        )
    d, w, mc = _YOLOV8_SIZES[key]
    return YOLOv8Config(depth=d, width=w, max_channels=mc, dtype=dtype)


def yolov8_feature_dim(cfg: YOLOv8Config) -> int:
    return cfg.ch(1024)
