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
    """ultralytics ``Conv``: conv(bias=False) + BN + SiLU."""

    out_ch: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = self.kernel // 2  # torch-style symmetric padding: for stride-2
        # even inputs XLA's SAME pads (0,1) while ultralytics' Conv2d pads
        # (1,1) — explicit padding keeps converted checkpoints bit-faithful.
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn"
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h = ConvBNSiLU(self.out_ch, 3, dtype=self.dtype, name="cv1")(x, train)
        h = ConvBNSiLU(self.out_ch, 3, dtype=self.dtype, name="cv2")(h, train)
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
