"""ResNet backbone in Flax (torchvision-family parity).

Native rebuild of the reference's torchvision package wrappers
(``src/lightly_train/_models/torchvision/resnet.py:47``): ResNet-18/34 basic
blocks and ResNet-50/101 bottlenecks, channels-last, BatchNorm with running
stats carried in the ``batch_stats`` collection.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    bottleneck: bool = False
    width: int = 64
    dtype: Any = jnp.float32
    # ResNet-D / "vd" variant (PResNet in RT-DETR, reference
    # ``_models/rtdetr/rtdetr.py``): 3x conv3x3 deep stem and
    # avgpool+conv1x1 downsample shortcuts.
    deep_stem: bool = False


class BasicBlock(nn.Module):
    filters: int
    strides: int
    dtype: Any
    vd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        h = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides),
            padding=((1, 1), (1, 1)),  # torch-exact (SAME shifts stride-2)
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.relu(norm("bn1")(h))
        h = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = norm("bn2")(h)
        if x.shape[-1] != self.filters or self.strides != 1:
            if self.vd and self.strides != 1:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
                x = nn.Conv(
                    self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="down_conv",
                )(x)
            else:
                x = nn.Conv(
                    self.filters, (1, 1), (self.strides, self.strides),
                    use_bias=False, dtype=self.dtype, name="down_conv",
                )(x)
            x = norm("down_bn")(x)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    filters: int
    strides: int
    dtype: Any
    vd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        h = nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        h = nn.relu(norm("bn1")(h))
        h = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides),
            padding=((1, 1), (1, 1)),  # torch-exact (SAME shifts stride-2)
            use_bias=False, dtype=self.dtype, name="conv2",
        )(h)
        h = nn.relu(norm("bn2")(h))
        h = nn.Conv(
            4 * self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(h)
        h = norm("bn3")(h)
        out_ch = 4 * self.filters
        if x.shape[-1] != out_ch or self.strides != 1:
            if self.vd and self.strides != 1:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
                x = nn.Conv(
                    out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="down_conv",
                )(x)
            else:
                x = nn.Conv(
                    out_ch, (1, 1), (self.strides, self.strides), use_bias=False,
                    dtype=self.dtype, name="down_conv",
                )(x)
            x = norm("down_bn")(x)
        return nn.relu(x + h)


class ResNet(nn.Module):
    cfg: ResNetConfig

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict[str, jax.Array]:
        cfg = self.cfg
        block_cls = Bottleneck if cfg.bottleneck else BasicBlock
        x = images.astype(cfg.dtype)
        if cfg.deep_stem:
            for i, ch in enumerate((cfg.width // 2, cfg.width // 2, cfg.width)):
                x = nn.Conv(
                    ch, (3, 3), (2, 2) if i == 0 else (1, 1),
                    padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=cfg.dtype, name=f"stem_conv{i + 1}",
                )(x)
                x = nn.relu(
                    nn.BatchNorm(use_running_average=not train, dtype=cfg.dtype,
                                 name=f"stem_bn{i + 1}")(x)
                )
        else:
            x = nn.Conv(
                cfg.width, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                use_bias=False, dtype=cfg.dtype, name="stem_conv",
            )(x)
            x = nn.relu(
                nn.BatchNorm(use_running_average=not train, dtype=cfg.dtype,
                             name="stem_bn")(x)
            )
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        stage_feats = []
        for stage, n_blocks in enumerate(cfg.stage_sizes):
            filters = cfg.width * (2**stage)
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = block_cls(
                    filters, strides, cfg.dtype, vd=cfg.deep_stem,
                    name=f"stage{stage}_block{b}",
                )(x, train)
            stage_feats.append(x)
        pooled = jnp.mean(x, axis=(1, 2))
        B, H, W, D = x.shape
        return {
            "features": x,
            "cls_token": pooled,
            "patch_tokens": x.reshape(B, H * W, D),
            "stage_features": stage_feats,
        }


_RESNET_SIZES = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnettest": ((1, 1, 1, 1), False),
    # RT-DETR PResNet "vd" variants (rtdetr package).
    "resnet18vd": ((2, 2, 2, 2), False),
    "resnet34vd": ((3, 4, 6, 3), False),
    "resnet50vd": ((3, 4, 6, 3), True),
    "resnet101vd": ((3, 4, 23, 3), True),
    "resnettestvd": ((1, 1, 1, 1), False),
}


def resnet_config(name: str, dtype: Any = jnp.float32) -> ResNetConfig:
    if name not in _RESNET_SIZES:
        raise ValueError(f"Unknown ResNet '{name}'. Options: {sorted(_RESNET_SIZES)}")
    stages, bottleneck = _RESNET_SIZES[name]
    width = 8 if name.startswith("resnettest") else 64
    return ResNetConfig(
        stage_sizes=stages, bottleneck=bottleneck, width=width, dtype=dtype,
        deep_stem=name.endswith("vd"),
    )


def resnet_feature_dim(name: str) -> int:
    stages, bottleneck = _RESNET_SIZES[name]
    width = 8 if name.startswith("resnettest") else 64
    dim = width * (2 ** (len(stages) - 1))
    return dim * 4 if bottleneck else dim
