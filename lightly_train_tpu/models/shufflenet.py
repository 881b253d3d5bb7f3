"""ShuffleNetV2 backbone in Flax (torchvision family).

Rebuild of the reference's torchvision ShuffleNetV2 support
(``src/lightly_train/_models/torchvision/shufflenet.py``): conv1 -> maxpool ->
3 stages of ShuffleNetV2 units (channel split + depthwise branch + shuffle)
-> conv5, channels-last with BatchNorm running stats in ``batch_stats``.
The channel shuffle is a reshape/transpose pair XLA fuses into the
surrounding elementwise ops — no data-dependent permutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ShuffleNetV2Config:
    stage_repeats: Tuple[int, ...] = (4, 8, 4)
    stage_channels: Tuple[int, ...] = (116, 232, 464)
    out_channels: int = 1024
    dtype: Any = jnp.float32


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, groups, C // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(B, H, W, C)


class _ShuffleUnit(nn.Module):
    out_ch: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        branch_ch = self.out_ch // 2
        if self.stride == 1:
            shortcut, h = jnp.split(x, 2, axis=-1)
        else:
            shortcut = x
            h = x
            # Downsampling shortcut branch: dw 3x3 s2 + 1x1.
            shortcut = nn.Conv(
                shortcut.shape[-1], (3, 3), strides=(2, 2), padding="SAME",
                feature_group_count=shortcut.shape[-1], use_bias=False,
                dtype=self.dtype, name="short_dw",
            )(shortcut)
            shortcut = norm("short_dw_bn")(shortcut)
            shortcut = nn.Conv(
                branch_ch, (1, 1), use_bias=False, dtype=self.dtype,
                name="short_pw",
            )(shortcut)
            shortcut = nn.relu(norm("short_pw_bn")(shortcut))
        h = nn.Conv(
            branch_ch, (1, 1), use_bias=False, dtype=self.dtype, name="pw1"
        )(h)
        h = nn.relu(norm("pw1_bn")(h))
        h = nn.Conv(
            branch_ch, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=branch_ch, use_bias=False,
            dtype=self.dtype, name="dw",
        )(h)
        h = norm("dw_bn")(h)
        h = nn.Conv(
            branch_ch, (1, 1), use_bias=False, dtype=self.dtype, name="pw2"
        )(h)
        h = nn.relu(norm("pw2_bn")(h))
        return channel_shuffle(jnp.concatenate([shortcut, h], axis=-1))


class ShuffleNetV2(nn.Module):
    """Returns the WrappedModel feature contract dict."""

    cfg: ShuffleNetV2Config

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        x = nn.Conv(
            24, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=cfg.dtype, name="conv1",
        )(x)
        x = nn.relu(
            nn.BatchNorm(
                use_running_average=not train, dtype=cfg.dtype, name="conv1_bn"
            )(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        stage_feats = []
        for s, (reps, ch) in enumerate(
            zip(cfg.stage_repeats, cfg.stage_channels)
        ):
            for b in range(reps):
                x = _ShuffleUnit(
                    ch, stride=2 if b == 0 else 1, dtype=cfg.dtype,
                    name=f"stage{s}_block{b}",
                )(x, train)
            stage_feats.append(x)
        x = nn.Conv(
            cfg.out_channels, (1, 1), use_bias=False, dtype=cfg.dtype,
            name="conv5",
        )(x)
        x = nn.relu(
            nn.BatchNorm(
                use_running_average=not train, dtype=cfg.dtype, name="conv5_bn"
            )(x)
        )
        stage_feats[-1] = x
        B, H, W, D = x.shape
        return {
            "features": x,
            "cls_token": jnp.mean(x, axis=(1, 2)),
            "patch_tokens": x.reshape(B, H * W, D),
            "stage_features": stage_feats,
        }


_SHUFFLENET_SIZES = {
    # torchvision shufflenet_v2_x* widths
    "shufflenet_v2_x0_5": ((4, 8, 4), (48, 96, 192), 1024),
    "shufflenet_v2_x1_0": ((4, 8, 4), (116, 232, 464), 1024),
    "shufflenet_v2_x1_5": ((4, 8, 4), (176, 352, 704), 1024),
    "shufflenet_v2_x2_0": ((4, 8, 4), (244, 488, 976), 2048),
    "shufflenettest": ((1, 1, 1), (8, 16, 32), 32),
}


def shufflenet_config(size: str, dtype: Any = jnp.float32) -> ShuffleNetV2Config:
    if size not in _SHUFFLENET_SIZES:
        raise ValueError(
            f"Unknown ShuffleNet size '{size}'. "
            f"Options: {sorted(_SHUFFLENET_SIZES)}"
        )
    reps, chans, out = _SHUFFLENET_SIZES[size]
    return ShuffleNetV2Config(
        stage_repeats=reps, stage_channels=chans, out_channels=out, dtype=dtype
    )
