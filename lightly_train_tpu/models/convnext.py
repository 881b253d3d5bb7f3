"""ConvNeXt backbone in Flax (DINOv3 ConvNeXt family).

Rebuild of the vendored ConvNeXt
(``src/lightly_train/_models/dinov3/dinov3_src/models/convnext.py``):
stem + 4 stages of (dwconv7x7 -> LN -> pw expand 4x -> GELU -> pw project)
blocks with LayerScale and stochastic depth. Channels-last throughout; the
depthwise conv and 1x1 convs map directly onto TPU conv/MXU paths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.models.vit import DropPath


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    layerscale_init: float = 1e-6
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32


class ConvNeXtBlock(nn.Module):
    dim: int
    layerscale_init: float
    drop_path: float
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        h = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding="SAME",
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layerscale_init), (self.dim,)
        )
        h = h * gamma.astype(h.dtype)
        return x + DropPath(self.drop_path, name="dp")(h, deterministic)


class ConvNeXt(nn.Module):
    """Returns the stage-4 feature map plus pooled features.

    Output dict matches the ViT trunk contract: ``features`` (B, H/32, W/32, D),
    ``cls_token`` = global-average-pooled features (CNNs have no CLS;
    the reference pools too, ``model_wrapper.py:forward_pool``), and
    ``stage_features`` for multi-scale consumers (LT-DETR necks).
    """

    cfg: ConvNeXtConfig

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict[str, jax.Array]:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        total_blocks = sum(cfg.depths)
        dp_rates = [
            cfg.drop_path_rate * i / max(total_blocks - 1, 1)
            for i in range(total_blocks)
        ]
        block_idx = 0
        stage_feats = []
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(
                    cfg.dims[0],
                    kernel_size=(4, 4),
                    strides=(4, 4),
                    padding="VALID",
                    dtype=cfg.dtype,
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(dtype=cfg.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(dtype=cfg.dtype, name=f"down{stage}_norm")(x)
                x = nn.Conv(
                    cfg.dims[stage],
                    kernel_size=(2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=cfg.dtype,
                    name=f"down{stage}_conv",
                )(x)
            for b in range(cfg.depths[stage]):
                x = ConvNeXtBlock(
                    cfg.dims[stage],
                    cfg.layerscale_init,
                    dp_rates[block_idx],
                    cfg.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, deterministic=not train)
                block_idx += 1
            stage_feats.append(x)
        # Final LayerNorm over [pooled-cls; patch tokens] with shared params
        # (``convnext.py:246-248``: x_norm = self.norm(cat([x_pool, x]))).
        B, H, W, D = x.shape
        pooled = jnp.mean(x, axis=(1, 2), keepdims=False)
        norm = nn.LayerNorm(dtype=cfg.dtype, name="norm")
        tokens = jnp.concatenate([pooled[:, None, :], x.reshape(B, H * W, D)],
                                 axis=1)
        tokens = norm(tokens)
        patch_tokens = tokens[:, 1:]
        return {
            "features": patch_tokens.reshape(B, H, W, D),
            "cls_token": tokens[:, 0],
            "patch_tokens": patch_tokens,
            "stage_features": stage_feats,
        }


_CONVNEXT_SIZES = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    # test-size factory (reference _dinov3_convnext_test)
    "test": ((1, 1, 1, 1), (8, 16, 32, 64)),
}


def convnext_config(size: str, dtype: Any = jnp.float32) -> ConvNeXtConfig:
    if size not in _CONVNEXT_SIZES:
        raise ValueError(
            f"Unknown ConvNeXt size '{size}'. Options: {sorted(_CONVNEXT_SIZES)}"
        )
    depths, dims = _CONVNEXT_SIZES[size]
    return ConvNeXtConfig(depths=depths, dims=dims, dtype=dtype)
