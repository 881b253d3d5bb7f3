"""ECViT (EdgeCrafter) hybrid backbone: conv-pyramid patch embed + RoPE ViT.

Rebuild of ``src/lightly_train/_models/ecvit/ecvit.py:115-612``: a
convolutional pyramid stem (strides 4, 2, 2) whose intermediate stages are
exposed as multi-scale features for detection necks, followed by RoPE
attention transformer blocks on the /16 token grid. The wrapper exposes the
standard feature contract plus ``stage_features`` (multi-scale, like the
reference ``MultiScaleFeatureViT``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.models.vit import Block, ViTConfig, _rope_angles


@dataclasses.dataclass(frozen=True)
class ECViTConfig:
    stem_dims: Tuple[int, ...] = (48, 96, 192)
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    rope_base: float = 100.0
    dtype: Any = jnp.float32

    def vit_config(self) -> ViTConfig:
        return ViTConfig(
            patch_size=16,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            num_register_tokens=0,
            use_rope=True,
            rope_base=self.rope_base,
            drop_path_rate=self.drop_path_rate,
            dtype=self.dtype,
        )


class _StemStage(nn.Module):
    filters: int
    strides: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides), padding="SAME",
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.silu(x)
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn2"
        )(x)
        return nn.silu(x)


class ECViT(nn.Module):
    cfg: ECViTConfig

    @nn.compact
    def __call__(
        self, images: jax.Array, mask: Any = None, train: bool = False
    ) -> dict:
        cfg = self.cfg
        vcfg = cfg.vit_config()
        x = images.astype(cfg.dtype)
        stage_feats = []
        strides = (4, 2, 2)
        for i, (dim, s) in enumerate(zip(cfg.stem_dims, strides)):
            x = _StemStage(dim, s, cfg.dtype, name=f"stem{i}")(x, train)
            stage_feats.append(x)
        # Project /16 conv features to transformer tokens.
        x = nn.Conv(
            cfg.embed_dim, (1, 1), dtype=cfg.dtype, name="token_proj"
        )(x)
        B, gh, gw, D = x.shape
        tokens = x.reshape(B, gh * gw, D)
        head_dim = cfg.embed_dim // cfg.num_heads
        cos, sin = _rope_angles((gh, gw), head_dim, cfg.rope_base)
        rope = (cos.astype(cfg.dtype), sin.astype(cfg.dtype))
        dp = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        for i in range(cfg.depth):
            tokens = Block(
                vcfg, drop_path=dp[i], num_prefix_tokens=0, name=f"block{i}"
            )(tokens, rope, deterministic=not train)
        tokens = nn.LayerNorm(dtype=cfg.dtype, name="norm")(tokens)
        feats = tokens.reshape(B, gh, gw, cfg.embed_dim)
        stage_feats = stage_feats[:-1] + [feats]  # /4, /8, /16-token features
        return {
            "features": feats,
            "cls_token": jnp.mean(tokens, axis=1),
            "patch_tokens": tokens,
            "stage_features": stage_feats,
        }


_ECVIT_SIZES = {
    # name: (stem_dims, embed_dim, depth, heads)
    "ecvitt": ((32, 64, 128), 192, 12, 3),
    "ecvits": ((48, 96, 192), 384, 12, 6),
    "ecvitb": ((64, 128, 256), 768, 12, 12),
    "ecvittest": ((8, 16, 32), 32, 2, 2),
}


def ecvit_config(name: str, dtype: Any = jnp.float32) -> ECViTConfig:
    if name not in _ECVIT_SIZES:
        raise ValueError(f"Unknown ECViT '{name}'. Options: {sorted(_ECVIT_SIZES)}")
    stem, dim, depth, heads = _ECVIT_SIZES[name]
    return ECViTConfig(
        stem_dims=stem, embed_dim=dim, depth=depth, num_heads=heads, dtype=dtype
    )
