"""ViT -> multi-scale pyramid adapter for LT-DETR (DINOSTAs).

Rebuild of the reference's DEIMv2-style backbone wrapper
(``ltdetr_object_detection/dino_vit_wrapper.py:56-296``): three final-norm
ViT taps at ``interaction_indexes`` resized to /8, /16, /32, fused with a
small conv "spatial prior" stem (STA) on the raw image, then projected per
level with 1x1 conv + BN. Parameter-isomorphic with the torch module
(converter: ``tasks/detection/convert.py``), golden-tested against it.

The ECViT / ConvNeXt backbones bypass this adapter — they already emit a
(P3, P4, P5) pyramid (``ecvit_vit_wrapper.py:20-52``,
``dinov3_convnext_wrapper.py``)."""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.tasks.detection.components import BN_EPS, BN_MOMENTUM


class SpatialPriorModule(nn.Module):
    """``SpatialPriorModulev2`` (``dino_vit_wrapper.py:56-122``): conv stem
    producing /8, /16, /32 detail features from the raw image."""

    inplanes: int = 16
    dtype: Any = jnp.float32

    def _conv(self, ch: int, name: str):
        return nn.Conv(
            ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name=name,
        )

    def _bn(self, train: bool, name: str):
        return nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        ip = self.inplanes
        # stem: conv s2 + BN + GELU + maxpool 3x3 s2 pad 1  (1/4)
        c1 = self._conv(ip, "stem_conv")(x)
        c1 = self._bn(train, "stem_norm")(c1)
        c1 = nn.gelu(c1)
        c1 = nn.max_pool(
            c1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        # conv2: conv s2 + BN                                (1/8)
        c2 = self._bn(train, "conv2_norm")(
            self._conv(2 * ip, "conv2_conv")(c1)
        )
        # conv3: GELU + conv s2 + BN                         (1/16)
        c3 = self._bn(train, "conv3_norm")(
            self._conv(4 * ip, "conv3_conv")(nn.gelu(c2))
        )
        # conv4: GELU + conv s2 + BN                         (1/32)
        c4 = self._bn(train, "conv4_norm")(
            self._conv(4 * ip, "conv4_conv")(nn.gelu(c3))
        )
        return c2, c3, c4


class DINOSTAs(nn.Module):
    """Fuse three ViT taps with the STA conv pyramid and project
    (``dino_vit_wrapper.py:243-296``).

    ``taps``: final-norm ViT features (B, H_c, W_c, C) at
    ``interaction_indexes`` (computed by the trunk via ``tap_indices=``);
    resized bilinearly (align_corners=False) to /8, /16, /32."""

    hidden_dim: int
    use_sta: bool = True
    conv_inplane: int = 32
    resize_features: bool = True
    project_features: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jax.Array,  # (B, H, W, 3)
        taps: Sequence[jax.Array],  # 3 x (B, H_c, W_c, C)
        train: bool = False,
    ) -> List[jax.Array]:
        assert len(taps) == 3
        B, H_c, W_c, _ = taps[0].shape
        num_scales = len(taps) - 2  # = 1

        resized = []
        for i, t in enumerate(taps):
            if not self.resize_features:
                resized.append(t)
                continue
            rh = int(H_c * 2 ** (num_scales - i))
            rw = int(W_c * 2 ** (num_scales - i))
            resized.append(
                jax.image.resize(
                    t, (B, rh, rw, t.shape[-1]), "bilinear",
                    antialias=False,
                ).astype(t.dtype)
            )

        if self.use_sta:
            details = SpatialPriorModule(
                self.conv_inplane, dtype=self.dtype, name="sta"
            )(image, train)
            fused = []
            for sem, det in zip(resized, details):
                det_r = jax.image.resize(
                    det,
                    (B,) + sem.shape[1:3] + (det.shape[-1],),
                    "bilinear",
                    antialias=False,
                ).astype(sem.dtype)
                fused.append(jnp.concatenate([sem, det_r], axis=-1))
        else:
            fused = resized

        if not self.project_features:
            return fused

        out = []
        for i, f in enumerate(fused):
            x = nn.Conv(
                self.hidden_dim, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"convs{i}",
            )(f)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype, name=f"norms{i}",
            )(x)
            out.append(x)
        return out


def resolve_vit_adapter(
    embed_dim: int, depth: int
) -> Tuple[Tuple[int, int, int], int]:
    """(interaction_indexes, conv_inplane_factor) per model size
    (``LTDETRRTDETRBackboneWrapperConfig``, ``config.py:566-640``)."""
    if depth >= 40:
        idx, factor = (19, 29, 39), 4
    elif depth >= 24:
        idx, factor = (11, 17, 23), 4
    elif embed_dim <= 256:
        idx, factor = (3, 7, 11), 1
    elif embed_dim <= 384:
        idx, factor = (5, 8, 11), 2
    else:
        idx, factor = (5, 8, 11), 4
    # Tiny test trunks (depth < 12): clamp taps into range.
    idx = tuple(min(i, depth - 1) for i in idx)
    return idx, factor
