"""Pallas TPU kernel: fused crop + resize + flip + normalize.

The geometry + normalization stage of the augmentation pipeline as a single
VMEM-resident kernel (BASELINE.json "fused multi-crop augmentation kernels"):
one grid step per image loads the uint8 canonical image into VMEM once,
builds the bilinear resampling operators from SMEM-prefetched crop
parameters, runs two 2-D resampling matmuls per channel plane on the MXU,
applies the optional horizontal flip by mirroring the column operator, and
writes the normalized output — no HBM round-trips between stages.

Layout: channel-PLANAR (B, 3, H, W) in and out. Mosaic's vector layouts do
not support the (H, W, 3) interleaved reshuffles, and planar keeps every
matmul a plain 2-D (sublane x lane) op; the NHWC transposes happen once in
XLA outside the kernel.

Photometric ops (color jitter, blur, solarize) stay in XLA where they fuse
into neighboring elementwise work.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD


def _kernel(
    params_ref,  # (B, 5) f32 in SMEM: y0, x0, h, w, flip
    img_ref,  # (1, 3, H, W) uint8 VMEM
    out_ref,  # (1, 3, oh, ow) out dtype VMEM
    *,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
):
    b = pl.program_id(0)
    H, W = img_ref.shape[2], img_ref.shape[3]
    oh, ow = out_ref.shape[2], out_ref.shape[3]
    y0 = params_ref[b, 0]
    x0 = params_ref[b, 1]
    h = params_ref[b, 2]
    w = params_ref[b, 3]
    flip = params_ref[b, 4]

    iy = jax.lax.broadcasted_iota(jnp.int32, (oh, 1), 0).astype(jnp.float32)
    sy = jnp.clip(y0 + (iy + 0.5) * (h / oh) - 0.5, 0.0, H - 1.0)  # (oh, 1)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (oh, H), 1).astype(jnp.float32)
    Ry = jnp.clip(1.0 - jnp.abs(sy - col_h), 0.0, 1.0)  # (oh, H)

    # Build the TRANSPOSED column operator directly: (W, ow) — mirrored
    # output coordinates implement the horizontal flip.
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, ow), 1).astype(jnp.float32)
    ix = jnp.where(flip > 0.5, (ow - 1.0) - ix, ix)
    sx = jnp.clip(x0 + (ix + 0.5) * (w / ow) - 0.5, 0.0, W - 1.0)  # (1, ow)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (W, ow), 0).astype(jnp.float32)
    RxT = jnp.clip(1.0 - jnp.abs(sx - row_w), 0.0, 1.0)  # (W, ow)

    for c in range(3):
        # Mosaic has no direct uint8->f32 cast; go through int32.
        plane = img_ref[0, c].astype(jnp.int32).astype(jnp.float32)  # (H, W)
        rows = jnp.dot(Ry, plane, preferred_element_type=jnp.float32)
        out = jnp.dot(rows, RxT, preferred_element_type=jnp.float32)
        out = out * (1.0 / (std[c] * 255.0)) - (mean[c] / std[c])
        out_ref[0, c] = out.astype(out_ref.dtype)


def fused_crop_resize_normalize(
    images: jax.Array,  # (B, H, W, 3) uint8 (NHWC at the API boundary)
    boxes: jax.Array,  # (B, 4) f32 pixel crop boxes (y0, x0, h, w)
    flips: jax.Array,  # (B,) bool horizontal flips
    out_size: Tuple[int, int],
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Fused geometry stage: returns normalized (B, oh, ow, 3) views."""
    B, H, W, C = images.shape
    assert C == 3
    oh, ow = out_size
    params = jnp.concatenate(
        [boxes.astype(jnp.float32), flips.astype(jnp.float32)[:, None]], axis=1
    )  # (B, 5)
    planar = images.transpose(0, 3, 1, 2)  # (B, 3, H, W) — one XLA transpose
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, H, W), lambda b, p: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, oh, ow), lambda b, p: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(_kernel, mean=tuple(mean), std=tuple(std))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 3, oh, ow), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(params, planar)
    return out.transpose(0, 2, 3, 1)  # back to NHWC
