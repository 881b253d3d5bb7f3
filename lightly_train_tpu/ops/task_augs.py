"""On-device geometric augmentations for fine-tuning tasks.

TPU-native rebuild of the reference's albumentations task pipelines
(``src/lightly_train/_transforms/eomt_transforms/utils.py:78-191``,
``image_classification_transform.py:123-230``). The reference composes
host-side ops over variable-size numpy images (Resize to a random scale,
RandomCrop with pad_if_needed, flips, ColorJitter); the TPU design keeps the
staged uint8 batch at a fixed resolution and expresses the whole geometric
chain as ONE crop-box per sample executed by the MXU matmul resampler
(``ops/augment.crop_resize_matmul``), extended here with out-of-bounds
padding so zoom-out (scale < 1) fills borders exactly like the reference's
constant-fill padding (image fill, mask fill=ignore_index).

Equivalence used for scale-jitter + random-crop (the EoMT recipe): resizing
the image to (s*oh, s*ow) and then cropping (oh, ow) at offset (y0r, x0r) is
identical to sampling the source window

    h_src = oh * H / (s*oh),  y0_src = y0r * H / (s*oh)

from the ORIGINAL image and resizing it to (oh, ow). When s < 1 the window
is larger than the image and the out-of-window mass is the pad fill
(albumentations RandomCrop(pad_if_needed=True, pad_position="center")).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _hat_matrix_unclipped(src: jax.Array, in_size: int) -> jax.Array:
    """(out,) source coords -> (out, in) bilinear weights; rows for coords
    outside [-1, in] get ZERO total weight (that mass becomes the pad fill)."""
    idx = jnp.arange(in_size, dtype=jnp.float32)
    d = 1.0 - jnp.abs(src[:, None] - idx[None, :])
    return jnp.clip(d, 0.0, 1.0)


def _nearest_matrix_unclipped(src: jax.Array, in_size: int) -> jax.Array:
    """One-hot nearest weights; out-of-range coords get an all-zero row."""
    idx = jnp.arange(in_size, dtype=jnp.float32)
    nearest = jnp.round(src)
    return (jnp.abs(nearest[:, None] - idx[None, :]) < 0.5).astype(jnp.float32)


def padded_crop_resize(
    images: jax.Array,  # (B, H, W, C) float in [0,1] (or uint8)
    y0: jax.Array,
    x0: jax.Array,
    h: jax.Array,
    w: jax.Array,
    out_hw: Tuple[int, int],
    fill: float = 0.0,
    hflip: Optional[jax.Array] = None,
    vflip: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched bilinear crop+resize with constant-fill out-of-bounds padding.

    Crop boxes may extend beyond the image; missing sampling mass is replaced
    by ``fill`` (albumentations pad_if_needed semantics). Flips ride the
    sampling coordinates for free.
    """
    B, H, W, C = images.shape
    oh, ow = out_hw
    t_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    t_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    t_y = (
        jnp.where(vflip[:, None], 1.0 - t_y[None, :], t_y[None, :])
        if vflip is not None
        else t_y[None, :]
    )
    t_x = (
        jnp.where(hflip[:, None], 1.0 - t_x[None, :], t_x[None, :])
        if hflip is not None
        else t_x[None, :]
    )
    sy = y0[:, None] + t_y * h[:, None] - 0.5
    sx = x0[:, None] + t_x * w[:, None] - 0.5
    Ry = jax.vmap(lambda s: _hat_matrix_unclipped(s, H))(sy)  # (B, oh, H)
    Rx = jax.vmap(lambda s: _hat_matrix_unclipped(s, W))(sx)  # (B, ow, W)
    img_f = images.astype(jnp.float32)
    rows = jnp.einsum("boh,bhwc->bowc", Ry, img_f)
    out = jnp.einsum("bowc,bxw->boxc", rows, Rx)  # (B, oh, ow, C)
    if fill != 0.0:
        wy = jnp.sum(Ry, axis=-1)  # (B, oh) in [0, 1]
        wx = jnp.sum(Rx, axis=-1)  # (B, ow)
        mass = wy[:, :, None] * wx[:, None, :]
        out = out + (1.0 - mass)[..., None] * fill
    return out


def padded_crop_resize_nearest(
    maps: jax.Array,  # (B, H, W) int
    y0: jax.Array,
    x0: jax.Array,
    h: jax.Array,
    w: jax.Array,
    out_hw: Tuple[int, int],
    fill: int,
    hflip: Optional[jax.Array] = None,
    vflip: Optional[jax.Array] = None,
) -> jax.Array:
    """Nearest-neighbor crop+resize for id maps; out-of-bounds -> ``fill``
    (ignore_index for semantic masks, NO_SEGMENT for instance slot maps)."""
    B, H, W = maps.shape
    oh, ow = out_hw
    t_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    t_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    t_y = (
        jnp.where(vflip[:, None], 1.0 - t_y[None, :], t_y[None, :])
        if vflip is not None
        else t_y[None, :]
    )
    t_x = (
        jnp.where(hflip[:, None], 1.0 - t_x[None, :], t_x[None, :])
        if hflip is not None
        else t_x[None, :]
    )
    sy = y0[:, None] + t_y * h[:, None] - 0.5
    sx = x0[:, None] + t_x * w[:, None] - 0.5
    Ry = jax.vmap(lambda s: _nearest_matrix_unclipped(s, H))(sy)
    Rx = jax.vmap(lambda s: _nearest_matrix_unclipped(s, W))(sx)
    m = maps.astype(jnp.float32)[..., None]
    rows = jnp.einsum("boh,bhwc->bowc", Ry, m)
    out = jnp.einsum("bowc,bxw->boxc", rows, Rx)[..., 0]
    mass = jnp.sum(Ry, axis=-1)[:, :, None] * jnp.sum(Rx, axis=-1)[:, None, :]
    out = jnp.where(mass > 0.5, jnp.round(out), float(fill))
    return out.astype(maps.dtype)


def sample_scale_jitter_crop(
    key: jax.Array,
    batch: int,
    in_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    min_scale: float,
    max_scale: float,
    num_scales: int,
    prob: float = 1.0,
    crop_prob: float = 1.0,
    pad_if_needed: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-sample crop boxes for scale_jitter + random_crop(pad center).

    Returns (y0, x0, h, w) in STAGED-image pixels. With probability
    ``1 - prob`` the scale step is skipped and the box is a plain (oh, ow)
    random crop of the staged image (albumentations OneOf(p=prob) followed by
    RandomCrop). Scales are the reference's ``np.linspace(min, max, num)``
    grid (``eomt_transforms/utils.py:96-115``). ``crop_prob`` < 1 skips the
    whole crop for a sample (identity box over the staged image);
    ``pad_if_needed=False`` clamps windows inside the image instead of
    center-padding when the jittered window exceeds it.
    """
    H, W = in_hw
    oh, ow = out_hw
    k_s, k_apply, k_y, k_x, k_crop = jax.random.split(key, 5)
    scales = jnp.linspace(min_scale, max_scale, max(num_scales, 1))
    s = scales[jax.random.randint(k_s, (batch,), 0, len(scales))]
    applied = jax.random.uniform(k_apply, (batch,)) < prob
    # Resized dims the crop operates in: (s*oh, s*ow) when the jitter fires,
    # the staged dims otherwise.
    rh = jnp.where(applied, s * oh, float(H))
    rw = jnp.where(applied, s * ow, float(W))
    # Source window size in staged pixels.
    h = oh * H / rh
    w = ow * W / rw
    # Crop offset: uniform over valid positions when the resized image is
    # larger than the crop; centered (negative offset) when smaller
    # (pad_position="center").
    u_y = jax.random.uniform(k_y, (batch,))
    u_x = jax.random.uniform(k_x, (batch,))
    y0r = jnp.where(rh >= oh, u_y * (rh - oh), -(oh - rh) / 2.0)
    x0r = jnp.where(rw >= ow, u_x * (rw - ow), -(ow - rw) / 2.0)
    y0 = y0r * H / rh
    x0 = x0r * W / rw
    if not pad_if_needed:
        h = jnp.minimum(h, float(H))
        w = jnp.minimum(w, float(W))
        y0 = jnp.clip(y0, 0.0, H - h)
        x0 = jnp.clip(x0, 0.0, W - w)
    if crop_prob < 1.0:
        skip = jax.random.uniform(k_crop, (batch,)) >= crop_prob
        y0 = jnp.where(skip, 0.0, y0)
        x0 = jnp.where(skip, 0.0, x0)
        h = jnp.where(skip, float(H), h)
        w = jnp.where(skip, float(W), w)
    return y0, x0, h, w


def sample_random_resized_crop(
    key: jax.Array,
    batch: int,
    in_hw: Tuple[int, int],
    min_scale: float,
    max_scale: float,
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """torchvision-style RandomResizedCrop boxes (area-scale + log-ratio).

    Matches the classification recipe's ``_get_RandomResizedCrop``
    (``image_classification_transform.py:26`` via albumentations
    RandomResizedCrop): area fraction uniform in [min_scale, max_scale],
    aspect ratio log-uniform in ``ratio``; boxes clipped inside the image.
    """
    H, W = in_hw
    k_a, k_r, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(
        k_a, (batch,), minval=min_scale, maxval=max_scale
    ) * (H * W)
    log_r = jax.random.uniform(
        k_r, (batch,),
        minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]),
    )
    r = jnp.exp(log_r)
    w = jnp.clip(jnp.sqrt(area * r), 1.0, W)
    h = jnp.clip(jnp.sqrt(area / r), 1.0, H)
    y0 = jax.random.uniform(k_y, (batch,)) * (H - h)
    x0 = jax.random.uniform(k_x, (batch,)) * (W - w)
    return y0, x0, h, w


def random_rot90(
    key: jax.Array,
    prob: float,
    images: jax.Array,
    maps: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Joint random 90-degree rotation (k in 0..3) of a square batch.

    albumentations RandomRotate90: with probability ``prob`` rotate by a
    uniform k in {1, 2, 3} (identity otherwise). Image (B, H, W, C) and map
    (B, H, W) share the sample's k.
    """
    B, H, W = images.shape[:3]
    if H != W:
        raise ValueError(
            f"random_rot90 requires square staged images, got {(H, W)}"
        )
    k_apply, k_k = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (B,)) < prob
    k = jnp.where(apply, jax.random.randint(k_k, (B,), 1, 4), 0)

    def _rot(x: jax.Array, hw_axes: Tuple[int, int]) -> jax.Array:
        r1 = jnp.rot90(x, 1, hw_axes)
        r2 = jnp.rot90(x, 2, hw_axes)
        r3 = jnp.rot90(x, 3, hw_axes)
        sel = k.reshape((B,) + (1,) * (x.ndim - 1))
        return jnp.where(
            sel == 1, r1, jnp.where(sel == 2, r2, jnp.where(sel == 3, r3, x))
        )

    out_img = _rot(images, (1, 2))
    if maps is None:
        return out_img, None
    if isinstance(maps, (list, tuple)):
        # Several id maps (e.g. masks + seg_map) share each sample's k.
        return out_img, [_rot(m, (1, 2)) for m in maps]
    return out_img, _rot(maps, (1, 2))
