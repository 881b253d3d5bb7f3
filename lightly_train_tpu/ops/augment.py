"""On-device fused multi-crop augmentation.

TPU-native replacement for the reference's CPU albumentations pipeline
(``src/lightly_train/_transforms/view_transform.py:133-213``): the op order is
identical — RandomResizedCrop -> HFlip/VFlip -> ColorJitter -> ToGray ->
GaussianBlur -> Solarize -> Normalize — but everything runs batched on device
from uint8 HBM input, with stateless ``jax.random`` keys, static shapes, and
XLA fusion. The host only decodes images to a canonical (B, H, W, 3) uint8
batch; all randomness and pixel math happen here.

Design notes vs the reference:
- Crop+resize is separable bilinear sampling (two gather+lerp passes) instead
  of cv2 INTER_AREA; for the crop scales used in SSL the difference is noise.
- RandomResizedCrop samples scale/log-ratio once and clamps to the image
  bounds rather than rejection-sampling (data-dependent loops do not jit).
- Hue is a rotation in YIQ space (linear) rather than an HSV round-trip.
- GaussianBlur uses a static kernel width with a traced sigma, implemented as
  two 1-D convolutions via batched matmuls (MXU-friendly).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# ImageNet normalization (reference: _transforms/normalize NormalizeArgs defaults).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ViewAugmentConfig:
    """Static (compile-time) parameters for one view family.

    Mirrors ``MethodTransformArgs`` fields (``_transforms/transform.py:306``)
    that the SSL methods feed per view.
    """

    out_size: Tuple[int, int] = (224, 224)
    crop_scale: Tuple[float, float] = (0.08, 1.0)
    crop_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    hflip_prob: float = 0.5
    vflip_prob: float = 0.0
    # color jitter
    cj_prob: float = 0.8
    cj_strength: float = 0.5
    cj_bright: float = 0.8
    cj_contrast: float = 0.8
    cj_sat: float = 0.4
    cj_hue: float = 0.2
    # grayscale
    gray_prob: float = 0.2
    # blur
    blur_prob: float = 0.5
    blur_sigma: Tuple[float, float] = (0.1, 2.0)
    blur_kernel_size: int = 9
    # solarize
    solarize_prob: float = 0.0
    solarize_threshold: float = 0.5
    # normalize
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


def _sample_crop_boxes(
    key: jax.Array,
    batch: int,
    in_hw: Tuple[int, int],
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample (y0, x0, h, w) float crop boxes, one per image. Shapes (B,)."""
    H, W = in_hw
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(
        k_area, (batch,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (batch,),
        minval=math.log(ratio[0]),
        maxval=math.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    # Clamp to bounds instead of retrying (static shapes under jit).
    w = jnp.clip(w, 1.0, W)
    h = jnp.clip(h, 1.0, H)
    y0 = jax.random.uniform(k_y, (batch,)) * (H - h)
    x0 = jax.random.uniform(k_x, (batch,)) * (W - w)
    return y0, x0, h, w


def _crop_resize_one(
    img: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    h: jax.Array,
    w: jax.Array,
    out_hw: Tuple[int, int],
) -> jax.Array:
    """Separable bilinear crop+resize of one (H, W, C) image to out_hw."""
    H, W = img.shape[0], img.shape[1]
    out_h, out_w = out_hw
    sy = y0 + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    sx = x0 + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    sy = jnp.clip(sy, 0.0, H - 1.0)
    sx = jnp.clip(sx, 0.0, W - 1.0)
    y_lo = jnp.floor(sy).astype(jnp.int32)
    x_lo = jnp.floor(sx).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, H - 1)
    x_hi = jnp.minimum(x_lo + 1, W - 1)
    wy = (sy - y_lo.astype(jnp.float32))[:, None, None]
    wx = (sx - x_lo.astype(jnp.float32))[None, :, None]
    img_f = img.astype(jnp.float32)
    rows = jnp.take(img_f, y_lo, axis=0) * (1.0 - wy) + jnp.take(
        img_f, y_hi, axis=0
    ) * wy  # (out_h, W, C)
    out = jnp.take(rows, x_lo, axis=1) * (1.0 - wx) + jnp.take(
        rows, x_hi, axis=1
    ) * wx  # (out_h, out_w, C)
    return out


def random_resized_crop(
    key: jax.Array,
    images: jax.Array,
    out_size: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """Batched RandomResizedCrop: (B, H, W, C) uint8/float -> (B, oh, ow, C) f32.

    Output is in [0, 1] when the input is uint8.
    """
    B = images.shape[0]
    in_hw = (images.shape[1], images.shape[2])
    y0, x0, h, w = _sample_crop_boxes(key, B, in_hw, scale, ratio)
    out = jax.vmap(partial(_crop_resize_one, out_hw=out_size))(images, y0, x0, h, w)
    if images.dtype == jnp.uint8:
        out = out * (1.0 / 255.0)
    return out


def random_flip(
    key: jax.Array, images: jax.Array, hflip_prob: float, vflip_prob: float
) -> jax.Array:
    """Random horizontal/vertical flips, batched. images: (B, H, W, C)."""
    kh, kv = jax.random.split(key)
    out = images
    if hflip_prob > 0:
        do_h = jax.random.uniform(kh, (images.shape[0], 1, 1, 1)) < hflip_prob
        out = jnp.where(do_h, out[:, :, ::-1, :], out)
    if vflip_prob > 0:
        do_v = jax.random.uniform(kv, (images.shape[0], 1, 1, 1)) < vflip_prob
        out = jnp.where(do_v, out[:, ::-1, :, :], out)
    return out


_RGB2GRAY = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
# YIQ conversion for linear hue rotation.
_RGB2YIQ = jnp.array(
    [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
    dtype=jnp.float32,
)
_YIQ2RGB = jnp.array(
    [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]],
    dtype=jnp.float32,
)


def color_jitter(
    key: jax.Array,
    images: jax.Array,
    prob: float = 0.8,
    strength: float = 0.5,
    brightness: float = 0.8,
    contrast: float = 0.8,
    saturation: float = 0.4,
    hue: float = 0.2,
) -> jax.Array:
    """Batched ColorJitter on float images in [0, 1].

    Factor ranges follow torchvision semantics: brightness/contrast/saturation
    factors uniform in [max(0, 1-s*v), 1+s*v], hue rotation uniform in
    [-s*h, s*h] turns (applied as YIQ rotation). Applied per-image with
    probability ``prob``; op order fixed b -> c -> s -> h.
    """
    B = images.shape[0]
    k_apply, kb, kc, ks, kh = jax.random.split(key, 5)
    apply = (jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob).astype(jnp.float32)

    def factor(k: jax.Array, v: float) -> jax.Array:
        lo = max(0.0, 1.0 - strength * v)
        hi = 1.0 + strength * v
        return jax.random.uniform(k, (B, 1, 1, 1), minval=lo, maxval=hi)

    out = images
    # brightness
    out = out * factor(kb, brightness)
    # contrast: blend with per-image mean luminance
    gray_mean = jnp.mean(
        jnp.tensordot(out, _RGB2GRAY, axes=([-1], [0])), axis=(1, 2), keepdims=True
    )[..., None]
    fc = factor(kc, contrast)
    out = gray_mean + (out - gray_mean) * fc
    # saturation: blend with per-pixel grayscale
    gray_pix = jnp.tensordot(out, _RGB2GRAY, axes=([-1], [0]))[..., None]
    fs = factor(ks, saturation)
    out = gray_pix + (out - gray_pix) * fs
    # hue: rotate IQ plane
    theta = (
        jax.random.uniform(
            kh, (B, 1, 1), minval=-strength * hue, maxval=strength * hue
        )
        * 2.0
        * jnp.pi
    )
    yiq = jnp.einsum("bhwc,dc->bhwd", out, _RGB2YIQ)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    y, i_ch, q_ch = yiq[..., 0], yiq[..., 1], yiq[..., 2]
    i_rot = i_ch * cos_t - q_ch * sin_t
    q_rot = i_ch * sin_t + q_ch * cos_t
    out = jnp.einsum(
        "bhwc,dc->bhwd", jnp.stack([y, i_rot, q_rot], axis=-1), _YIQ2RGB
    )
    out = jnp.clip(out, 0.0, 1.0)
    return images * (1.0 - apply) + out * apply


def random_grayscale(key: jax.Array, images: jax.Array, prob: float) -> jax.Array:
    if prob <= 0:
        return images
    B = images.shape[0]
    apply = jax.random.uniform(key, (B, 1, 1, 1)) < prob
    gray = jnp.tensordot(images, _RGB2GRAY, axes=([-1], [0]))[..., None]
    return jnp.where(apply, jnp.broadcast_to(gray, images.shape), images)


def gaussian_blur(
    key: jax.Array,
    images: jax.Array,
    prob: float,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
    kernel_size: int = 9,
) -> jax.Array:
    """Batched random-sigma Gaussian blur via separable 1-D convolutions.

    Per-image traced sigma with a static kernel width; implemented with
    depthwise conv over H then W (XLA lowers this to efficient fused loops).
    """
    if prob <= 0:
        return images
    B, H, W, C = images.shape
    k_apply, k_sigma = jax.random.split(key)
    sigma = jax.random.uniform(
        k_sigma, (B,), minval=sigma_range[0], maxval=sigma_range[1]
    )
    half = kernel_size // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)  # (K,)
    # (B, K) per-image kernels
    kern = jnp.exp(-(x[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    kern = kern / jnp.sum(kern, axis=1, keepdims=True)

    def blur_one(img: jax.Array, k1d: jax.Array) -> jax.Array:
        # img (H, W, C); conv along H then W with reflect-free zero pad
        # normalized by the in-bounds kernel mass to avoid edge darkening.
        pad_h = jnp.pad(img, ((half, half), (0, 0), (0, 0)))
        out = jnp.zeros_like(img)
        norm = jnp.zeros((H, 1, 1), dtype=img.dtype)
        ones = jnp.ones((H,), dtype=img.dtype)
        ones_pad = jnp.pad(ones, (half, half))
        for i in range(kernel_size):
            out = out + k1d[i] * jax.lax.dynamic_slice_in_dim(pad_h, i, H, axis=0)
            norm = norm + k1d[i] * jax.lax.dynamic_slice_in_dim(
                ones_pad, i, H, axis=0
            ).reshape(H, 1, 1)
        img_h = out / norm
        pad_w = jnp.pad(img_h, ((0, 0), (half, half), (0, 0)))
        out = jnp.zeros_like(img_h)
        ones_w = jnp.pad(jnp.ones((W,), dtype=img.dtype), (half, half))
        norm_w = jnp.zeros((1, W, 1), dtype=img.dtype)
        for i in range(kernel_size):
            out = out + k1d[i] * jax.lax.dynamic_slice_in_dim(pad_w, i, W, axis=1)
            norm_w = norm_w + k1d[i] * jax.lax.dynamic_slice_in_dim(
                ones_w, i, W, axis=0
            ).reshape(1, W, 1)
        return out / norm_w

    blurred = jax.vmap(blur_one)(images, kern)
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob
    return jnp.where(apply, blurred, images)


def random_solarize(
    key: jax.Array, images: jax.Array, prob: float, threshold: float = 0.5
) -> jax.Array:
    if prob <= 0:
        return images
    B = images.shape[0]
    apply = jax.random.uniform(key, (B, 1, 1, 1)) < prob
    solarized = jnp.where(images >= threshold, 1.0 - images, images)
    return jnp.where(apply, solarized, images)


def normalize(
    images: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jax.Array:
    mean_a = jnp.asarray(mean, dtype=images.dtype)
    std_a = jnp.asarray(std, dtype=images.dtype)
    return (images - mean_a) / std_a


def augment_view(
    key: jax.Array,
    images: jax.Array,
    cfg: ViewAugmentConfig,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Full fused augmentation for one view of the batch.

    images: (B, H, W, 3) uint8. Returns (B, oh, ow, 3) normalized ``out_dtype``.
    Op order matches ``ViewTransform`` (``view_transform.py:133-213``).
    """
    keys = jax.random.split(key, 6)
    out = random_resized_crop(
        keys[0], images, cfg.out_size, cfg.crop_scale, cfg.crop_ratio
    )
    out = random_flip(keys[1], out, cfg.hflip_prob, cfg.vflip_prob)
    if cfg.cj_prob > 0:
        out = color_jitter(
            keys[2],
            out,
            prob=cfg.cj_prob,
            strength=cfg.cj_strength,
            brightness=cfg.cj_bright,
            contrast=cfg.cj_contrast,
            saturation=cfg.cj_sat,
            hue=cfg.cj_hue,
        )
    out = random_grayscale(keys[3], out, cfg.gray_prob)
    out = gaussian_blur(
        keys[4], out, cfg.blur_prob, cfg.blur_sigma, cfg.blur_kernel_size
    )
    out = random_solarize(keys[5], out, cfg.solarize_prob, cfg.solarize_threshold)
    out = normalize(out, cfg.mean, cfg.std)
    return out.astype(out_dtype)


def augment_views(
    key: jax.Array,
    images: jax.Array,
    view_configs: Sequence[ViewAugmentConfig],
    out_dtype: jnp.dtype = jnp.float32,
) -> list[jax.Array]:
    """Generate multiple independent views of the same uint8 batch.

    Views with the same out_size can be stacked by the caller into
    (V, B, H, W, 3) tensors for single-program multi-view forward passes.
    """
    keys = jax.random.split(key, len(view_configs))
    return [
        augment_view(k, images, cfg, out_dtype) for k, cfg in zip(keys, view_configs)
    ]
