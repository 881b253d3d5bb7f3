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


def _bilinear_weight_matrix(
    src: jax.Array, in_size: int
) -> jax.Array:
    """(out,) source coords -> (out, in) bilinear hat-kernel weights.

    Expresses 1-D bilinear resampling as a small dense matmul — on TPU the
    separable resize becomes two MXU matmuls instead of lane-wise gathers
    (gathers are the slow path on the VPU). Rows sum to 1 for coords clipped
    into [0, in-1].
    """
    idx = jnp.arange(in_size, dtype=jnp.float32)
    d = 1.0 - jnp.abs(src[:, None] - idx[None, :])
    return jnp.clip(d, 0.0, 1.0)


def crop_resize_matmul(
    images: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    h: jax.Array,
    w: jax.Array,
    out_hw: Tuple[int, int],
    hflip: jax.Array | None = None,
) -> jax.Array:
    """Batched crop+resize as two batched matmuls (MXU path).

    images: (B, H, W, C); y0/x0/h/w: (B,) crop boxes in pixels. ``hflip``
    ((B,) bool) mirrors the horizontal sampling coordinates — the flip rides
    the resampling matrix for free instead of a separate reversal pass.
    """
    B, H, W, C = images.shape
    oh, ow = out_hw
    t_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    t_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    if hflip is not None:
        t_x = jnp.where(hflip[:, None], 1.0 - t_x[None, :], t_x[None, :])
    else:
        t_x = t_x[None, :]
    sy = jnp.clip(y0[:, None] + t_y[None, :] * h[:, None] - 0.5, 0.0, H - 1.0)
    sx = jnp.clip(x0[:, None] + t_x * w[:, None] - 0.5, 0.0, W - 1.0)
    Ry = jax.vmap(lambda s: _bilinear_weight_matrix(s, H))(sy)  # (B, oh, H)
    Rx = jax.vmap(lambda s: _bilinear_weight_matrix(s, W))(sx)  # (B, ow, W)
    img_f = images.astype(jnp.float32)
    rows = jnp.einsum("boh,bhwc->bowc", Ry, img_f)  # (B, oh, W, C)
    return jnp.einsum("bowc,bxw->boxc", rows, Rx)  # (B, oh, ow, C)


def _nearest_weight_matrix(src: jax.Array, in_size: int) -> jax.Array:
    """(out,) source coords -> (out, in) one-hot nearest-neighbor matrix."""
    idx = jnp.arange(in_size, dtype=jnp.float32)
    nearest = jnp.round(jnp.clip(src, 0, in_size - 1))
    return (jnp.abs(nearest[:, None] - idx[None, :]) < 0.5).astype(jnp.float32)


def crop_resize_nearest(
    masks: jax.Array,  # (B, H, W) int
    y0: jax.Array,
    x0: jax.Array,
    h: jax.Array,
    w: jax.Array,
    out_hw: Tuple[int, int],
) -> jax.Array:
    """Nearest-neighbor crop+resize for integer masks using the same crop
    geometry as the image view (one-hot resampling matrices -> exact ids)."""
    B, H, W = masks.shape
    oh, ow = out_hw
    t_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    t_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    sy = jnp.clip(y0[:, None] + t_y[None, :] * h[:, None] - 0.5, 0.0, H - 1.0)
    sx = jnp.clip(x0[:, None] + t_x[None, :] * w[:, None] - 0.5, 0.0, W - 1.0)
    Ry = jax.vmap(lambda s: _nearest_weight_matrix(s, H))(sy)  # (B, oh, H)
    Rx = jax.vmap(lambda s: _nearest_weight_matrix(s, W))(sx)  # (B, ow, W)
    m = masks.astype(jnp.float32)[..., None]
    rows = jnp.einsum("boh,bhwc->bowc", Ry, m)
    out = jnp.einsum("bowc,bxw->boxc", rows, Rx)[..., 0]
    return jnp.round(out).astype(masks.dtype)


def random_resized_crop(
    key: jax.Array,
    images: jax.Array,
    out_size: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    use_matmul: bool = True,
) -> jax.Array:
    """Batched RandomResizedCrop: (B, H, W, C) uint8/float -> (B, oh, ow, C) f32.

    Output is in [0, 1] when the input is uint8. ``use_matmul`` selects the
    MXU matmul resampler (default; identical math to the gather path).
    """
    B = images.shape[0]
    in_hw = (images.shape[1], images.shape[2])
    y0, x0, h, w = _sample_crop_boxes(key, B, in_hw, scale, ratio)
    if use_matmul:
        out = crop_resize_matmul(images, y0, x0, h, w, out_size)
    else:
        out = jax.vmap(partial(_crop_resize_one, out_hw=out_size))(
            images, y0, x0, h, w
        )
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
    [-s*h, s*h] turns (applied as YIQ rotation); op order fixed b -> c -> s ->
    h. All four ops are affine in RGB, so they compose into ONE per-image
    3x3 matrix + offset — a single pixel pass (b, 3, 3) einsum instead of
    four, which is what makes the fused on-device pipeline cheap.
    """
    B = images.shape[0]
    k_apply, kb, kc, ks, kh = jax.random.split(key, 5)
    apply = (jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob).astype(jnp.float32)

    def factor(k: jax.Array, v: float) -> jax.Array:
        lo = max(0.0, 1.0 - strength * v)
        hi = 1.0 + strength * v
        return jax.random.uniform(k, (B,), minval=lo, maxval=hi)

    fb = factor(kb, brightness)
    fc = factor(kc, contrast)
    fs = factor(ks, saturation)
    theta = (
        jax.random.uniform(
            kh, (B,), minval=-strength * hue, maxval=strength * hue
        )
        * 2.0
        * jnp.pi
    )

    eye = jnp.eye(3, dtype=jnp.float32)
    # brightness: x <- fb * x
    A = fb[:, None, None] * eye[None]
    o = jnp.zeros((B, 3), jnp.float32)
    # contrast: x <- fc * x + (1 - fc) * mean_gray (per-image scalar from the
    # brightness-adjusted image: mean_gray = fb * mean(gray(x))).
    gray_mean = jnp.mean(
        jnp.tensordot(images, _RGB2GRAY, axes=([-1], [0])), axis=(1, 2)
    )  # (B,)
    A = fc[:, None, None] * A
    o = fc[:, None] * o + ((1.0 - fc) * fb * gray_mean)[:, None]
    # saturation: x <- fs * x + (1 - fs) * gray(x) * ones
    G = jnp.outer(jnp.ones(3), _RGB2GRAY)  # (3, 3)
    S = fs[:, None, None] * eye[None] + (1.0 - fs)[:, None, None] * G[None]
    A = jnp.einsum("bij,bjk->bik", S, A)
    o = jnp.einsum("bij,bj->bi", S, o)
    # hue: YIQ rotation matrix
    c_t, s_t = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(c_t)
    ones = jnp.ones_like(c_t)
    R_yiq = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, c_t, -s_t], -1),
            jnp.stack([zeros, s_t, c_t], -1),
        ],
        axis=1,
    )  # (B, 3, 3)
    H_mat = jnp.einsum("ij,bjk,kl->bil", _YIQ2RGB, R_yiq, _RGB2YIQ)
    A = jnp.einsum("bij,bjk->bik", H_mat, A)
    o = jnp.einsum("bij,bj->bi", H_mat, o)

    out = jnp.einsum("bhwc,bdc->bhwd", images, A) + o[:, None, None, :]
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

    def band_matrix(n: int) -> jax.Array:
        """(B, n, n) per-image banded gaussian blur operators, row-normalized
        (edge-renormalized zero padding). Separable blur becomes two MXU
        matmuls instead of per-image shifted adds."""
        i = jnp.arange(n, dtype=jnp.float32)
        d = i[:, None] - i[None, :]  # (n, n)
        w = jnp.exp(-(d[None] ** 2) / (2.0 * sigma[:, None, None] ** 2))
        w = jnp.where(jnp.abs(d)[None] <= half, w, 0.0)
        return w / jnp.sum(w, axis=-1, keepdims=True)

    # Blur matmuls in bf16: pixel data in [0, 1] loses nothing visible and
    # the banded matmuls move to the fast MXU path.
    Kh = band_matrix(H).astype(jnp.bfloat16)
    Kw = band_matrix(W).astype(jnp.bfloat16)
    img16 = images.astype(jnp.bfloat16)
    blurred = jnp.einsum("bij,bjwc->biwc", Kh, img16)
    blurred = jnp.einsum("biwc,bxw->bixc", blurred, Kw).astype(images.dtype)
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
    view, _ = augment_view_with_geometry(key, images, cfg, out_dtype)
    return view


def augment_view_with_geometry(
    key: jax.Array,
    images: jax.Array,
    cfg: ViewAugmentConfig,
    out_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Like ``augment_view`` but also returns per-image crop geometry.

    Geometry: (B, 5) float32 ``[y0, x0, h, w, hflipped]`` in source pixels —
    the reference's geometry recording for PaKA (``view_transform.py:215-256``).
    """
    keys = jax.random.split(key, 7)
    B = images.shape[0]
    in_hw = (images.shape[1], images.shape[2])
    y0, x0, h, w = _sample_crop_boxes(
        keys[0], B, in_hw, cfg.crop_scale, cfg.crop_ratio
    )
    hflip = (
        jax.random.uniform(keys[6], (B,)) < cfg.hflip_prob
        if cfg.hflip_prob > 0
        else jnp.zeros((B,), bool)
    )
    # hflip is folded into the crop's column resampling matrix (no separate
    # reversal pass over the view).
    out = crop_resize_matmul(images, y0, x0, h, w, cfg.out_size, hflip=hflip)
    if images.dtype == jnp.uint8:
        out = out * (1.0 / 255.0)
    if cfg.vflip_prob > 0:
        vflip = jax.random.uniform(keys[1], (B, 1, 1, 1)) < cfg.vflip_prob
        out = jnp.where(vflip, out[:, ::-1, :, :], out)
    geometry = jnp.stack(
        [y0, x0, h, w, hflip.astype(jnp.float32)], axis=1
    )
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
    return out.astype(out_dtype), geometry


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
