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
    # channel drop (``transform.py:31-33`` ChannelDropArgs): keep
    # num_channels_keep channels, dropping others with probability weights.
    # None = off (output keeps all input channels).
    channel_drop_keep: Optional[int] = None
    channel_drop_weights: Optional[Tuple[float, ...]] = None
    # random rotation (``transform.py:126-138`` RandomRotationArgs): arbitrary
    # angle in [-degrees, degrees], reflect-101 border, applied after flips
    # at the view resolution (``view_transform.py:177-192``).
    rotation_prob: float = 0.0
    rotation_degrees: float = 0.0
    # crop interpolation: "area" = cv2 INTER_AREA fidelity (the reference's
    # view interpolation, ``view_transform.py:61-76``; golden-tested in
    # tests/ops/test_inter_area.py), "bilinear" = hat kernel. Same
    # two-matmul structure either way.
    interpolation: str = "area"
    # normalize
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


def view_config_with_overrides(
    cfg: ViewAugmentConfig, args: dict
) -> ViewAugmentConfig:
    """Apply reference-style ``transform_args`` keys onto a view config.

    Accepts the reference ``MethodTransformArgs`` vocabulary
    (``_transforms/transform.py:306-387``): image_size, random_resize,
    random_flip, color_jitter, random_gray_scale, gaussian_blur, solarize,
    channel_drop, random_rotation, normalize. A key explicitly set to None
    disables that op (reference semantics).
    """
    u: dict = {}
    if "image_size" in args:
        s = args["image_size"]
        u["out_size"] = (s, s) if isinstance(s, int) else tuple(s)
    if "random_resize" in args:
        rr = args["random_resize"]
        if rr is None:
            u["crop_scale"] = (1.0, 1.0)
        else:
            u["crop_scale"] = (
                rr.get("min_scale", cfg.crop_scale[0]),
                rr.get("max_scale", cfg.crop_scale[1]),
            )
    if "random_flip" in args:
        rf = args["random_flip"]
        u["hflip_prob"] = 0.0 if rf is None else rf.get("horizontal_prob", 0.5)
        u["vflip_prob"] = 0.0 if rf is None else rf.get("vertical_prob", 0.0)
    if "color_jitter" in args:
        cj = args["color_jitter"]
        if cj is None:
            u["cj_prob"] = 0.0
        else:
            u["cj_prob"] = cj.get("prob", cfg.cj_prob)
            u["cj_strength"] = cj.get("strength", cfg.cj_strength)
            u["cj_bright"] = cj.get("brightness", cfg.cj_bright)
            u["cj_contrast"] = cj.get("contrast", cfg.cj_contrast)
            u["cj_sat"] = cj.get("saturation", cfg.cj_sat)
            u["cj_hue"] = cj.get("hue", cfg.cj_hue)
    if "random_gray_scale" in args:
        g = args["random_gray_scale"]
        u["gray_prob"] = 0.0 if g is None else float(g)
    if "gaussian_blur" in args:
        gb = args["gaussian_blur"]
        if gb is None:
            u["blur_prob"] = 0.0
        else:
            u["blur_prob"] = gb.get("prob", cfg.blur_prob)
            if "sigmas" in gb:
                u["blur_sigma"] = tuple(gb["sigmas"])
    if "solarize" in args:
        so = args["solarize"]
        if so is None:
            u["solarize_prob"] = 0.0
        else:
            u["solarize_prob"] = so.get("prob", cfg.solarize_prob)
            u["solarize_threshold"] = so.get(
                "threshold", cfg.solarize_threshold)
    if "channel_drop" in args:
        cd = args["channel_drop"]
        keep = (cd or {}).get("num_channels_keep", 3)
        if cd is not None and keep != 3:
            # Reference incompatibility resolution (eomt_transforms/
            # utils.py:36-73): the 3x3 color matrix and RGB grayscale
            # weights cannot apply off 3 channels.
            u["cj_prob"] = 0.0
            u["gray_prob"] = 0.0
        if cd is None:
            u["channel_drop_keep"] = None
        else:
            u["channel_drop_keep"] = int(cd["num_channels_keep"])
            u["channel_drop_weights"] = tuple(cd["weight_drop"])
    if "random_rotation" in args:
        rot = args["random_rotation"]
        if rot is None:
            u["rotation_prob"] = 0.0
        else:
            u["rotation_prob"] = rot.get("prob", 1.0)
            deg = rot.get("degrees", 0.0)
            u["rotation_degrees"] = float(
                deg if not isinstance(deg, (tuple, list)) else max(
                    abs(deg[0]), abs(deg[1]))
            )
    if "normalize" in args and args["normalize"] is not None:
        u["mean"] = tuple(args["normalize"]["mean"])
        u["std"] = tuple(args["normalize"]["std"])
    return dataclasses.replace(cfg, **u)


def override_view_specs(specs: list, transform_args: Optional[dict]) -> list:
    """Apply ``transform_args`` to a method's view specs.

    Top-level keys apply to every view; optional ``global_view`` /
    ``local_view`` sub-dicts apply only to the largest-resolution views /
    the rest (the reference's per-view-group args,
    ``transform.py:306-387``).
    """
    if not transform_args:
        return specs
    common = {
        k: v for k, v in transform_args.items()
        if k not in ("global_view", "local_view")
    }
    max_size = max(s.config.out_size[0] for s in specs)
    out = []
    for s in specs:
        cfg = view_config_with_overrides(s.config, common)
        group = (
            "global_view" if s.config.out_size[0] == max_size else "local_view"
        )
        if group in transform_args and transform_args[group]:
            cfg = view_config_with_overrides(cfg, transform_args[group])
        out.append(dataclasses.replace(s, config=cfg))
    return out


def _sample_crop_boxes(
    key: jax.Array,
    batch: int,
    in_hw: Tuple[int, int],
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample (y0, x0, h, w) float crop boxes, one per image. Shapes (B,)."""
    H, W = in_hw
    if scale == (1.0, 1.0):
        # random_resize disabled (transform_args random_resize=None): a
        # plain resize of the FULL image — the random aspect draw would
        # otherwise still sub-crop (e.g. 224x194 at aspect 4/3).
        full = jnp.zeros((batch,), jnp.float32)
        return (full, full,
                jnp.full((batch,), float(H)), jnp.full((batch,), float(W)))
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


def _area_down_weight_matrix(
    y0: jax.Array, h: jax.Array, in_size: int, out: int
) -> jax.Array:
    """(out, in) cv2 INTER_AREA DOWNSCALE weights for crop [y0, y0+h).

    Output pixel i averages the source interval [y0 + i*s, y0 + (i+1)*s),
    s = h/out, with fractional edge weights — verified element-exact against
    ``cv2.resize(INTER_AREA)`` (tests/ops/test_inter_area.py). Borders are
    clipped and renormalized by the covered width.
    """
    s = h / out
    i = jnp.arange(out, dtype=jnp.float32)
    a = jnp.clip(y0 + i * s, 0.0, float(in_size))
    b = jnp.clip(y0 + (i + 1.0) * s, 0.0, float(in_size))
    j = jnp.arange(in_size, dtype=jnp.float32)
    overlap = jnp.clip(
        jnp.minimum(b[:, None], j[None, :] + 1.0)
        - jnp.maximum(a[:, None], j[None, :]),
        0.0, 1.0,
    )
    return overlap / jnp.maximum(b - a, 1e-9)[:, None]


def _area_up_weight_matrix(
    y0: jax.Array, h: jax.Array, in_size: int, out: int
) -> jax.Array:
    """(out, in) cv2 INTER_AREA UPSCALE weights (the 2-tap path cv2 uses
    when either axis upscales): sx = floor(i*s), fx = (i+1) - (sx+1)/s
    wrapped to its fractional part when positive — verified element-exact
    against cv2 (tests/ops/test_inter_area.py)."""
    s = h / out
    i = jnp.arange(out, dtype=jnp.float32)
    sxf = jnp.floor(i * s)
    fx = (i + 1.0) - (sxf + 1.0) / jnp.maximum(s, 1e-9)
    fx = jnp.where(fx <= 0.0, 0.0, fx - jnp.floor(fx))
    col = jnp.clip(y0 + sxf, 0.0, in_size - 1.0)
    col1 = jnp.minimum(col + 1.0, in_size - 1.0)
    j = jnp.arange(in_size, dtype=jnp.float32)
    one0 = (jnp.abs(col[:, None] - j[None, :]) < 0.5).astype(jnp.float32)
    one1 = (jnp.abs(col1[:, None] - j[None, :]) < 0.5).astype(jnp.float32)
    return one0 * (1.0 - fx)[:, None] + one1 * fx[:, None]


def crop_resize_matmul(
    images: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    h: jax.Array,
    w: jax.Array,
    out_hw: Tuple[int, int],
    hflip: jax.Array | None = None,
    method: str = "bilinear",
) -> jax.Array:
    """Batched crop+resize as two batched matmuls (MXU path).

    images: (B, H, W, C); y0/x0/h/w: (B,) crop boxes in pixels. ``hflip``
    ((B,) bool) mirrors the horizontal sampling coordinates — the flip rides
    the resampling matrix for free instead of a separate reversal pass.

    ``method="area"`` reproduces cv2 INTER_AREA (the reference view
    pipeline's interpolation, ``view_transform.py:61-76``): true area
    averaging when BOTH axes downscale, cv2's 2-tap fallback per axis
    otherwise — the same two-matmul structure, only the weights change.
    ``hflip`` with area weights mirrors the assembled matrix instead of the
    coordinates (area footprints are not symmetric under coordinate
    reflection).
    """
    B, H, W, C = images.shape
    oh, ow = out_hw
    if method == "area":
        down_both = ((h / oh) >= 1.0) & ((w / ow) >= 1.0)  # (B,)

        def one_axis(y0b, hb, in_size, out):
            return jnp.where(
                down_both[:, None, None],
                jax.vmap(
                    lambda o, hh: _area_down_weight_matrix(o, hh, in_size, out)
                )(y0b, hb),
                jax.vmap(
                    lambda o, hh: _area_up_weight_matrix(o, hh, in_size, out)
                )(y0b, hb),
            )

        Ry = one_axis(y0, h, H, oh)  # (B, oh, H)
        Rx = one_axis(x0, w, W, ow)  # (B, ow, W)
        if hflip is not None:
            Rx = jnp.where(hflip[:, None, None], Rx[:, ::-1, :], Rx)
    else:
        t_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
        t_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
        if hflip is not None:
            t_x = jnp.where(hflip[:, None], 1.0 - t_x[None, :], t_x[None, :])
        else:
            t_x = t_x[None, :]
        sy = jnp.clip(
            y0[:, None] + t_y[None, :] * h[:, None] - 0.5, 0.0, H - 1.0
        )
        sx = jnp.clip(x0[:, None] + t_x * w[:, None] - 0.5, 0.0, W - 1.0)
        Ry = jax.vmap(lambda s: _bilinear_weight_matrix(s, H))(sy)
        Rx = jax.vmap(lambda s: _bilinear_weight_matrix(s, W))(sx)
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

    Known approximation: torchvision clamps to [0, 1] after EACH op; the
    composed matrix clips once at the end, so outputs differ wherever an
    intermediate value leaves [0, 1] (strongly bright/dark pixels). This
    is a deliberate tradeoff for the single-pass design.
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


def channel_drop(
    key: jax.Array,
    images: jax.Array,
    num_keep: int,
    weights: Optional[Sequence[float]] = None,
) -> jax.Array:
    """Keep ``num_keep`` channels per image, dropping the rest.

    Device rebuild of the reference ``ChannelDrop``
    (``_transforms/channel_drop.py:21-61``): channels are REMOVED (static
    output shape (B, H, W, num_keep)), not zeroed. ``weights`` are per-channel
    drop propensities (0 = never dropped). Selection uses a per-image Gumbel
    top-k over -log(weight) noise — a static-shape weighted sample without
    replacement.
    """
    B, H, W, C = images.shape
    if num_keep >= C:
        return images
    w = jnp.asarray(
        weights if weights is not None else [1.0] * C, jnp.float32
    )
    # Weighted sampling without replacement (Gumbel-max over drop weights):
    # channels with the LOWEST drop score are kept; zero-weight channels get
    # -inf drop score (never dropped).
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, (B, C), minval=1e-9, maxval=1.0))
    )
    drop_score = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-9)) + gumbel,
                           -jnp.inf)
    order = jnp.argsort(drop_score, axis=1)  # ascending: keep first num_keep
    keep_idx = jnp.sort(order[:, :num_keep], axis=1)  # preserve channel order
    return jnp.take_along_axis(
        images, keep_idx[:, None, None, :], axis=3
    )


def random_rotate(
    key: jax.Array,
    images: jax.Array,
    prob: float,
    degrees: float,
    maps=None,
) -> jax.Array:
    """Per-image random rotation with reflect-101 border (albumentations
    ``Rotate`` as configured in ``view_transform.py:177-192``).

    Bilinear sampling on a rotated grid; runs at the (small) view resolution
    after cropping, so the 4-corner gathers stay cheap. ``maps`` (optional
    list of (B, H, W) integer id maps) rotate jointly with NEAREST sampling
    on the same angles — returns (images, maps) in that case.
    """
    if prob <= 0.0 or degrees == 0.0:
        return images if maps is None else (images, list(maps))
    B, H, W, C = images.shape
    k_apply, k_angle = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (B,)) < prob
    angle = jax.random.uniform(
        k_angle, (B,), minval=-degrees, maxval=degrees
    ) * (jnp.pi / 180.0)
    angle = jnp.where(apply, angle, 0.0)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32) - cy
    xs = jnp.arange(W, dtype=jnp.float32) - cx
    yy = jnp.broadcast_to(ys[:, None], (H, W))
    xx = jnp.broadcast_to(xs[None, :], (H, W))
    # Source coords for each output pixel (inverse rotation).
    sy = cos[:, None, None] * yy[None] - sin[:, None, None] * xx[None] + cy
    sx = sin[:, None, None] * yy[None] + cos[:, None, None] * xx[None] + cx

    def reflect101(v, n):
        # OpenCV BORDER_REFLECT_101: ... 2 1 | 0 1 2 ... n-1 | n-2 n-3 ...
        period = 2.0 * (n - 1)
        v = jnp.abs(v) % period
        return jnp.minimum(v, period - v)

    sy = reflect101(sy, H)
    sx = reflect101(sx, W)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    flat = images.reshape(B, H * W, C)

    def gather(yi, xi):
        lin = (yi * W + xi).reshape(B, H * W)
        g = jnp.take_along_axis(flat, lin[..., None], axis=1)
        return g.reshape(B, H, W, C)

    out = (
        gather(y0i, x0i) * (1 - fy) * (1 - fx)
        + gather(y0i, x1i) * (1 - fy) * fx
        + gather(y1i, x0i) * fy * (1 - fx)
        + gather(y1i, x1i) * fy * fx
    )
    out_img = jnp.where(apply[:, None, None, None], out, images)
    if maps is None:
        return out_img
    # Nearest-sampled id maps on the same per-sample angles.
    yn = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
    xn = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
    lin = (yn * W + xn).reshape(B, H * W)
    out_maps = []
    for m in maps:
        g = jnp.take_along_axis(m.reshape(B, H * W), lin, axis=1)
        g = g.reshape(B, H, W)
        out_maps.append(jnp.where(apply[:, None, None], g, m))
    return out_img, out_maps


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
    keys = jax.random.split(key, 9)
    B = images.shape[0]
    in_hw = (images.shape[1], images.shape[2])
    mean, std = cfg.mean, cfg.std
    if (
        cfg.channel_drop_keep is not None
        and cfg.channel_drop_keep < images.shape[3]
    ):
        # ChannelDrop runs first (``view_transform.py:155-161``); normalize
        # stats follow the kept channels when lengths line up.
        images = channel_drop(
            keys[7], images, cfg.channel_drop_keep, cfg.channel_drop_weights
        )
        if len(mean) != images.shape[3]:
            mean = tuple(mean[: images.shape[3]])
            std = tuple(std[: images.shape[3]])
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
    out = crop_resize_matmul(
        images, y0, x0, h, w, cfg.out_size, hflip=hflip,
        method=cfg.interpolation,
    )
    if images.dtype == jnp.uint8:
        out = out * (1.0 / 255.0)
    if cfg.vflip_prob > 0:
        vflip = jax.random.uniform(keys[1], (B, 1, 1, 1)) < cfg.vflip_prob
        out = jnp.where(vflip, out[:, ::-1, :, :], out)
    geometry = jnp.stack(
        [y0, x0, h, w, hflip.astype(jnp.float32)], axis=1
    )
    if cfg.rotation_prob > 0 and cfg.rotation_degrees != 0.0:
        # After flips, before photometrics (``view_transform.py:177-192``).
        # Note: rotation invalidates the crop geometry for dense-geometric
        # methods, mirroring the reference's record_geometry exclusion.
        out = random_rotate(
            keys[8], out, cfg.rotation_prob, cfg.rotation_degrees
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
    out = normalize(out, mean, std)
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
