"""On-device detection augmentations: Mosaic, MixUp, zoom-out, IoU-crop.

Rebuild of the reference's step-scheduled detection augs
(``src/lightly_train/_transforms/mosaic.py``, ``mixup.py``,
``transform.py:103-279``): where the reference composes images on CPU with
cached samples and re-initializes dataloaders when an activation window
flips (``train_task.py:1735-1746``), here every op is a batched device
function over fixed shapes and the schedule is a traced per-step gate —
no recompilation, no dataloader re-init.

Box targets are fixed-shape (B, K, 4) normalized cxcywh + valid flags;
composite ops concatenate the partners' (rolled batch) targets into a
doubled-K buffer, so callers should budget ``max_boxes`` accordingly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _roll(batch_leaf: jax.Array, shift: int) -> jax.Array:
    """Batch-axis roll as a gather: XLA lowers jnp.roll on a sharded batch
    axis to a CPU collective-permute whose thunk segfaults (observed on the
    8-device CPU test mesh, jax 0.9); an index gather lowers to all-gather
    + dynamic-slice which is stable on both backends."""
    B = batch_leaf.shape[0]
    idx = (jnp.arange(B) + shift) % B
    return jnp.take(batch_leaf, idx, axis=0)


def mosaic(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, 3) float [0,1] or uint8
    boxes: jax.Array,  # (B, K, 4) normalized cxcywh
    labels: jax.Array,  # (B, K)
    valid: jax.Array,  # (B, K)
    prob: jax.Array | float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """4-image mosaic: each output is a 2x2 grid of the image and 3 rolled
    partners, each quadrant downscaled 2x; boxes remap into quadrants.

    Returns (images, boxes (B, 4K, 4), labels (B, 4K), valid (B, 4K)).
    """
    B, H, W, C = images.shape
    imgs_f = images.astype(jnp.float32)
    half = jax.image.resize(imgs_f, (B, H // 2, W // 2, C), "bilinear")
    quads = [half] + [_roll(half, s) for s in (1, 2, 3)]
    top = jnp.concatenate([quads[0], quads[1]], axis=2)
    bottom = jnp.concatenate([quads[2], quads[3]], axis=2)
    grid = jnp.concatenate([top, bottom], axis=1)  # (B, H, W, C)

    offsets = [(0.0, 0.0), (0.0, 0.5), (0.5, 0.0), (0.5, 0.5)]  # (dy, dx)
    new_boxes, new_labels, new_valid = [], [], []
    for q, (dy, dx) in enumerate(offsets):
        b = _roll(boxes, q) if q else boxes
        l = _roll(labels, q) if q else labels
        v = _roll(valid, q) if q else valid
        scaled = jnp.stack(
            [
                b[..., 0] * 0.5 + dx,
                b[..., 1] * 0.5 + dy,
                b[..., 2] * 0.5,
                b[..., 3] * 0.5,
            ],
            axis=-1,
        )
        new_boxes.append(scaled)
        new_labels.append(l)
        new_valid.append(v)
    m_boxes = jnp.concatenate(new_boxes, axis=1)
    m_labels = jnp.concatenate(new_labels, axis=1)
    m_valid = jnp.concatenate(new_valid, axis=1)

    apply = jax.random.uniform(key, (B, 1, 1, 1)) < prob
    out_images = jnp.where(apply, grid, imgs_f).astype(images.dtype)
    app = apply[:, :, 0, 0]
    pad_boxes = jnp.concatenate(
        [boxes, jnp.zeros_like(m_boxes[:, : 3 * boxes.shape[1]])], axis=1
    )
    pad_labels = jnp.concatenate(
        [labels, jnp.zeros_like(m_labels[:, : 3 * labels.shape[1]])], axis=1
    )
    pad_valid = jnp.concatenate(
        [valid, jnp.zeros_like(m_valid[:, : 3 * valid.shape[1]])], axis=1
    )
    out_boxes = jnp.where(app[..., None], m_boxes, pad_boxes)
    out_labels = jnp.where(app, m_labels, pad_labels)
    out_valid = jnp.where(app, m_valid, pad_valid)
    return out_images, out_boxes, out_labels, out_valid


def detection_mixup(
    key: jax.Array,
    images: jax.Array,
    boxes: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    prob: jax.Array | float = 0.5,
    alpha: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Image blend with a rolled partner; targets are the union of both.

    Returns (images, boxes (B, 2K, 4), labels (B, 2K), valid (B, 2K)).
    """
    B = images.shape[0]
    k_apply, k_lam = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha, (B, 1, 1, 1)) * 0.5 + 0.25
    imgs_f = images.astype(jnp.float32)
    mixed = lam * imgs_f + (1.0 - lam) * _roll(imgs_f, 1)
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob
    out_images = jnp.where(apply, mixed, imgs_f).astype(images.dtype)
    app = apply[:, :, 0, 0]
    out_boxes = jnp.concatenate([boxes, _roll(boxes, 1)], axis=1)
    out_labels = jnp.concatenate([labels, _roll(labels, 1)], axis=1)
    partner_valid = _roll(valid, 1) & app
    out_valid = jnp.concatenate([valid, partner_valid], axis=1)
    return out_images, out_boxes, out_labels, out_valid


def random_zoom_out(
    key: jax.Array,
    images: jax.Array,
    boxes: jax.Array,
    prob: jax.Array | float = 0.5,
    max_scale: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Canvas zoom-out: the image shrinks into a larger gray canvas
    (``RandomZoomOut``); boxes scale accordingly. Output size unchanged."""
    B, H, W, C = images.shape
    k_apply, k_s, k_pos = jax.random.split(key, 3)
    s = jax.random.uniform(k_s, (B,), minval=1.0, maxval=max_scale)
    # Content occupies 1/s of the canvas at a random offset.
    frac = 1.0 / s
    off = jax.random.uniform(k_pos, (B, 2)) * (1.0 - frac)[:, None]
    # Resample: output pixel (u,v) reads source ((u - off)/frac) — use the
    # matmul resampler with a virtual crop box of size s*H starting at
    # -off*s*H (out-of-bounds reads clamp; mask them to gray).
    from lightly_train_tpu.ops.augment import crop_resize_matmul

    y0 = -off[:, 0] * s * H
    x0 = -off[:, 1] * s * W
    zoomed = crop_resize_matmul(
        images.astype(jnp.float32), y0, x0, s * H, s * W, (H, W)
    )
    # Gray out regions outside the original content.
    uy = (jnp.arange(H)[None, :] + 0.5) / H
    ux = (jnp.arange(W)[None, :] + 0.5) / W
    in_y = (uy >= off[:, 0:1]) & (uy <= off[:, 0:1] + frac[:, None])
    in_x = (ux >= off[:, 1:2]) & (ux <= off[:, 1:2] + frac[:, None])
    inside = in_y[:, :, None] & in_x[:, None, :]
    gray = 0.5 if images.dtype != jnp.uint8 else 114.0
    zoomed = jnp.where(inside[..., None], zoomed, gray)
    new_boxes = jnp.stack(
        [
            boxes[..., 0] * frac[:, None] + off[:, 1:2],
            boxes[..., 1] * frac[:, None] + off[:, 0:1],
            boxes[..., 2] * frac[:, None],
            boxes[..., 3] * frac[:, None],
        ],
        axis=-1,
    )
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob
    out_images = jnp.where(apply, zoomed, images.astype(jnp.float32)).astype(
        images.dtype
    )
    out_boxes = jnp.where(apply[:, :, 0, :], new_boxes, boxes)
    return out_images, out_boxes


def random_iou_crop(
    key: jax.Array,
    images: jax.Array,
    boxes: jax.Array,  # (B, K, 4) normalized cxcywh
    valid: jax.Array,  # (B, K)
    prob: jax.Array | float = 0.5,
    min_scale: float = 0.3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RandomIoUCrop: zoom into a random sub-window; boxes remap and targets
    whose centers leave the window are invalidated (reference
    ``RandomIoUCrop`` semantics with static shapes — no rejection loop)."""
    B, H, W, C = images.shape
    k_apply, k_s, k_pos = jax.random.split(key, 3)
    s = jax.random.uniform(k_s, (B,), minval=min_scale, maxval=1.0)
    off = jax.random.uniform(k_pos, (B, 2)) * (1.0 - s)[:, None]  # (dy, dx)
    from lightly_train_tpu.ops.augment import crop_resize_matmul

    cropped = crop_resize_matmul(
        images.astype(jnp.float32),
        off[:, 0] * H, off[:, 1] * W, s * H, s * W, (H, W),
    )
    cx = (boxes[..., 0] - off[:, 1:2]) / s[:, None]
    cy = (boxes[..., 1] - off[:, 0:1]) / s[:, None]
    new_boxes = jnp.stack(
        [cx, cy, boxes[..., 2] / s[:, None], boxes[..., 3] / s[:, None]],
        axis=-1,
    )
    center_in = (cx > 0) & (cx < 1) & (cy > 0) & (cy < 1)
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob
    app = apply[:, :, 0, 0]
    out_images = jnp.where(apply, cropped, images.astype(jnp.float32)).astype(
        images.dtype
    )
    out_boxes = jnp.where(app[..., None], jnp.clip(new_boxes, 0.0, 1.0), boxes)
    out_valid = jnp.where(app, valid & center_in, valid)
    return out_images, out_boxes, out_valid


def channel_shuffle(
    key: jax.Array, images: jax.Array, prob: jax.Array | float = 0.5
) -> jax.Array:
    """Per-sample random RGB channel permutation (reference ChannelShuffle,
    ``random_photometric_distort.py:81-94``). A (B, 3) gather index — no
    data-dependent control flow."""
    B = images.shape[0]
    k_perm, k_apply = jax.random.split(key)
    perms = jax.vmap(lambda k: jax.random.permutation(k, 3))(
        jax.random.split(k_perm, B)
    )  # (B, 3)
    identity = jnp.broadcast_to(jnp.arange(3), (B, 3))
    apply = jax.random.uniform(k_apply, (B,)) < prob
    idx = jnp.where(apply[:, None], perms, identity)
    return jnp.take_along_axis(images, idx[:, None, None, :], axis=-1)


def photometric_distort(
    key: jax.Array, images: jax.Array, prob: jax.Array | float = 0.5
) -> jax.Array:
    """RandomPhotometricDistort: the SSL affine color-jitter pass with SSD's
    wider factor ranges, composed with ChannelShuffle in per-sample random
    order (the reference wraps both in ``RandomOrder``,
    ``random_photometric_distort.py:81-94``). Both orders are computed (the
    ops are cheap elementwise passes) and a per-sample bit selects one."""
    from lightly_train_tpu.ops.augment import color_jitter

    k_jit, k_shuf, k_order = jax.random.split(key, 3)

    def jitter(x: jax.Array) -> jax.Array:
        return color_jitter(
            k_jit, x, prob=prob, strength=1.0,
            brightness=0.25, contrast=0.5, saturation=0.5, hue=0.05,
        )

    a = channel_shuffle(k_shuf, jitter(images), prob=prob)
    b = jitter(channel_shuffle(k_shuf, images, prob=prob))
    order = jax.random.bernoulli(k_order, 0.5, (images.shape[0],))
    return jnp.where(order[:, None, None, None], a, b)


def scale_jitter(
    key: jax.Array,
    images: jax.Array,
    boxes: jax.Array,
    prob: jax.Array | float = 0.5,
    scale_range: Tuple[float, float] = (0.5, 1.5),
) -> Tuple[jax.Array, jax.Array]:
    """ScaleJitter at fixed output size: scale <1 shrinks content into a gray
    canvas (zoom-out), scale >1 zooms into the center (boxes outside keep
    their coordinates clipped)."""
    B, H, W, C = images.shape
    k_apply, k_s = jax.random.split(key)
    s = jax.random.uniform(
        k_s, (B,), minval=scale_range[0], maxval=scale_range[1]
    )
    from lightly_train_tpu.ops.augment import crop_resize_matmul

    # Virtual crop of size 1/s centered.
    frac = 1.0 / s
    off = (1.0 - frac) / 2.0
    out = crop_resize_matmul(
        images.astype(jnp.float32),
        off * H, off * W, frac * H, frac * W, (H, W),
    )
    # Gray outside the source content when zooming out (frac > 1).
    uy = (jnp.arange(H)[None, :] + 0.5) / H
    ux = (jnp.arange(W)[None, :] + 0.5) / W
    in_y = (uy >= off[:, None]) & (uy <= (off + frac)[:, None])
    in_x = (ux >= off[:, None]) & (ux <= (off + frac)[:, None])
    inside = in_y[:, :, None] & in_x[:, None, :]
    gray = 0.5 if images.dtype != jnp.uint8 else 114.0
    out = jnp.where(inside[..., None], out, gray)
    new_boxes = jnp.stack(
        [
            (boxes[..., 0] - off[:, None]) * s[:, None],
            (boxes[..., 1] - off[:, None]) * s[:, None],
            boxes[..., 2] * s[:, None],
            boxes[..., 3] * s[:, None],
        ],
        axis=-1,
    )
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob
    out_images = jnp.where(apply, out, images.astype(jnp.float32)).astype(
        images.dtype
    )
    out_boxes = jnp.where(
        apply[:, :, 0, :], jnp.clip(new_boxes, 0.0, 1.0), boxes
    )
    return out_images, out_boxes


def copy_blend(
    key: jax.Array,
    images: jax.Array,
    boxes: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    prob: jax.Array | float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """CopyBlend: blend the partner image's box regions onto this image and
    adopt those targets (reference ``copyblend.py``: object copy-paste with
    soft blending). Fixed shapes: the partner's box regions become a soft
    mask; targets are the union (B, 2K)."""
    B, H, W, C = images.shape
    k_apply, k_alpha = jax.random.split(key)
    p_images = _roll(images, 1).astype(jnp.float32)
    p_boxes = _roll(boxes, 1)
    p_labels = _roll(labels, 1)
    p_valid = _roll(valid, 1)
    # Rasterize partner boxes into a (B, H, W) mask.
    uy = (jnp.arange(H, dtype=jnp.float32)[None, :, None] + 0.5) / H
    ux = (jnp.arange(W, dtype=jnp.float32)[None, :, None] + 0.5) / W
    x0 = (p_boxes[..., 0] - p_boxes[..., 2] / 2)[:, None, :]
    x1 = (p_boxes[..., 0] + p_boxes[..., 2] / 2)[:, None, :]
    y0 = (p_boxes[..., 1] - p_boxes[..., 3] / 2)[:, None, :]
    y1 = (p_boxes[..., 1] + p_boxes[..., 3] / 2)[:, None, :]
    in_x = (ux >= x0) & (ux <= x1)  # (B, W, K)
    in_y = (uy >= y0) & (uy <= y1)  # (B, H, K)
    in_box = jnp.einsum(
        "bhk,bwk->bhw",
        (in_y & p_valid[:, None, :]).astype(jnp.float32),
        in_x.astype(jnp.float32),
    ) > 0.0
    alpha = jax.random.uniform(k_alpha, (B, 1, 1, 1), minval=0.6, maxval=1.0)
    blended = jnp.where(
        in_box[..., None],
        alpha * p_images + (1 - alpha) * images.astype(jnp.float32),
        images.astype(jnp.float32),
    )
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < prob
    app = apply[:, :, 0, 0]
    out_images = jnp.where(apply, blended, images.astype(jnp.float32)).astype(
        images.dtype
    )
    out_boxes = jnp.concatenate([boxes, p_boxes], axis=1)
    out_labels = jnp.concatenate([labels, p_labels], axis=1)
    out_valid = jnp.concatenate([valid, p_valid & app], axis=1)
    return out_images, out_boxes, out_labels, out_valid


def random_rotate90(
    key: jax.Array,
    images: jax.Array,
    boxes: jax.Array,
    prob: jax.Array | float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Per-image random k*90-degree rotation with exact box remapping.

    Rebuild of the reference LTDETR RandomRotate90
    (``ltdetr_transforms/utils.py:253-256``). Square views only (the LTDETR
    training resolution is square). boxes: (B, K, 4) normalized cxcywh.
    """
    assert images.shape[1] == images.shape[2], "rotate90 needs square views"
    B = images.shape[0]
    k_apply, k_k = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (B,)) < prob
    k = jnp.where(apply, jax.random.randint(k_k, (B,), 0, 4), 0)  # 0..3

    imgs_f = images
    rot1 = jnp.rot90(imgs_f, 1, axes=(1, 2))
    rot2 = jnp.rot90(imgs_f, 2, axes=(1, 2))
    rot3 = jnp.rot90(imgs_f, 3, axes=(1, 2))
    sel = k[:, None, None, None]
    out_images = jnp.where(
        sel == 1, rot1, jnp.where(sel == 2, rot2,
                                  jnp.where(sel == 3, rot3, imgs_f))
    )

    cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    # np.rot90(axes=(1,2)) is counter-clockwise: (y, x) -> (1-x, y).
    variants = jnp.stack(
        [
            jnp.stack([cx, cy, w, h], -1),
            jnp.stack([cy, 1.0 - cx, h, w], -1),
            jnp.stack([1.0 - cx, 1.0 - cy, w, h], -1),
            jnp.stack([1.0 - cy, cx, h, w], -1),
        ],
        axis=0,
    )  # (4, B, K, 4)
    out_boxes = jnp.take_along_axis(
        variants, k[None, :, None, None].repeat(boxes.shape[1], 2)
        .repeat(4, 3), axis=0
    )[0]
    return out_images, out_boxes


def window_gate(step: jax.Array, start: int, stop: int) -> jax.Array:
    """Traced activation-window gate (``ActivationPolicyArgs`` step_start/
    step_stop): 1.0 inside [start, stop), else 0.0 — multiplied into the
    op's probability so schedules need no recompilation."""
    s = jnp.asarray(step, jnp.float32)
    return ((s >= start) & (s < stop)).astype(jnp.float32)
