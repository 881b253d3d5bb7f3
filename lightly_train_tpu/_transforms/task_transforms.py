"""Per-task training transform schemas + on-device pipeline builder.

Rebuild of the reference's task transform layer
(``src/lightly_train/_transforms/task_transform.py:25-60`` +
``eomt_transforms/*`` + ``image_classification_transform.py``): every
``train_*`` entry point exposes a typed ``transform_args`` schema with
"auto" resolution and incompatibility rules, and each task family carries
the reference's default recipe:

- semantic/instance/panoptic segmentation (EoMT + linear + multihead):
  scale_jitter(0.5-2.0, 20 scales) -> random_crop(image_size, center pad,
  mask fill=ignore_index) -> hflip(0.5) -> color_jitter(p=0.5, b=32/255,
  c=0.5, s=0.5, h=18/360) -> normalize
  (``dinov3_eomt_semantic_segmentation/transforms.py:69-118``,
  ``linear_semantic_segmentation/transforms.py:69-118``)
- image classification (+multihead): RandomResizedCrop(scale 0.2-1.0) ->
  hflip(0.5) -> color_jitter(same strengths) -> normalize
  (``image_classification/transforms.py:44-88``)

The execution model is TPU-native: the whole pipeline runs ON DEVICE over
the staged fixed-size uint8 batch as part of the jitted prepare program —
the geometric chain collapses into one crop box per sample executed by the
MXU matmul resampler (``ops/task_augs.py``), and the photometric chain is
the fused 3x3-matrix color jitter (``ops/augment.color_jitter``). Detection
tasks keep their dedicated pipeline (``ops/detection_augs.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from pydantic import Field

from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._logging import get_logger

logger = get_logger("transforms")

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

Auto = Literal["auto"]


# ---------------------------------------------------------------------------
# Component args (reference ``_transforms/transform.py``)
# ---------------------------------------------------------------------------


class NormalizeArgs(PydanticConfig):
    mean: Tuple[float, ...] = IMAGENET_MEAN
    std: Tuple[float, ...] = IMAGENET_STD


class RandomFlipArgs(PydanticConfig):
    horizontal_prob: float = 0.5
    vertical_prob: float = 0.0


class RandomRotate90Args(PydanticConfig):
    prob: float = 0.5


class RandomRotationArgs(PydanticConfig):
    prob: float = 0.5
    degrees: float = 30.0


class ColorJitterArgs(PydanticConfig):
    """Reference task-jitter semantics: all-or-none with ``prob``
    (``image_classification/transforms.py:32-38``)."""

    prob: float = 0.5
    strength: float = 1.0
    brightness: float = 32.0 / 255.0
    contrast: float = 0.5
    saturation: float = 0.5
    hue: float = 18.0 / 360.0


class ChannelDropArgs(PydanticConfig):
    num_channels_keep: int = 3
    weight_drop: Tuple[float, ...] = (1.0, 1.0, 1.0)


class ScaleJitterArgs(PydanticConfig):
    min_scale: float = 0.5
    max_scale: float = 2.0
    num_scales: int = 20
    prob: float = 1.0


class RandomCropArgs(PydanticConfig):
    height: Union[int, Auto] = "auto"
    width: Union[int, Auto] = "auto"
    pad_if_needed: bool = True
    fill: int = 0
    prob: float = 1.0


class RandomResizeArgs(PydanticConfig):
    """Classification RandomResizedCrop area-scale range."""

    min_scale: float = 0.2
    max_scale: float = 1.0


class SmallestMaxSizeArgs(PydanticConfig):
    max_size: Union[int, Auto] = "auto"
    prob: float = 1.0


# ---------------------------------------------------------------------------
# Task schemas
# ---------------------------------------------------------------------------


class TaskTransformArgs(PydanticConfig):
    """Base schema (reference ``task_transform.py:25-60``)."""

    image_size: Union[Tuple[int, int], Auto] = "auto"
    channel_drop: Optional[ChannelDropArgs] = None
    num_channels: Union[int, Auto] = "auto"
    normalize: Union[NormalizeArgs, Auto] = "auto"
    random_flip: Optional[RandomFlipArgs] = Field(
        default_factory=RandomFlipArgs
    )
    random_rotate_90: Optional[RandomRotate90Args] = None
    random_rotate: Optional[RandomRotationArgs] = None
    color_jitter: Optional[ColorJitterArgs] = Field(
        default_factory=ColorJitterArgs
    )

    def resolve_auto(self, image_size: Tuple[int, int]) -> None:
        if self.image_size == "auto":
            self.image_size = tuple(image_size)
        if self.normalize == "auto":
            self.normalize = NormalizeArgs()
        if self.num_channels == "auto":
            if self.channel_drop is not None:
                self.num_channels = self.channel_drop.num_channels_keep
            else:
                self.num_channels = len(self.normalize.mean)

    def resolve_incompatible(self) -> None:
        """Reference rules (``eomt_transforms/utils.py:36-73``): repeat
        mean/std to num_channels; disable color jitter off 3 channels."""
        nc = self.num_channels
        assert isinstance(nc, int)
        mean, std = self.normalize.mean, self.normalize.std
        if len(mean) != nc:
            self.normalize.mean = tuple(mean[i % len(mean)] for i in range(nc))
        if len(std) != nc:
            self.normalize.std = tuple(std[i % len(std)] for i in range(nc))
        if self.color_jitter is not None and nc != 3:
            logger.debug(
                "Disabling color jitter: needs 3 channels, have %d", nc
            )
            self.color_jitter = None


class SemanticSegmentationTransformArgs(TaskTransformArgs):
    """EoMT/linear/multihead segmentation train recipe
    (``dinov3_eomt_semantic_segmentation/transforms.py:69-118``)."""

    ignore_index: int = 255
    scale_jitter: Optional[ScaleJitterArgs] = Field(
        default_factory=ScaleJitterArgs
    )
    smallest_max_size: Optional[SmallestMaxSizeArgs] = None
    random_crop: Optional[RandomCropArgs] = Field(
        default_factory=RandomCropArgs
    )

    def resolve_auto(self, image_size: Tuple[int, int]) -> None:
        super().resolve_auto(image_size)
        if self.random_crop is not None:
            if self.random_crop.height == "auto":
                self.random_crop.height = self.image_size[0]
            if self.random_crop.width == "auto":
                self.random_crop.width = self.image_size[1]
            if (self.random_crop.height, self.random_crop.width) != tuple(
                self.image_size
            ):
                from lightly_train_tpu.errors import ConfigValidationError

                raise ConfigValidationError(
                    "random_crop.height/width must equal image_size "
                    f"({tuple(self.image_size)}): the crop IS the model "
                    "input here. Set image_size= on the train_* call to "
                    "change the training resolution."
                )
        if (
            self.smallest_max_size is not None
            and self.smallest_max_size.max_size == "auto"
        ):
            self.smallest_max_size.max_size = min(self.image_size)


class ImageClassificationTransformArgs(TaskTransformArgs):
    """Classification train recipe
    (``image_classification/transforms.py:44-88``)."""

    random_crop: Optional[RandomResizeArgs] = Field(
        default_factory=RandomResizeArgs
    )
    resize_scale: Optional[float] = None


TASK_TRANSFORM_ARGS: Dict[str, type] = {
    "semantic_segmentation": SemanticSegmentationTransformArgs,
    "instance_segmentation": SemanticSegmentationTransformArgs,
    "panoptic_segmentation": SemanticSegmentationTransformArgs,
    "image_classification": ImageClassificationTransformArgs,
}


def resolve_task_transform_args(
    kind: str,
    user_args: Optional[Dict[str, Any]],
    image_size: Tuple[int, int],
    hflip_prob: Optional[float] = None,
) -> TaskTransformArgs:
    """Validate user overrides onto the task's default schema and resolve.

    ``hflip_prob`` is the legacy scalar knob (round-2 surface): when the
    user sets it, it overrides ``random_flip.horizontal_prob``.
    """
    cls = TASK_TRANSFORM_ARGS[kind]
    args = pydantic_model_validate(cls, dict(user_args or {}))
    if hflip_prob is not None and "random_flip" not in (user_args or {}):
        if hflip_prob <= 0:
            args.random_flip = None
        else:
            args.random_flip = RandomFlipArgs(horizontal_prob=hflip_prob)
    args.resolve_auto(image_size)
    args.resolve_incompatible()
    return args


# ---------------------------------------------------------------------------
# On-device pipeline builder
# ---------------------------------------------------------------------------

# Spatial integer id-map batch keys and their out-of-bounds fill semantics.
_MAP_KEYS = ("masks", "seg_map")


def _map_fill(args: TaskTransformArgs, key: str) -> int:
    if key == "seg_map":
        from lightly_train_tpu.tasks.eomt_instance_panoptic import NO_SEGMENT

        return NO_SEGMENT
    return getattr(args, "ignore_index", 255)


def build_train_transform(args: TaskTransformArgs, dtype: Any):
    """Compile the resolved schema into ``fn(batch, key) -> batch``.

    Applies, in the reference's composition order: channel_drop ->
    geometric chain (scale_jitter+random_crop OR RandomResizedCrop, with
    flips folded into the sampling coordinates) -> rotate90 -> rotate ->
    color_jitter -> normalize. Images come in as (B, H, W, C) uint8 and
    leave as normalized ``dtype``; id-map keys (masks/seg_map) follow the
    same geometry with nearest resampling and ignore fills.
    """
    from lightly_train_tpu.ops import augment as A
    from lightly_train_tpu.ops import task_augs as T

    out_hw = tuple(args.image_size)
    jitter = args.color_jitter
    flip = args.random_flip
    rot90 = args.random_rotate_90
    rot = args.random_rotate
    scale_jitter = getattr(args, "scale_jitter", None)
    random_crop = getattr(args, "random_crop", None)
    smallest = getattr(args, "smallest_max_size", None)
    if smallest is not None and scale_jitter is not None:
        logger.info(
            "smallest_max_size set: it replaces scale_jitter in the "
            "geometric chain (set scale_jitter=None to silence this)"
        )
    rrc = getattr(args, "random_crop", None) if isinstance(
        args, ImageClassificationTransformArgs
    ) else None

    def fn(batch: Dict[str, jax.Array], key: jax.Array) -> Dict[str, jax.Array]:
        out = dict(batch)
        images = batch["images"].astype(jnp.float32) / 255.0
        B, H, W = images.shape[:3]
        keys = jax.random.split(key, 8)

        if args.channel_drop is not None:
            images = A.channel_drop(
                keys[0], images, args.channel_drop.num_channels_keep,
                args.channel_drop.weight_drop,
            )

        hflip = vflip = None
        if flip is not None:
            if flip.horizontal_prob > 0:
                hflip = jax.random.uniform(keys[1], (B,)) < flip.horizontal_prob
            if flip.vertical_prob > 0:
                vflip = jax.random.uniform(keys[2], (B,)) < flip.vertical_prob

        boxes = None
        fill = 0.0
        if isinstance(args, ImageClassificationTransformArgs):
            if rrc is not None:
                boxes = T.sample_random_resized_crop(
                    keys[3], B, (H, W), rrc.min_scale, rrc.max_scale
                )
            elif args.resize_scale is not None:
                # Reference val-style recipe when random_crop is disabled:
                # resize shorter side to size*scale + center crop size
                # (``image_classification_transform.py:153-185``). In
                # staged-pixel space: a centered window of size/scale.
                ch = jnp.full((B,), H / float(args.resize_scale))
                cw = jnp.full((B,), W / float(args.resize_scale))
                boxes = ((jnp.full((B,), H) - ch) / 2.0,
                         (jnp.full((B,), W) - cw) / 2.0, ch, cw)
        elif smallest is not None:
            # SmallestMaxSize(msz) + RandomCrop: resize factor
            # f = msz/min(H, W), crop window out_hw/f in staged pixels,
            # uniform offsets, center-pad when the window exceeds the image
            # (``eomt_transforms/semantic_segmentation.py:58-76``). When
            # the resize does not fire (prob), a plain RandomCrop(out_hw)
            # remains; random_crop.prob skips cropping entirely.
            f = float(smallest.max_size) / float(min(H, W))
            k_a, k_y, k_x, k_c = jax.random.split(keys[3], 4)
            applied = jax.random.uniform(k_a, (B,)) < smallest.prob
            h = jnp.where(applied, out_hw[0] / f, float(out_hw[0]))
            w = jnp.where(applied, out_hw[1] / f, float(out_hw[1]))
            if random_crop is not None and not random_crop.pad_if_needed:
                h = jnp.minimum(h, float(H))
                w = jnp.minimum(w, float(W))
            u_y = jax.random.uniform(k_y, (B,))
            u_x = jax.random.uniform(k_x, (B,))
            y0 = jnp.where(h <= H, u_y * (H - h), -(h - H) / 2.0)
            x0 = jnp.where(w <= W, u_x * (W - w), -(w - W) / 2.0)
            if random_crop is not None and random_crop.prob < 1.0:
                skip = jax.random.uniform(k_c, (B,)) >= random_crop.prob
                y0 = jnp.where(skip, 0.0, y0)
                x0 = jnp.where(skip, 0.0, x0)
                h = jnp.where(skip, float(H), h)
                w = jnp.where(skip, float(W), w)
            boxes = (y0, x0, h, w)
            fill = float(random_crop.fill) / 255.0 if random_crop else 0.0
        elif scale_jitter is not None or random_crop is not None:
            sj = scale_jitter or ScaleJitterArgs(
                min_scale=1.0, max_scale=1.0, num_scales=1, prob=0.0
            )
            boxes = T.sample_scale_jitter_crop(
                keys[3], B, (H, W), out_hw,
                sj.min_scale, sj.max_scale, sj.num_scales, sj.prob,
                crop_prob=random_crop.prob if random_crop else 1.0,
                pad_if_needed=(
                    random_crop.pad_if_needed if random_crop else True
                ),
            )
            fill = float(random_crop.fill) / 255.0 if random_crop else 0.0

        if boxes is not None:
            y0, x0, h, w = boxes
            images = T.padded_crop_resize(
                images, y0, x0, h, w, out_hw, fill=fill,
                hflip=hflip, vflip=vflip,
            )
            for mk in _MAP_KEYS:
                if mk in batch:
                    out[mk] = T.padded_crop_resize_nearest(
                        batch[mk], y0, x0, h, w, out_hw,
                        fill=_map_fill(args, mk), hflip=hflip, vflip=vflip,
                    )
            if "seg_map" in batch and "seg_valid" in batch:
                # Cropping can remove an instance entirely; drop its slot so
                # the Hungarian matcher never targets an empty mask (the
                # reference recomputes binary_masks post-transform).
                Q = batch["seg_valid"].shape[1]
                idx = jnp.minimum(out["seg_map"].astype(jnp.int32), Q)
                counts = jax.vmap(
                    lambda m: jnp.zeros((Q + 1,), jnp.int32)
                    .at[m.reshape(-1)]
                    .add(1)
                )(idx)
                out["seg_valid"] = batch["seg_valid"] & (counts[:, :Q] > 0)
        else:
            # No crop: flips become explicit reversals (joint with maps).
            if hflip is not None:
                do = hflip[:, None, None, None]
                images = jnp.where(do, images[:, :, ::-1, :], images)
                for mk in _MAP_KEYS:
                    if mk in batch:
                        out[mk] = jnp.where(
                            do[..., 0], out[mk][:, :, ::-1], out[mk]
                        )
            if vflip is not None:
                do = vflip[:, None, None, None]
                images = jnp.where(do, images[:, ::-1, :, :], images)
                for mk in _MAP_KEYS:
                    if mk in batch:
                        out[mk] = jnp.where(
                            do[..., 0], out[mk][:, ::-1, :], out[mk]
                        )

        map_keys = [mk for mk in _MAP_KEYS if mk in batch]
        if rot90 is not None and rot90.prob > 0:
            images, rotated = T.random_rot90(
                keys[4], rot90.prob, images,
                [out[mk] for mk in map_keys] or None,
            )
            for mk, r in zip(map_keys, rotated or []):
                out[mk] = r

        if rot is not None and rot.prob > 0:
            # Arbitrary-angle rotation; id maps rotate jointly with nearest
            # sampling (reflect-101 border like the images).
            if map_keys:
                images, rotated = A.random_rotate(
                    keys[5], images, rot.prob, rot.degrees,
                    maps=[out[mk] for mk in map_keys],
                )
                for mk, r in zip(map_keys, rotated):
                    out[mk] = r
            else:
                images = A.random_rotate(
                    keys[5], images, rot.prob, rot.degrees
                )

        if jitter is not None:
            images = A.color_jitter(
                keys[6], images,
                prob=jitter.prob, strength=jitter.strength,
                brightness=jitter.brightness, contrast=jitter.contrast,
                saturation=jitter.saturation, hue=jitter.hue,
            )

        mean = jnp.asarray(args.normalize.mean, jnp.float32)
        std = jnp.asarray(args.normalize.std, jnp.float32)
        out["images"] = ((images - mean) / std).astype(dtype)
        return out

    return fn
