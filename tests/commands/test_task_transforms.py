"""Schema + wiring tests for the per-task train transforms.

Covers the reference parity points from VERDICT r2 #3: per-task default
recipes, the ``transform_args`` user schema with auto/incompatibility
resolution, and the on-device pipeline effects (geometry + mask
consistency).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu._transforms import (
    ColorJitterArgs,
    ImageClassificationTransformArgs,
    RandomFlipArgs,
    SemanticSegmentationTransformArgs,
    build_train_transform,
    resolve_task_transform_args,
)


def test_semantic_defaults_match_reference_recipe():
    """dinov3_eomt_semantic_segmentation/transforms.py:69-118 defaults."""
    args = resolve_task_transform_args("semantic_segmentation", None, (64, 64))
    assert isinstance(args, SemanticSegmentationTransformArgs)
    assert args.scale_jitter is not None
    assert (args.scale_jitter.min_scale, args.scale_jitter.max_scale) == (
        0.5, 2.0,
    )
    assert args.scale_jitter.num_scales == 20
    assert args.random_crop is not None
    assert (args.random_crop.height, args.random_crop.width) == (64, 64)
    assert args.random_flip.horizontal_prob == 0.5
    assert args.color_jitter is not None
    assert args.color_jitter.prob == 0.5
    assert abs(args.color_jitter.brightness - 32.0 / 255.0) < 1e-9
    assert args.random_rotate_90 is None and args.random_rotate is None
    assert args.normalize.mean == (0.485, 0.456, 0.406)


def test_classification_defaults_match_reference_recipe():
    """image_classification/transforms.py:44-88 defaults."""
    args = resolve_task_transform_args("image_classification", None, (32, 32))
    assert isinstance(args, ImageClassificationTransformArgs)
    assert (args.random_crop.min_scale, args.random_crop.max_scale) == (
        0.2, 1.0,
    )
    assert args.random_flip.horizontal_prob == 0.5
    assert args.color_jitter is not None and args.color_jitter.prob == 0.5


def test_user_overrides_and_legacy_hflip():
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {"scale_jitter": {"min_scale": 0.8, "max_scale": 1.2}},
        (32, 32),
        hflip_prob=0.0,
    )
    assert args.scale_jitter.min_scale == 0.8
    assert args.random_flip is None  # hflip_prob=0 disables
    args = resolve_task_transform_args(
        "semantic_segmentation", None, (32, 32), hflip_prob=0.9
    )
    assert args.random_flip.horizontal_prob == 0.9
    # Explicit random_flip in transform_args wins over the legacy knob.
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {"random_flip": {"horizontal_prob": 0.3}},
        (32, 32),
        hflip_prob=0.9,
    )
    assert args.random_flip.horizontal_prob == 0.3


def test_unknown_keys_rejected():
    with pytest.raises(Exception):
        resolve_task_transform_args(
            "semantic_segmentation", {"bogus_knob": 1}, (32, 32)
        )


def test_incompatible_resolution_disables_jitter_off_3_channels():
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {"channel_drop": {"num_channels_keep": 1,
                          "weight_drop": (1.0, 1.0, 1.0)}},
        (32, 32),
    )
    assert args.num_channels == 1
    assert args.color_jitter is None
    assert len(args.normalize.mean) == 1


def test_pipeline_mask_consistency_and_fill():
    """Geometric chain keeps image/mask aligned; zoom-out fills with
    ignore_index in the mask."""
    B, H = 4, 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (B, H, H, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(rng.integers(0, 5, (B, H, H), dtype=np.int32))
    # Force strong zoom-out so padding must appear.
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {
            "scale_jitter": {"min_scale": 0.4, "max_scale": 0.4,
                             "num_scales": 1, "prob": 1.0},
            "color_jitter": None,
            "ignore_index": 255,
        },
        (H, H),
    )
    fn = build_train_transform(args, jnp.float32)
    out = jax.jit(fn)({"images": images, "masks": masks}, jax.random.key(0))
    assert out["images"].shape == (B, H, H, 3)
    assert out["masks"].shape == (B, H, H)
    m = np.asarray(out["masks"])
    assert (m == 255).any(), "zoom-out must pad the mask with ignore_index"
    assert set(np.unique(m)).issubset(set(range(5)) | {255})


def test_pipeline_no_augs_is_normalize_only():
    B, H = 2, 16
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 256, (B, H, H, 3), dtype=np.uint8))
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {"scale_jitter": None, "random_crop": None, "random_flip": None,
         "color_jitter": None},
        (H, H),
    )
    fn = build_train_transform(args, jnp.float32)
    out = fn({"images": images}, jax.random.key(0))
    expect = (np.asarray(images, np.float32) / 255.0 - (0.485, 0.456, 0.406)
              ) / (0.229, 0.224, 0.225)
    np.testing.assert_allclose(np.asarray(out["images"]), expect, atol=1e-5)


def test_classification_pipeline_shapes_and_determinism():
    B, H = 4, 32
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.integers(0, 256, (B, H, H, 3), dtype=np.uint8))
    labels = jnp.arange(B)
    args = resolve_task_transform_args("image_classification", None, (H, H))
    fn = jax.jit(build_train_transform(args, jnp.bfloat16))
    out1 = fn({"images": images, "labels": labels}, jax.random.key(5))
    out2 = fn({"images": images, "labels": labels}, jax.random.key(5))
    assert out1["images"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out1["images"], np.float32),
        np.asarray(out2["images"], np.float32),
    )
    np.testing.assert_array_equal(np.asarray(out1["labels"]), np.arange(B))
    # Different key -> different crop.
    out3 = fn({"images": images, "labels": labels}, jax.random.key(6))
    assert not np.allclose(
        np.asarray(out1["images"], np.float32),
        np.asarray(out3["images"], np.float32),
    )


def test_seg_valid_refresh_drops_cropped_out_instances():
    """Instance slots fully outside the crop lose their seg_valid flag."""
    B, H, Q = 1, 32, 4
    images = jnp.zeros((B, H, H, 3), jnp.uint8)
    seg_map = np.full((B, H, H), 255, np.int32)
    seg_map[0, :8, :8] = 0      # slot 0: top-left corner
    seg_map[0, 12:20, 12:20] = 1  # slot 1: center
    seg_valid = np.zeros((B, Q), bool)
    seg_valid[0, :2] = True
    args = resolve_task_transform_args(
        "instance_segmentation",
        {"scale_jitter": {"min_scale": 2.0, "max_scale": 2.0,
                          "num_scales": 1, "prob": 1.0},
         "color_jitter": None, "random_flip": None},
        (H, H),
    )
    fn = build_train_transform(args, jnp.float32)
    # s=2 -> window is 16px; find a key whose window covers the center but
    # not the corner.
    for seed in range(20):
        out = fn(
            {"images": images, "seg_map": jnp.asarray(seg_map),
             "seg_valid": jnp.asarray(seg_valid),
             "seg_labels": jnp.zeros((B, Q), jnp.int32)},
            jax.random.key(seed),
        )
        v = np.asarray(out["seg_valid"][0])
        m = np.asarray(out["seg_map"][0])
        # Valid flags must exactly reflect slot presence in the cropped map.
        for q in range(Q):
            assert v[q] == (seg_valid[0, q] and (m == q).any())
        if not v[0] and v[1]:
            break
    else:
        pytest.fail("no crop window separated the two instances")


def test_train_entry_point_with_transform_args(tmp_path):
    """transform_args flows through train_semantic_segmentation."""
    from PIL import Image

    import lightly_train_tpu as lt

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "masks").mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(tmp_path / split / "images" / f"{i}.png")
            Image.fromarray(
                rng.integers(0, 3, (40, 40), dtype=np.uint8)
            ).save(tmp_path / split / "masks" / f"{i}.png")

    state, metrics = lt.train_semantic_segmentation(
        out=str(tmp_path / "out"),
        data={
            "train": {"images": str(tmp_path / "train/images"),
                      "masks": str(tmp_path / "train/masks")},
            "val": {"images": str(tmp_path / "val/images"),
                    "masks": str(tmp_path / "val/masks")},
            "num_classes": 3,
        },
        model="torchvision/resnettest",
        steps=2,
        batch_size=4,
        image_size=32,
        precision="fp32",
        transform_args={
            "scale_jitter": {"min_scale": 0.5, "max_scale": 1.5,
                             "num_scales": 5},
            "random_rotate_90": {"prob": 0.5},
        },
    )
    assert int(state.step) == 2
    assert np.isfinite(metrics.get("val_miou", 0.0))


def test_detection_rejects_transform_args(tmp_path):
    import lightly_train_tpu as lt
    from lightly_train_tpu.errors import ConfigError
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train",):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(tmp_path / split / "images" / f"{i}.jpg")
            (tmp_path / split / "labels" / f"{i}.txt").write_text(
                "0 0.5 0.5 0.4 0.4\n"
            )
    with pytest.raises(ConfigError, match="transform_args"):
        lt.train_object_detection(
            out=str(tmp_path / "out_det"),
            data={
                "format": "yolo", "num_classes": 1,
                "train": {"images": str(tmp_path / "train/images"),
                          "labels": str(tmp_path / "train/labels")},
            },
            model="torchvision/resnettest",
            steps=1,
            batch_size=2,
            image_size=32,
            precision="fp32",
            transform_args={"random_flip": {"horizontal_prob": 0.1}},
        )


def test_raw_torch_checkpoint_initializes_task_backbone(tmp_path):
    """checkpoint=<raw .pth> (Meta naming) initializes the fine-tune
    backbone via the converter (reference auto-weights analog)."""
    import jax
    import jax.numpy as jnp
    import torch

    import lightly_train_tpu as lt
    from lightly_train_tpu.models.convert import (
        convert_flax_vit_to_torch_state_dict,
    )
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from PIL import Image

    wrapped = get_wrapped_model("dinov2/vittest14")
    variables = wrapped.init(jax.random.key(42), jnp.zeros((1, 28, 28, 3),
                                                           jnp.uint8))
    sd = convert_flax_vit_to_torch_state_dict(
        variables["params"], depth=wrapped.module.cfg.depth
    )
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "backbone.pth")

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        (tmp_path / "train" / cls).mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(tmp_path / "train" / cls / f"{i}.png")

    state, _ = lt.train_image_classification(
        out=str(tmp_path / "out"),
        data={"train": str(tmp_path / "train")},
        model="dinov2/vittest14",
        checkpoint=str(tmp_path / "backbone.pth"),
        steps=1, batch_size=4, image_size=28, precision="fp32",
    )
    # The trunk must have started from the converted weights: after one tiny
    # step the patch-embed kernel stays near the saved value, far from a
    # fresh random init.
    got = np.asarray(state.params["backbone"]["patch_embed"]["kernel"])
    want = np.asarray(variables["params"]["patch_embed"]["kernel"])
    assert np.abs(got - want).max() < 0.05


def test_random_rotate_rotates_maps_jointly():
    """random_rotate must keep image/mask aligned (it used to rotate images
    only, silently corrupting segmentation labels)."""
    B, H = 2, 32
    # Image IS the mask pattern: a half-plane split, rotated identically.
    masks = np.zeros((B, H, H), np.int32)
    masks[:, : H // 2] = 1
    images = (masks[..., None] * 255).astype(np.uint8).repeat(3, axis=-1)
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {
            "scale_jitter": None, "random_crop": None, "random_flip": None,
            "color_jitter": None,
            "random_rotate": {"prob": 1.0, "degrees": 45.0},
            "normalize": {"mean": (0.0, 0.0, 0.0), "std": (1.0, 1.0, 1.0)},
        },
        (H, H),
    )
    fn = build_train_transform(args, jnp.float32)
    out = jax.jit(fn)(
        {"images": jnp.asarray(images), "masks": jnp.asarray(masks)},
        jax.random.key(3),
    )
    img = np.asarray(out["images"])[..., 0]
    m = np.asarray(out["masks"])
    assert not np.array_equal(m, masks), "rotation must fire"
    # Away from the bilinear transition band, mask == thresholded image.
    confident = (img < 0.25) | (img > 0.75)
    agree = (m == (img > 0.5)).mean(where=confident)
    assert agree > 0.99


def test_random_crop_prob_and_pad_if_needed():
    """random_crop.prob < 1 skips cropping for ~that fraction of samples;
    pad_if_needed=False never produces fill pixels."""
    B, H = 64, 16
    images = jnp.asarray(
        np.full((B, H, H, 3), 128, np.uint8)
    )
    masks = jnp.asarray(np.ones((B, H, H), np.int32))
    common = {
        "color_jitter": None, "random_flip": None,
        "scale_jitter": {"min_scale": 0.5, "max_scale": 0.5,
                         "num_scales": 1, "prob": 1.0},
    }
    # prob=0: no crop at all -> no ignore fill despite zoom-out jitter.
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {**common, "random_crop": {"prob": 0.0}}, (H, H),
    )
    out = jax.jit(build_train_transform(args, jnp.float32))(
        {"images": images, "masks": masks}, jax.random.key(0)
    )
    assert (np.asarray(out["masks"]) == 1).all()
    # pad_if_needed=False: the window clamps inside the image -> no fill.
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {**common, "random_crop": {"pad_if_needed": False}}, (H, H),
    )
    out = jax.jit(build_train_transform(args, jnp.float32))(
        {"images": images, "masks": masks}, jax.random.key(0)
    )
    assert (np.asarray(out["masks"]) == 1).all()
    # Default (pad center) DOES fill at 0.5 zoom-out.
    args = resolve_task_transform_args(
        "semantic_segmentation", dict(common), (H, H),
    )
    out = jax.jit(build_train_transform(args, jnp.float32))(
        {"images": images, "masks": masks}, jax.random.key(0)
    )
    assert (np.asarray(out["masks"]) == 255).any()


def test_random_crop_size_must_match_image_size():
    import pytest as _pytest

    from lightly_train_tpu.errors import ConfigValidationError

    with _pytest.raises(ConfigValidationError, match="image_size"):
        resolve_task_transform_args(
            "semantic_segmentation",
            {"random_crop": {"height": 24, "width": 24}}, (32, 32),
        )


def test_smallest_max_size_window():
    """smallest_max_size resizes the shorter side then crops: at
    max_size == H the window equals out_hw (identity scale); at
    max_size == 2H the window halves (zoom in, no fill)."""
    B, H = 8, 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, H, H, 3), np.uint8))
    masks = jnp.asarray(np.ones((B, H, H), np.int32))
    args = resolve_task_transform_args(
        "semantic_segmentation",
        {"smallest_max_size": {"max_size": 2 * H}, "scale_jitter": None,
         "color_jitter": None, "random_flip": None},
        (H, H),
    )
    out = jax.jit(build_train_transform(args, jnp.float32))(
        {"images": images, "masks": masks}, jax.random.key(0)
    )
    # Zoom-in only: no ignore fill can appear.
    assert (np.asarray(out["masks"]) == 1).all()
    assert out["images"].shape == (B, H, H, 3)


def test_classification_resize_scale_center_crop():
    """random_crop=None + resize_scale: val-style shorter-side resize +
    center crop (reference image_classification_transform.py:153-185) —
    the border pixels must come from inside, not fill."""
    B, H = 2, 32
    images = np.zeros((B, H, H, 3), np.uint8)
    images[:, H // 4 : 3 * H // 4, H // 4 : 3 * H // 4] = 200
    args = resolve_task_transform_args(
        "image_classification",
        {"random_crop": None, "resize_scale": 2.0, "random_flip": None,
         "color_jitter": None,
         "normalize": {"mean": (0.0, 0.0, 0.0), "std": (1.0, 1.0, 1.0)}},
        (H, H),
    )
    out = jax.jit(build_train_transform(args, jnp.float32))(
        {"images": jnp.asarray(images)}, jax.random.key(0)
    )
    img = np.asarray(out["images"])
    # Center crop of the middle half scaled up: everything bright.
    assert (img > 0.5).mean() > 0.95
