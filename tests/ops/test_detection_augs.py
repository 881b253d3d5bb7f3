"""On-device detection augmentation tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lightly_train_tpu.ops.detection_augs import (
    detection_mixup,
    mosaic,
    random_zoom_out,
    window_gate,
)


def _batch(B=4, K=3):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 3)), jnp.float32)
    boxes = jnp.asarray(
        np.tile([[0.5, 0.5, 0.4, 0.4]], (B, K, 1)), jnp.float32
    )
    labels = jnp.ones((B, K), jnp.int32)
    valid = jnp.zeros((B, K), bool).at[:, 0].set(True)
    return images, boxes, labels, valid


def test_mosaic_shapes_and_box_remap():
    images, boxes, labels, valid = _batch()
    out_i, out_b, out_l, out_v = mosaic(
        jax.random.key(0), images, boxes, labels, valid, prob=1.0
    )
    assert out_i.shape == images.shape
    assert out_b.shape == (4, 12, 4)
    # First-quadrant remap: (0.5, 0.5) center -> (0.25, 0.25), size halves.
    np.testing.assert_allclose(
        np.asarray(out_b[0, 0]), [0.25, 0.25, 0.2, 0.2], atol=1e-6
    )
    # Second quadrant (top-right) offsets x by 0.5.
    np.testing.assert_allclose(
        np.asarray(out_b[0, 3]), [0.75, 0.25, 0.2, 0.2], atol=1e-6
    )
    assert int(out_v.sum()) == 16  # 4 images x 4 quadrants x 1 valid box


def test_mosaic_prob_zero_identity():
    images, boxes, labels, valid = _batch()
    out_i, out_b, out_l, out_v = mosaic(
        jax.random.key(0), images, boxes, labels, valid, prob=0.0
    )
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(images))
    np.testing.assert_allclose(np.asarray(out_b[:, :3]), np.asarray(boxes))
    assert int(out_v.sum()) == int(valid.sum())


def test_mixup_unions_targets():
    images, boxes, labels, valid = _batch()
    out_i, out_b, out_l, out_v = detection_mixup(
        jax.random.key(0), images, boxes, labels, valid, prob=1.0
    )
    assert out_b.shape == (4, 6, 4)
    assert int(out_v.sum()) == 8  # own + partner boxes
    assert not np.allclose(np.asarray(out_i), np.asarray(images))


def test_zoom_out_boxes_shrink():
    images, boxes, labels, valid = _batch()
    out_i, out_b = random_zoom_out(
        jax.random.key(0), images, boxes, prob=1.0, max_scale=2.0
    )
    assert out_i.shape == images.shape
    assert (np.asarray(out_b[..., 2:]) <= np.asarray(boxes[..., 2:]) + 1e-6).all()


def test_window_gate():
    assert float(window_gate(jnp.asarray(5), 0, 10)) == 1.0
    assert float(window_gate(jnp.asarray(10), 0, 10)) == 0.0
    assert float(window_gate(jnp.asarray(0), 5, 10)) == 0.0


def test_detection_training_with_scheduled_augs(tmp_path):
    from PIL import Image

    import lightly_train_tpu as lt

    rng = np.random.default_rng(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(tmp_path / "images" / f"{i}.png")
        (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    state, _ = lt.train_object_detection(
        out=str(tmp_path / "out"),
        data={"format": "yolo",
              "train": {"images": str(tmp_path / "images"),
                        "labels": str(tmp_path / "labels")},
              "num_classes": 1},
        model="dinov3/vittest16",
        task_args={"num_queries": 8, "num_decoder_layers": 1, "d_model": 32,
                   "num_heads": 2, "dim_feedforward": 64, "max_detections": 4,
                   "mosaic_window": (0, 10), "mixup_window": (0, 10)},
        steps=2, batch_size=8, image_size=32, precision="fp32", num_workers=2,
    )
    assert int(state.step) == 2


def test_random_iou_crop():
    from lightly_train_tpu.ops.detection_augs import random_iou_crop

    images, boxes, labels, valid = _batch()
    out_i, out_b, out_v = random_iou_crop(
        jax.random.key(0), images, boxes, valid, prob=1.0, min_scale=0.5
    )
    assert out_i.shape == images.shape
    assert out_b.shape == boxes.shape
    # Boxes grow when zooming in (w/h divided by scale<1), clipped to [0,1].
    assert (np.asarray(out_b) <= 1.0 + 1e-6).all()


def test_photometric_distort_changes_pixels():
    from lightly_train_tpu.ops.detection_augs import photometric_distort

    images, *_ = _batch()
    out = photometric_distort(jax.random.key(0), images, prob=1.0)
    assert not np.allclose(np.asarray(out), np.asarray(images))


def test_scale_jitter_box_consistency():
    from lightly_train_tpu.ops.detection_augs import scale_jitter

    images, boxes, labels, valid = _batch()
    out_i, out_b = scale_jitter(
        jax.random.key(0), images, boxes, prob=1.0, scale_range=(0.5, 0.5)
    )
    # scale 0.5: centered content shrinks; centered box stays centered, halves.
    np.testing.assert_allclose(
        np.asarray(out_b[0, 0]), [0.5, 0.5, 0.2, 0.2], atol=1e-5
    )


def test_copy_blend_unions_targets():
    from lightly_train_tpu.ops.detection_augs import copy_blend

    images, boxes, labels, valid = _batch()
    out_i, out_b, out_l, out_v = copy_blend(
        jax.random.key(0), images, boxes, labels, valid, prob=1.0
    )
    assert out_b.shape == (4, 6, 4)
    assert int(out_v.sum()) == 8
    assert not np.allclose(np.asarray(out_i), np.asarray(images))


def test_random_rotate90_box_follows_content():
    import numpy as np

    from lightly_train_tpu.ops.detection_augs import random_rotate90

    # Bright square at a known off-center location.
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[0, 4:12, 20:28] = 1.0  # rows 4-12, cols 20-28
    boxes = np.array([[[(20 + 28) / 2 / 32, (4 + 12) / 2 / 32,
                        8 / 32, 8 / 32]]], np.float32)
    found_rotation = False
    for seed in range(8):
        out_img, out_boxes = random_rotate90(
            jax.random.key(seed), jnp.asarray(img), jnp.asarray(boxes),
            prob=1.0,
        )
        oi, ob = np.asarray(out_img), np.asarray(out_boxes)[0, 0]
        ys, xs = np.where(oi[0, :, :, 0] > 0.5)
        cy = (ys.min() + ys.max() + 1) / 2 / 32
        cx = (xs.min() + xs.max() + 1) / 2 / 32
        np.testing.assert_allclose(ob[0], cx, atol=0.04)
        np.testing.assert_allclose(ob[1], cy, atol=0.04)
        if not np.allclose(oi, img):
            found_rotation = True
    assert found_rotation


def test_channel_shuffle_permutes_channels():
    from lightly_train_tpu.ops.detection_augs import channel_shuffle

    images = jnp.stack(
        [jnp.full((4, 4, 1), c, jnp.float32) for c in (1.0, 2.0, 3.0)], axis=-1
    ).reshape(1, 4, 4, 3)
    images = jnp.tile(images, (8, 1, 1, 1))
    out = channel_shuffle(jax.random.key(0), images, prob=1.0)
    # channels stay a permutation of {1,2,3} at every pixel
    sums = jnp.sum(out, axis=-1)
    assert jnp.allclose(sums, 6.0)
    sorted_ch = jnp.sort(out[:, 0, 0, :], axis=-1)
    assert jnp.allclose(sorted_ch, jnp.array([1.0, 2.0, 3.0]))
    # with 8 samples and prob=1, at least one non-identity permutation
    assert bool(jnp.any(out[:, 0, 0, 0] != 1.0))
    # prob=0 is identity
    out0 = channel_shuffle(jax.random.key(0), images, prob=0.0)
    assert jnp.allclose(out0, images)
