"""Tests for the on-device task augmentation ops (ops/task_augs.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu.ops.task_augs import (
    padded_crop_resize,
    padded_crop_resize_nearest,
    random_rot90,
    sample_random_resized_crop,
    sample_scale_jitter_crop,
)


def _coord_image(B, H, W):
    """Image whose channel 0 encodes the row id and channel 1 the col id."""
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
    img = jnp.stack([y, x, jnp.zeros_like(y)], -1)
    return jnp.broadcast_to(img, (B, H, W, 3))


def test_identity_crop_is_identity():
    img = _coord_image(2, 16, 16)
    z = jnp.zeros((2,))
    out = padded_crop_resize(
        img, z, z, jnp.full((2,), 16.0), jnp.full((2,), 16.0), (16, 16)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_zoom_out_fills_borders():
    """A centered 2x window pads with fill outside the image."""
    B, H = 1, 16
    img = jnp.ones((B, H, H, 3), jnp.float32) * 0.5
    y0 = jnp.full((B,), -8.0)
    h = jnp.full((B,), 32.0)
    out = padded_crop_resize(img, y0, y0, h, h, (32, 32), fill=0.25)
    # Far corner: pure fill. Center: pure image.
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(out[0, 16, 16, 0]), 0.5, atol=1e-5)

    mask = jnp.ones((B, H, H), jnp.int32) * 7
    mout = padded_crop_resize_nearest(mask, y0, y0, h, h, (32, 32), fill=255)
    assert int(mout[0, 0, 0]) == 255
    assert int(mout[0, 16, 16]) == 7
    assert mout.dtype == mask.dtype


def test_image_mask_geometry_consistent():
    """Integer-aligned crops give identical image/mask geometry."""
    B, H = 1, 32
    img = _coord_image(B, H, H)
    mask = img[..., 0].astype(jnp.int32) * 100 + img[..., 1].astype(jnp.int32)
    y0 = jnp.array([4.0])
    x0 = jnp.array([8.0])
    h = jnp.array([16.0])
    out = padded_crop_resize(img, y0, x0, h, h, (16, 16))
    mout = padded_crop_resize_nearest(mask, y0, x0, h, h, (16, 16), fill=255)
    # Unit-scale integer crop: output pixel (i, j) = source (4+i, 8+j).
    np.testing.assert_allclose(
        np.asarray(out[0, :, :, 0]),
        np.arange(4, 20, dtype=np.float32)[:, None] * np.ones((1, 16)),
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(mout[0]),
        np.arange(4, 20)[:, None] * 100 + np.arange(8, 24)[None, :],
    )


def test_hflip_rides_the_crop():
    img = _coord_image(1, 16, 16)
    z = jnp.zeros((1,))
    f = jnp.full((1,), 16.0)
    out = padded_crop_resize(
        img, z, z, f, f, (16, 16), hflip=jnp.array([True])
    )
    np.testing.assert_allclose(
        np.asarray(out[0, :, :, 1]), np.asarray(img[0, :, ::-1, 1]), atol=1e-4
    )


def test_scale_jitter_unit_scale_is_full_image():
    key = jax.random.key(0)
    y0, x0, h, w = sample_scale_jitter_crop(
        key, 8, (64, 64), (32, 32), 1.0, 1.0, 1, prob=1.0
    )
    np.testing.assert_allclose(np.asarray(h), 64.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y0), 0.0, atol=1e-4)


def test_scale_jitter_zoom_out_centers():
    """s=0.5: source window is 2x the staged image, centered."""
    key = jax.random.key(0)
    y0, x0, h, w = sample_scale_jitter_crop(
        key, 4, (64, 64), (32, 32), 0.5, 0.5, 1, prob=1.0
    )
    np.testing.assert_allclose(np.asarray(h), 128.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(y0), -32.0, atol=1e-3)


def test_scale_jitter_zoom_in_window_in_bounds():
    key = jax.random.key(1)
    B = 64
    y0, x0, h, w = sample_scale_jitter_crop(
        key, B, (64, 64), (32, 32), 2.0, 2.0, 1, prob=1.0
    )
    # s=2: resized is (64, 64), crop 32 -> window 32 staged px, y0 in [0, 32]
    np.testing.assert_allclose(np.asarray(h), 32.0, atol=1e-3)
    assert float(jnp.min(y0)) >= -1e-3
    assert float(jnp.max(y0 + h)) <= 64.0 + 1e-3


def test_random_resized_crop_in_bounds():
    key = jax.random.key(2)
    B = 128
    y0, x0, h, w = sample_random_resized_crop(key, B, (48, 64), 0.2, 1.0)
    assert float(jnp.min(y0)) >= 0 and float(jnp.min(x0)) >= 0
    assert float(jnp.max(y0 + h)) <= 48 + 1e-3
    assert float(jnp.max(x0 + w)) <= 64 + 1e-3
    area = h * w / (48.0 * 64.0)
    assert float(jnp.min(area)) > 0.1


def test_rot90_joint_and_prob_zero():
    key = jax.random.key(3)
    img = _coord_image(4, 8, 8)
    mask = (img[..., 0] * 8 + img[..., 1]).astype(jnp.int32)
    out_i, out_m = random_rot90(key, 0.0, img, mask)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(mask))
    out_i, out_m = random_rot90(key, 1.0, img, mask)
    # Joint: the mask stays the deterministic function of the image coords.
    rebuilt = (out_i[..., 0] * 8 + out_i[..., 1]).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(rebuilt))
    # At prob=1 at least one sample must actually rotate.
    assert not np.allclose(np.asarray(out_i), np.asarray(img))


def test_rot90_requires_square():
    with pytest.raises(ValueError, match="square"):
        random_rot90(jax.random.key(0), 0.5, jnp.zeros((1, 8, 16, 3)))
