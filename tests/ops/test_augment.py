import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu.ops import augment


@pytest.fixture
def images():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 256, size=(4, 64, 64, 3), dtype=np.uint8))


def test_random_resized_crop_shape_and_range(images):
    out = augment.random_resized_crop(jax.random.key(0), images, (32, 32))
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_crop_identity_when_full_box():
    # A crop covering the whole image at the same size reproduces the image.
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.uint8))
    out = augment.random_resized_crop(
        jax.random.key(0), img, (16, 16), scale=(1.0, 1.0), ratio=(1.0, 1.0)
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(img[0], dtype=np.float32) / 255.0, atol=1e-5
    )


def test_flip_deterministic_full_prob(images):
    imgs = images.astype(jnp.float32) / 255.0
    out = augment.random_flip(jax.random.key(0), imgs, hflip_prob=1.0, vflip_prob=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs[:, :, ::-1, :]))


def test_color_jitter_preserves_shape_and_changes_pixels(images):
    imgs = images.astype(jnp.float32) / 255.0
    out = augment.color_jitter(jax.random.key(0), imgs, prob=1.0)
    assert out.shape == imgs.shape
    assert not np.allclose(np.asarray(out), np.asarray(imgs))
    assert float(out.min()) >= -1e-5


def test_grayscale_full_prob_equal_channels(images):
    imgs = images.astype(jnp.float32) / 255.0
    out = augment.random_grayscale(jax.random.key(0), imgs, prob=1.0)
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.asarray(out[..., 1]), atol=1e-6
    )


def test_gaussian_blur_preserves_mean(images):
    imgs = images.astype(jnp.float32) / 255.0
    out = augment.gaussian_blur(jax.random.key(0), imgs, prob=1.0)
    assert out.shape == imgs.shape
    # Edge-normalized blur roughly preserves the image mean.
    np.testing.assert_allclose(
        float(jnp.mean(out)), float(jnp.mean(imgs)), rtol=0.02
    )


def test_solarize_inverts_bright(images):
    imgs = images.astype(jnp.float32) / 255.0
    out = augment.random_solarize(jax.random.key(0), imgs, prob=1.0, threshold=0.5)
    bright = np.asarray(imgs) >= 0.5
    np.testing.assert_allclose(
        np.asarray(out)[bright], 1.0 - np.asarray(imgs)[bright], atol=1e-6
    )


def test_augment_view_full_pipeline(images):
    cfg = augment.ViewAugmentConfig(out_size=(32, 32), solarize_prob=0.2)
    out = augment.augment_view(jax.random.key(0), images, cfg)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    # Normalized output should be roughly centered.
    assert abs(float(jnp.mean(out))) < 3.0


def test_augment_views_independent(images):
    cfg = augment.ViewAugmentConfig(out_size=(32, 32))
    views = augment.augment_views(jax.random.key(0), images, [cfg, cfg])
    assert len(views) == 2
    assert not np.allclose(np.asarray(views[0]), np.asarray(views[1]))


def test_augment_view_jit_compiles(images):
    cfg = augment.ViewAugmentConfig(out_size=(32, 32))
    fn = jax.jit(lambda k, x: augment.augment_view(k, x, cfg))
    out = fn(jax.random.key(0), images)
    assert out.shape == (4, 32, 32, 3)


def test_augment_deterministic_same_key(images):
    cfg = augment.ViewAugmentConfig(out_size=(32, 32))
    a = augment.augment_view(jax.random.key(7), images, cfg)
    b = augment.augment_view(jax.random.key(7), images, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_matmul_and_gather_crop_parity():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from lightly_train_tpu.ops.augment import (
        _crop_resize_one, _sample_crop_boxes, crop_resize_matmul,
    )

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 40, 48, 3), dtype=np.uint8))
    y0, x0, h, w = _sample_crop_boxes(
        jax.random.key(3), 4, (40, 48), (0.2, 1.0), (0.75, 1.333)
    )
    out_mm = crop_resize_matmul(imgs, y0, x0, h, w, (16, 16))
    out_gather = jax.vmap(partial(_crop_resize_one, out_hw=(16, 16)))(
        imgs, y0, x0, h, w
    )
    np.testing.assert_allclose(
        np.asarray(out_mm), np.asarray(out_gather), atol=1e-2
    )


def test_random_resize_none_is_plain_resize():
    """transform_args random_resize=None must disable cropping entirely —
    the random aspect draw previously still sub-cropped the image."""
    import jax

    from lightly_train_tpu.ops.augment import (
        ViewAugmentConfig,
        augment_view_with_geometry,
        view_config_with_overrides,
    )

    cfg = view_config_with_overrides(
        ViewAugmentConfig(out_size=(16, 16), cj_prob=0.0, gray_prob=0.0,
                          blur_prob=0.0, hflip_prob=0.0),
        {"random_resize": None},
    )
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 20, 30, 3), np.uint8)
    )
    _, geom = augment_view_with_geometry(jax.random.key(0), imgs, cfg)
    g = np.asarray(geom)
    np.testing.assert_allclose(g[:, 0], 0.0)  # y0
    np.testing.assert_allclose(g[:, 1], 0.0)  # x0
    np.testing.assert_allclose(g[:, 2], 20.0)  # full height
    np.testing.assert_allclose(g[:, 3], 30.0)  # full width


def test_channel_drop_off_3_disables_color_ops():
    from lightly_train_tpu.ops.augment import (
        ViewAugmentConfig,
        view_config_with_overrides,
    )

    cfg = view_config_with_overrides(
        ViewAugmentConfig(),
        {"channel_drop": {"num_channels_keep": 2,
                          "weight_drop": (1.0, 1.0, 1.0)}},
    )
    assert cfg.cj_prob == 0.0 and cfg.gray_prob == 0.0
