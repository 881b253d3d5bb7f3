"""ChannelDrop, RandomRotation, transform_args overrides, KoLeo groups."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.ops.augment import (
    ViewAugmentConfig,
    augment_view,
    channel_drop,
    override_view_specs,
    random_rotate,
    view_config_with_overrides,
)
from lightly_train_tpu.ops.losses import koleo_loss


def test_channel_drop_shape_and_weights():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 6, 6, 4), dtype=np.uint8))
    out = channel_drop(jax.random.key(0), imgs, num_keep=2,
                       weights=(0.0, 1.0, 1.0, 1.0))
    assert out.shape == (8, 6, 6, 2)
    # Channel 0 has zero drop weight -> always kept, and kept first (order
    # preserved).
    np.testing.assert_array_equal(np.asarray(out[:, :, :, 0]),
                                  np.asarray(imgs[:, :, :, 0]))


def test_channel_drop_kept_channels_are_subset():
    imgs = jnp.stack(
        [jnp.full((4, 4), c, jnp.float32) for c in range(5)], axis=-1
    )[None]
    out = channel_drop(jax.random.key(1), imgs, num_keep=3)
    vals = np.unique(np.asarray(out))
    assert len(vals) == 3 and set(vals).issubset({0, 1, 2, 3, 4})


def test_random_rotate_identity_at_zero_prob():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    out = random_rotate(jax.random.key(0), imgs, prob=0.0, degrees=30.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


def test_random_rotate_90_degrees_matches_rot90():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(1, 9, 9, 1)).astype(np.float32))
    # Force the angle: degrees range [-90, 90]; pick a key where apply fires
    # and check rotation preserves content statistics + is not identity.
    out = random_rotate(jax.random.key(3), imgs, prob=1.0, degrees=90.0)
    assert not np.allclose(np.asarray(out), np.asarray(imgs))
    # Reflect-101 border keeps values within the input range.
    assert np.asarray(out).min() >= np.asarray(imgs).min() - 1e-5
    assert np.asarray(out).max() <= np.asarray(imgs).max() + 1e-5


def test_augment_view_with_rotation_and_channel_drop():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    cfg = ViewAugmentConfig(
        out_size=(16, 16), rotation_prob=0.5, rotation_degrees=15.0,
    )
    out = augment_view(jax.random.key(0), imgs, cfg)
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_view_config_overrides_map_reference_keys():
    cfg = ViewAugmentConfig()
    new = view_config_with_overrides(cfg, {
        "image_size": 96,
        "random_resize": {"min_scale": 0.2, "max_scale": 0.9},
        "color_jitter": None,
        "random_gray_scale": 0.5,
        "gaussian_blur": {"prob": 0.7, "sigmas": (0.2, 1.0)},
        "solarize": {"prob": 0.3, "threshold": 0.4},
        "random_rotation": {"prob": 0.25, "degrees": 10},
        "channel_drop": {"num_channels_keep": 2, "weight_drop": (0, 1, 1)},
        "normalize": {"mean": (0.5, 0.5, 0.5), "std": (0.2, 0.2, 0.2)},
    })
    assert new.out_size == (96, 96)
    assert new.crop_scale == (0.2, 0.9)
    assert new.cj_prob == 0.0
    # channel_drop to 2 channels disables the 3-channel-only grayscale op
    # (reference incompatibility rule; the old expectation of 0.5 codified
    # a config that crashed at trace time).
    assert new.gray_prob == 0.0
    assert new.blur_prob == 0.7 and new.blur_sigma == (0.2, 1.0)
    assert new.solarize_prob == 0.3
    assert new.rotation_prob == 0.25 and new.rotation_degrees == 10.0
    assert new.channel_drop_keep == 2
    assert new.mean == (0.5, 0.5, 0.5)


def test_override_view_specs_global_local_split():
    from lightly_train_tpu.methods.base import ViewSpec

    specs = [
        ViewSpec(ViewAugmentConfig(out_size=(64, 64)), 2),
        ViewSpec(ViewAugmentConfig(out_size=(32, 32)), 4),
    ]
    out = override_view_specs(specs, {
        "random_gray_scale": 0.9,
        "global_view": {"gaussian_blur": {"prob": 1.0}},
        "local_view": {"solarize": {"prob": 0.6}},
    })
    assert out[0].config.gray_prob == 0.9 and out[1].config.gray_prob == 0.9
    assert out[0].config.blur_prob == 1.0
    assert out[1].config.solarize_prob == 0.6
    assert out[0].config.solarize_prob == ViewAugmentConfig().solarize_prob


def test_pretrain_accepts_transform_args(tmp_path):
    from PIL import Image

    import lightly_train_tpu as lt

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(data / f"{i}.png")
    state = lt.pretrain(
        out=str(tmp_path / "out"),
        data=str(data),
        model="torchvision/resnettest",
        method="simclr",
        method_args={"image_size": 32, "output_dim": 16, "hidden_dim": 16},
        transform_args={
            "color_jitter": None,
            "random_rotation": {"prob": 0.5, "degrees": 15},
        },
        batch_size=8, steps=2, precision="fp32", canonical_size=64,
        num_workers=2,
    )
    assert int(state.step) == 2


def test_koleo_groups_match_per_shard_computation():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    grouped = koleo_loss(x, groups=4)
    manual = np.mean([
        float(koleo_loss(x[i * 4:(i + 1) * 4])) for i in range(4)
    ])
    np.testing.assert_allclose(float(grouped), manual, rtol=1e-5)
    # groups=1 equals the old global behavior
    assert float(koleo_loss(x, groups=1)) != float(grouped)
