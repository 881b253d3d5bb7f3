"""Tiled validation: val_step above the training resolution runs the tile
grid and stitches logits (VERDICT r2 #4; reference
``dinov3_eomt_semantic_segmentation/train_model.py:358-420``)."""

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.tasks.tiling import n_tiles, tile_grid, tiled_logits


def test_tile_grid_covers_and_flushes():
    ys = tile_grid(100, 40, 26)
    assert ys[0] == 0 and ys[-1] == 60  # flush tile reaches the end
    covered = np.zeros(100, bool)
    for y in ys:
        covered[y : y + 40] = True
    assert covered.all()
    assert tile_grid(32, 40, 26) == [0]


def test_tiled_logits_matches_full_forward_for_linear_fn():
    """For a pixel-local fn, tiling+averaging must reproduce the full pass."""
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 80, 80, 3)).astype(np.float32))

    def local_fn(x):
        return jnp.stack(
            [x.sum(-1), x[..., 0] - x[..., 1]], axis=-1
        )

    full = local_fn(images)
    tiled = tiled_logits(local_fn, images, 2, tile_size=32)
    assert n_tiles((80, 80), 32) >= 4
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)


def test_small_image_bypasses_tiling():
    images = jnp.ones((1, 16, 16, 3))
    calls = []

    def fn(x):
        calls.append(x.shape)
        return jnp.zeros(x.shape[:3] + (4,))

    tiled_logits(fn, images, 4, tile_size=32)
    assert calls == [(1, 16, 16, 3)]


def test_eomt_val_step_tiles_large_images():
    """EoMT val_step on a 2x-resolution batch exercises >= 4 tiles and
    produces a well-formed confusion matrix."""
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        EoMTSemanticSegmentationArgs,
        EoMTSemanticSegmentationTrainModel,
    )

    wrapped = get_wrapped_model("dinov3/vittest16", dtype=jnp.float32)
    args = EoMTSemanticSegmentationArgs(num_classes=3, num_queries=4)
    tm = EoMTSemanticSegmentationTrainModel(wrapped, args)
    tm.val_tile_size = 32
    rng = np.random.default_rng(1)
    images32 = jnp.asarray(
        rng.integers(0, 2, (1, 32, 32, 3)).astype(np.float32)
    )
    params, model_state = tm.init(
        jax.random.key(0), {"images": images32}
    )
    # Large image: 64 > 32 -> tiled path (3x3 grid with stride 21).
    images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (1, 64, 64)).astype(np.int32))
    counted = []
    orig = tm._semantic_logits

    def counting(params_, imgs):
        counted.append(imgs.shape)
        return orig(params_, imgs)

    tm._semantic_logits = counting
    stats = tm.val_step(params, model_state, {"images": images,
                                              "masks": masks})
    tm._semantic_logits = orig
    assert len(counted) >= 4
    assert all(s[1] == 32 and s[2] == 32 for s in counted)
    cm = np.asarray(stats["confusion"])
    assert cm.shape == (3, 3)
    np.testing.assert_allclose(cm.sum(), 64 * 64, atol=0.5)
    # At the training resolution the val_step must NOT tile.
    counted.clear()
    tm._semantic_logits = counting
    tm.val_step(params, model_state, {"images": images32,
                                      "masks": masks[:, :32, :32]})
    tm._semantic_logits = orig
    assert counted == [(1, 32, 32, 3)]
