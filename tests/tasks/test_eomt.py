"""EoMT semantic segmentation tests: matching, loss math, end-to-end train."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
    EoMTSemanticSegmentationArgs,
    EoMTSemanticSegmentationTrainModel,
    _dice_loss,
    hungarian_match,
)
from lightly_train_tpu.models.package_registry import get_wrapped_model


def test_hungarian_match_simple():
    # 2 queries, 2 targets; identity cost should assign diagonally.
    cost = jnp.asarray([[[0.0, 10.0], [10.0, 0.0]]])  # (1, 2, 2)
    valid = jnp.asarray([[True, True]])
    a = hungarian_match(cost, valid)
    np.testing.assert_array_equal(np.asarray(a), [[0, 1]])


def test_hungarian_match_invalid_targets():
    cost = jnp.zeros((2, 3, 2))
    valid = jnp.asarray([[True, False], [False, False]])
    a = np.asarray(hungarian_match(cost, valid))
    assert a[0, 0] >= 0 and a[0, 1] == -1
    assert (a[1] == -1).all()


def test_dice_loss_perfect_and_disjoint():
    pred = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    target = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    assert float(_dice_loss(pred, target)[0]) < 0.01
    disjoint = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    assert float(_dice_loss(pred, disjoint)[0]) > 0.6


@pytest.fixture(scope="module")
def model():
    wrapped = get_wrapped_model("dinov3/vittest16")
    args = EoMTSemanticSegmentationArgs(
        num_classes=4, num_queries=8, num_joint_blocks=1,
        default_steps=10, default_batch_size=4,
    )
    return EoMTSemanticSegmentationTrainModel(wrapped, args)


def test_eomt_loss_and_grads(model):
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (2, 32, 32, 3))
    masks = jax.random.randint(jax.random.key(1), (2, 32, 32), 0, 4)
    masks = masks.at[0, 0, 0].set(255)
    batch = {"images": images, "masks": masks}
    params, model_state = model.init(rng, batch)

    def lw(p):
        loss, _ = model.loss_fn(p, model_state, batch, rng, jnp.zeros((), jnp.int32))
        return loss

    loss, grads = jax.value_and_grad(lw)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    )
    assert gnorm > 0


def test_eomt_predict_shape(model):
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (2, 32, 32, 3))
    batch = {"images": images, "masks": jnp.zeros((2, 32, 32), jnp.int32)}
    params, model_state = model.init(rng, batch)
    pred = model.predict({"params": params}, images)
    assert pred.shape == (2, 32, 32)
    assert int(pred.max()) < 4


def test_eomt_val_metrics(model):
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (2, 32, 32, 3))
    masks = jax.random.randint(jax.random.key(1), (2, 32, 32), 0, 4)
    batch = {"images": images, "masks": masks}
    params, model_state = model.init(rng, batch)
    stats = model.val_step(params, model_state, batch)
    out = model.val_finalize(stats)
    assert 0.0 <= out["val_miou"] <= 1.0


def test_eomt_mask_prob_annealing(model):
    p0 = np.asarray(model._mask_probs(jnp.asarray(0), 10))
    pend = np.asarray(model._mask_probs(jnp.asarray(10), 10))
    assert (p0 == 1.0).all()
    assert (pend == 0.0).all()


def test_eomt_end_to_end_training(tmp_path):
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
    state, val = lt.train_semantic_segmentation(
        out=str(tmp_path / "out"),
        data={
            "train": {"images": str(tmp_path / "train" / "images"),
                      "masks": str(tmp_path / "train" / "masks")},
            "val": {"images": str(tmp_path / "val" / "images"),
                    "masks": str(tmp_path / "val" / "masks")},
            "num_classes": 3,
        },
        model="dinov3/vittest16-eomt",
        task_args={"num_queries": 8, "num_joint_blocks": 1},
        steps=2, batch_size=8, image_size=32, precision="fp32",
        num_workers=2, log_every=1, val_every=2,
    )
    assert int(state.step) == 2
    assert "val_miou" in val


def test_eomt_tiled_inference(model):
    import jax
    import jax.numpy as jnp

    rng = jax.random.key(0)
    small = jax.random.uniform(rng, (1, 32, 32, 3))
    batch = {"images": small, "masks": jnp.zeros((1, 32, 32), jnp.int32)}
    params, _ = model.init(rng, batch)
    big = jax.random.uniform(jax.random.key(1), (1, 64, 48, 3))
    pred = model.predict_tiled({"params": params}, big, tile_size=32)
    assert pred.shape == (1, 64, 48)
    assert int(pred.max()) < 4


def test_greedy_matches_hungarian_on_random_costs():
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        greedy_match, hungarian_match_host,
    )

    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.normal(size=(4, 6, 5)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(4, 5)) < 0.8)
    g = np.asarray(greedy_match(cost, valid))
    h = np.asarray(hungarian_match_host(cost, valid))
    # Same targets assigned/unassigned.
    np.testing.assert_array_equal(g >= 0, h >= 0)
    # Greedy total cost within 10% of optimal on these sizes.
    def total(a):
        t = 0.0
        for b in range(4):
            for k in range(5):
                if a[b, k] >= 0:
                    t += float(cost[b, a[b, k], k])
        return t
    assert total(g) <= total(h) + 0.1 * abs(total(h)) + 1e-3


def test_trunk_has_no_pos_embed_for_rope_backbones():
    """DINOv3 backbones use RoPE only (use_pos_embed=False): the EoMT trunk
    must not invent a learned pos table the pretrained artifact can never
    overwrite (it would add frozen random noise to every patch token)."""
    import jax

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        EoMTSemanticSegmentationArgs,
        EoMTSemanticSegmentationTrainModel,
    )

    model = EoMTSemanticSegmentationTrainModel(
        get_wrapped_model("dinov3/vittest16"),
        EoMTSemanticSegmentationArgs(num_classes=5),
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params, _ = model.init(jax.random.key(0), {"images": x, "masks": jnp.zeros((1, 32, 32), jnp.int32)})
    assert "pos_embed" not in params["backbone"]
    # DINOv2 backbones DO carry one, and it must still exist for loading.
    model2 = EoMTSemanticSegmentationTrainModel(
        get_wrapped_model("dinov2/vittest14"),
        EoMTSemanticSegmentationArgs(num_classes=5),
    )
    x2 = jnp.zeros((1, 28, 28, 3), jnp.float32)
    p2, _ = model2.init(jax.random.key(0), {"images": x2, "masks": jnp.zeros((1, 28, 28), jnp.int32)})
    assert "pos_embed" in p2["backbone"]


def test_anneal_horizon_uses_resolved_steps():
    """The attention-mask anneal must reach zero at the END of the actual
    run (runtime sets total_steps), not at the family default_steps."""
    import jax

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        EoMTSemanticSegmentationArgs,
        EoMTSemanticSegmentationTrainModel,
    )

    model = EoMTSemanticSegmentationTrainModel(
        get_wrapped_model("dinov3/vittest16"),
        EoMTSemanticSegmentationArgs(num_classes=5),
    )
    model.total_steps = 100  # as run_task_training sets it
    probs_end = model._mask_probs(jnp.asarray(100), model.total_steps)
    assert float(np.max(np.asarray(probs_end))) == 0.0


def test_palette_masks_decode_as_class_ids(tmp_path):
    """VOC-style palette (P-mode) PNGs hold class IDS as pixel values;
    convert('L') would map them through the palette to luminance and
    corrupt every label."""
    from PIL import Image

    from lightly_train_tpu.tasks.semantic_segmentation_linear import (
        MaskSemanticSegmentationDataset,
    )

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        tmp_path / "images" / "a.png"
    )
    ids = np.zeros((16, 16), np.uint8)
    ids[:8] = 1
    ids[8:] = 2
    m = Image.fromarray(ids, mode="P")
    # VOC palette: class 1 = maroon (128,0,0), class 2 = green (0,128,0).
    m.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * (768 - 9))
    m.save(tmp_path / "masks" / "a.png")
    ds = MaskSemanticSegmentationDataset(
        tmp_path / "images", tmp_path / "masks", (16, 16)
    )
    mask = ds[0]["masks"]
    assert set(np.unique(mask)) == {1, 2}
