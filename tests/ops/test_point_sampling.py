"""Point-sampling ops: torch grid_sample parity + loss equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.ops.point_sampling import (
    bilinear_point_sample,
    sample_id_indicator,
    sample_slot_indicator,
    uncertainty_point_coords,
)


def test_bilinear_point_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    grid = rng.normal(size=(2, 3, 7, 5)).astype(np.float32)
    coords = rng.uniform(0, 1, size=(2, 64, 2)).astype(np.float32)  # (y, x)

    ours = np.asarray(bilinear_point_sample(jnp.asarray(grid), jnp.asarray(coords)))

    # torch grid_sample wants (x, y) in [-1, 1], align_corners=False.
    t_grid = torch.from_numpy(
        np.stack([coords[..., 1], coords[..., 0]], axis=-1) * 2.0 - 1.0
    )[:, None]  # (B, 1, P, 2)
    t_out = torch.nn.functional.grid_sample(
        torch.from_numpy(grid), t_grid, mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )[:, :, 0]  # (B, C, P)
    np.testing.assert_allclose(ours, t_out.numpy(), atol=1e-5)


def test_sample_id_indicator_equals_onehot_sampling():
    rng = np.random.default_rng(1)
    id_map = rng.integers(0, 4, size=(2, 9, 11)).astype(np.int32)
    coords = rng.uniform(0, 1, size=(2, 32, 2)).astype(np.float32)
    K = 4
    ours = np.asarray(
        sample_id_indicator(jnp.asarray(id_map), jnp.asarray(coords), K)
    )
    onehot = np.eye(K, dtype=np.float32)[id_map].transpose(0, 3, 1, 2)
    ref = np.asarray(
        bilinear_point_sample(jnp.asarray(onehot), jnp.asarray(coords))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_slot_indicator_matches_shared_coords_case():
    rng = np.random.default_rng(2)
    id_map = rng.integers(0, 3, size=(1, 6, 6)).astype(np.int32)
    coords_shared = rng.uniform(0, 1, size=(1, 16, 2)).astype(np.float32)
    K = 3
    per_slot = np.repeat(coords_shared[:, None], K, axis=1)  # (1, K, 16, 2)
    ours = np.asarray(
        sample_slot_indicator(
            jnp.asarray(id_map), jnp.asarray(per_slot), jnp.arange(K)
        )
    )
    ref = np.asarray(
        sample_id_indicator(jnp.asarray(id_map), jnp.asarray(coords_shared), K)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_uncertainty_points_shape_and_range():
    pred = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 8, 8)).astype(np.float32)
    )
    coords = uncertainty_point_coords(
        jax.random.key(0), pred, num_points=64, oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )
    assert coords.shape == (4, 64, 2)
    c = np.asarray(coords)
    assert (c >= 0).all() and (c <= 1).all()


def test_point_loss_approximates_full_mask_loss_on_block_labels():
    """With patch-constant labels, uniform-only sampling, and a large budget,
    the point-sampled CE+dice must approach the full-mask loss."""
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        mask_classification_loss,
        point_sampled_mask_loss,
    )

    rng = np.random.default_rng(4)
    B, Q, gh, gw, K = 2, 5, 4, 4, 3
    scale = 8  # label map at 8x patch resolution, constant per patch
    cls_logits = jnp.asarray(rng.normal(size=(B, Q, K + 1)).astype(np.float32))
    mask_logits = jnp.asarray(
        rng.normal(size=(B, Q, gh * gw)).astype(np.float32)
    )
    labels_patch = rng.integers(0, K, size=(B, gh, gw)).astype(np.int32)
    labels = np.repeat(np.repeat(labels_patch, scale, 1), scale, 2)

    targets = np.stack(
        [(labels_patch == k).reshape(B, gh * gw) for k in range(K)], axis=1
    ).astype(np.float32)
    valid = jnp.asarray(targets.sum(-1) > 0)
    tgt_classes = jnp.arange(K)[None].repeat(B, 0)

    kw = dict(
        num_classes=K, class_weight=2.0, mask_weight=5.0, dice_weight=5.0,
        no_object_weight=0.1,
    )
    full = mask_classification_loss(
        cls_logits, mask_logits, jnp.asarray(targets), valid, tgt_classes, **kw
    )
    point = point_sampled_mask_loss(
        cls_logits, mask_logits, (gh, gw), jnp.asarray(labels), valid,
        tgt_classes, jax.random.key(1),
        num_points=8192, oversample_ratio=3.0, importance_sample_ratio=0.0,
        **kw,
    )
    # Same matching on these well-separated targets; sampled CE/dice converge
    # to the full-mask values (bilinear target softening only at block edges).
    np.testing.assert_allclose(float(point), float(full), rtol=0.08)


def test_active_slot_compaction_is_exact():
    """Compacted slots (slot_ids=...) == direct loss over the relabeled
    compact id map: the compaction is a pure re-indexing whenever every
    present class fits in the slot budget."""
    from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
        point_sampled_mask_loss,
    )

    rng = np.random.default_rng(7)
    B, Q, gh, gw, K, Kc = 2, 6, 4, 4, 8, 4
    H = W = 16
    present = [np.array([0, 2, 5]), np.array([1, 2, 7])]
    cls_logits = jnp.asarray(rng.normal(size=(B, Q, K + 1)).astype(np.float32))
    mask_logits = jnp.asarray(
        rng.normal(size=(B, Q, gh * gw)).astype(np.float32)
    )
    id_map = np.stack(
        [rng.choice(p, size=(H, W)) for p in present]
    ).astype(np.int32)
    id_map[0, :2, :2] = -1  # ignore region

    # Compaction rule: present classes ascending, absent padding, flagged.
    slot_ids = np.stack([
        np.concatenate([p, np.setdiff1d(np.arange(K), p)[: Kc - len(p)]])
        for p in present
    ]).astype(np.int32)
    valid = np.stack([
        np.arange(Kc) < len(p) for p in present
    ])
    kw = dict(
        num_classes=K, class_weight=2.0, mask_weight=5.0, dice_weight=5.0,
        no_object_weight=0.1, num_points=256, oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )
    loss_c = point_sampled_mask_loss(
        cls_logits, mask_logits, (gh, gw), jnp.asarray(id_map),
        jnp.asarray(valid), jnp.asarray(slot_ids), jax.random.key(3),
        slot_ids=jnp.asarray(slot_ids), **kw,
    )

    # Direct emulation: relabel the id map to compact ids 0..Kc-1.
    id_direct = np.full_like(id_map, -1)
    for b in range(B):
        for k in range(Kc):
            if valid[b, k]:
                id_direct[b][id_map[b] == slot_ids[b, k]] = k
    loss_d = point_sampled_mask_loss(
        cls_logits, mask_logits, (gh, gw), jnp.asarray(id_direct),
        jnp.asarray(valid), jnp.asarray(slot_ids), jax.random.key(3),
        slot_ids=None, **kw,
    )
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=0, atol=0)
