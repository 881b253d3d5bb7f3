import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu.ops import ema, losses, masking


def test_softmax_center_teacher_is_distribution():
    logits = jax.random.normal(jax.random.key(0), (8, 16))
    center = jnp.zeros((16,))
    p = losses.softmax_center_teacher(logits, center, temp=0.07)
    np.testing.assert_allclose(np.asarray(jnp.sum(p, axis=-1)), 1.0, atol=1e-5)


def test_update_center_momentum():
    logits = jnp.ones((4, 8)) * 2.0
    center = jnp.zeros((8,))
    new = losses.update_center(center, logits, momentum=0.9)
    np.testing.assert_allclose(np.asarray(new), 0.2, atol=1e-6)


def test_sinkhorn_rows_and_cols():
    logits = jax.random.normal(jax.random.key(1), (32, 16))
    # 3 iterations (the reference default) gives valid per-sample distributions.
    Q = losses.sinkhorn_knopp_teacher(logits, temp=0.05, n_iterations=3)
    np.testing.assert_allclose(np.asarray(jnp.sum(Q, axis=1)), 1.0, atol=1e-3)
    # With many iterations the transport converges: columns balance to B/K.
    Q = losses.sinkhorn_knopp_teacher(logits, temp=0.05, n_iterations=100)
    np.testing.assert_allclose(np.asarray(jnp.sum(Q, axis=1)), 1.0, atol=1e-3)
    col = np.asarray(jnp.sum(Q, axis=0))
    np.testing.assert_allclose(col, 32 / 16, rtol=0.1)


def test_sinkhorn_with_sample_weights():
    logits = jax.random.normal(jax.random.key(2), (16, 8))
    w = jnp.array([1.0] * 8 + [0.0] * 8)
    Q = losses.sinkhorn_knopp_teacher(logits, temp=0.05, sample_weights=w)
    # Zero-weight rows stay zero.
    assert float(jnp.abs(Q[8:]).max()) < 1e-6
    np.testing.assert_allclose(np.asarray(jnp.sum(Q[:8], axis=1)), 1.0, atol=1e-3)


def test_dino_cross_entropy_minimized_at_match():
    key = jax.random.key(3)
    logits = jax.random.normal(key, (8, 16)) * 3
    p = jax.nn.softmax(logits / 0.1, axis=-1)
    matched = losses.dino_cross_entropy(p, logits, student_temp=0.1)
    mismatched = losses.dino_cross_entropy(
        p, jnp.roll(logits, 1, axis=0), student_temp=0.1
    )
    assert float(matched) < float(mismatched)


def test_ibot_patch_loss_only_masked_positions():
    B, N, K = 4, 16, 8
    t = jax.nn.softmax(jax.random.normal(jax.random.key(0), (B, N, K)), axis=-1)
    s = jax.random.normal(jax.random.key(1), (B, N, K))
    mask = jnp.zeros((B, N), dtype=bool)
    w = jnp.zeros((B, N))
    loss_empty = losses.ibot_patch_loss(t, s, mask, w)
    assert float(loss_empty) == 0.0
    mask = mask.at[0, :4].set(True)
    w = w.at[0, :4].set(0.25)
    loss = losses.ibot_patch_loss(t, s, mask, w)
    assert float(loss) > 0.0


def test_koleo_penalizes_collapse():
    spread = jax.random.normal(jax.random.key(0), (16, 8))
    collapsed = jnp.ones((16, 8)) + 1e-3 * jax.random.normal(jax.random.key(1), (16, 8))
    assert float(losses.koleo_loss(collapsed)) > float(losses.koleo_loss(spread))


def test_ntxent_positive_pairs_lower_loss():
    z = jax.random.normal(jax.random.key(0), (8, 16))
    matched = losses.ntxent_loss(z, z)
    mismatched = losses.ntxent_loss(z, jnp.roll(z, 3, axis=0))
    assert float(matched) < float(mismatched)


def test_similarity_queue_ce_gradient_flows():
    s = jax.random.normal(jax.random.key(0), (4, 8))
    t = jax.random.normal(jax.random.key(1), (4, 8))
    q = jax.random.normal(jax.random.key(2), (32, 8))
    g = jax.grad(lambda s: losses.similarity_queue_ce(s, t, q))(s)
    assert float(jnp.abs(g).max()) > 0.0


def test_ema_update_moves_toward_student():
    t = {"w": jnp.zeros((4,))}
    s = {"w": jnp.ones((4,))}
    out = ema.ema_update(t, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


def test_cosine_schedule_endpoints():
    assert float(ema.cosine_schedule(0, 100, 1.0, 0.0)) == pytest.approx(1.0)
    assert float(ema.cosine_schedule(100, 100, 1.0, 0.0)) == pytest.approx(0.0)
    mid = float(ema.cosine_schedule(50, 100, 1.0, 0.0))
    assert 0.4 < mid < 0.6


def test_block_masks_budget_and_weights():
    mask, w = masking.random_block_masks(
        jax.random.key(0), batch=16, grid_hw=(14, 14), mask_prob=1.0
    )
    assert mask.shape == (16, 196)
    ratios = np.asarray(jnp.mean(mask.astype(jnp.float32), axis=1))
    assert ratios.min() > 0.0 and ratios.max() < 0.9
    # Weights sum to 1 per masked sample.
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=1)), 1.0, atol=1e-5)


def test_block_masks_prob_zero():
    mask, w = masking.random_block_masks(
        jax.random.key(0), batch=8, grid_hw=(7, 7), mask_prob=0.0
    )
    assert not bool(mask.any())
