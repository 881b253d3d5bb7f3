"""Property tests for the reconstructed PaKA loss (VERDICT r2 #5).

``methods/dinov31._paka_loss`` is a reconstruction from arXiv:2509.05606
App. D (the lightly-OSS ``PatchKernelAlignmentLoss`` source is not in this
environment). These tests pin the properties the derivation implies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu.methods.dinov31 import (
    DINOv31,
    DINOv31Args,
    paka_overlap_validity,
)
from lightly_train_tpu.models.package_registry import get_wrapped_model


def _tiny_method(dtype=jnp.float32):
    wrapped = get_wrapped_model("dinov2/vittest14", dtype=dtype)
    args = DINOv31Args(
        output_dim=64, hidden_dim=32, bottleneck_dim=16,
        local_view_count=2, global_image_size=28, local_image_size=14,
        paka_hidden_dim=32, paka_bottleneck_dim=16,
    )
    return DINOv31(wrapped, args)


@pytest.fixture(scope="module")
def setup():
    method = _tiny_method()
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    B, g = 2, 28
    imgs = (
        jax.random.uniform(jax.random.key(1), (B, g, g, 3)) * 2.0 - 1.0
    )
    return method, params, model_state, method_state, imgs


def _geom(B, y, x, h, w, flip=0.0):
    return jnp.broadcast_to(
        jnp.asarray([y, x, h, w, flip], jnp.float32), (B, 5)
    )


def test_identical_views_minimize_the_loss(setup):
    """Teacher == student (init state) + identical geometry: the CE sits at
    its minimum H(p_t); any student perturbation increases it."""
    method, params, model_state, method_state, imgs = setup
    B = imgs.shape[0]
    geom = _geom(B, 0.0, 0.0, 256.0, 256.0)
    rng = jax.random.key(2)
    loss_id = method._paka_loss(
        params, model_state, method_state, imgs, geom, imgs, geom, rng
    )
    assert np.isfinite(float(loss_id))

    # Perturb the student's paka head -> Ks != Kt -> strictly larger CE.
    params_pert = {
        **params,
        "paka_head": jax.tree_util.tree_map(
            lambda p: p
            + 0.5 * jax.random.normal(jax.random.key(3), p.shape, p.dtype),
            params["paka_head"],
        ),
    }
    loss_pert = method._paka_loss(
        params_pert, model_state, method_state, imgs, geom, imgs, geom, rng
    )
    assert float(loss_pert) > float(loss_id) + 1e-4


def test_disjoint_crops_zero_loss(setup):
    """Student crop fully outside the clean crop -> empty mask -> loss 0."""
    method, params, model_state, method_state, imgs = setup
    B = imgs.shape[0]
    clean_geom = _geom(B, 0.0, 0.0, 100.0, 100.0)
    far_geom = _geom(B, 500.0, 500.0, 100.0, 100.0)
    loss = method._paka_loss(
        params, model_state, method_state, imgs, far_geom, imgs, clean_geom,
        jax.random.key(2),
    )
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_overlap_mask_geometry():
    """Validity marks exactly the student patch centers inside the clean
    crop, in teacher-grid coordinates, with flip mirroring columns."""
    B, gs, gt = 1, 8, 8
    # Student crop == clean crop: everything valid.
    z = jnp.zeros((B,))
    full = jnp.full((B,), float(gt))
    v = paka_overlap_validity(z, z, full, full, z, (gs, gs), (gt, gt))
    assert bool(jnp.all(v))
    # Student crop shifted right by half the clean width: left half of the
    # student's columns map inside, the right half outside.
    v = paka_overlap_validity(
        z, jnp.full((B,), gt / 2.0), full, full, z, (gs, gs), (gt, gt)
    )
    expect_cols = np.array([True] * (gs // 2) + [False] * (gs // 2))
    np.testing.assert_array_equal(np.asarray(v[0, 0]), expect_cols)
    assert bool(jnp.all(v[0, :, : gs // 2]))
    # Flip mirrors the column validity.
    vf = paka_overlap_validity(
        z, jnp.full((B,), gt / 2.0), full, full, jnp.ones((B,)),
        (gs, gs), (gt, gt),
    )
    np.testing.assert_array_equal(np.asarray(vf[0, 0]), expect_cols[::-1])
    # Vertical: shifted down by half -> top half of rows valid.
    v = paka_overlap_validity(
        jnp.full((B,), gt / 2.0), z, full, full, z, (gs, gs), (gt, gt)
    )
    np.testing.assert_array_equal(
        np.asarray(v[0, :, 0]), expect_cols
    )


def test_partial_overlap_between_zero_and_full(setup):
    method, params, model_state, method_state, imgs = setup
    B = imgs.shape[0]
    clean_geom = _geom(B, 0.0, 0.0, 256.0, 256.0)
    half_geom = _geom(B, 0.0, 128.0, 256.0, 256.0)
    loss = method._paka_loss(
        params, model_state, method_state, imgs, half_geom, imgs, clean_geom,
        jax.random.key(2),
    )
    assert np.isfinite(float(loss))
    assert float(loss) >= 0.0


def test_finite_under_bf16():
    """The kernel CE (softmax over +/-1e9-masked logits) stays finite when
    the backbone runs in bf16."""
    method = _tiny_method(dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    B, g = 2, 28
    imgs = (
        jax.random.uniform(jax.random.key(1), (B, g, g, 3)).astype(
            jnp.bfloat16
        )
        * 2.0
        - 1.0
    )
    geom = _geom(B, 0.0, 0.0, 256.0, 256.0)
    half = _geom(B, 0.0, 128.0, 256.0, 256.0)
    for g1_geom in (geom, half):
        loss = method._paka_loss(
            params, model_state, method_state, imgs, g1_geom, imgs, geom,
            jax.random.key(2),
        )
        assert np.isfinite(float(loss))


def test_full_train_step_paka_metric_finite(setup):
    """End-to-end: the dinov31 train step emits a finite paka_loss."""
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu._optim import build_optimizer, cosine_warmup
    from lightly_train_tpu.methods.base import TrainState

    method, params, model_state, method_state, _ = setup
    optimizer = build_optimizer(
        method.default_optimizer_args(), cosine_warmup(1e-3, 100, 10),
        params, grad_clip_norm=method.grad_clip_norm(),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        model_state=model_state, opt_state=optimizer.init(params),
        method_state=method_state,
    )
    step = make_train_step(method, optimizer, 100)
    imgs = jax.random.randint(
        jax.random.key(9), (4, 32, 32, 3), 0, 256, jnp.uint8
    )
    state, metrics = step(state, imgs, jax.random.key(4))
    assert np.isfinite(float(metrics["paka_loss"]))
    assert np.isfinite(float(metrics["train_loss"]))
