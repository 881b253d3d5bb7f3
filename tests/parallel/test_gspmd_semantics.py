"""GSPMD correctness: sharded-batch computations match replicated numerics.

The parity argument for replacing the reference's explicit collectives with
in-step reductions (SURVEY.md §2.7/§5.8): the same jitted function applied to
(a) a batch sharded over the 8-device mesh and (b) the same batch fully
replicated must produce the same values — the sharded run's psums ARE the
reference's all-reduces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lightly_train_tpu.ops import losses as L
from lightly_train_tpu.parallel import get_default_mesh


@pytest.fixture(scope="module")
def mesh():
    return get_default_mesh()


def _run_both(fn, x, mesh):
    sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    replicated = jax.device_put(x, NamedSharding(mesh, P()))
    return jax.jit(fn)(sharded), jax.jit(fn)(replicated)


def test_center_update_matches(mesh):
    logits = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
    center = jnp.zeros((16,))
    f = lambda t: L.update_center(center, t, 0.9)
    a, b = _run_both(f, logits, mesh)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sinkhorn_matches(mesh):
    logits = np.random.default_rng(1).normal(size=(32, 8)).astype(np.float32)
    f = lambda t: L.sinkhorn_knopp_teacher(t, temp=0.1)
    a, b = _run_both(f, logits, mesh)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ntxent_global_negatives_match(mesh):
    z = np.random.default_rng(2).normal(size=(16, 8)).astype(np.float32)

    def f(z):
        return L.ntxent_loss(z, z[::-1])

    a, b = _run_both(f, z, mesh)
    np.testing.assert_allclose(float(a), float(b), atol=1e-5)


def test_dinov2_full_step_sharded_vs_replicated():
    """The entire fused train step: sharded batch == replicated batch."""
    from lightly_train_tpu._optim import build_optimizer
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._commands.train_loop import make_train_step

    mesh = get_default_mesh()
    wrapped = get_wrapped_model("dinov3/vittest16")
    method = DINOv2(wrapped, DINOv2Args(
        output_dim=16, hidden_dim=8, bottleneck_dim=8, local_view_count=2,
        global_image_size=32, local_image_size=16, koleo_weight=0.0,
    ))
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 48, 48, 3), jnp.uint8)
    params, ms, mstate = method.init(rng, sample)
    opt = build_optimizer(method.default_optimizer_args(), 1e-3, params)
    imgs = np.random.default_rng(0).integers(
        0, 256, (8, 48, 48, 3), dtype=np.uint8
    )

    def run(sharding_spec):
        # Fresh copies: the train step donates its input state buffers.
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=copy(params),
            model_state=copy(ms), opt_state=opt.init(copy(params)),
            method_state=copy(mstate),
        )
        state = jax.device_put(state, NamedSharding(mesh, P()))
        batch = jax.device_put(imgs, NamedSharding(mesh, sharding_spec))
        # donate disabled by fresh state each call
        step = make_train_step(method, opt, total_steps=10)
        _, metrics = step(state, batch, jax.random.key(1))
        return float(metrics["train_loss"])

    loss_sharded = run(P("data"))
    loss_replicated = run(P())
    assert loss_sharded == pytest.approx(loss_replicated, abs=1e-4)


def test_fsdp_sharding_rules():
    from lightly_train_tpu.parallel.mesh import (
        FSDP_AXIS, MeshConfig, fsdp_leaf_sharding, shard_train_state,
    )

    mesh = MeshConfig(data=4, fsdp=2).build()
    big = jnp.zeros((1024, 512))
    small = jnp.zeros((8,))
    s_big = fsdp_leaf_sharding(big, mesh)
    s_small = fsdp_leaf_sharding(small, mesh)
    assert FSDP_AXIS in (s_big.spec[0], s_big.spec[1] if len(s_big.spec) > 1 else None)
    assert all(x is None for x in s_small.spec)
    placed = shard_train_state({"w": big, "b": small}, mesh)
    assert placed["w"].sharding.spec != placed["b"].sharding.spec


def test_dinov2_step_fsdp_mesh_matches_dp():
    """Full fused step on a (4, 2) data x fsdp mesh == pure-DP loss."""
    from lightly_train_tpu._optim import build_optimizer
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu.parallel.mesh import MeshConfig, shard_train_state

    wrapped = get_wrapped_model("dinov3/vittest16")
    method = DINOv2(wrapped, DINOv2Args(
        output_dim=16, hidden_dim=8, bottleneck_dim=8, local_view_count=2,
        global_image_size=32, local_image_size=16, koleo_weight=0.0,
    ))
    rng = jax.random.key(0)
    params, ms, mstate = method.init(rng, jnp.zeros((2, 48, 48, 3), jnp.uint8))
    opt = build_optimizer(method.default_optimizer_args(), 1e-3, params)
    imgs = np.random.default_rng(0).integers(
        0, 256, (8, 48, 48, 3), dtype=np.uint8
    )

    def run(mesh_cfg):
        mesh = mesh_cfg.build()
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=copy(params),
            model_state=copy(ms), opt_state=opt.init(copy(params)),
            method_state=copy(mstate),
        )
        state = shard_train_state(state, mesh, fsdp_min_size=64)
        batch = jax.device_put(imgs, NamedSharding(mesh, P("data")))
        step = make_train_step(method, opt, total_steps=10)
        _, metrics = step(state, batch, jax.random.key(1))
        return float(metrics["train_loss"])

    loss_dp = run(MeshConfig(data=8, fsdp=1))
    loss_fsdp = run(MeshConfig(data=4, fsdp=2))
    assert loss_fsdp == pytest.approx(loss_dp, abs=1e-4)


def test_fused_update_step_sharded_matches_unfused_on_mesh():
    """The fused AdamW+EMA update's GSPMD (jnp) path: a full step with the
    fused updater on the 8-device mesh equals the unfused optax step, both
    with a sharded batch AND on a (4 data x 2 fsdp) mesh."""
    from lightly_train_tpu._optim import build_optimizer, cosine_warmup
    from lightly_train_tpu._optim.fused_update import build_fused_updater
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu.parallel.mesh import MeshConfig, shard_train_state

    wrapped = get_wrapped_model("dinov3/vittest16")
    method = DINOv2(wrapped, DINOv2Args(
        output_dim=16, hidden_dim=8, bottleneck_dim=8, local_view_count=2,
        global_image_size=32, local_image_size=16, koleo_weight=0.0,
    ))
    rng = jax.random.key(0)
    params, ms, mstate = method.init(rng, jnp.zeros((2, 48, 48, 3), jnp.uint8))
    args = method.default_optimizer_args()
    sched = cosine_warmup(1e-3, 10, 2)
    opt = build_optimizer(
        args, sched, params, grad_clip_norm=method.grad_clip_norm(),
        lr_scales=method.lr_scales(params),
        weight_decay_schedule=method.weight_decay_schedule(10),
        wd_mask=method.wd_mask(params),
    )
    imgs = np.random.default_rng(0).integers(
        0, 256, (8, 48, 48, 3), dtype=np.uint8
    )

    def run(mesh_cfg, fused):
        mesh = mesh_cfg.build()
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=copy(params),
            model_state=copy(ms), opt_state=opt.init(copy(params)),
            method_state=copy(mstate),
        )
        state = shard_train_state(state, mesh, fsdp_min_size=64)
        batch = jax.device_put(imgs, NamedSharding(mesh, P("data")))
        updater = (
            build_fused_updater(method, args, sched, params, 10, mode="jnp")
            if fused else None
        )
        step = make_train_step(
            method, opt, total_steps=10, fused_updater=updater
        )
        new_state, metrics = step(state, batch, jax.random.key(1))
        leaf = new_state.params["student"]["cls_token"]
        teacher = new_state.method_state["teacher"]["student"]["cls_token"]
        return (
            float(metrics["train_loss"]),
            np.asarray(leaf),
            np.asarray(teacher),
        )

    loss_u, p_u, t_u = run(MeshConfig(data=8, fsdp=1), fused=False)
    loss_f, p_f, t_f = run(MeshConfig(data=8, fsdp=1), fused=True)
    assert loss_f == pytest.approx(loss_u, abs=1e-5)
    np.testing.assert_allclose(p_f, p_u, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(t_f, t_u, rtol=1e-5, atol=1e-7)
    # FSDP mesh: fused path still matches the pure-DP fused result.
    loss_f2, p_f2, t_f2 = run(MeshConfig(data=4, fsdp=2), fused=True)
    assert loss_f2 == pytest.approx(loss_f, abs=1e-4)
    np.testing.assert_allclose(p_f2, p_f, rtol=1e-4, atol=1e-6)
