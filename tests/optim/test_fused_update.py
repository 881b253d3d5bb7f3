"""Parity tests: fused AdamW+EMA update vs the unfused optax chain.

The fused path (``_optim/fused_update.py``) must reproduce the exact update
semantics of ``build_optimizer``'s chain (clip_by_global_norm ->
scale_by_adam -> add_decayed_weights(schedule, mask) -> lr scales -> lr) plus
``mask_updates`` + ``apply_updates`` + the EMA teacher ``post_update`` —
within fp32 rounding of reassociated scalar factors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lightly_train_tpu._optim import AdamWArgs, build_optimizer
from lightly_train_tpu._optim.fused_update import (
    FusedAdamWEMA,
    _jnp_leaf,
    _leaf_plan,
    build_fused_updater,
    fused_adamw_ema_leaf,
)
from lightly_train_tpu.ops.ema import ema_update

CLIP = 3.0


def _make_tree(key):
    ks = jax.random.split(key, 4)
    return {
        "student": {
            "w": jax.random.normal(ks[0], (64, 32), jnp.float32),
            "b": jax.random.normal(ks[1], (32,), jnp.float32),
        },
        "prototypes": {
            "kernel": jax.random.normal(ks[2], (16, 8), jnp.float32)
        },
        "cls_token": jax.random.normal(ks[3], (1, 5, 8), jnp.float32),
    }


def _lr_scales():
    return {
        "student": {"w": 0.5, "b": 0.5},
        "prototypes": {"kernel": 1.0},
        "cls_token": 0.25,
    }


def _wd_sched(c):
    return 0.04 + 0.001 * jnp.asarray(c, jnp.float32)


def _lr_sched(c):
    return 1e-3 * (1.0 + 0.1 * jnp.asarray(c, jnp.float32))


def _momentum(step):
    return 0.99 + 0.001 * jnp.asarray(step, jnp.float32)


def _freeze_scales(params, step):
    live = (jnp.asarray(step) >= 2).astype(jnp.float32)

    def _s(path, _):
        parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        return live if "prototypes" in parts else 1.0

    return jax.tree_util.tree_map_with_path(_s, params)


def _reference_step(optimizer, params, teacher, opt_state, grads, step):
    updates, opt_state = optimizer.update(grads, opt_state, params)
    live = (jnp.asarray(step) >= 2).astype(jnp.float32)

    def _freeze(path, u):
        parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        return u * live if "prototypes" in parts else u

    updates = jax.tree_util.tree_map_with_path(_freeze, updates)
    params = optax.apply_updates(params, updates)
    teacher = ema_update(teacher, params, _momentum(step))
    return params, teacher, opt_state


def test_fused_jnp_matches_optax_chain():
    """5 steps of fused (jnp mode) vs the exact build_optimizer chain."""
    key = jax.random.key(0)
    params = _make_tree(key)
    teacher = jax.tree_util.tree_map(jnp.copy, params)
    args = AdamWArgs(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.04)
    optimizer = build_optimizer(
        args, _lr_sched, params, grad_clip_norm=CLIP,
        lr_scales=_lr_scales(), weight_decay_schedule=_wd_sched,
    )
    opt_state = optimizer.init(params)

    fused = FusedAdamWEMA(
        args, _lr_sched, params, grad_clip_norm=CLIP,
        lr_scales=_lr_scales(), weight_decay_schedule=_wd_sched,
        momentum_fn=_momentum,
        update_scales_fn=lambda s: _freeze_scales(params, s),
        mode="jnp",
    )

    f_params = jax.tree_util.tree_map(jnp.copy, params)
    f_teacher = jax.tree_util.tree_map(jnp.copy, teacher)
    f_opt = optimizer.init(params)

    for step in range(5):
        gkey = jax.random.fold_in(key, 100 + step)
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(gkey, p.shape, p.dtype)
            # step 1: huge grads so the global-norm clip actually triggers
            * (100.0 if step == 1 else 0.1),
            params,
        )
        params, teacher, opt_state = _reference_step(
            optimizer, params, teacher, opt_state, grads, step
        )
        f_params, f_teacher, f_opt, gnorm = fused.update_and_apply(
            grads, f_opt, f_params, f_teacher, jnp.asarray(step)
        )
        assert np.isfinite(float(gnorm))

    for name, ref, got in [
        ("params", params, f_params),
        ("teacher", teacher, f_teacher),
    ]:
        for (pa, r), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got),
        ):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(g), rtol=1e-5, atol=1e-7,
                err_msg=f"{name} {pa}",
            )
    # Moments + every count field advanced identically.
    ref_adam = [
        s for s in jax.tree_util.tree_leaves(
            opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
        ) if isinstance(s, optax.ScaleByAdamState)
    ][0]
    got_adam = [
        s for s in jax.tree_util.tree_leaves(
            f_opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        ) if isinstance(s, optax.ScaleByAdamState)
    ][0]
    assert int(ref_adam.count) == int(got_adam.count) == 5
    for r, g in zip(
        jax.tree_util.tree_leaves(ref_adam.mu),
        jax.tree_util.tree_leaves(got_adam.mu),
    ):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=1e-5,
                                   atol=1e-8)
    for r, g in zip(
        jax.tree_util.tree_leaves(ref_adam.nu),
        jax.tree_util.tree_leaves(got_adam.nu),
    ):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=1e-5,
                                   atol=1e-9)


def test_pallas_kernel_interpret_matches_jnp():
    """The Pallas kernel (interpret mode) == the jnp expression per leaf."""
    key = jax.random.key(1)
    shape = (3, 120, 1024)  # leading grid dim + blocked rows/lanes
    ks = jax.random.split(key, 5)
    g = jax.random.normal(ks[0], shape, jnp.float32)
    p = jax.random.normal(ks[1], shape, jnp.float32)
    mu = jax.random.normal(ks[2], shape, jnp.float32) * 0.1
    nu = jax.random.uniform(ks[3], shape, jnp.float32) * 0.01
    t = jax.random.normal(ks[4], shape, jnp.float32)
    scalars = jnp.array(
        [[0.7, 1.5, 1.1, 2e-3, 0.04, 0.995, 0.0, 0.0]], jnp.float32
    )
    kw = dict(b1=0.9, b2=0.999, eps=1e-8)
    ref = _jnp_leaf(g, p, mu, nu, t, scalars, **kw)
    got = fused_adamw_ema_leaf(g, p, mu, nu, t, scalars, interpret=True, **kw)
    for r, o in zip(ref, got):
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), rtol=1e-6,
                                   atol=1e-7)


def test_leaf_plan_shapes():
    assert _leaf_plan((10, 10)) is None  # tiny -> jnp
    assert _leaf_plan((131072,)) is None  # 1-D -> jnp
    # pos_embed (1, 257, 768) has a prime row extent -> jnp fallback.
    assert _leaf_plan((1, 257, 768)) is None
    for shape in [(768, 768), (768, 3072), (3072, 768), (14, 14, 3, 768),
                  (256, 65536)]:
        plan = _leaf_plan(shape)
        assert plan is not None, shape
        br, bl = plan
        rows, lanes = shape[-2], shape[-1]
        assert rows % br == 0 and lanes % bl == 0, (shape, plan)
        assert br == rows or br % 8 == 0
        assert bl == lanes or bl % 128 == 0
        assert br * bl * 4 <= 2048 * 2048  # bounded VMEM block


def test_train_step_fused_matches_unfused():
    """Full tiny-DINOv2 train step: fused path == unfused path, 3 steps."""
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu._optim import cosine_warmup
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model

    wrapped = get_wrapped_model("dinov2/vittest14", dtype=jnp.float32)
    args = DINOv2Args(
        output_dim=64, hidden_dim=32, bottleneck_dim=16,
        local_view_count=2, global_image_size=28, local_image_size=14,
    )
    method = DINOv2(wrapped, args)
    total_steps = 100
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    optim_args = method.default_optimizer_args()
    lr_sched = cosine_warmup(1e-3, total_steps, 10)
    optimizer = build_optimizer(
        optim_args, lr_sched, params,
        grad_clip_norm=method.grad_clip_norm(),
        lr_scales=method.lr_scales(params),
        weight_decay_schedule=method.weight_decay_schedule(total_steps),
    )

    def fresh_state():
        p, ms, mes = method.init(rng, sample)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=p, model_state=ms,
            opt_state=optimizer.init(p), method_state=mes,
        )

    fused = build_fused_updater(
        method, optim_args, lr_sched, params, total_steps, mode="jnp"
    )
    assert fused is not None
    step_unfused = make_train_step(method, optimizer, total_steps)
    step_fused = make_train_step(
        method, optimizer, total_steps, fused_updater=fused
    )

    imgs = jax.random.randint(
        jax.random.key(7), (4, 32, 32, 3), 0, 256, jnp.uint8
    )
    key = jax.random.key(3)
    s_a, s_b = fresh_state(), fresh_state()
    for _ in range(3):
        s_a, m_a = step_unfused(s_a, imgs, key)
        s_b, m_b = step_fused(s_b, imgs, key)
    np.testing.assert_allclose(
        float(m_a["train_loss"]), float(m_b["train_loss"]), rtol=1e-4
    )
    for (pa, r), (_, g) in zip(
        jax.tree_util.tree_leaves_with_path(s_a.params),
        jax.tree_util.tree_leaves_with_path(s_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=1e-4, atol=1e-6,
            err_msg=str(pa),
        )
    for (pa, r), (_, g) in zip(
        jax.tree_util.tree_leaves_with_path(s_a.method_state["teacher"]),
        jax.tree_util.tree_leaves_with_path(s_b.method_state["teacher"]),
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=1e-4, atol=1e-6,
            err_msg=str(pa),
        )


def test_fused_and_unfused_interop_mid_run():
    """Switching update paths mid-run (the checkpoint-interop claim): 2
    fused steps then 2 unfused == 4 unfused, because the fused path reads
    and writes the SAME optax chain state (counts + moments)."""
    from lightly_train_tpu._commands.train_loop import make_train_step
    from lightly_train_tpu._optim import cosine_warmup
    from lightly_train_tpu.methods.base import TrainState
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.models.package_registry import get_wrapped_model

    wrapped = get_wrapped_model("dinov2/vittest14", dtype=jnp.float32)
    method = DINOv2(wrapped, DINOv2Args(
        output_dim=64, hidden_dim=32, bottleneck_dim=16,
        local_view_count=2, global_image_size=28, local_image_size=14,
    ))
    total_steps = 100
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    optim_args = method.default_optimizer_args()
    lr_sched = cosine_warmup(1e-3, total_steps, 10)
    optimizer = build_optimizer(
        optim_args, lr_sched, params,
        grad_clip_norm=method.grad_clip_norm(),
        lr_scales=method.lr_scales(params),
        weight_decay_schedule=method.weight_decay_schedule(total_steps),
        wd_mask=method.wd_mask(params),
    )
    fused = build_fused_updater(
        method, optim_args, lr_sched, params, total_steps, mode="jnp"
    )
    step_f = make_train_step(method, optimizer, total_steps,
                             fused_updater=fused)
    step_u = make_train_step(method, optimizer, total_steps)

    def fresh():
        p, ms, mes = method.init(rng, sample)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=p, model_state=ms,
            opt_state=optimizer.init(p), method_state=mes,
        )

    imgs = jax.random.randint(
        jax.random.key(7), (4, 32, 32, 3), 0, 256, jnp.uint8
    )
    key = jax.random.key(3)
    s_mixed, s_pure = fresh(), fresh()
    for _ in range(2):
        s_mixed, _ = step_f(s_mixed, imgs, key)
        s_pure, _ = step_u(s_pure, imgs, key)
    for _ in range(2):
        s_mixed, m_a = step_u(s_mixed, imgs, key)  # switch paths mid-run
        s_pure, m_b = step_u(s_pure, imgs, key)
    np.testing.assert_allclose(
        float(m_a["train_loss"]), float(m_b["train_loss"]), rtol=1e-4
    )
    for (pa, r), (_, g) in zip(
        jax.tree_util.tree_leaves_with_path(s_pure.params),
        jax.tree_util.tree_leaves_with_path(s_mixed.params),
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=1e-4, atol=1e-6,
            err_msg=str(pa),
        )


def test_build_fused_updater_gating():
    """Non-EMA methods and non-AdamW optimizers keep the unfused path."""
    from lightly_train_tpu._optim import SGDArgs
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
    from lightly_train_tpu.methods.simclr import SimCLR, SimCLRArgs
    from lightly_train_tpu.models.package_registry import get_wrapped_model

    wrapped = get_wrapped_model("dinov2/vittest14", dtype=jnp.float32)
    simclr = SimCLR(wrapped, SimCLRArgs(image_size=28))
    assert (
        build_fused_updater(simclr, AdamWArgs(lr=1e-3), 1e-3, {}, 10) is None
    )
    dinov2 = DINOv2(
        wrapped,
        DINOv2Args(
            output_dim=64, hidden_dim=32, bottleneck_dim=16,
            local_view_count=2, global_image_size=28, local_image_size=14,
        ),
    )
    assert (
        build_fused_updater(
            simclr, SGDArgs(lr=0.1), 1e-3, {}, 10
        ) is None
    )
    # AdamW + EMA method -> enabled (jnp on CPU)
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    params, _, _ = dinov2.init(rng, sample)
    upd = build_fused_updater(
        dinov2, dinov2.default_optimizer_args(), 1e-3, params, 10
    )
    assert upd is not None and upd.mode == "jnp"
