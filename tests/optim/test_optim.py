import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu._optim import (
    AdamWArgs,
    LARSArgs,
    SGDArgs,
    build_optimizer,
    cosine_warmup,
    flat_cosine,
    layerwise_lr_scales,
    no_weight_decay_mask,
    poly_schedule,
    scale_lr_for_batch_size,
)


def test_cosine_warmup_shape():
    s = cosine_warmup(1.0, total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(s(55)) > float(s(90))


def test_poly_schedule():
    s = poly_schedule(1.0, total_steps=100, power=0.9)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)


def test_flat_cosine():
    s = flat_cosine(1.0, total_steps=100, warmup_steps=10, flat_fraction=0.5)
    assert float(s(5)) == pytest.approx(0.5)
    assert float(s(30)) == pytest.approx(1.0)
    assert float(s(54)) == pytest.approx(1.0)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)


def test_lr_scaling():
    assert scale_lr_for_batch_size(0.1, 2048, 1024, "linear") == pytest.approx(0.2)
    assert scale_lr_for_batch_size(0.1, 4096, 1024, "sqrt") == pytest.approx(0.2)


def _params():
    return {
        "patch_embed": {"kernel": jnp.ones((3, 3, 3, 8)), "bias": jnp.ones((8,))},
        "block0": {"attn": {"kernel": jnp.ones((8, 8)), "bias": jnp.ones((8,))}},
        "block1": {"attn": {"kernel": jnp.ones((8, 8)), "bias": jnp.ones((8,))}},
        "norm": {"scale": jnp.ones((8,))},
        "cls_token": jnp.ones((1, 1, 8)),
    }


def test_no_weight_decay_mask():
    mask = no_weight_decay_mask(_params())
    assert mask["patch_embed"]["kernel"] is True
    assert mask["patch_embed"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["cls_token"] is False


def test_layerwise_scales():
    scales = layerwise_lr_scales(_params(), decay=0.9, num_layers=2,
                                 patch_embed_multiplier=0.2)
    assert scales["block0"]["attn"]["kernel"] == pytest.approx(0.9**2)
    assert scales["block1"]["attn"]["kernel"] == pytest.approx(0.9)
    assert scales["norm"]["scale"] == pytest.approx(1.0)
    assert scales["patch_embed"]["kernel"] == pytest.approx(0.9**3 * 0.2)
    # The patch-embed multiplier applies to patch_embed ONLY; tokens get the
    # plain embedding-level decay (reference utils.py:246).
    assert scales["cls_token"] == pytest.approx(0.9**3)


@pytest.mark.parametrize("args", [AdamWArgs(lr=0.1), SGDArgs(lr=0.1),
                                  LARSArgs(lr=0.1, weight_decay=1e-4)])
def test_build_optimizer_steps(args):
    params = _params()
    opt = build_optimizer(args, 0.1, params, grad_clip_norm=1.0)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    # params moved
    assert not np.allclose(
        np.asarray(new_params["block0"]["attn"]["kernel"]),
        np.asarray(params["block0"]["attn"]["kernel"]),
    )


def test_build_optimizer_with_llrd_and_wd_schedule():
    params = _params()
    scales = layerwise_lr_scales(params, decay=0.5, num_layers=2)
    wd_sched = lambda step: 0.04 + 0.36 * jnp.minimum(step / 100.0, 1.0)
    opt = build_optimizer(
        AdamWArgs(lr=0.1), 0.1, params,
        lr_scales=scales, weight_decay_schedule=wd_sched,
    )
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    u0 = float(jnp.abs(updates["block0"]["attn"]["kernel"]).mean())
    u1 = float(jnp.abs(updates["block1"]["attn"]["kernel"]).mean())
    assert u0 < u1  # earlier layer gets smaller update


def test_adamw8bit_tracks_adamw():
    """8-bit moments approximate fp32 AdamW over a few steps."""
    from lightly_train_tpu._optim.adamw8bit import AdamW8bitArgs

    params = {"w": jnp.ones((512,)) * 0.5, "b": jnp.ones((8,))}
    rng = np.random.default_rng(0)
    grads_seq = [
        {"w": jnp.asarray(rng.normal(size=(512,)), jnp.float32),
         "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32)}
        for _ in range(5)
    ]
    out = {}
    for name, args in [("fp32", AdamWArgs(lr=0.1, weight_decay=0.0)),
                       ("int8", AdamW8bitArgs(lr=0.1, weight_decay=0.0))]:
        opt = build_optimizer(args, 0.1, params)
        state = opt.init(params)
        p = params
        for g in grads_seq:
            updates, state = opt.update(g, state, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        out[name] = p
    diff = float(jnp.max(jnp.abs(out["fp32"]["w"] - out["int8"]["w"])))
    assert diff < 0.05, diff  # quantization noise stays small
    assert "adamw8bit" in __import__(
        "lightly_train_tpu._optim.optimizers", fromlist=["OPTIMIZER_ARGS_TYPES"]
    ).OPTIMIZER_ARGS_TYPES


def test_adamw8bit_state_is_int8():
    from lightly_train_tpu._optim.adamw8bit import (
        AdamW8bitArgs, ScaleByAdam8bitState,
    )

    params = {"w": jnp.ones((300,))}
    opt = build_optimizer(AdamW8bitArgs(lr=0.1), 0.1, params)
    state = opt.init(params)
    inner = [s for s in jax.tree_util.tree_leaves(
        state, is_leaf=lambda x: isinstance(x, ScaleByAdam8bitState))
        if isinstance(s, ScaleByAdam8bitState)]
    assert inner, "adam8bit state not found in chain"
    assert inner[0].mu_q["w"].dtype == jnp.int8
    assert inner[0].mu_q["w"].shape == (2, 256)  # 300 -> 2 blocks of 256
