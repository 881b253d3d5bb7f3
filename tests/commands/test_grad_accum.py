"""Gradient accumulation in the pretrain step (reference train.py:62,463).

Two layers of coverage: exact equivalence of the scan-accumulated update
against the single-shot update for a params-only loss (the averaging math),
and an end-to-end ``pretrain(grad_accum_steps=2)`` on the 8-device mesh
(the sharded microbatch reshape compiles and trains).
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

import lightly_train_tpu as lt
from lightly_train_tpu._commands.train_loop import make_train_step
from lightly_train_tpu.methods.base import Method, MethodArgs, TrainState, ViewSpec
from lightly_train_tpu.ops.augment import ViewAugmentConfig


class _StubMethod(Method):
    """Loss depends only on params, so every microbatch yields identical
    grads and accumulation must reproduce the single-shot update exactly.
    method_state counts loss_fn invocations (must equal grad_accum_steps)."""

    def view_specs(self):
        return [ViewSpec(ViewAugmentConfig(out_size=(8, 8)), 2)]

    def init(self, rng, sample_images):
        del rng, sample_images
        return {"w": jnp.arange(1.0, 5.0)}, {}, {"calls": jnp.zeros((), jnp.int32)}

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del rng, step, total_steps
        loss = jnp.sum(params["w"] ** 2) + 0.0 * jnp.mean(views[0])
        new_ms = {"calls": method_state["calls"] + 1}
        return loss, (model_state, new_ms, {"aux": loss})


def _make_state(method):
    params, model_state, method_state = method.init(
        jax.random.key(0), jnp.zeros((2, 16, 16, 3), jnp.uint8)
    )
    opt = optax.sgd(0.1)
    return opt, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=opt.init(params),
        method_state=method_state,
    )


def test_accum_matches_single_shot_for_param_only_loss():
    method = _StubMethod(wrapped=None, args=MethodArgs())
    batch = jnp.zeros((4, 16, 16, 3), jnp.uint8)
    key = jax.random.key(1)

    opt, state1 = _make_state(method)
    step1 = make_train_step(method, opt, total_steps=10, grad_accum_steps=1)
    new1, m1 = step1(state1, batch, key)

    opt, state2 = _make_state(method)
    step2 = make_train_step(method, opt, total_steps=10, grad_accum_steps=2)
    new2, m2 = step2(state2, batch, key)

    np.testing.assert_allclose(
        np.asarray(new1.params["w"]), np.asarray(new2.params["w"]), rtol=1e-6
    )
    assert int(new1.method_state["calls"]) == 1
    assert int(new2.method_state["calls"]) == 2
    np.testing.assert_allclose(float(m1["aux"]), float(m2["aux"]), rtol=1e-6)


def test_accum_batch_not_divisible_raises():
    method = _StubMethod(wrapped=None, args=MethodArgs())
    opt, state = _make_state(method)
    step = make_train_step(method, opt, total_steps=10, grad_accum_steps=3)
    batch = jnp.zeros((4, 16, 16, 3), jnp.uint8)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, jax.random.key(0))


def test_pretrain_end_to_end_with_grad_accum(tmp_path):
    from PIL import Image

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        arr = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(data / f"img_{i}.png")

    state = lt.pretrain(
        out=str(tmp_path / "out"),
        data=str(data),
        model="torchvision/resnettest",
        method="simclr",
        method_args={"image_size": 32, "output_dim": 16, "hidden_dim": 16},
        batch_size=8,
        grad_accum_steps=2,
        steps=2,
        precision="fp32",
        canonical_size=64,
        num_workers=2,
        log_every=1,
    )
    assert int(state.step) == 2
