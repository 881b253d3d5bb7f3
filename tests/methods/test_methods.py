"""Per-method unit tests: one fused train step runs, loss finite, state sane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu._optim import build_optimizer, cosine_warmup
from lightly_train_tpu.methods.base import TrainState
from lightly_train_tpu.methods.method_helpers import get_method_cls, list_methods
from lightly_train_tpu._commands.train_loop import make_train_step
from lightly_train_tpu.models.package_registry import get_wrapped_model

TINY_ARGS = {
    "distillationv3": {"teacher": "dinov3/vittest16", "image_size": 32,
                       "queue_size": 16},
    "distillationv2": {"teacher": "dinov3/vittest16", "image_size": 32,
                       "queue_size": 16},
    "distillationv1": {"teacher": "dinov3/vittest16", "image_size": 32,
                       "queue_size": 16},
    "dinov2": {"output_dim": 32, "hidden_dim": 16, "bottleneck_dim": 8,
               "local_view_count": 2, "global_image_size": 32,
               "local_image_size": 16},
    "dino": {"output_dim": 32, "hidden_dim": 16, "bottleneck_dim": 8,
             "local_view_count": 2, "global_image_size": 32,
             "local_image_size": 16},
    "simclr": {"image_size": 32, "hidden_dim": 16, "output_dim": 8},
    "densecl": {"image_size": 32, "queue_size": 32, "hidden_dim": 16,
                "output_dim": 8},
    "detconb": {"image_size": 32, "num_masks": 4, "hidden_dim": 16,
                "output_dim": 8},
    "detcons": {"image_size": 32, "num_masks": 4, "hidden_dim": 16,
                "output_dim": 8},
}


def _run_two_steps(method_name: str, model_name: str = "dinov3/vittest16"):
    method_cls, args_cls = get_method_cls(method_name)
    args = args_cls(**TINY_ARGS[method_name])
    wrapped = get_wrapped_model(model_name)
    method = method_cls(wrapped, args)
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 48, 48, 3), dtype=jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    opt = build_optimizer(
        method.default_optimizer_args(), cosine_warmup(1e-3, 10, 1), params,
        grad_clip_norm=method.grad_clip_norm(),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, model_state=model_state,
        opt_state=opt.init(params), method_state=method_state,
    )
    step_fn = make_train_step(method, opt, total_steps=10)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 48, 48, 3), dtype=np.uint8)
    )
    losses = []
    for _ in range(2):
        state, metrics = step_fn(state, imgs, jax.random.key(1))
        losses.append(float(metrics["train_loss"]))
    return state, losses


@pytest.mark.parametrize("name", sorted(TINY_ARGS))
def test_method_two_steps(name):
    state, losses = _run_two_steps(name)
    assert int(state.step) == 2
    assert all(np.isfinite(l) for l in losses), losses


def test_method_registry_lists_and_aliases():
    methods = list_methods()
    assert "distillation" in methods and "dinov2" in methods
    assert "densecl" not in methods  # hidden
    cls, _ = get_method_cls("distillation")
    assert cls.name == "distillationv3"


def test_ema_teacher_moves_toward_student():
    state, _ = _run_two_steps("dinov2")
    # After 2 steps the teacher differs from its init but tracks the student.
    t = state.method_state["teacher"]["student"]
    s = state.params["student"]
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.mean(jnp.abs(a - b))), t, s
    )
    vals = jax.tree_util.tree_leaves(diff)
    assert max(vals) < 0.2  # momentum 0.992 keeps them close


def test_distillation_queue_advances():
    state, _ = _run_two_steps("distillationv3")
    assert int(state.method_state["queue_ptr"]) == 16 % 16  # 2*8 mod 16
    assert int(state.method_state["queue_filled"]) == 16


def test_dinov31_paka_step():
    from lightly_train_tpu.methods.dinov31 import DINOv31, DINOv31Args

    args = DINOv31Args(
        output_dim=32, hidden_dim=16, bottleneck_dim=8, local_view_count=2,
        global_image_size=32, local_image_size=16,
    )
    wrapped = get_wrapped_model("dinov3/vittest16")
    method = DINOv31(wrapped, args)
    assert method.needs_geometry
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 48, 48, 3), dtype=jnp.uint8)
    params, model_state, method_state = method.init(rng, sample)
    opt = build_optimizer(
        method.default_optimizer_args(), cosine_warmup(1e-3, 10, 1), params,
        grad_clip_norm=method.grad_clip_norm(),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, model_state=model_state,
        opt_state=opt.init(params), method_state=method_state,
    )
    step_fn = make_train_step(method, opt, total_steps=10)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 48, 48, 3), dtype=np.uint8)
    )
    state, metrics = step_fn(state, imgs, jax.random.key(1))
    assert np.isfinite(float(metrics["train_loss"]))
    assert np.isfinite(float(metrics["paka_loss"]))
    assert float(metrics["paka_loss"]) >= 0.0


def test_dinov2_sinkhorn_centering():
    from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args

    args = DINOv2Args(center_method="sinkhorn", **TINY_ARGS["dinov2"])
    wrapped = get_wrapped_model("dinov3/vittest16")
    method = DINOv2(wrapped, args)
    rng = jax.random.key(0)
    sample = jnp.zeros((2, 48, 48, 3), dtype=jnp.uint8)
    params, ms, mstate = method.init(rng, sample)
    opt = build_optimizer(method.default_optimizer_args(),
                          cosine_warmup(1e-3, 10, 1), params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       model_state=ms, opt_state=opt.init(params),
                       method_state=mstate)
    step_fn = make_train_step(method, opt, total_steps=10)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (8, 48, 48, 3), dtype=np.uint8))
    state, metrics = step_fn(state, imgs, jax.random.key(1))
    assert np.isfinite(float(metrics["train_loss"]))


def test_distillation_with_teacher_weights_artifact(tmp_path):
    """teacher_weights pointing at an exported artifact initializes teacher."""
    from lightly_train_tpu._checkpoint.checkpoint import (
        export_model, load_exported_model,
    )
    from lightly_train_tpu.methods.distillationv3 import (
        DistillationV3, DistillationV3Args,
    )

    teacher = get_wrapped_model("dinov3/vittest16")
    tvars = teacher.init(jax.random.key(42), jnp.zeros((1, 32, 32, 3)))
    export_model(tmp_path / "teacher", "dinov3/vittest16", tvars["params"])
    args = DistillationV3Args(
        teacher="dinov3/vittest16",
        teacher_weights=str(tmp_path / "teacher"),
        image_size=32, queue_size=16,
    )
    method = DistillationV3(get_wrapped_model("torchvision/resnettest"), args)
    params, ms, mstate = method.init(
        jax.random.key(0), jnp.zeros((2, 48, 48, 3), jnp.uint8)
    )
    got = mstate["teacher"]["params"]["cls_token"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(tvars["params"]["cls_token"]), atol=1e-6
    )
