"""Distillation v1 (feature MSE) and v2 (global queue similarity CE).

Rebuilds of ``src/lightly_train/_methods/distillation/`` (539 LoC — original
feature-MSE distillation) and ``_methods/distillationv2/`` (526 LoC — the
queue-based global-only predecessor of DistillationV3). Both share the frozen
teacher + single-view layout of DistillationV3.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from lightly_train_tpu._configs.config import AUTO
from lightly_train_tpu._optim import AdamWArgs
from lightly_train_tpu.methods.base import Method, ViewSpec
from lightly_train_tpu.methods.distillationv3 import DistillationV3, DistillationV3Args
from lightly_train_tpu.ops.losses import mse_feature_loss, similarity_queue_ce


class DistillationV1Args(DistillationV3Args):
    mixup_prob: float = 0.0


class DistillationV1(DistillationV3):
    """Feature-MSE distillation: student patch grid -> teacher patch grid."""

    name = "distillationv1"

    def __init__(self, wrapped, args: DistillationV1Args, **kw):
        super().__init__(wrapped, args, **kw)

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del step, total_steps
        images = views[0]
        k_drop = rng
        t_out = self.teacher.forward_features(
            method_state["teacher"], images, train=False
        )
        t_local = jax.lax.stop_gradient(t_out["features"])
        t_global = jax.lax.stop_gradient(self.teacher.forward_pool(t_out))

        s_variables = {"params": params["student"], **model_state}
        mutable = [k for k in model_state] if model_state else False
        s_out = self.wrapped.forward_features(
            s_variables, images, train=True, rngs={"droppath": k_drop},
            mutable=mutable,
        )
        if mutable:
            s_out, new_model_state = s_out
        else:
            new_model_state = model_state
        z_global = self.global_head.apply(
            {"params": params["global_head"]}, self.wrapped.forward_pool(s_out)
        )
        z_local = self.local_head.apply(
            {"params": params["local_head"]}, s_out["features"]
        )
        Bt, Ht, Wt, Dt = t_local.shape
        if z_local.shape[1:3] != (Ht, Wt):
            z_local = jax.image.resize(
                z_local, (z_local.shape[0], Ht, Wt, z_local.shape[-1]),
                "bilinear",
            )
        loss_global = mse_feature_loss(z_global, t_global)
        loss_local = mse_feature_loss(z_local, t_local)
        loss = loss_global + self.args.lambda_local * loss_local
        return loss, (
            new_model_state,
            method_state,
            {"loss_global": loss_global, "loss_local": loss_local},
        )

    def default_optimizer_args(self):
        return AdamWArgs(lr=1e-3, weight_decay=1e-5)


class DistillationV2Args(DistillationV3Args):
    pass


class DistillationV2(DistillationV3):
    """Queue-based distillation, global term only (no patch-level loss)."""

    name = "distillationv2"

    def __init__(self, wrapped, args: DistillationV2Args, **kw):
        super().__init__(wrapped, args, **kw)

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        loss, (new_model_state, new_method_state, metrics) = super().loss_fn(
            params, model_state, method_state, views, rng, step, total_steps
        )
        # Keep only the global term (v2 had no local loss).
        loss_global = metrics["loss_global"]
        return loss_global, (
            new_model_state,
            new_method_state,
            {"loss_global": loss_global},
        )
