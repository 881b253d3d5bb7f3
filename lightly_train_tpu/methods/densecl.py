"""DenseCL: dense contrastive learning with a momentum encoder (hidden method).

Rebuild of ``src/lightly_train/_methods/densecl/densecl.py:54-270``: two views,
EMA momentum encoder, a global InfoNCE head plus a dense head where student
pixels are matched to their most-similar teacher pixel (argmax backbone-feature
correspondence), both contrasted against ring-buffer queues of negatives.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

from lightly_train_tpu._optim import SGDArgs
from lightly_train_tpu.methods.base import Method, MethodArgs, ViewSpec
from lightly_train_tpu.models.heads import SimCLRProjectionHead
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops.augment import ViewAugmentConfig
from lightly_train_tpu.ops.losses import l2_normalize
from lightly_train_tpu.ops.ema import ema_update


class DenseCLArgs(MethodArgs):
    image_size: int = 224
    temperature: float = 0.2
    queue_size: int = 65536
    momentum: float = 0.999
    lambda_dense: float = 0.5
    hidden_dim: int = 2048
    output_dim: int = 128
    reference_batch_size: int = 256
    lr_scale_method: str = "linear"


def _info_nce(q: jax.Array, pos: jax.Array, queue: jax.Array, temp: float):
    """InfoNCE with one positive and a queue of negatives. q/pos: (B, D)."""
    q = l2_normalize(q)
    pos = l2_normalize(pos)
    neg = l2_normalize(queue)
    l_pos = jnp.sum(q * pos, axis=-1, keepdims=True)  # (B, 1)
    l_neg = q @ neg.T  # (B, Q)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temp
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


class DenseCL(Method):
    name = "densecl"
    default_steps = 100_000
    default_batch_size = 256

    def __init__(self, wrapped: WrappedModel, args: DenseCLArgs):
        super().__init__(wrapped, args)
        self.args: DenseCLArgs = args
        self.global_head = SimCLRProjectionHead(
            hidden_dim=args.hidden_dim, out_dim=args.output_dim
        )
        self.dense_head = SimCLRProjectionHead(
            hidden_dim=args.hidden_dim, out_dim=args.output_dim
        )

    def view_specs(self) -> List[ViewSpec]:
        s = self.args.image_size
        return [ViewSpec(ViewAugmentConfig(out_size=(s, s)), count=2)]

    def init(self, rng, sample_images):
        ks, kg, kd = jax.random.split(rng, 3)
        student_vars = self.wrapped.init(ks, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)
        d = self.wrapped.feature_dim
        params = {
            "student": student_params,
            "global_head": self.global_head.init(kg, jnp.zeros((1, d)))["params"],
            "dense_head": self.dense_head.init(kd, jnp.zeros((1, d)))["params"],
        }
        method_state = {
            "teacher": jax.tree_util.tree_map(jnp.copy, params),
            "queue_global": jnp.zeros(
                (self.args.queue_size, self.args.output_dim), jnp.float32
            ),
            "queue_dense": jnp.zeros(
                (self.args.queue_size, self.args.output_dim), jnp.float32
            ),
            "queue_ptr": jnp.zeros((), jnp.int32),
            "queue_filled": jnp.zeros((), jnp.int32),
        }
        return params, model_state, method_state

    def _encode(self, params, model_state, images, train, rng):
        variables = {"params": params["student"], **model_state}
        mutable = [k for k in model_state] if (model_state and train) else False
        rngs = {"droppath": rng} if train else None
        out = self.wrapped.forward_features(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        if mutable:
            out, new_state = out
        else:
            new_state = model_state
        pooled = self.wrapped.forward_pool(out)
        feats = out["features"]  # (B, h, w, D)
        B, h, w, D = feats.shape
        z_g = self.global_head.apply({"params": params["global_head"]}, pooled)
        z_d = self.dense_head.apply(
            {"params": params["dense_head"]}, feats.reshape(B, h * w, D)
        )
        return z_g, z_d, feats.reshape(B, h * w, D), new_state

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del step, total_steps
        a = self.args
        v0, v1 = views
        zg_s, zd_s, f_s, new_model_state = self._encode(
            params, model_state, v0, True, rng
        )
        t = method_state["teacher"]
        zg_t, zd_t, f_t, _ = self._encode(
            jax.lax.stop_gradient(t), model_state, v1, False, rng
        )
        zg_t = jax.lax.stop_gradient(zg_t)
        zd_t = jax.lax.stop_gradient(zd_t)
        f_t = jax.lax.stop_gradient(f_t)

        # Dense correspondence: student pixel i -> teacher pixel argmax sim.
        fs_n = l2_normalize(f_s)
        ft_n = l2_normalize(f_t)
        corr = jnp.einsum("bnd,bmd->bnm", fs_n, ft_n)
        match = jnp.argmax(corr, axis=-1)  # (B, n)
        zd_pos = jnp.take_along_axis(zd_t, match[..., None], axis=1)

        filled = method_state["queue_filled"] > 0
        qg = method_state["queue_global"]
        qd = method_state["queue_dense"]
        # lax.cond, not jnp.where: where would EXECUTE the step-0 fallback
        # (including a (B*n, B*n) dense logit matrix, ~157 MB at batch 32)
        # on every step of the run just to discard it.
        loss_g = jax.lax.cond(
            filled,
            lambda: _info_nce(zg_s, zg_t, qg, a.temperature),
            lambda: _info_nce(zg_s, zg_t, zg_t, a.temperature),
        )
        B, n, D = zd_s.shape
        zd_s_flat = zd_s.reshape(B * n, D)
        zd_pos_flat = zd_pos.reshape(B * n, D)
        loss_d = jax.lax.cond(
            filled,
            lambda: _info_nce(zd_s_flat, zd_pos_flat, qd, a.temperature),
            lambda: _info_nce(zd_s_flat, zd_pos_flat,
                              zd_t.reshape(B * n, D), a.temperature),
        )
        loss = (1 - a.lambda_dense) * loss_g + a.lambda_dense * loss_d

        # Enqueue teacher globals + mean dense features.
        Q = qg.shape[0]
        idx = (method_state["queue_ptr"] + jnp.arange(B)) % Q
        new_state = {
            **method_state,
            "queue_global": qg.at[idx].set(zg_t),
            "queue_dense": qd.at[idx].set(jnp.mean(zd_t, axis=1)),
            "queue_ptr": (method_state["queue_ptr"] + B) % Q,
            "queue_filled": jnp.minimum(method_state["queue_filled"] + B, Q),
        }
        return loss, (
            new_model_state,
            new_state,
            {"loss_global": loss_g, "loss_dense": loss_d},
        )

    def post_update(self, params, method_state, step, total_steps):
        return {
            **method_state,
            "teacher": ema_update(
                method_state["teacher"], params, self.args.momentum
            ),
        }

    def default_optimizer_args(self):
        return SGDArgs(lr=0.3, momentum=0.9, weight_decay=1e-4)
