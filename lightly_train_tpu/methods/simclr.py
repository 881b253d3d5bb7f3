"""SimCLR method (NT-Xent over two views).

Rebuild of ``src/lightly_train/_methods/simclr/simclr.py:34-108``: 2 views,
MLP projection head, NT-Xent loss with global negatives, LARS default.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from lightly_train_tpu._optim import LARSArgs
from lightly_train_tpu.methods.base import Method, MethodArgs, ViewSpec
from lightly_train_tpu.models.heads import SimCLRProjectionHead
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops.augment import ViewAugmentConfig
from lightly_train_tpu.ops.losses import ntxent_loss


class SimCLRArgs(MethodArgs):
    image_size: int = 224
    temperature: float = 0.5
    hidden_dim: int = 2048
    output_dim: int = 128
    reference_batch_size: int = 256
    lr_scale_method: str = "sqrt"


class SimCLR(Method):
    name = "simclr"
    default_steps = 100_000
    default_batch_size = 256

    def __init__(self, wrapped: WrappedModel, args: SimCLRArgs):
        super().__init__(wrapped, args)
        self.args: SimCLRArgs = args
        self.head = SimCLRProjectionHead(
            hidden_dim=args.hidden_dim, out_dim=args.output_dim
        )

    def view_specs(self) -> List[ViewSpec]:
        s = self.args.image_size
        return [ViewSpec(ViewAugmentConfig(out_size=(s, s)), count=2)]

    def init(self, rng, sample_images):
        ks, kh = jax.random.split(rng)
        student_vars = self.wrapped.init(ks, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)
        d = self.wrapped.feature_dim
        head_params = self.head.init(kh, jnp.zeros((1, d)))["params"]
        return (
            {"student": student_params, "head": head_params},
            model_state,
            {},
        )

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del step, total_steps
        v0, v1 = views[0], views[1]
        B = v0.shape[0]
        cat = jnp.concatenate([v0, v1], axis=0)
        variables = {"params": params["student"], **model_state}
        mutable = [k for k in model_state] if model_state else False
        out = self.wrapped.forward_features(
            variables, cat, train=True, rngs={"droppath": rng}, mutable=mutable
        )
        if mutable:
            out, new_model_state = out
        else:
            new_model_state = model_state
        pooled = self.wrapped.forward_pool(out)
        z = self.head.apply({"params": params["head"]}, pooled)
        loss = ntxent_loss(z[:B], z[B:], self.args.temperature)
        return loss, (new_model_state, method_state, {"ntxent_loss": loss})

    def default_optimizer_args(self):
        return LARSArgs(lr=0.3, momentum=0.9, weight_decay=1e-6)
