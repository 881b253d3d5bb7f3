"""DistillationV3: queue-based distillation from a frozen teacher (default method).

Rebuild of ``src/lightly_train/_methods/distillationv3/distillationv3.py:83-519``
and its loss (``distillationv3_loss.py``):

- frozen teacher backbone (default ``dinov3/vitb16``; custom teacher + weights
  supported, ``distillationv3.py:47-80``) — teacher params live in
  ``method_state`` and are never differentiated;
- single augmented view, with input mixup;
- two linear projection heads on the student: global (pooled) and local
  (patch grid, bilinear-resampled to the teacher's grid);
- similarity cross-entropy against a queue of past teacher global embeddings
  (ring buffer; size auto-bucketed from dataset size 16 -> 8192,
  ``distillationv3.py:114-144``), computed for both global and local terms;
- queue update fused into the step (``post-loss`` enqueue of the batch's
  teacher embeddings).

TPU notes: the whole step (teacher fwd, student fwd, queue similarity matmuls,
ring-buffer scatter) compiles to one program; the (B, Q) similarity matmuls
ride the MXU; the reference's per-GPU queue becomes one global queue with the
same aggregate size semantics.
"""

from __future__ import annotations

from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from pydantic import Field

from lightly_train_tpu._configs.config import AUTO, Auto
from lightly_train_tpu._optim import AdamWArgs, LARSArgs
from lightly_train_tpu._scaling import ScalingInfo, get_bucket_value
from lightly_train_tpu.methods.base import Method, MethodArgs, ViewSpec
from lightly_train_tpu.models.heads import ProjectionHead
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops.augment import ViewAugmentConfig
from lightly_train_tpu.ops.losses import similarity_queue_ce


class DistillationV3Args(MethodArgs):
    teacher: str = "dinov3/vitb16"
    # Path to teacher weights: a torch .pth (Meta naming, converted via
    # models/convert.py) or an exported_models artifact directory.
    teacher_weights: Optional[str] = None
    queue_size: Union[int, Auto] = AUTO
    temperature: float = 0.07
    mixup_prob: float = 0.5
    image_size: int = 224
    lambda_local: float = 1.0
    reference_batch_size: int = 1536
    lr_scale_method: str = "linear"

    def resolve_auto(self, scaling_info: ScalingInfo) -> None:
        if self.queue_size == AUTO:
            # Bucketed by dataset size (``distillationv3.py:114-144``).
            self.queue_size = get_bucket_value(
                scaling_info.dataset_size,
                [
                    (1_000, 16),
                    (10_000, 128),
                    (100_000, 1024),
                    (1_000_000, 4096),
                    (float("inf"), 8192),
                ],
            )


class DistillationV3(Method):
    name = "distillationv3"
    default_steps = 100_000
    default_batch_size = 1536

    def __init__(
        self,
        wrapped: WrappedModel,
        args: DistillationV3Args,
        teacher_wrapped: Optional[WrappedModel] = None,
        teacher_variables: Optional[Any] = None,
    ):
        super().__init__(wrapped, args)
        self.args: DistillationV3Args = args
        self.teacher = teacher_wrapped or get_wrapped_model(args.teacher)
        # Pretrained teacher weights: injected by the caller, or loaded from
        # args.teacher_weights (torch .pth via converter, or an exported
        # artifact dir); random teacher if absent (tests).
        if teacher_variables is None and args.teacher_weights is not None:
            from pathlib import Path

            path = Path(args.teacher_weights)
            if path.is_dir():
                from lightly_train_tpu._checkpoint.checkpoint import (
                    load_exported_model,
                )

                teacher_variables = load_exported_model(path)["variables"]
            else:
                from lightly_train_tpu.models.convert import (
                    load_torch_checkpoint_for_model,
                )

                teacher_variables = load_torch_checkpoint_for_model(
                    path, args.teacher
                )
        self._teacher_variables_init = teacher_variables
        self.global_head = ProjectionHead(self.teacher.feature_dim)
        self.local_head = ProjectionHead(self.teacher.feature_dim)

    def view_specs(self) -> List[ViewSpec]:
        s = self.args.image_size
        return [ViewSpec(ViewAugmentConfig(out_size=(s, s)), count=1)]

    def init(self, rng, sample_images):
        k_student, k_teacher, kg, kl = jax.random.split(rng, 4)
        student_vars = self.wrapped.init(k_student, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)  # batch_stats etc.
        teacher_vars = (
            self._teacher_variables_init
            if self._teacher_variables_init is not None
            else self.teacher.init(k_teacher, sample_images)
        )
        d_s = self.wrapped.feature_dim
        gh_params = self.global_head.init(kg, jnp.zeros((1, d_s)))["params"]
        lh_params = self.local_head.init(kl, jnp.zeros((1, d_s)))["params"]
        params = {
            "student": student_params,
            "global_head": gh_params,
            "local_head": lh_params,
        }
        queue_size = int(self.args.queue_size) if self.args.queue_size != AUTO else 1024
        method_state = {
            "teacher": teacher_vars,
            "queue": jnp.zeros((queue_size, self.teacher.feature_dim), jnp.float32),
            "queue_ptr": jnp.zeros((), jnp.int32),
            "queue_filled": jnp.zeros((), jnp.int32),
        }
        return params, model_state, method_state

    def _mixup(self, key: jax.Array, images: jax.Array) -> jax.Array:
        """Batch mixup: blend each image with a rolled partner (traced lam)."""
        k_apply, k_lam = jax.random.split(key)
        B = images.shape[0]
        lam = jax.random.uniform(k_lam, (B, 1, 1, 1), minval=0.5, maxval=1.0)
        apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < self.args.mixup_prob
        mixed = lam * images + (1.0 - lam) * jnp.roll(images, 1, axis=0)
        return jnp.where(apply, mixed, images)

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del step, total_steps
        images = views[0]  # (B, H, W, 3)
        k_mix, k_drop = jax.random.split(rng)
        if self.args.mixup_prob > 0:
            images = self._mixup(k_mix, images)

        # Teacher forward (frozen, no grad — method_state is not differentiated).
        t_out = self.teacher.forward_features(
            method_state["teacher"], images, train=False
        )
        t_global = jax.lax.stop_gradient(self.teacher.forward_pool(t_out))
        t_local = jax.lax.stop_gradient(t_out["features"])  # (B, Ht, Wt, Dt)

        # Student forward.
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
        s_global = self.wrapped.forward_pool(s_out)
        s_local = s_out["features"]  # (B, Hs, Ws, Ds)

        z_global = self.global_head.apply(
            {"params": params["global_head"]}, s_global
        )
        z_local = self.local_head.apply({"params": params["local_head"]}, s_local)
        # Resample the student patch grid to the teacher grid
        # (``distillationv3.py`` bilinear resample of patch features).
        Bt, Ht, Wt, Dt = t_local.shape
        if z_local.shape[1:3] != (Ht, Wt):
            z_local = jax.image.resize(
                z_local, (z_local.shape[0], Ht, Wt, z_local.shape[-1]), "bilinear"
            )

        queue = method_state["queue"]
        # Until the queue has real entries, fall back to the current batch's
        # teacher embeddings as the comparison set.
        filled = method_state["queue_filled"] > 0
        temp = self.args.temperature
        # Queue CE on global embeddings.
        loss_global_q = similarity_queue_ce(z_global, t_global, queue, temp)
        loss_global_b = similarity_queue_ce(z_global, t_global, t_global, temp)
        loss_global = jnp.where(filled, loss_global_q, loss_global_b)
        # Queue CE on local (patch) embeddings vs the same global queue.
        zl = z_local.reshape(Bt, Ht * Wt, -1)
        tl = t_local.reshape(Bt, Ht * Wt, -1)
        loss_local_q = similarity_queue_ce(zl, tl, queue, temp)
        loss_local_b = similarity_queue_ce(zl, tl, t_global, temp)
        loss_local = jnp.where(filled, loss_local_q, loss_local_b)

        loss = loss_global + self.args.lambda_local * loss_local

        # Ring-buffer enqueue of this batch's teacher globals (fused in step).
        Q = queue.shape[0]
        B = t_global.shape[0]
        idx = (method_state["queue_ptr"] + jnp.arange(B)) % Q
        new_queue = queue.at[idx].set(t_global.astype(queue.dtype))
        new_method_state = {
            **method_state,
            "queue": jax.lax.stop_gradient(new_queue),
            "queue_ptr": (method_state["queue_ptr"] + B) % Q,
            "queue_filled": jnp.minimum(method_state["queue_filled"] + B, Q),
        }
        metrics = {
            "loss_global": loss_global,
            "loss_local": loss_local,
        }
        return loss, (new_model_state, new_method_state, metrics)

    def default_optimizer_args(self):
        # Reference default: LARS lr=1.8 (``distillationv3.py``); AdamW optional.
        return LARSArgs(lr=1.8, momentum=0.9, weight_decay=1e-6)
