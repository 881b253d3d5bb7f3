"""Classic DINO method.

Rebuild of ``src/lightly_train/_methods/dino/dino.py:47-506``: EMA teacher,
multi-crop (2 global 224^2 scale 0.14-1.0 + 6 local 96^2 scale 0.05-0.14,
``dino_transform.py:39-120``), DINO head, softmax-centered teacher CE.
Scaling-aware defaults via ``resolve_auto`` (``dino.py:78``).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import jax
import jax.numpy as jnp

from lightly_train_tpu._configs.config import AUTO, Auto
from lightly_train_tpu._optim import AdamWArgs
from lightly_train_tpu._scaling import IMAGENET_SIZE, ScalingInfo, interpolate
from lightly_train_tpu.methods.base import Method, MethodArgs, ViewSpec
from lightly_train_tpu.models.heads import DINOHead
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops import losses as L
from lightly_train_tpu.ops.augment import ViewAugmentConfig
from lightly_train_tpu.ops.ema import cosine_schedule, ema_update


class DINOArgs(MethodArgs):
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    output_dim: int = 65536
    local_view_count: int = 6
    global_image_size: int = 224
    local_image_size: int = 96
    global_crop_scale: Tuple[float, float] = (0.14, 1.0)
    local_crop_scale: Tuple[float, float] = (0.05, 0.14)
    student_temp: float = 0.1
    teacher_temp_start: float = 0.04
    teacher_temp_end: float = 0.07
    teacher_temp_warmup_fraction: float = 0.3
    center_momentum: float = 0.9
    momentum_start: Union[float, Auto] = AUTO
    momentum_end: float = 1.0
    freeze_last_layer_steps: int = 1250
    reference_batch_size: int = 1024
    lr_scale_method: str = "sqrt"

    def resolve_auto(self, scaling_info: ScalingInfo) -> None:
        if self.momentum_start == AUTO:
            # Smaller datasets -> lower start momentum (reference
            # scaling-aware default, ``dino.py:78``).
            self.momentum_start = interpolate(
                scaling_info.dataset_size,
                input_start=20_000,
                input_end=IMAGENET_SIZE,
                value_start=0.99,
                value_end=0.996,
                round_ndigits=4,
            )


class DINO(Method):
    name = "dino"
    default_steps = 125_000
    default_batch_size = 1024

    def __init__(self, wrapped: WrappedModel, args: DINOArgs):
        super().__init__(wrapped, args)
        self.args: DINOArgs = args
        head_dtype = getattr(
            getattr(wrapped.module, "cfg", None), "dtype", jnp.float32
        )
        self.head = DINOHead(
            out_dim=args.output_dim,
            hidden_dim=args.hidden_dim,
            bottleneck_dim=args.bottleneck_dim,
            dtype=head_dtype,
        )

    def view_specs(self) -> List[ViewSpec]:
        a = self.args
        g = a.global_image_size
        l = a.local_image_size
        g1 = ViewAugmentConfig(
            out_size=(g, g), crop_scale=a.global_crop_scale, blur_prob=1.0
        )
        g2 = ViewAugmentConfig(
            out_size=(g, g), crop_scale=a.global_crop_scale, blur_prob=0.1,
            solarize_prob=0.2,
        )
        loc = ViewAugmentConfig(
            out_size=(l, l), crop_scale=a.local_crop_scale, blur_prob=0.5
        )
        return [
            ViewSpec(g1, count=1),
            ViewSpec(g2, count=1),
            ViewSpec(loc, count=a.local_view_count),
        ]

    def init(self, rng, sample_images):
        a = self.args
        ks, kh = jax.random.split(rng)
        student_vars = self.wrapped.init(ks, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)
        d = self.wrapped.feature_dim
        head_params = self.head.init(kh, jnp.zeros((1, d)))["params"]
        params = {"student": student_params, "head": head_params}
        method_state = {
            # Real copy: aliased buffers break train-state donation.
            "teacher": jax.tree_util.tree_map(jnp.copy, params),
            "center": jnp.zeros((a.output_dim,), jnp.float32),
        }
        return params, model_state, method_state

    def _forward(self, params, model_state, images, train, rng):
        """Pooled student/teacher features; train mode threads BatchNorm
        running stats (classic DINO trains CNN backbones too). Returns
        (pooled, new_model_state)."""
        variables = {"params": params, **model_state}
        rngs = {"droppath": rng} if train else None
        mutable = [k for k in model_state] if (model_state and train) else False
        out = self.wrapped.forward_features(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        if mutable:
            out, new_state = out
            return self.wrapped.forward_pool(out), dict(new_state)
        return self.wrapped.forward_pool(out), model_state

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        a = self.args
        g1, g2 = views[0], views[1]
        locals_list = views[2:]
        B = g1.shape[0]
        kg, kl = jax.random.split(rng)

        globals_cat = jnp.concatenate([g1, g2], axis=0)
        teacher = method_state["teacher"]
        t_pool, _ = self._forward(
            jax.lax.stop_gradient(teacher["student"]), model_state, globals_cat,
            False, rng,
        )
        t_logits = jax.lax.stop_gradient(
            self.head.apply({"params": teacher["head"]}, t_pool)
        )
        warmup = max(int(a.teacher_temp_warmup_fraction * total_steps), 1)
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / warmup, 0.0, 1.0)
        teacher_temp = a.teacher_temp_start + frac * (
            a.teacher_temp_end - a.teacher_temp_start
        )
        t_probs = L.softmax_center_teacher(
            t_logits, method_state["center"], teacher_temp
        ).reshape(2, B, -1)

        s_pool_g, model_state = self._forward(
            params["student"], model_state, globals_cat, True, kg
        )
        s_g = self.head.apply({"params": params["head"]}, s_pool_g).reshape(
            2, B, -1
        )
        locals_cat = jnp.concatenate(locals_list, axis=0)
        s_pool_l, model_state = self._forward(
            params["student"], model_state, locals_cat, True, kl
        )
        s_l = self.head.apply({"params": params["head"]}, s_pool_l).reshape(
            len(locals_list), B, -1
        )

        terms = []
        for ti in range(2):
            terms.append(
                L.dino_cross_entropy(t_probs[ti], s_g[1 - ti], a.student_temp)
            )
            for li in range(len(locals_list)):
                terms.append(
                    L.dino_cross_entropy(t_probs[ti], s_l[li], a.student_temp)
                )
        loss = jnp.mean(jnp.stack(terms))

        new_center = L.update_center(
            method_state["center"], t_logits, a.center_momentum
        )
        new_method_state = {**method_state, "center": new_center}
        return loss, (model_state, new_method_state, {"dino_loss": loss})

    def post_update(self, params, method_state, step, total_steps):
        a = self.args
        m_start = a.momentum_start if a.momentum_start != AUTO else 0.996
        m = cosine_schedule(step, total_steps, m_start, a.momentum_end)
        return {
            **method_state,
            "teacher": ema_update(method_state["teacher"], params, m),
        }

    def default_optimizer_args(self):
        return AdamWArgs(lr=5e-4 * 1024 / 256, weight_decay=0.04)

    def grad_clip_norm(self):
        return 3.0

    def mask_updates(self, updates, step):
        live = (
            jnp.asarray(step) >= self.args.freeze_last_layer_steps
        ).astype(jnp.float32)

        def _freeze(path, u):
            parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
            return u * live if "prototypes" in parts else u

        return jax.tree_util.tree_map_with_path(_freeze, updates)

    def fused_ema_momentum(self, step, total_steps):
        a = self.args
        m_start = a.momentum_start if a.momentum_start != AUTO else 0.996
        return cosine_schedule(step, total_steps, m_start, a.momentum_end)

    def update_scales(self, params, step):
        live = (
            jnp.asarray(step) >= self.args.freeze_last_layer_steps
        ).astype(jnp.float32)

        def _scale(path, _):
            parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
            return live if "prototypes" in parts else 1.0

        return jax.tree_util.tree_map_with_path(_scale, params)
