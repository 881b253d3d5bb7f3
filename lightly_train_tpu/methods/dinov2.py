"""DINOv2 pretraining method (EMA teacher, DINO + iBOT + KoLeo).

Rebuild of ``src/lightly_train/_methods/dinov2/dinov2.py:70-693`` +
``dinov2_loss.py`` + ``dinov2_head.py``:

- 2 global views (224^2) + N local views (96^2) with asymmetric blur/solarize;
- EMA teacher (backbone + DINO head + iBOT head) with cosine momentum
  0.992 -> 1.0, fused into the step (``dinov2.py:641-660``);
- DINO CLS cross-entropy across view pairs, iBOT masked-patch CE on global
  views with a fixed mask budget, KoLeo regularizer (weight 0.1);
- softmax-centering (EMA center; the reference's async all-reduce becomes an
  in-step global-mean psum) or Sinkhorn-Knopp centering;
- teacher temperature warmup 0.04 -> 0.07, weight-decay cosine 0.04 -> 0.4,
  layerwise LR decay 0.9 with patch-embed multiplier 0.2, grad clip 3.0,
  frozen prototype layer for the first 1250 steps, sqrt LR scaling at
  reference batch 1024, default 125k steps.

TPU step layout: both global views are stacked to one (2B, H, W, 3) forward,
locals to one (LB, h, w, 3) forward — two fixed-shape jit paths instead of the
reference's ragged list concat (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from lightly_train_tpu._configs.config import AUTO, Auto
from lightly_train_tpu._optim import (
    AdamWArgs,
    layerwise_lr_scales,
)
from lightly_train_tpu._scaling import ScalingInfo
from lightly_train_tpu.methods.base import Method, MethodArgs, ViewSpec
from lightly_train_tpu.models.heads import DINOHead
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops import losses as L
from lightly_train_tpu.ops.augment import ViewAugmentConfig
from lightly_train_tpu.ops.ema import cosine_schedule, ema_update
from lightly_train_tpu.ops.masking import random_block_masks


class DINOv2Args(MethodArgs):
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    output_dim: int = 65536
    ibot_separate_head: bool = True
    local_view_count: int = 8
    global_image_size: int = 224
    local_image_size: int = 96
    global_crop_scale: Tuple[float, float] = (0.32, 1.0)
    local_crop_scale: Tuple[float, float] = (0.05, 0.32)
    student_temp: float = 0.1
    teacher_temp_start: float = 0.04
    teacher_temp_end: float = 0.07
    teacher_temp_warmup_fraction: float = 0.3
    center_method: Literal["softmax", "sinkhorn"] = "softmax"
    center_momentum: float = 0.9
    mask_prob: float = 0.5
    mask_ratio: Tuple[float, float] = (0.1, 0.5)
    koleo_weight: float = 0.1
    ibot_weight: float = 1.0
    dino_weight: float = 1.0
    momentum_start: float = 0.992
    momentum_end: float = 1.0
    freeze_last_layer_steps: int = 1250
    layerwise_decay: float = 0.9
    patch_embed_lr_mult: float = 0.2
    weight_decay_start: float = 0.04
    weight_decay_end: float = 0.4
    reference_batch_size: int = 1024
    lr_scale_method: str = "sqrt"


class DINOv2(Method):
    name = "dinov2"
    default_steps = 125_000
    default_batch_size = 1024

    def __init__(self, wrapped: WrappedModel, args: DINOv2Args):
        super().__init__(wrapped, args)
        self.args: DINOv2Args = args
        # Heads follow the backbone compute dtype: the 65536-prototype matmul
        # in fp32 costs ~13% of the v5e step for <1% of its FLOPs (profiled);
        # bf16 with fp32 weight-norm/softmax boundaries matches the
        # reference's mixed-precision policy.
        head_dtype = getattr(wrapped.module, "cfg", None)
        head_dtype = getattr(head_dtype, "dtype", jnp.float32)
        self.dino_head = DINOHead(
            out_dim=args.output_dim,
            hidden_dim=args.hidden_dim,
            bottleneck_dim=args.bottleneck_dim,
            dtype=head_dtype,
        )
        self.ibot_head = (
            DINOHead(
                out_dim=args.output_dim,
                hidden_dim=args.hidden_dim,
                bottleneck_dim=args.bottleneck_dim,
                dtype=head_dtype,
            )
            if args.ibot_separate_head
            else self.dino_head
        )

    # -- views --------------------------------------------------------------
    def view_specs(self) -> List[ViewSpec]:
        a = self.args
        g = a.global_image_size
        l = a.local_image_size
        # Asymmetric photometrics like the reference DINO transform
        # (``dino_transform.py:39-120``): view 1 always blurred, view 2
        # lightly blurred + solarized, locals half-blurred.
        g1 = ViewAugmentConfig(
            out_size=(g, g), crop_scale=a.global_crop_scale, blur_prob=1.0
        )
        g2 = ViewAugmentConfig(
            out_size=(g, g),
            crop_scale=a.global_crop_scale,
            blur_prob=0.1,
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

    # -- init ---------------------------------------------------------------
    def init(self, rng, sample_images):
        a = self.args
        ks, kd, ki = jax.random.split(rng, 3)
        student_vars = self.wrapped.init(ks, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)
        d = self.wrapped.feature_dim
        dino_params = self.dino_head.init(kd, jnp.zeros((1, d)))["params"]
        params = {"student": student_params, "dino_head": dino_params}
        if a.ibot_separate_head:
            params["ibot_head"] = self.ibot_head.init(ki, jnp.zeros((1, d)))[
                "params"
            ]
        # Teacher starts as an exact copy of the student (reference teacher
        # conversion, ``dinov2.py:179-257``). Must be a real copy: aliased
        # buffers break train-state donation.
        teacher_params = jax.tree_util.tree_map(jnp.copy, params)
        method_state = {
            "teacher": teacher_params,
            "dino_center": jnp.zeros((a.output_dim,), jnp.float32),
            "ibot_center": jnp.zeros((a.output_dim,), jnp.float32),
        }
        return params, model_state, method_state

    # -- helpers ------------------------------------------------------------
    def _apply_backbone(self, params, model_state, images, mask, train, rng):
        variables = {"params": params, **model_state}
        rngs = {"droppath": rng} if train else None
        out = self.wrapped.forward_features(
            variables, images, mask=mask, train=train, rngs=rngs
        )
        return out

    def _teacher_temp(self, step, total_steps):
        a = self.args
        warmup = max(int(a.teacher_temp_warmup_fraction * total_steps), 1)
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / warmup, 0.0, 1.0)
        return a.teacher_temp_start + frac * (
            a.teacher_temp_end - a.teacher_temp_start
        )

    # -- loss ---------------------------------------------------------------
    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        a = self.args
        g1, g2 = views[0], views[1]
        locals_list = views[2:]
        B = g1.shape[0]
        k_mask, k_drop_g, k_drop_l = jax.random.split(rng, 3)

        globals_cat = jnp.concatenate([g1, g2], axis=0)  # (2B, H, W, 3)
        patch = self.wrapped.patch_size or 16
        gh = g1.shape[1] // patch
        gw = g1.shape[2] // patch
        n_tokens = gh * gw

        # iBOT masks for the student's global views (fixed budget).
        mask, _ = random_block_masks(
            k_mask, 2 * B, (gh, gw), a.mask_prob, a.mask_ratio
        )
        # Fixed-budget masked-token gather: the iBOT heads see only the (at
        # most) n_tokens/2 masked positions instead of all patch tokens — the
        # static-shape analog of the reference's ragged index_select
        # (``dinov2.py:528-538``). Halves the 65536-prototype head FLOPs and
        # the (tokens, K) logit memory, the step's biggest HBM tensor.
        budget = max(n_tokens // 2, 1)
        order = jnp.argsort(jnp.where(mask, 0, 1), axis=1)  # masked first
        sel_idx = order[:, :budget]  # (2B, M)
        sel_mask = jnp.take_along_axis(mask, sel_idx, axis=1)  # (2B, M)
        n_sel = jnp.sum(sel_mask.astype(jnp.float32), axis=1, keepdims=True)
        sel_weight = sel_mask.astype(jnp.float32) / jnp.maximum(n_sel, 1.0)

        teacher_params = method_state["teacher"]
        teacher_temp = self._teacher_temp(step, total_steps)

        # ---- teacher forward (no grad, no mask) ----
        t_out = self._apply_backbone(
            jax.lax.stop_gradient(teacher_params["student"]),
            model_state,
            globals_cat,
            None,
            False,
            rng,
        )
        t_cls = t_out["cls_token"]  # (2B, D)
        t_patches = jnp.take_along_axis(
            t_out["patch_tokens"], sel_idx[:, :, None], axis=1
        )  # (2B, M, D) masked positions only
        t_dino_logits = self.dino_head.apply(
            {"params": teacher_params["dino_head"]}, t_cls
        )
        ibot_key = "ibot_head" if a.ibot_separate_head else "dino_head"
        t_ibot_logits = self.ibot_head.apply(
            {"params": teacher_params[ibot_key]}, t_patches
        )
        t_dino_logits = jax.lax.stop_gradient(t_dino_logits)
        t_ibot_logits = jax.lax.stop_gradient(t_ibot_logits)

        # ---- teacher centering ----
        if a.center_method == "softmax":
            t_dino_probs = L.softmax_center_teacher(
                t_dino_logits, method_state["dino_center"], teacher_temp
            )
            t_ibot_probs_flat = L.softmax_center_teacher(
                t_ibot_logits.reshape(-1, a.output_dim),
                method_state["ibot_center"],
                teacher_temp,
            )
            new_dino_center = L.update_center(
                method_state["dino_center"], t_dino_logits, a.center_momentum
            )
            # iBOT center averages masked tokens only (``dinov2_loss.py:250``).
            new_ibot_center = L.update_center(
                method_state["ibot_center"],
                t_ibot_logits.reshape(-1, a.output_dim),
                a.center_momentum,
                sample_weights=sel_mask.reshape(-1),
            )
        else:
            t_dino_probs = L.sinkhorn_knopp_teacher(
                t_dino_logits, float(a.teacher_temp_start)
            )
            # Sinkhorn over masked patches only (``dinov2_loss.py:189-224``).
            t_ibot_probs_flat = L.sinkhorn_knopp_teacher(
                t_ibot_logits.reshape(-1, a.output_dim),
                float(a.teacher_temp_start),
                sample_weights=sel_mask.reshape(-1).astype(jnp.float32),
            )
            new_dino_center = method_state["dino_center"]
            new_ibot_center = method_state["ibot_center"]
        t_ibot_probs = t_ibot_probs_flat.reshape(2 * B, budget, a.output_dim)

        # ---- student forward ----
        s_out_g = self._apply_backbone(
            params["student"], model_state, globals_cat, mask, True, k_drop_g
        )
        s_cls_g = s_out_g["cls_token"]  # (2B, D)
        s_patches = jnp.take_along_axis(
            s_out_g["patch_tokens"], sel_idx[:, :, None], axis=1
        )  # (2B, M, D)
        s_dino_g = self.dino_head.apply({"params": params["dino_head"]}, s_cls_g)
        s_ibot = self.ibot_head.apply({"params": params[ibot_key]}, s_patches)

        locals_cat = jnp.concatenate(locals_list, axis=0)  # (LB, h, w, 3)
        s_out_l = self._apply_backbone(
            params["student"], model_state, locals_cat, None, True, k_drop_l
        )
        s_dino_l = self.dino_head.apply(
            {"params": params["dino_head"]}, s_out_l["cls_token"]
        )  # (LB, K)

        # ---- DINO CE over view pairs ----
        n_local = len(locals_list)
        t_probs = t_dino_probs.reshape(2, B, -1)
        s_g = s_dino_g.reshape(2, B, -1)
        s_l = s_dino_l.reshape(n_local, B, -1)
        dino_terms = []
        for ti in range(2):
            # teacher view ti vs the OTHER student global view
            dino_terms.append(
                L.dino_cross_entropy(t_probs[ti], s_g[1 - ti], a.student_temp)
            )
            for li in range(n_local):
                dino_terms.append(
                    L.dino_cross_entropy(t_probs[ti], s_l[li], a.student_temp)
                )
        dino_loss = jnp.mean(jnp.stack(dino_terms))

        # ---- iBOT masked-patch CE ----
        ibot_loss = L.ibot_patch_loss(
            t_ibot_probs, s_ibot, sel_mask, sel_weight, a.student_temp
        )

        # ---- KoLeo on student global CLS features ----
        # Per-device nearest-neighbor semantics like the reference (KoLeo is
        # not all-gathered there): group blocks align with the batch shards.
        # The reference SUMS the per-view terms (``dinov2.py:377-380``:
        # ``sum(self.koleo_loss(token) for token in ....chunk(2))``), it does
        # not average them — caught by the torch trajectory harness, round 3.
        n_groups = jax.device_count()
        koleo = (
            L.koleo_loss(s_cls_g[:B], groups=n_groups)
            + L.koleo_loss(s_cls_g[B:], groups=n_groups)
        )

        loss = (
            a.dino_weight * dino_loss
            + a.ibot_weight * ibot_loss
            + a.koleo_weight * koleo
        )

        new_method_state = {
            **method_state,
            "dino_center": new_dino_center,
            "ibot_center": new_ibot_center,
        }
        metrics = {
            "dino_loss": dino_loss,
            "ibot_loss": ibot_loss,
            "koleo_loss": koleo,
            "teacher_temp": teacher_temp,
        }
        return loss, (model_state, new_method_state, metrics)

    # -- post-update: EMA teacher ------------------------------------------
    def post_update(self, params, method_state, step, total_steps):
        a = self.args
        m = cosine_schedule(step, total_steps, a.momentum_start, a.momentum_end)
        new_teacher = ema_update(method_state["teacher"], params, m)
        return {**method_state, "teacher": new_teacher}

    # -- optimization -------------------------------------------------------
    def default_optimizer_args(self):
        return AdamWArgs(lr=4e-3, betas=(0.9, 0.999), weight_decay=0.04)

    def grad_clip_norm(self):
        return 3.0

    def lr_scales(self, params):
        a = self.args
        depth = getattr(self.wrapped.module.cfg, "depth", None)
        if depth is None:
            return None
        scales = jax.tree_util.tree_map(lambda _: 1.0, params)
        scales["student"] = layerwise_lr_scales(
            params["student"], a.layerwise_decay, depth, a.patch_embed_lr_mult
        )
        return scales

    def weight_decay_schedule(self, total_steps):
        a = self.args
        return lambda step: cosine_schedule(
            step, total_steps, a.weight_decay_start, a.weight_decay_end
        )

    def wd_mask(self, params):
        """Exact reference rule: only bias/norm/gamma exempt
        (``_methods/dinov2/utils.py:240-243``) — tokens, pos_embed, the
        patch-embed kernel and the prototype gain all decay."""
        from lightly_train_tpu._optim.optimizers import dinov2_wd_mask

        return dinov2_wd_mask(params)

    def mask_updates(self, updates, step):
        """Freeze the prototype (weight-normed last) layers early
        (``dinov2.py`` freeze_last_layer, 1250 steps)."""
        a = self.args
        live = (jnp.asarray(step) >= a.freeze_last_layer_steps).astype(jnp.float32)

        def _freeze(path, u):
            parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
            if "prototypes" in parts:
                return u * live
            return u

        return jax.tree_util.tree_map_with_path(_freeze, updates)

    def fused_ema_momentum(self, step, total_steps):
        """post_update is exactly the teacher EMA -> fused path eligible."""
        a = self.args
        return cosine_schedule(step, total_steps, a.momentum_start, a.momentum_end)

    def update_scales(self, params, step):
        """Fused-path analog of :meth:`mask_updates` (prototype freeze)."""
        a = self.args
        live = (jnp.asarray(step) >= a.freeze_last_layer_steps).astype(jnp.float32)

        def _scale(path, _):
            parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
            return live if "prototypes" in parts else 1.0

        return jax.tree_util.tree_map_with_path(_scale, params)
