"""DetConB: mask-pooled contrastive learning (hidden method).

Rebuild of ``src/lightly_train/_methods/detcon/detcon.py:45-445``: features
are pooled within region masks, and mask-level embeddings are contrasted
across views with an EMA target network (BYOL-style predictor for DetConB).
Supports dataset-provided region masks (``use_dataset_masks`` + pretrain
``mask_dir``): mask crops follow each view's crop geometry through the fused
augmentation stage and pool features per region id; without masks a spatial
grid is used (the reference's maskless fallback).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

from lightly_train_tpu._optim import LARSArgs
from lightly_train_tpu.methods.base import Method, MethodArgs, ViewSpec
from lightly_train_tpu.models.heads import SimCLRProjectionHead
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops.augment import ViewAugmentConfig
from lightly_train_tpu.ops.losses import l2_normalize
from lightly_train_tpu.ops.ema import cosine_schedule, ema_update


class DetConBArgs(MethodArgs):
    image_size: int = 224
    num_masks: int = 16  # regions per image (grid cells or dataset mask ids)
    # Reference DetCon samples num_samples PRESENT masks per view; here all
    # regions enter the loss and ABSENT regions (not visible in a crop) are
    # masked out of positives and negatives instead — same effect with
    # static shapes (no data-dependent sampling under jit).
    num_samples: int = 5
    # True: pool within dataset-provided region masks (requires pretrain
    # mask_dir; mask crops follow the view's crop geometry). False: spatial
    # grid fallback (the reference's maskless mode).
    use_dataset_masks: bool = False
    temperature: float = 0.1
    momentum_start: float = 0.996
    momentum_end: float = 1.0
    hidden_dim: int = 2048
    output_dim: int = 128
    reference_batch_size: int = 1024
    lr_scale_method: str = "sqrt"


def _grid_masks(hw: tuple, num_masks: int) -> jax.Array:
    """(h*w, num_masks) one-hot spatial grid assignment."""
    h, w = hw
    side = int(num_masks**0.5)
    if side * side != num_masks:
        raise ValueError(
            f"num_masks={num_masks} must be a perfect square in grid mode "
            "(dataset-mask mode accepts any count)."
        )
    rows = jnp.minimum(
        (jnp.arange(h) * side) // h, side - 1
    )
    cols = jnp.minimum((jnp.arange(w) * side) // w, side - 1)
    region = rows[:, None] * side + cols[None, :]
    return jax.nn.one_hot(region.reshape(-1), side * side)


class DetConB(Method):
    name = "detconb"
    default_steps = 100_000
    default_batch_size = 1024

    @property
    def needs_masks(self) -> bool:
        return self.args.use_dataset_masks

    def __init__(self, wrapped: WrappedModel, args: DetConBArgs):
        super().__init__(wrapped, args)
        self.args: DetConBArgs = args
        self.projector = SimCLRProjectionHead(
            hidden_dim=args.hidden_dim, out_dim=args.output_dim
        )
        self.predictor = SimCLRProjectionHead(
            hidden_dim=args.hidden_dim // 4, out_dim=args.output_dim
        )

    def view_specs(self) -> List[ViewSpec]:
        s = self.args.image_size
        return [ViewSpec(ViewAugmentConfig(out_size=(s, s)), count=2)]

    def init(self, rng, sample_images):
        ks, kp, kq = jax.random.split(rng, 3)
        student_vars = self.wrapped.init(ks, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)
        d = self.wrapped.feature_dim
        params = {
            "student": student_params,
            "projector": self.projector.init(kp, jnp.zeros((1, d)))["params"],
            "predictor": self.predictor.init(
                kq, jnp.zeros((1, self.args.output_dim))
            )["params"],
        }
        teacher = {
            "student": jax.tree_util.tree_map(jnp.copy, student_params),
            "projector": jax.tree_util.tree_map(jnp.copy, params["projector"]),
        }
        return params, model_state, {"teacher": teacher}

    def _mask_pooled(self, params, model_state, images, train, rng,
                     use_predictor, region_masks=None):
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
        feats = out["features"]  # (B, h, w, D)
        B, h, w, D = feats.shape
        M = self.args.num_masks
        if region_masks is not None:
            # Dataset region ids cropped with the view geometry: downsample
            # to the feature grid (nearest) and one-hot pool per region id.
            mh = region_masks.shape[1] // h
            mw = region_masks.shape[2] // w
            grid_ids = region_masks[:, ::max(mh, 1), ::max(mw, 1)][:, :h, :w]
            onehot = jax.nn.one_hot(
                jnp.clip(grid_ids, 0, M - 1), M
            ).reshape(B, h * w, M)
            counts = jnp.sum(onehot, axis=1)  # (B, M)
            pooled = jnp.einsum(
                "bnd,bnm->bmd", feats.reshape(B, h * w, D), onehot
            ) / jnp.maximum(counts[:, :, None], 1.0)
            presence = counts > 0
        else:
            masks = _grid_masks((h, w), M)  # (n, M)
            pooled = jnp.einsum(
                "bnd,nm->bmd", feats.reshape(B, h * w, D), masks
            ) / jnp.maximum(jnp.sum(masks, axis=0)[None, :, None], 1.0)
            presence = jnp.ones((B, M), bool)
        z = self.projector.apply({"params": params["projector"]}, pooled)
        if use_predictor:
            z = self.predictor.apply({"params": params["predictor"]}, z)
        return z, presence, new_state  # (B, M, out_dim), (B, M)

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del step, total_steps
        a = self.args
        if a.use_dataset_masks and len(views) >= 4:
            v0, v1, m0, m1 = views[:4]
        else:
            v0, v1 = views[:2]
            m0 = m1 = None
        z_s, pres_s, new_model_state = self._mask_pooled(
            params, model_state, v0, True, rng, use_predictor=True,
            region_masks=m0,
        )
        teacher = {
            "student": method_state["teacher"]["student"],
            "projector": method_state["teacher"]["projector"],
        }
        z_t, pres_t, _ = self._mask_pooled(
            jax.lax.stop_gradient(teacher), model_state, v1, False, rng,
            use_predictor=False, region_masks=m1,
        )
        z_t = jax.lax.stop_gradient(z_t)
        # Contrast mask m of view0 vs same mask of view1; negatives = other
        # masks across the batch (reference DetCon loss structure).
        B, M, D = z_s.shape
        zs = l2_normalize(z_s)
        zt = l2_normalize(z_t)
        logits = jnp.einsum("bmd,cnd->bmcn", zs, zt) / a.temperature
        logits = logits.reshape(B, M, B * M)
        # Regions absent from a crop pool to a degenerate shared vector:
        # exclude them from negatives and zero-weight their positive pairs
        # (the reference samples only present masks).
        neg_valid = pres_t.reshape(1, 1, B * M)
        logits = jnp.where(neg_valid, logits, -1e9)
        labels = (
            jnp.arange(B)[:, None] * M + jnp.arange(M)[None, :]
        )  # (B, M): own index in flattened teacher masks
        pair_w = (pres_s & pres_t).astype(jnp.float32)  # (B, M)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        loss = jnp.sum(ce * pair_w) / jnp.maximum(jnp.sum(pair_w), 1.0)
        return loss, (new_model_state, method_state, {"detcon_loss": loss})

    def post_update(self, params, method_state, step, total_steps):
        a = self.args
        m = cosine_schedule(step, total_steps, a.momentum_start, a.momentum_end)
        teacher = method_state["teacher"]
        new_teacher = {
            "student": ema_update(teacher["student"], params["student"], m),
            "projector": ema_update(teacher["projector"], params["projector"], m),
        }
        return {**method_state, "teacher": new_teacher}

    def default_optimizer_args(self):
        return LARSArgs(lr=0.3, momentum=0.9, weight_decay=1e-6)


class DetConS(DetConB):
    """DetConS (``detcon.py:147-245``): SimCLR-style mask-pooled contrast.

    No EMA teacher and no predictor — both views run through the live
    encoder + projector and the mask-level NT-Xent is symmetrized (the
    reference's DetConSLoss), in contrast to DetConB's BYOL-style
    teacher/predictor asymmetry.
    """

    name = "detcons"

    def init(self, rng, sample_images):
        ks, kp = jax.random.split(rng)
        student_vars = self.wrapped.init(ks, sample_images)
        student_params = student_vars.pop("params")
        model_state = dict(student_vars)
        d = self.wrapped.feature_dim
        params = {
            "student": student_params,
            "projector": self.projector.init(kp, jnp.zeros((1, d)))["params"],
        }
        return params, model_state, {}

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        del step, total_steps
        a = self.args
        if a.use_dataset_masks and len(views) >= 4:
            v0, v1, m0, m1 = views[:4]
        else:
            v0, v1 = views[:2]
            m0 = m1 = None
        k0, k1 = jax.random.split(rng)
        z0, pres0, new_model_state = self._mask_pooled(
            params, model_state, v0, True, k0, use_predictor=False,
            region_masks=m0,
        )
        z1, pres1, new_model_state = self._mask_pooled(
            params, new_model_state, v1, True, k1, use_predictor=False,
            region_masks=m1,
        )
        B, M, D = z0.shape
        za = l2_normalize(z0)
        zb = l2_normalize(z1)
        pair_w = (pres0 & pres1).astype(jnp.float32)

        def direction(x, y, pres_y):
            logits = jnp.einsum("bmd,cnd->bmcn", x, y) / a.temperature
            logits = logits.reshape(B, M, B * M)
            logits = jnp.where(pres_y.reshape(1, 1, B * M), logits, -1e9)
            labels = jnp.arange(B)[:, None] * M + jnp.arange(M)[None, :]
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            return jnp.sum(ce * pair_w) / jnp.maximum(jnp.sum(pair_w), 1.0)

        loss = 0.5 * (direction(za, zb, pres1) + direction(zb, za, pres0))
        return loss, (new_model_state, method_state, {"detcon_loss": loss})

    def post_update(self, params, method_state, step, total_steps):
        return method_state
