"""DINOv31: DINOv2 post-training + PaKA dense-relational alignment.

Rebuild of ``src/lightly_train/_methods/dinov31/dinov31.py:1-456`` +
``constrained_crop.py:63-216``: the DINOv2 objective augmented with a clean
(augmentation-free) global view fed to the EMA teacher and a patch-kernel
alignment (PaKA) loss — the teacher's clean patch grid is ROI-resampled onto
the student view's crop geometry, and the student's patch-similarity kernel
is aligned to the teacher's over the overlapping region.

TPU-native notes: crop geometry flows from the fused augmentation stage as
(B, 5) arrays appended to the views list (``needs_geometry``); ROI resampling
reuses the matmul resampler on feature maps; the kernel alignment is
row-softmax CE over (N, N) gram matrices (MXU matmuls), masked by overlap
validity.

Provenance of the loss math: the reference imports
``lightly.loss.PatchKernelAlignmentLoss`` (``dinov31.py:55``) whose source is
not available in this environment, so ``_paka_loss`` is a RECONSTRUCTION from
the PaKA paper (arXiv:2509.05606, App. D): project both patch grids through a
2048/256 MLP head (student trained, teacher EMA), l2-normalize, form the
temperature-scaled patch-similarity kernels K = Z Z^T / tau, and minimize the
row-wise cross-entropy CE(softmax(K_t), softmax(K_s)) over rows/columns whose
BOTH patches are observed by the teacher's clean view (overlap mask). The
properties this implies — CE minimized exactly when the kernels match,
zero loss for disjoint crops, mask correctness, bf16 finiteness — are
asserted by ``tests/methods/test_paka_properties.py``.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from lightly_train_tpu.ops.losses import l2_normalize

from lightly_train_tpu.methods.base import ViewSpec
from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
from lightly_train_tpu.ops.augment import ViewAugmentConfig, crop_resize_matmul

import flax.linen as nn


def paka_overlap_validity(y0, x0, hh, ww, flip, gs_hw, gt_hw):
    """(B, gs_h, gs_w) bool: student patch centers that land inside the
    teacher's clean crop.

    ``(y0, x0, hh, ww)`` is the student crop box expressed in TEACHER-GRID
    coordinates (clean crop spans [0, gt_h] x [0, gt_w]); ``flip`` mirrors
    the column validity to match the student's hflipped grid. Derivation
    follows the overlap masking of arXiv:2509.05606 App. D (constrained-crop
    PaKA): only kernel rows/columns whose both patches are observed by the
    teacher contribute to the alignment CE.
    """
    gs_h, gs_w = gs_hw
    gt_h, gt_w = gt_hw
    ty = y0[:, None] + (jnp.arange(gs_h) + 0.5)[None, :] * (
        hh[:, None] / gs_h
    )
    tx = x0[:, None] + (jnp.arange(gs_w) + 0.5)[None, :] * (
        ww[:, None] / gs_w
    )
    vy = (ty >= 0) & (ty <= gt_h)  # (B, gs_h)
    vx = (tx >= 0) & (tx <= gt_w)
    vx = jnp.where(flip[:, None] > 0.5, vx[:, ::-1], vx)
    return vy[:, :, None] & vx[:, None, :]


class _PaKAHead(nn.Module):
    """3-layer MLP (embed -> hidden -> hidden -> bottleneck, GELU, no BN)
    applied to the ROI-aligned patch tokens before the kernel alignment —
    the reference's ``_build_mlp`` paka head (``dinov31.py:126-143``,
    paper App. D.1). Student head trains; the teacher copy rides the
    method's EMA (it lives inside ``params`` / ``method_state["teacher"]``).
    """

    hidden_dim: int = 2048
    bottleneck_dim: int = 256

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_dim, name="fc2")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.bottleneck_dim, name="fc3")(h)


class DINOv31Args(DINOv2Args):
    paka_weight: float = 1.0
    paka_temp: float = 0.25
    # Clean views use gentler crops (high overlap with student crops).
    clean_crop_scale: tuple = (0.6, 1.0)
    # PaKA projection head dims (reference _build_mlp 2048/256,
    # ``dinov31.py:132-136``) and the warmup gate before the dense loss
    # engages (``dinov31.py:242`` paka_start_step).
    paka_hidden_dim: int = 2048
    paka_bottleneck_dim: int = 256
    paka_start_step: int = 0


class DINOv31(DINOv2):
    name = "dinov31"
    needs_geometry = True

    def __init__(self, wrapped, args: DINOv31Args):
        super().__init__(wrapped, args)
        self.args: DINOv31Args = args
        self.paka_head = _PaKAHead(
            hidden_dim=args.paka_hidden_dim,
            bottleneck_dim=args.paka_bottleneck_dim,
        )

    def init(self, rng, sample_images):
        params, model_state, method_state = super().init(rng, sample_images)
        kp = jax.random.fold_in(rng, 131)
        d = self.wrapped.feature_dim
        head_params = self.paka_head.init(kp, jnp.zeros((1, d)))["params"]
        params = {**params, "paka_head": head_params}
        # Teacher copy starts identical (reference deepcopy,
        # ``dinov31.py:141-143``); the whole-tree EMA then keeps it updated.
        method_state["teacher"] = {
            **method_state["teacher"],
            "paka_head": jax.tree_util.tree_map(jnp.copy, head_params),
        }
        return params, model_state, method_state

    def view_specs(self) -> List[ViewSpec]:
        a = self.args
        base = super().view_specs()  # g1, g2, locals
        g = a.global_image_size
        clean = ViewAugmentConfig(
            out_size=(g, g),
            crop_scale=a.clean_crop_scale,
            hflip_prob=0.0,
            cj_prob=0.0,
            gray_prob=0.0,
            blur_prob=0.0,
            solarize_prob=0.0,
        )
        # Order: g1, g2, clean, locals...
        return base[:2] + [ViewSpec(clean, count=1)] + base[2:]

    def _paka_loss(self, params, model_state, method_state, g1, geom_g1,
                   clean, geom_clean, rng):
        a = self.args
        patch = self.wrapped.patch_size or 16
        # Teacher clean patch grid (EMA teacher, no grad).
        t_out = self._apply_backbone(
            jax.lax.stop_gradient(method_state["teacher"]["student"]),
            model_state, clean, None, False, rng,
        )
        Ft = jax.lax.stop_gradient(t_out["features"])  # (B, gt, gt, D)
        # Student patch grid for the augmented global view.
        s_out = self._apply_backbone(
            params["student"], model_state, g1, None, True, rng
        )
        Fs = s_out["features"]  # (B, gs, gs, D)
        B, gs_h, gs_w, D = Fs.shape
        gt_h, gt_w = Ft.shape[1], Ft.shape[2]

        # Student crop box in source pixels -> teacher-grid coordinates.
        ys, xs, hs, ws, flip = (geom_g1[:, i] for i in range(5))
        yc, xc, hc, wc = (geom_clean[:, i] for i in range(4))
        y0 = (ys - yc) / hc * gt_h
        x0 = (xs - xc) / wc * gt_w
        hh = hs / hc * gt_h
        ww = ws / wc * gt_w
        # ROI-resample teacher features onto the student grid (matmul
        # resampler on the feature map).
        Ft_aligned = crop_resize_matmul(Ft, y0, x0, hh, ww, (gs_h, gs_w))
        # Student hflip flips its grid; mirror the teacher alignment.
        Ft_aligned = jnp.where(
            flip[:, None, None, None] > 0.5,
            Ft_aligned[:, :, ::-1, :],
            Ft_aligned,
        )
        # Validity: student patch centers inside the clean crop.
        valid = paka_overlap_validity(
            y0, x0, hh, ww, flip, (gs_h, gs_w), (gt_h, gt_w)
        ).reshape(B, gs_h * gs_w)

        N = gs_h * gs_w
        # Projection heads on the aligned tokens (student trained, teacher
        # EMA'd + stop-grad) before the kernel alignment.
        Zs = self.paka_head.apply(
            {"params": params["paka_head"]}, Fs.reshape(B, N, D)
        ).astype(jnp.float32)
        Zt = jax.lax.stop_gradient(
            self.paka_head.apply(
                {"params": method_state["teacher"]["paka_head"]},
                Ft_aligned.reshape(B, N, D),
            )
        ).astype(jnp.float32)
        Zs = l2_normalize(Zs)
        Zt = l2_normalize(Zt)
        Ks = jnp.einsum("bnd,bmd->bnm", Zs, Zs) / a.paka_temp
        Kt = jnp.einsum("bnd,bmd->bnm", Zt, Zt) / a.paka_temp
        w = valid[:, :, None] & valid[:, None, :]
        neg = -1e9 * (1.0 - w.astype(jnp.float32))
        p_t = jax.nn.softmax(Kt + neg, axis=-1)
        logp_s = jax.nn.log_softmax(Ks + neg, axis=-1)
        ce = -jnp.sum(p_t * logp_s * w, axis=-1)  # (B, N)
        row_valid = valid.astype(jnp.float32)
        return jnp.sum(ce * row_valid) / jnp.maximum(jnp.sum(row_valid), 1.0)

    def loss_fn(self, params, model_state, method_state, views, rng, step,
                total_steps):
        n = len(views) // 2  # views + geometry arrays
        view_arrs = views[:n]
        geoms = views[n:]
        # DINOv2 objective on g1, g2 + locals (clean view excluded).
        dino_views = [view_arrs[0], view_arrs[1]] + view_arrs[3:]
        loss, (ms, mstate, metrics) = super().loss_fn(
            params, model_state, method_state, dino_views, rng, step,
            total_steps,
        )
        k_paka = jax.random.fold_in(rng, 31)
        paka = self._paka_loss(
            params, model_state, mstate,
            view_arrs[0], geoms[0], view_arrs[2], geoms[2], k_paka,
        )
        # Warmup gate (reference paka_start_step, ``dinov31.py:242``) —
        # traced so the step stays shape-stable.
        gate = (
            jnp.asarray(step, jnp.float32) >= self.args.paka_start_step
        ).astype(jnp.float32)
        paka = paka * gate
        total = loss + self.args.paka_weight * paka
        return total, (ms, mstate, {**metrics, "paka_loss": paka})
