"""LT-DETR full fine-tuning trajectory parity harness vs the torch reference.

Runs N training steps of the ACTUAL reference pipeline — DINOv2 ViT +
DINOSTAs adapter + HybridEncoder + DFINETransformer forward
(``task_model.py:383-387``), the ACTUAL ``DFINECriterion`` + Hungarian
matcher, the reference ``get_optimizer`` semantics
(``train_model.py:764-884``: AdamW with backbone-lr-factor groups,
``get_weight_decay_parameters`` no-decay rules, FlatCosineLRScheduler,
grad-clip 0.1) — side by side with the rebuild's converter-identical flax
model + ``detection_criterion`` + the mirrored optax chain, on identical
fixed batches with denoising off (its torch randomness is untrackable).

The schedule constants are chosen so the quadratic warmup (steps 0-3), the
flat phase (3-5), the cosine phase (5-10), and the min-lr tail (10-12) all
flip DURING the run — schedule parity is covered, not just steady state.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

# Tiny-but-real config (reference ViTTest scale).
B = 2
IMG = 56
PATCH = 14
EMBED = 8
DEPTH = 3
D = 16
NHEAD = 2
FFN = 32
# num_queries == the anchor count (8² + 4² + 2² at IMG 56), so the
# encoder top-k is the identity SET and the trajectory has no discrete
# selection boundary: at tiny random-init scale the k-th/k+1-th encoder
# scores sit ~1e-4 apart, and cross-framework fp noise flips the pick
# (a permutation-invariant model makes query ORDER irrelevant to the
# loss). Top-k selection correctness itself is covered by the golden
# forward tests at real-checkpoint weight scales.
NQ = 84
NCLS = 5
NLAYERS = 2
REG_MAX = 8
PTS = (3, 6, 3)
INPLANE = 4
IDX = (0, 1, 2)

LR = 5e-4
BACKBONE_FACTOR = 0.05
WD = 1e-4
BETAS = (0.9, 0.999)
CLIP = 0.1
TOTAL_STEPS = 12
WARMUP = 3
FLAT = 5
NO_AUG = 2


def make_batches(n_steps: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        images = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
        n_tgts = [int(rng.integers(1, 4)) for _ in range(B)]
        K = max(n_tgts)
        boxes = np.zeros((B, K, 4), np.float32)
        labels = np.zeros((B, K), np.int64)
        valid = np.zeros((B, K), bool)
        for b, n in enumerate(n_tgts):
            boxes[b, :n] = np.concatenate(
                [
                    rng.random((n, 2)) * 0.6 + 0.2,
                    rng.random((n, 2)) * 0.2 + 0.05,
                ],
                -1,
            )
            labels[b, :n] = rng.integers(0, NCLS, n)
            valid[b, :n] = True
        batches.append(
            {
                "images": images,
                "boxes": boxes,
                "labels": labels,
                "valid": valid,
                "n_tgts": n_tgts,
            }
        )
    return batches


def flat_cosine_lr(step: int, base: float) -> float:
    """Reference ``flat_cosine_schedule`` (``flat_cosine.py:36-60``) with
    the harness constants; min_lr = 0.5 * base (_REFERENCE_LR_GAMMA)."""
    import math

    cosine_start = max(WARMUP, FLAT)
    cosine_end = max(cosine_start, TOTAL_STEPS - NO_AUG)
    min_lr = 0.5 * base
    if WARMUP > 0 and step <= WARMUP:
        return base * (step / float(WARMUP)) ** 2
    if step < cosine_start:
        return base
    if step >= cosine_end:
        return min_lr
    cos = 0.5 * (
        1.0 + math.cos(
            math.pi * (step - cosine_start) / (cosine_end - cosine_start)
        )
    )
    return min_lr + (base - min_lr) * cos


class TorchSide:
    def __init__(self, seed: int = 0):
        from ref_mount import mount_reference_tasks

        mount_reference_tasks()
        import importlib

        import torch

        self.torch = torch
        torch.manual_seed(seed)

        vt = importlib.import_module(
            "lightly_train._models.dinov2_vit.dinov2_vit_src.models."
            "vision_transformer"
        )
        wrap_mod = importlib.import_module(
            "lightly_train._models.dinov2_vit.dinov2_vit"
        )
        sta_mod = importlib.import_module(
            "lightly_train._task_models.ltdetr_object_detection."
            "dino_vit_wrapper"
        )
        he_mod = importlib.import_module(
            "lightly_train._task_models.object_detection_components."
            "hybrid_encoder"
        )
        dec_mod = importlib.import_module(
            "lightly_train._task_models.object_detection_components."
            "dfine_decoder"
        )
        crit_mod = importlib.import_module(
            "lightly_train._task_models.object_detection_components."
            "dfine_criterion"
        )
        match_mod = importlib.import_module(
            "lightly_train._task_models.object_detection_components.matcher"
        )

        backbone = vt._vit_test(
            patch_size=PATCH, init_values=1e-5, img_size=224
        )

        class Model(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = sta_mod.DINOSTAs(
                    model_wrapper=wrap_mod.DINOv2ViTModelWrapper(backbone),
                    interaction_indexes=list(IDX),
                    finetune=True,
                    use_sta=True,
                    conv_inplane=INPLANE,
                    hidden_dim=D,
                    project_features=True,
                )
                self.encoder = he_mod.HybridEncoder(
                    upsample=True,
                    in_channels=[D, D, D],
                    feat_strides=[8, 16, 32],
                    hidden_dim=D,
                    nhead=NHEAD,
                    dim_feedforward=FFN,
                    dropout=0.0,
                    enc_act="gelu",
                    use_encoder_idx=[2],
                    num_encoder_layers=1,
                    expansion=1.0,
                    depth_mult=1.0,
                    act="silu",
                )
                self.decoder = dec_mod.DFINETransformer(
                    num_classes=NCLS,
                    hidden_dim=D,
                    num_queries=NQ,
                    feat_channels=[D, D, D],
                    feat_strides=[8, 16, 32],
                    num_levels=3,
                    num_points=list(PTS),
                    nhead=NHEAD,
                    num_layers=NLAYERS,
                    dim_feedforward=FFN,
                    num_denoising=0,
                    eval_idx=-1,
                    reg_max=REG_MAX,
                    reg_scale=4.0,
                    layer_scale=1,
                )

            def forward(self, x, targets):
                return self.decoder(
                    self.encoder(self.backbone(x)), targets=targets
                )

        self.model = Model()
        with torch.no_grad():
            for p in self.model.parameters():
                if p.ndim >= 1 and p.requires_grad:
                    p.add_(torch.randn_like(p) * 0.02)
        self.model.train()

        matcher = match_mod.HungarianMatcher(
            weight_dict={
                "cost_class": 2.0, "cost_bbox": 5.0, "cost_giou": 2.0,
            },
            use_focal_loss=True,
            alpha=0.25,
            gamma=2.0,
        )
        self.criterion = crit_mod.DFINECriterion(
            matcher=matcher,
            weight_dict={
                "loss_vfl": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                "loss_fgl": 0.15, "loss_ddf": 1.5,
            },
            losses=["vfl", "boxes", "local"],
            alpha=0.75,
            gamma=2.0,
            num_classes=NCLS,
            reg_max=REG_MAX,
        )
        self._build_optimizer()

    def _build_optimizer(self):
        """Reference ``get_optimizer`` (``train_model.py:764-884``)."""
        import torch
        from lightly_train._optim import optimizer_helpers

        _, no_wd_list = optimizer_helpers.get_weight_decay_parameters(
            modules=[self.model]
        )
        no_wd = {id(p) for p in no_wd_list}

        backbone_params = list(
            self.model.backbone.backbone_model.parameters()
        )
        vit_ids = {id(p) for p in backbone_params}
        connector = [
            p
            for p in self.model.backbone.parameters()
            if id(p) not in vit_ids
        ]
        detector = (
            connector
            + list(self.model.encoder.parameters())
            + list(self.model.decoder.parameters())
        )
        groups = []
        blr = LR * BACKBONE_FACTOR
        bwd = [p for p in backbone_params if id(p) not in no_wd]
        bnwd = [p for p in backbone_params if id(p) in no_wd]
        if bwd:
            groups.append({"params": bwd, "lr": blr})
        if bnwd:
            groups.append({"params": bnwd, "lr": blr, "weight_decay": 0.0})
        dwd = [
            p for p in detector if id(p) not in no_wd and p.requires_grad
        ]
        dnwd = [p for p in detector if id(p) in no_wd and p.requires_grad]
        if dwd:
            groups.append({"params": dwd})
        if dnwd:
            groups.append({"params": dnwd, "weight_decay": 0.0})
        self.optim = torch.optim.AdamW(
            groups, lr=LR, betas=BETAS, weight_decay=WD
        )
        self.base_lrs = [g["lr"] for g in self.optim.param_groups]

    def step(self, batch: Dict, step_idx: int) -> float:
        torch = self.torch
        images = torch.from_numpy(
            np.transpose(batch["images"], (0, 3, 1, 2)).copy()
        )
        targets = [
            {
                "labels": torch.from_numpy(
                    batch["labels"][b, : batch["n_tgts"][b]]
                ),
                "boxes": torch.from_numpy(
                    batch["boxes"][b, : batch["n_tgts"][b]]
                ),
            }
            for b in range(B)
        ]
        out = self.model(images, targets)
        loss_dict = self.criterion(
            outputs=out, targets=targets, world_size=1
        )
        total = sum(loss_dict.values())

        self.optim.zero_grad(set_to_none=True)
        total.backward()
        torch.nn.utils.clip_grad_norm_(
            self.model.parameters(), CLIP, error_if_nonfinite=False
        )
        for g, base in zip(self.optim.param_groups, self.base_lrs):
            g["lr"] = flat_cosine_lr(step_idx, base)
        self.optim.step()
        return float(total.detach())

    def composed_state_dict(self) -> Dict[str, np.ndarray]:
        return {k: v for k, v in self.model.state_dict().items()}


class FlaxSide:
    def __init__(self, torch_state: Dict):
        import jax
        import jax.numpy as jnp
        import optax

        from lightly_train_tpu.models.vit import (
            ViTConfig,
            VisionTransformer,
        )
        from lightly_train_tpu.models.wrapper import WrappedModel
        from lightly_train_tpu.tasks.detection.convert import (
            convert_torch_ltdetr_state_dict,
        )
        from lightly_train_tpu.tasks.detection.ltdetr import (
            ObjectDetectionArgs,
            ObjectDetectionTrainModel,
        )

        self.jax = jax
        self.jnp = jnp

        cfg = ViTConfig(
            patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
            num_heads=NHEAD, mlp_ratio=1.0, layerscale_init=1e-5,
            norm_eps=1e-6, pos_embed_size=16,
        )
        wrapped = WrappedModel(
            name="vit-test", module=VisionTransformer(cfg),
            feature_dim=EMBED, patch_size=PATCH,
        )
        args = ObjectDetectionArgs(
            num_classes=NCLS, num_queries=NQ, d_model=D,
            num_decoder_layers=NLAYERS, num_heads=NHEAD,
            dim_feedforward=FFN, decoder="dfine", dn_groups=0,
            num_points=PTS, dfine_bins=REG_MAX + 1,
            interaction_indexes=IDX, conv_inplane=INPLANE,
        )
        self.m = ObjectDetectionTrainModel(wrapped, args)

        params, stats = convert_torch_ltdetr_state_dict(torch_state)
        self.params = {"backbone": jax.tree.map(jnp.asarray, params)}
        self.model_state = {
            "batch_stats": jax.tree.map(jnp.asarray, stats)
        }

        # --- optimizer: mirrored reference semantics ---
        def path_str(path):
            return "/".join(str(getattr(k, "key", k)) for k in path)

        def no_wd(path, leaf):
            p = path_str(path).lower()
            if leaf.ndim <= 1:
                return True
            if p.endswith("/bias") or "bias" in p.split("/")[-1]:
                return True
            for tok in (
                "cls_token", "mask_token", "register_tokens", "pos_embed",
                "denoising_class_embed", "query_pos_head",
            ):
                if tok in p:
                    return True
            return False

        def lr_factor(path, leaf):
            del leaf
            p = path_str(path)
            return (
                BACKBONE_FACTOR
                if p.startswith("backbone/trunk") else 1.0
            )

        wd_mask = jax.tree_util.tree_map_with_path(
            lambda p, x: not no_wd(p, x), self.params
        )
        factors = jax.tree_util.tree_map_with_path(lr_factor, self.params)

        def scale_by_group_lr():
            def init_fn(params):
                del params
                return optax.ScaleByScheduleState(
                    count=jnp.zeros([], jnp.int32)
                )

            def update_fn(updates, state, params=None):
                del params
                lr = flat_cosine_sched(state.count)
                updates = jax.tree.map(
                    lambda u, f: -lr * f * u, updates, factors
                )
                return updates, optax.ScaleByScheduleState(
                    count=state.count + 1
                )

            return optax.GradientTransformation(init_fn, update_fn)

        def flat_cosine_sched(count):
            # jnp version of flat_cosine_lr(step, LR)
            step = count.astype(jnp.float32)
            cosine_start = float(max(WARMUP, FLAT))
            cosine_end = float(max(cosine_start, TOTAL_STEPS - NO_AUG))
            min_lr = 0.5 * LR
            warm = LR * (step / float(WARMUP)) ** 2
            cos = 0.5 * (
                1.0
                + jnp.cos(
                    jnp.pi * (step - cosine_start)
                    / (cosine_end - cosine_start)
                )
            )
            cos_lr = min_lr + (LR - min_lr) * cos
            lr = jnp.where(
                step <= WARMUP,
                warm,
                jnp.where(
                    step < cosine_start,
                    LR,
                    jnp.where(step >= cosine_end, min_lr, cos_lr),
                ),
            )
            return lr

        import optax

        self.tx = optax.chain(
            optax.clip_by_global_norm(CLIP),
            optax.scale_by_adam(b1=BETAS[0], b2=BETAS[1], eps=1e-8),
            optax.add_decayed_weights(WD, mask=wd_mask),
            scale_by_group_lr(),
        )
        self.opt_state = self.tx.init(self.params)

        def loss_fn(params, model_state, batch, rng):
            return self.m.loss_fn(params, model_state, batch, rng, 0)

        self._grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def step(self, batch: Dict, step_idx: int) -> float:
        import optax

        jnp = self.jnp
        K = batch["boxes"].shape[1]
        fb = {
            "images": jnp.asarray(batch["images"]),
            "boxes": jnp.asarray(batch["boxes"]),
            "labels": jnp.asarray(batch["labels"].astype(np.int32)),
            "box_valid": jnp.asarray(batch["valid"]),
        }
        (loss, (new_state, _metrics)), grads = self._grad(
            self.params, self.model_state, fb, self.jax.random.key(0)
        )
        updates, self.opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        self.params = optax.apply_updates(self.params, updates)
        self.model_state = new_state
        return float(loss)


def run_parity(n_steps: int = TOTAL_STEPS) -> List[Dict[str, float]]:
    # Exact-parity regime: force the host scipy Hungarian matcher + host GO
    # union. The auto rule would pick the greedy device matcher on the
    # 8-device CPU test mesh (callback/collective deadlock avoidance), but
    # this harness is a single unsharded program where callbacks are safe —
    # and parity vs the reference requires the OPTIMAL assignment.
    os.environ["LIGHTLY_TRAIN_MATCHER"] = "hungarian"
    try:
        batches = make_batches(n_steps)
        t = TorchSide()
        f = FlaxSide(t.composed_state_dict())
        records = []
        for i, b in enumerate(batches):
            lt = t.step(b, i)
            lf = f.step(b, i)
            records.append({"step": i, "torch": lt, "flax": lf})
        return records
    finally:
        os.environ.pop("LIGHTLY_TRAIN_MATCHER", None)
