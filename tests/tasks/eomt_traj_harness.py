"""Side-by-side EoMT fine-tuning: torch reference components vs the rebuild.

Extends the DINOv2 trajectory-parity pattern (``tests/methods/
trajectory_harness.py``) to the fine-tuning side (VERDICT r3 item #1): both
sides start from CONVERTER-IDENTICAL weights, consume IDENTICAL images/masks
and IDENTICAL injected uniform draws (matcher points, uncertainty points,
per-query annealing bernoullis), and step their own full optimizer +
scheduler pipelines; per-step total losses are compared.

The torch side composes ONLY reference components:
- the ACTUAL ``DINOv3EoMTSemanticSegmentation`` task model
  (``_task_models/dinov3_eomt_semantic_segmentation/task_model.py``) with a
  tiny ``DinoVisionTransformer`` backbone injected via the package hook,
- the ACTUAL ``MaskClassificationLoss`` (HF Mask2Former loss,
  ``mask_loss.py``),
- the ACTUAL ``TwoStageWarmupPolySchedule`` (``scheduler.py``),
- the param-grouping + LLRD + annealing glue of ``train_model.py:283-305,
  459-567`` inlined verbatim-by-rule (the Train module itself needs
  torchmetrics, which is not installed).

Randomness injection: every stochastic draw on both sides is served from one
canonical per-step pool. torch draws (x, y) grid_sample coordinates; the
rebuild draws (y, x) — the injector swaps the last axis. The torch matcher
draws per image and the uncertainty sampler per MATCHED mask (ordered by
matched query); the rebuild draws per (image, slot) for all slots — the
injector maps torch's matched boxes to (image, class-slot) rows, so both
sides evaluate the identical coordinates wherever a value contributes to the
loss.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Tuple

import numpy as np

# ---- shared tiny config ----------------------------------------------------
EMBED_DIM = 64
DEPTH = 4
N_HEADS = 2
PATCH = 16
N_STORAGE = 4
IMG = 64            # 4x4 patch grid, 16x16 mask-logit grid
B = 2
NUM_CLASSES = 5     # K = 5 slots (single chunk in the rebuild's loss)
NUM_QUERIES = 6
NUM_JOINT = 2
NUM_POINTS = 16
OVERSAMPLE = 3.0
IMPORTANCE = 0.75
CLASS_W, MASK_W, DICE_W, NO_OBJ_W = 2.0, 5.0, 5.0, 0.1
LR = 1e-3
WD = 0.05
LLRD = 0.8
CLIP = 0.01
WARMUP = (2, 3)
POLY_POWER = 0.9
TOTAL_STEPS = 12
IGNORE = 255

N_OVER = int(NUM_POINTS * OVERSAMPLE)
N_UNC = int(IMPORTANCE * NUM_POINTS)
N_RAND = NUM_POINTS - N_UNC


def make_data(seed: int, n_steps: int):
    """Identical per-step batches + the canonical uniform pool."""
    rng = np.random.RandomState(seed)
    steps = []
    for _ in range(n_steps):
        images = rng.randn(B, 3, IMG, IMG).astype(np.float32)
        masks = rng.randint(0, NUM_CLASSES, (B, IMG, IMG)).astype(np.int64)
        # a band of ignore pixels exercises the ignore path
        masks[:, :4, :] = IGNORE
        uniforms = {
            # per-query annealing disable draws, one per joint block
            "anneal": rng.rand(NUM_JOINT, B, NUM_QUERIES).astype(np.float32),
            # matcher coordinates per level per image, torch (x, y) order
            "match": rng.rand(
                NUM_JOINT + 1, B, NUM_POINTS, 2
            ).astype(np.float32),
            # uncertainty oversample + final random coords per level per
            # (image, class-slot)
            "over": rng.rand(
                NUM_JOINT + 1, B, NUM_CLASSES, N_OVER, 2
            ).astype(np.float32),
            "rand": rng.rand(
                NUM_JOINT + 1, B, NUM_CLASSES, N_RAND, 2
            ).astype(np.float32),
        }
        steps.append({"images": images, "masks": masks, "uniforms": uniforms})
    return steps


def anneal_prob(step: int, start: int, end: int) -> float:
    """Reference ``mask_annealing`` (``train_model.py:438-455``) with the
    one-step lag: probs start at 1 and are recomputed with
    ``current_iter = step`` at the END of each step."""
    cur = step - 1
    if cur < start:
        return 1.0
    if cur >= end:
        return 0.0
    return float((1.0 - (cur - start) / (end - start)) ** POLY_POWER)


def anneal_windows(total_steps: int) -> Tuple[List[int], List[int]]:
    n_phases = NUM_JOINT + 2
    phases = [round(i * total_steps / n_phases) for i in range(n_phases + 1)]
    return phases[1:-2], phases[2:-1]


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------


class TorchEoMT:
    def __init__(self, seed: int = 0):
        sys.path.insert(0, os.path.dirname(__file__))
        from ref_mount import mount_reference_tasks

        mount_reference_tasks()
        import torch

        self.torch = torch
        torch.manual_seed(seed)

        import importlib

        vt3 = importlib.import_module(
            "lightly_train._models.dinov3.dinov3_src.models.vision_transformer"
        )
        backbone = vt3.DinoVisionTransformer(
            img_size=224, patch_size=PATCH, embed_dim=EMBED_DIM, depth=DEPTH,
            num_heads=N_HEADS, ffn_ratio=4.0, qkv_bias=True,
            layerscale_init=1e-5, norm_layer="layernormbf16",
            ffn_layer="mlp", n_storage_tokens=N_STORAGE, mask_k_bias=True,
            pos_embed_rope_base=100.0, pos_embed_rope_dtype="fp32",
        )
        backbone.init_weights()
        with torch.no_grad():
            for p in backbone.parameters():
                if p.ndim >= 1:
                    p.add_(torch.randn_like(p) * 0.02)
            for blk in backbone.blocks:
                m = blk.attn.qkv.bias_mask
                d = m.shape[0] // 3
                m.fill_(1.0)
                m[d: 2 * d] = 0.0

        tm = importlib.import_module(
            "lightly_train._task_models.dinov3_eomt_semantic_segmentation"
            ".task_model"
        )
        orig_get_model = tm.DINOV3_PACKAGE.get_model
        tm.DINOV3_PACKAGE.get_model = classmethod(
            lambda cls, **kw: backbone
        ).__get__(None, type(tm.DINOV3_PACKAGE))
        try:
            self.model = tm.DINOv3EoMTSemanticSegmentation(
                model_name="dinov3/vits16-eomt-coco",
                classes={i: f"c{i}" for i in range(NUM_CLASSES)},
                class_ignore_index=None,
                image_size=(IMG, IMG),
                image_normalize={"mean": [0.0] * 3, "std": [1.0] * 3},
                num_queries=NUM_QUERIES,
                num_joint_blocks=NUM_JOINT,
                load_weights=False,
            )
        finally:
            tm.DINOV3_PACKAGE.get_model = orig_get_model
        with torch.no_grad():
            # randomize the EoMT heads for a discriminating comparison
            for name, p in self.model.named_parameters():
                if not name.startswith("backbone."):
                    p.add_(torch.randn_like(p) * 0.05)

        from lightly_train._task_models.dinov3_eomt_semantic_segmentation.mask_loss import (  # noqa: E501
            MaskClassificationLoss,
        )

        self.criterion = MaskClassificationLoss(
            num_points=NUM_POINTS,
            oversample_ratio=OVERSAMPLE,
            importance_sample_ratio=IMPORTANCE,
            mask_coefficient=MASK_W,
            dice_coefficient=DICE_W,
            class_coefficient=CLASS_W,
            num_labels=NUM_CLASSES,
            no_object_coefficient=NO_OBJ_W,
        )
        self._build_optimizer()
        self.starts, self.ends = anneal_windows(TOTAL_STEPS)
        self.model.train()

    # -- reference optimizer glue (train_model.py:459-567), inlined by rule --
    def _build_optimizer(self):
        import torch
        from lightly_train._optim.optimizer_helpers import (
            get_weight_decay_parameters,
        )
        from lightly_train._task_models.dinov3_eomt_semantic_segmentation.scheduler import (  # noqa: E501
            TwoStageWarmupPolySchedule,
        )

        class W(torch.nn.Module):
            def __init__(self, model):
                super().__init__()
                self.model = model

        self.wrapper = W(self.model)
        _, no_wd_list = get_weight_decay_parameters([self.wrapper])
        no_wd = set(no_wd_list)
        backbone_params = set(self.model.backbone.parameters())
        bb_groups, other_groups = [], []
        block_i = DEPTH
        for name, param in reversed(list(self.wrapper.named_parameters())):
            if not param.requires_grad:
                continue
            param_lr = LR  # global batch == default batch in the harness
            if param in backbone_params:
                parts = name.split(".")
                is_block = False
                for i, key in enumerate(parts):
                    if key == "blocks":
                        block_i = int(parts[i + 1])
                        is_block = True
                if is_block or block_i == 0:
                    param_lr *= LLRD ** (DEPTH - 1 - block_i)
                g = {"params": [param], "lr": param_lr, "name": name}
                if param in no_wd:
                    g["weight_decay"] = 0.0
                bb_groups.append(g)
            else:
                g = {"params": [param], "lr": param_lr, "name": name}
                if param in no_wd:
                    g["weight_decay"] = 0.0
                other_groups.append(g)
        self.optimizer = torch.optim.AdamW(
            bb_groups + other_groups, weight_decay=WD
        )
        self.scheduler = TwoStageWarmupPolySchedule(
            self.optimizer,
            num_backbone_params=len(bb_groups),
            warmup_steps=WARMUP,
            total_steps=TOTAL_STEPS,
            poly_power=POLY_POWER,
        )

    def _targets(self, masks_np: np.ndarray):
        torch = self.torch
        out = []
        for b in range(B):
            present = sorted(
                int(c) for c in np.unique(masks_np[b]) if c != IGNORE
            )
            m = np.stack(
                [(masks_np[b] == c).astype(np.float32) for c in present]
            ) if present else np.zeros((0, IMG, IMG), np.float32)
            out.append({
                "masks": torch.from_numpy(m),
                "labels": torch.tensor(present, dtype=torch.long),
            })
        return out

    def step(self, batch: Dict, step_idx: int) -> float:
        torch = self.torch
        u = batch["uniforms"]
        probs = [
            anneal_prob(step_idx, self.starts[j], self.ends[j])
            for j in range(NUM_JOINT)
        ]
        with torch.no_grad():
            for j in range(NUM_JOINT):
                self.model.attn_mask_probs[j] = probs[j]

        # ---- forward with injected per-query annealing draws ----
        queue: List[np.ndarray] = []
        for j in range(NUM_JOINT):
            if probs[j] < 1:  # reference draws only when annealing is active
                queue.append(u["anneal"][j])

        real_rand = torch.rand

        def fake_rand(*shape, **kw):
            if shape and isinstance(shape[0], tuple):
                shape = shape[0]
            exp = queue.pop(0)
            assert tuple(shape) == tuple(exp.shape), (shape, exp.shape)
            return torch.from_numpy(np.ascontiguousarray(exp))

        images = torch.from_numpy(batch["images"])
        torch.rand = fake_rand
        try:
            mask_logits_l, class_logits_l = self.model.forward_train(
                images, return_logits_per_layer=True
            )
            assert not queue, "unconsumed annealing draws"

            targets = self._targets(batch["masks"])
            losses = {}
            for li in range(NUM_JOINT + 1):
                # 1) standalone matcher pass to learn the matched-box order
                queue.extend(u["match"][li][b][None] for b in range(B))
                indices = self.criterion.matcher(
                    masks_queries_logits=mask_logits_l[li],
                    mask_labels=[t["masks"] for t in targets],
                    class_queries_logits=class_logits_l[li],
                    class_labels=[t["labels"] for t in targets],
                )
                assert not queue
                # boxes are ordered by (image, matched-query ascending); map
                # each to its (image, class-slot) canonical uniform row
                over_rows, rand_rows = [], []
                for b, (_, cols) in enumerate(indices):
                    for j in cols.numpy():
                        c = int(targets[b]["labels"][int(j)])
                        over_rows.append(u["over"][li][b, c])
                        rand_rows.append(u["rand"][li][b, c])
                # 2) full criterion: matcher redraw + uncertainty draws
                queue.extend(u["match"][li][b][None] for b in range(B))
                if over_rows:
                    queue.append(np.stack(over_rows))
                    queue.append(np.stack(rand_rows))
                block_losses = self.criterion(
                    masks_queries_logits=mask_logits_l[li],
                    class_queries_logits=class_logits_l[li],
                    targets=targets,
                )
                assert not queue
                losses.update(
                    {f"{k}_l{li}": v for k, v in block_losses.items()}
                )
            loss = self.criterion.loss_total(losses_all_layers=losses)
        finally:
            torch.rand = real_rand

        self.optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            self.wrapper.parameters(), CLIP, error_if_nonfinite=False
        )
        self.optimizer.step()
        self.scheduler.step()
        return float(loss.detach())

    def state_dict_np(self) -> Dict[str, np.ndarray]:
        return {
            k: v.detach().numpy().copy()
            for k, v in self.model.state_dict().items()
        }


# ---------------------------------------------------------------------------
# flax side
# ---------------------------------------------------------------------------


class FlaxEoMT:
    def __init__(self, torch_state: Dict[str, np.ndarray]):
        import jax
        import jax.numpy as jnp

        self.jax, self.jnp = jax, jnp
        from lightly_train_tpu.models.convert import (
            convert_torch_eomt_state_dict,
        )
        from lightly_train_tpu.models.vit import ViTConfig, VisionTransformer
        from lightly_train_tpu.models.wrapper import WrappedModel
        from lightly_train_tpu.tasks.eomt_semantic_segmentation import (
            EoMTSemanticSegmentationArgs,
            EoMTSemanticSegmentationTrainModel,
        )

        cfg = ViTConfig(
            patch_size=PATCH, embed_dim=EMBED_DIM, depth=DEPTH,
            num_heads=N_HEADS, mlp_ratio=4.0, layerscale_init=1e-5,
            num_register_tokens=N_STORAGE, use_rope=True, rope_base=100.0,
            use_swiglu=False, qkv_bias=True, mask_k_bias=True,
            use_pos_embed=False, norm_eps=1e-5, dtype=jnp.float32,
        )
        wrapped = WrappedModel(
            name="vit-tiny", module=VisionTransformer(cfg),
            feature_dim=EMBED_DIM, patch_size=PATCH,
        )
        args = EoMTSemanticSegmentationArgs(
            num_classes=NUM_CLASSES, num_queries=NUM_QUERIES,
            num_joint_blocks=NUM_JOINT, num_points=NUM_POINTS,
            oversample_ratio=OVERSAMPLE, importance_sample_ratio=IMPORTANCE,
            class_weight=CLASS_W, mask_weight=MASK_W, dice_weight=DICE_W,
            no_object_weight=NO_OBJ_W, lr_warmup_steps=WARMUP,
            poly_power=POLY_POWER,
        )
        self.m = EoMTSemanticSegmentationTrainModel(wrapped, args)
        self.m.total_steps = TOTAL_STEPS

        sample = {
            "images": jnp.zeros((B, IMG, IMG, 3)),
            "masks": jnp.zeros((B, IMG, IMG), jnp.int32),
        }
        params, self.model_state = self.m.init(jax.random.key(0), sample)
        converted = convert_torch_eomt_state_dict(torch_state, DEPTH)
        # structural check: converted tree must cover the init tree exactly
        init_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(
                params["backbone"]
            )[0]
        }
        conv_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        assert init_paths == conv_paths, (
            init_paths - conv_paths, conv_paths - init_paths
        )
        self.params = {
            "backbone": jax.tree_util.tree_map(
                lambda i, c: jnp.asarray(c, i.dtype).reshape(i.shape),
                params["backbone"], converted,
            )
        }

        from lightly_train_tpu._optim import AdamWArgs, build_optimizer

        self.optimizer = build_optimizer(
            AdamWArgs(lr=LR, weight_decay=WD),
            self.m.lr_schedule(LR, TOTAL_STEPS),
            self.params,
            grad_clip_norm=CLIP,
            lr_scales=self.m.lr_scales(self.params),
            schedule_groups=self.m.lr_schedule_groups(
                LR, TOTAL_STEPS, self.params
            ),
        )
        self.opt_state = self.optimizer.init(self.params)

    def step(self, batch: Dict, step_idx: int) -> float:
        jax, jnp = self.jax, self.jnp
        import lightly_train_tpu.ops.point_sampling as ps

        u = batch["uniforms"]
        # queue order: trunk annealing draws (one per joint block), then per
        # level: match coords, uncertainty oversample, uncertainty random —
        # all converted from torch (x, y) to this package's (y, x)
        queue: List[np.ndarray] = [u["anneal"][j] for j in range(NUM_JOINT)]
        for li in range(NUM_JOINT + 1):
            queue.append(u["match"][li][..., ::-1])
            queue.append(
                u["over"][li][..., ::-1].reshape(
                    B * NUM_CLASSES, N_OVER, 2
                )
            )
            queue.append(
                u["rand"][li][..., ::-1].reshape(
                    B * NUM_CLASSES, N_RAND, 2
                )
            )

        real_uniform = ps._uniform

        def fake_uniform(key, shape):
            exp = queue.pop(0)
            assert tuple(shape) == tuple(exp.shape), (shape, exp.shape)
            return jnp.asarray(np.ascontiguousarray(exp))

        fbatch = {
            "images": jnp.asarray(
                batch["images"].transpose(0, 2, 3, 1)
            ),
            "masks": jnp.asarray(batch["masks"].astype(np.int32)),
        }
        ps._uniform = fake_uniform
        try:
            (loss, _), grads = jax.value_and_grad(
                lambda p: self.m.loss_fn(
                    p, self.model_state, fbatch, jax.random.key(0),
                    jnp.asarray(step_idx),
                ),
                has_aux=True,
            )(self.params)
            assert not queue, f"{len(queue)} unconsumed flax draws"
        finally:
            ps._uniform = real_uniform
        updates, self.opt_state = self.optimizer.update(
            grads, self.opt_state, self.params
        )
        import optax

        self.params = optax.apply_updates(self.params, updates)
        return float(loss)


def run_parity(n_steps: int = TOTAL_STEPS, seed: int = 0):
    os.environ["LIGHTLY_TRAIN_MATCHER"] = "hungarian"
    try:
        data = make_data(seed, n_steps)
        t = TorchEoMT(seed)
        f = FlaxEoMT(t.state_dict_np())
        records = []
        for s in range(n_steps):
            tl = t.step(data[s], s)
            fl = f.step(data[s], s)
            records.append({"step": s, "torch": tl, "flax": fl})
        return records
    finally:
        os.environ.pop("LIGHTLY_TRAIN_MATCHER", None)
