"""Side-by-side DINOv2 training: torch reference components vs the rebuild.

Answers BASELINE.json's correctness north star ("loss-curve parity with the
PyTorch reference within run-to-run noise") with direct evidence: both sides
start from CONVERTER-IDENTICAL weights, consume IDENTICAL pre-generated
views and iBOT masks, use the same schedule values, and step their own full
optimizer + EMA-teacher pipelines; per-step losses are compared.

The torch side is composed ONLY of reference components (the vendored
``DinoVisionTransformer``, ``DINOv2ProjectionHead``, ``DINOLoss``,
``IBOTPatchLoss``, the param-group rules of
``_methods/dinov2/utils.py:190-250``, the wd-schedule/freeze hook of
``dinov2.py:600-640``, the EMA hook of ``dinov2.py:641-660``) assembled in
the same order as ``training_step_impl`` (``dinov2.py:259-398``). The
reference's own Trainer cannot run here (pytorch_lightning and the
``lightly`` package are not installed), so this is the closest runnable
composition. KoLeo (weight 0.1) IS exercised: the reference imports
``lightly.loss.KoLeoLoss`` (not installed), so the torch side uses a
reconstruction of the official DINOv2 KoLeo formula (normalize, inner-dot
nearest neighbor excluding self, ``-log(pairwise_distance + eps).mean()``)
that the lightly implementation mirrors; the reference SUMS the two
global-view terms (``dinov2.py:377-380``).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

REF = Path("/root/reference/src/lightly_train")

# Tiny config shared by both sides.
EMBED_DIM = 8
DEPTH = 3
N_HEADS = 2
PATCH = 16
GLOBAL_SIZE = 64   # 4x4 patch grid
LOCAL_SIZE = 32    # 2x2 patch grid
N_LOCAL = 2
OUT_DIM = 32
HIDDEN_DIM = 16
BOTTLENECK_DIM = 8
BATCH = 4
LR = 5e-3
WD_START, WD_END = 0.04, 0.4
CLIP = 3.0
LAYERWISE_DECAY = 0.9
PATCH_EMBED_MULT = 0.2
MOMENTUM_START, MOMENTUM_END = 0.992, 1.0
TOTAL_STEPS = 100
WARMUP_STEPS = 10
TEACHER_TEMP_WARMUP_FRACTION = 0.3
MASK_PROB = 0.5
MASK_RATIO = (0.1, 0.5)
KOLEO_WEIGHT = 0.1


def mount_reference():
    """Stub-import the reference source tree (golden-test pattern)."""
    if "lightly_train" not in sys.modules:
        pkg = types.ModuleType("lightly_train")
        pkg.__path__ = [str(REF)]
        sys.modules["lightly_train"] = pkg
    if "lightning_utilities" not in sys.modules:
        lu = types.ModuleType("lightning_utilities")
        lu.__path__ = []
        core = types.ModuleType("lightning_utilities.core")
        core.__path__ = []
        imports = types.ModuleType("lightning_utilities.core.imports")

        class RequirementCache:
            def __init__(self, *args, **kwargs):
                pass

            def __bool__(self):
                return False

        imports.RequirementCache = RequirementCache
        sys.modules["lightning_utilities"] = lu
        sys.modules["lightning_utilities.core"] = core
        sys.modules["lightning_utilities.core.imports"] = imports
    import importlib

    vt = importlib.import_module(
        "lightly_train._models.dinov2_vit.dinov2_vit_src.models."
        "vision_transformer"
    )
    head = importlib.import_module("lightly_train._methods.dinov2.dinov2_head")
    loss = importlib.import_module("lightly_train._methods.dinov2.dinov2_loss")
    return vt, head, loss


def make_data(seed: int, n_steps: int):
    """Pre-generated views + iBOT masks, identical for both sides."""
    rng = np.random.default_rng(seed)
    gh = GLOBAL_SIZE // PATCH
    n_tokens = gh * gh
    steps = []
    for _ in range(n_steps):
        views = [
            rng.normal(size=(BATCH, GLOBAL_SIZE, GLOBAL_SIZE, 3)).astype(
                np.float32
            )
            for _ in range(2)
        ] + [
            rng.normal(size=(BATCH, LOCAL_SIZE, LOCAL_SIZE, 3)).astype(
                np.float32
            )
            for _ in range(N_LOCAL)
        ]
        # Block masks on the 4x4 grid: half the 2B global crops masked with
        # ratio in MASK_RATIO (<= 50% so the fixed budget captures all).
        masks = np.zeros((2 * BATCH, n_tokens), bool)
        n_masked_crops = int(2 * BATCH * MASK_PROB)
        for c in range(n_masked_crops):
            ratio = rng.uniform(*MASK_RATIO)
            k = max(int(n_tokens * ratio), 1)
            idx = rng.choice(n_tokens, size=k, replace=False)
            masks[c, idx] = True
        order = rng.permutation(2 * BATCH)
        masks = masks[order]
        steps.append({"views": views, "masks": masks})
    return steps


def schedules(n_steps: int):
    """Per-step scalar schedule values shared verbatim by both sides."""
    sys.path.insert(0, "/root/repo")
    from lightly_train_tpu._optim import cosine_warmup
    from lightly_train_tpu.ops.ema import cosine_schedule

    lr_fn = cosine_warmup(LR, TOTAL_STEPS, WARMUP_STEPS)
    out = []
    for t in range(n_steps):
        lr = float(lr_fn(t))
        wd = float(cosine_schedule(t, TOTAL_STEPS, WD_START, WD_END))
        m = float(
            cosine_schedule(t, TOTAL_STEPS, MOMENTUM_START, MOMENTUM_END)
        )
        warm = max(int(TEACHER_TEMP_WARMUP_FRACTION * TOTAL_STEPS), 1)
        frac = min(t / warm, 1.0)
        tt = 0.04 + frac * (0.07 - 0.04)
        out.append({"lr": lr, "wd": wd, "momentum": m, "teacher_temp": tt})
    return out


# ---------------------------------------------------------------------------
# Torch side
# ---------------------------------------------------------------------------


class TorchDINOv2:
    """Reference components assembled per ``training_step_impl``."""

    def __init__(self, seed: int = 0, koleo_weight: float = KOLEO_WEIGHT):
        import torch

        self.koleo_weight = koleo_weight

        vt, head_mod, loss_mod = mount_reference()
        torch.manual_seed(seed)
        self.torch = torch
        self.backbone = vt._vit_test(
            patch_size=PATCH, init_values=1e-5, img_size=224
        )
        with torch.no_grad():
            for p in self.backbone.parameters():
                if p.ndim >= 1:
                    p.add_(torch.randn_like(p) * 0.02)
        self.dino_head = head_mod.DINOv2ProjectionHead(
            in_dim=EMBED_DIM, out_dim=OUT_DIM, hidden_dim=HIDDEN_DIM,
            bottleneck_dim=BOTTLENECK_DIM,
        )
        self.ibot_head = head_mod.DINOv2ProjectionHead(
            in_dim=EMBED_DIM, out_dim=OUT_DIM, hidden_dim=HIDDEN_DIM,
            bottleneck_dim=BOTTLENECK_DIM,
        )
        import copy

        self.t_backbone = copy.deepcopy(self.backbone)
        self.t_dino_head = copy.deepcopy(self.dino_head)
        self.t_ibot_head = copy.deepcopy(self.ibot_head)
        for m in (self.t_backbone, self.t_dino_head, self.t_ibot_head):
            for p in m.parameters():
                p.requires_grad_(False)
        self.dino_loss = loss_mod.DINOLoss(out_dim=OUT_DIM)
        self.ibot_loss = loss_mod.IBOTPatchLoss(patch_out_dim=OUT_DIM)
        self.opt = self._build_optimizer()

    def _build_optimizer(self):
        """Param groups per ``utils.py:get_optimizer_with_decay``."""
        import torch

        def vit_lr_decay_rate(name, lr_decay_rate, num_layers):
            # Inlined from reference utils.py:155-188 (importing utils pulls
            # torchvision via optimizer_args; not available here).
            layer_id = num_layers + 1
            if (
                "pos_embed" in name or "patch_embed" in name
                or "mask_token" in name or "cls_token" in name
                or "register_tokens" in name
            ):
                layer_id = 0
            elif "blocks." in name and "residual." not in name:
                layer_id = int(name[name.find("blocks."):].split(".")[1]) + 1
            return lr_decay_rate ** (num_layers + 1 - layer_id)

        groups = []
        for name, p in self.backbone.named_parameters():
            rate = vit_lr_decay_rate(name, LAYERWISE_DECAY, DEPTH)
            wd_on = not (
                name.endswith(".bias") or "norm" in name or "gamma" in name
            )
            if "patch_embed" in name:
                rate *= PATCH_EMBED_MULT
            groups.append(
                {"params": [p], "name": f"backbone.{name}", "lr": LR * rate,
                 "decay_rate": rate, "weight_decay": 0.04 if wd_on else 0.0,
                 "wd_on": wd_on}
            )
        for prefix, module in (
            ("dino_head", self.dino_head), ("ibot_head", self.ibot_head),
        ):
            for name, p in module.named_parameters():
                full = f"{prefix}.{name}"
                wd_on = not (
                    name.endswith(".bias") or "norm" in name
                    or "gamma" in name
                )
                groups.append(
                    {"params": [p], "name": full, "lr": LR, "decay_rate": 1.0,
                     "weight_decay": 0.04 if wd_on else 0.0, "wd_on": wd_on}
                )
        return torch.optim.AdamW(
            groups, lr=LR, betas=(0.9, 0.999), eps=1e-8
        )

    def _heads_cls(self, backbone, dino_head, x, masks=None):
        out = backbone.forward_features(x, masks=masks)
        return out["x_norm_clstoken"], out["x_norm_patchtokens"]

    def _koleo(self, x, eps: float = 1e-8):
        """Official DINOv2 KoLeoLoss (reconstruction; the reference imports
        the equivalent ``lightly.loss.KoLeoLoss``, unavailable here)."""
        torch = self.torch
        F = torch.nn.functional
        x = F.normalize(x, p=2, dim=-1, eps=eps)
        with torch.no_grad():
            dots = x @ x.t()
            n = x.shape[0]
            dots.view(-1)[:: n + 1].fill_(-1)
            nn_idx = dots.max(dim=1).indices
        dist = F.pairwise_distance(x, x[nn_idx], eps=eps)
        return -torch.log(dist + eps).mean()

    def step(self, views_np: List[np.ndarray], masks_np: np.ndarray,
             sched: Dict[str, float], t: int) -> Dict[str, float]:
        torch = self.torch
        B = BATCH
        g = [torch.from_numpy(v).permute(0, 3, 1, 2).contiguous()
             for v in views_np[:2]]
        locals_t = [torch.from_numpy(v).permute(0, 3, 1, 2).contiguous()
                    for v in views_np[2:]]
        global_views = torch.cat(g)
        collated_masks = torch.from_numpy(masks_np)
        mask_indices_list = collated_masks.flatten().nonzero().flatten()
        masks_weight = (
            (1 / collated_masks.sum(-1).clamp(min=1.0))
            .unsqueeze(-1)
            .expand_as(collated_masks)[collated_masks]
        )
        n_masked_patches = int(mask_indices_list.shape[0])
        teacher_temp = sched["teacher_temp"]

        # ---- teacher (dinov2.py:403-474) ----
        with torch.no_grad():
            cls, patches = self._heads_cls(self.t_backbone, None, global_views)
            cls = torch.cat((cls[B:], cls[:B]))
            t_dino = self.t_dino_head(cls)
            masked_patches = torch.index_select(
                patches.flatten(0, 1), 0, mask_indices_list
            )
            t_ibot = self.t_ibot_head(masked_patches)
            t_dino_centered = self.dino_loss.softmax_center_teacher(
                t_dino, teacher_temp=teacher_temp
            ).view(2, -1, OUT_DIM)
            self.dino_loss.update_center(t_dino)
            t_ibot_u = t_ibot.unsqueeze(0)
            t_ibot_centered = self.ibot_loss.softmax_center_teacher(
                t_ibot_u, teacher_temp=teacher_temp
            ).squeeze(0)
            self.ibot_loss.update_center(t_ibot_u)

        # ---- student (dinov2.py:475-538) ----
        s_cls, s_patches = self._heads_cls(
            self.backbone, None, global_views, masks=collated_masks
        )
        s_dino_g = self.dino_head(s_cls)
        s_masked = torch.index_select(
            s_patches.flatten(0, 1), 0, mask_indices_list
        )
        s_ibot = self.ibot_head(s_masked)
        local_views = torch.cat(locals_t)
        l_cls, _ = self._heads_cls(self.backbone, None, local_views)
        s_dino_l = self.dino_head(l_cls)

        # ---- losses (dinov2.py:333-386) ----
        n_g_terms = 2
        n_l_terms = max(N_LOCAL * 2, 1)
        dino_global = self.dino_loss.forward(
            student_output_list=[s_dino_g],
            teacher_out_softmaxed_centered_list=[
                t_dino_centered.flatten(0, 1)
            ],
        ) * 2 / (n_g_terms + n_l_terms)
        dino_local = self.dino_loss.forward(
            student_output_list=s_dino_l.chunk(N_LOCAL),
            teacher_out_softmaxed_centered_list=t_dino_centered,
        ) / (n_g_terms + n_l_terms)
        ibot = self.ibot_loss.forward_masked(
            student_patch_tokens_masked=s_ibot,
            teacher_patch_tokens_masked=t_ibot_centered,
            student_masks_flat=collated_masks,
            n_masked_patches=n_masked_patches,
            masks_weight=masks_weight,
        )
        # KoLeo on before-head student global CLS, SUMMED over the two
        # views (dinov2.py:377-388).
        koleo = self._koleo(s_cls[:B]) + self._koleo(s_cls[B:])
        loss = dino_global + dino_local + ibot + self.koleo_weight * koleo

        # ---- optimizer (utils + dinov2.py:600-640 hook semantics) ----
        self.opt.zero_grad(set_to_none=True)
        loss.backward()
        params = [
            p for group in self.opt.param_groups for p in group["params"]
        ]
        torch.nn.utils.clip_grad_norm_(params, CLIP)
        for group in self.opt.param_groups:
            group["lr"] = sched["lr"] * group["decay_rate"]
            if group["wd_on"]:
                group["weight_decay"] = sched["wd"]
        self.opt.step()

        # ---- EMA (dinov2.py:641-660) ----
        m = sched["momentum"]
        with torch.no_grad():
            for s_mod, t_mod in (
                (self.backbone, self.t_backbone),
                (self.dino_head, self.t_dino_head),
                (self.ibot_head, self.t_ibot_head),
            ):
                for ps, pt in zip(s_mod.parameters(), t_mod.parameters()):
                    pt.mul_(m).add_(ps, alpha=1.0 - m)

        return {
            "loss": float(loss.detach()),
            "dino": float((dino_global + dino_local).detach()),
            "ibot": float(ibot.detach()),
            "koleo": float(koleo.detach()),
        }

    def export_params(self) -> Dict[str, np.ndarray]:
        """Initial weights for the converter (flax side starts identical)."""
        sd = {k: v.detach().numpy() for k, v in
              self.backbone.state_dict().items()}
        heads = {}
        for prefix, module in (
            ("dino_head", self.dino_head), ("ibot_head", self.ibot_head),
        ):
            for k, v in module.state_dict().items():
                heads[f"{prefix}.{k}"] = v.detach().numpy()
        return {"backbone": sd, "heads": heads}


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------


def _convert_head(heads_sd: Dict[str, np.ndarray], prefix: str):
    """torch DINOv2ProjectionHead state dict -> flax DINOHead params."""
    g = heads_sd[f"{prefix}.last_layer.parametrizations.weight.original0"]
    v = heads_sd[f"{prefix}.last_layer.parametrizations.weight.original1"]
    return {
        "mlp0": {
            "kernel": heads_sd[f"{prefix}.mlp.0.weight"].T,
            "bias": heads_sd[f"{prefix}.mlp.0.bias"],
        },
        "mlp1": {
            "kernel": heads_sd[f"{prefix}.mlp.2.weight"].T,
            "bias": heads_sd[f"{prefix}.mlp.2.bias"],
        },
        "bottleneck": {
            "kernel": heads_sd[f"{prefix}.mlp.4.weight"].T,
            "bias": heads_sd[f"{prefix}.mlp.4.bias"],
        },
        "prototypes": {"v": v.T, "g": g.reshape(-1)},
    }


class JaxDINOv2:
    """The rebuild's method + optimizer, initialized from torch weights."""

    def __init__(self, torch_params: Dict,
                 koleo_weight: float = KOLEO_WEIGHT):
        sys.path.insert(0, "/root/repo")
        import lightly_train_tpu.methods.dinov2 as dinov2_mod
        from lightly_train_tpu.methods.base import TrainState
        from lightly_train_tpu.methods.dinov2 import DINOv2, DINOv2Args
        from lightly_train_tpu.models.convert import (
            convert_torch_vit_state_dict,
        )
        from lightly_train_tpu.models.vit import ViTConfig, VisionTransformer
        from lightly_train_tpu.models.wrapper import WrappedModel
        from lightly_train_tpu._optim import build_optimizer, cosine_warmup
        from lightly_train_tpu.ops.ema import cosine_schedule

        self.dinov2_mod = dinov2_mod
        cfg = ViTConfig(
            patch_size=PATCH, embed_dim=EMBED_DIM, depth=DEPTH,
            num_heads=N_HEADS, mlp_ratio=1.0, layerscale_init=1e-5,
            pos_embed_size=14,
        )
        wrapped = WrappedModel(
            name="trajtest", module=VisionTransformer(cfg),
            feature_dim=EMBED_DIM, patch_size=PATCH,
        )
        args = DINOv2Args(
            output_dim=OUT_DIM, hidden_dim=HIDDEN_DIM,
            bottleneck_dim=BOTTLENECK_DIM, local_view_count=N_LOCAL,
            global_image_size=GLOBAL_SIZE, local_image_size=LOCAL_SIZE,
            koleo_weight=koleo_weight, freeze_last_layer_steps=0,
            mask_prob=MASK_PROB, mask_ratio=MASK_RATIO,
            layerwise_decay=LAYERWISE_DECAY,
            patch_embed_lr_mult=PATCH_EMBED_MULT,
            momentum_start=MOMENTUM_START, momentum_end=MOMENTUM_END,
            weight_decay_start=WD_START, weight_decay_end=WD_END,
        )
        self.method = DINOv2(wrapped, args)
        rng = jax.random.key(0)
        sample = jnp.zeros((2, GLOBAL_SIZE, GLOBAL_SIZE, 3), jnp.uint8)
        params, model_state, method_state = self.method.init(rng, sample)

        backbone = convert_torch_vit_state_dict(
            torch_params["backbone"], depth=DEPTH
        )
        params = {
            "student": jax.tree_util.tree_map(jnp.asarray, backbone),
            "dino_head": jax.tree_util.tree_map(
                jnp.asarray, _convert_head(torch_params["heads"], "dino_head")
            ),
            "ibot_head": jax.tree_util.tree_map(
                jnp.asarray, _convert_head(torch_params["heads"], "ibot_head")
            ),
        }
        method_state["teacher"] = jax.tree_util.tree_map(jnp.copy, params)
        self.optimizer = build_optimizer(
            self.method.default_optimizer_args().model_copy(
                update={"lr": LR}
            ),
            cosine_warmup(LR, TOTAL_STEPS, WARMUP_STEPS),
            params,
            grad_clip_norm=CLIP,
            lr_scales=self.method.lr_scales(params),
            weight_decay_schedule=self.method.weight_decay_schedule(
                TOTAL_STEPS
            ),
            wd_mask=self.method.wd_mask(params),
        )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            model_state=model_state,
            opt_state=self.optimizer.init(params),
            method_state=method_state,
        )
        self._injected_mask = None
        self._orig_masks_fn = dinov2_mod.random_block_masks
        self._step_fn = self._build_step()

    def _build_step(self):
        import optax

        method, optimizer = self.method, self.optimizer
        # Mask injection: the method samples its own iBOT masks; patch the
        # sampler to return the mask ARGUMENT captured at trace time so the
        # step stays one cached jit program.
        inject = {}
        self.dinov2_mod.random_block_masks = (
            lambda key, n, grid, prob, ratio: (inject["mask"], None)
        )

        def train_step(state, views, mask):
            inject["mask"] = mask
            def lw(params):
                return method.loss_fn(
                    params, state.model_state, state.method_state, views,
                    jax.random.key(0), state.step, TOTAL_STEPS,
                )

            (loss, (ms, mstate, metrics)), grads = jax.value_and_grad(
                lw, has_aux=True
            )(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            updates = method.mask_updates(updates, state.step)
            params = optax.apply_updates(state.params, updates)
            mstate = method.post_update(
                params, mstate, state.step, TOTAL_STEPS
            )
            new_state = state.replace(
                step=state.step + 1, params=params, model_state=ms,
                opt_state=opt_state, method_state=mstate,
            )
            return new_state, loss, metrics

        return jax.jit(train_step)

    def close(self):
        self.dinov2_mod.random_block_masks = self._orig_masks_fn

    def step(self, views_np, masks_np, sched, t):
        del sched  # jax side computes schedules from its own state.step
        views = [jnp.asarray(v) for v in views_np]
        mask = jnp.asarray(masks_np)
        self.state, loss, metrics = self._step_fn(self.state, views, mask)
        return {
            "loss": float(loss),
            "dino": float(metrics["dino_loss"]),
            "ibot": float(metrics["ibot_loss"]),
            "koleo": float(metrics["koleo_loss"]),
        }


def run_parity(n_steps: int, seed: int = 0,
               koleo_weight: float = KOLEO_WEIGHT):
    """Run both sides over identical data; returns per-step records.

    ``koleo_weight=0`` isolates the smooth losses (dino + ibot), whose
    trajectories match to fp accumulation noise. With KoLeo enabled the
    tolerance must be wider: random tiny-net CLS embeddings are
    near-collapsed (NN distances ~1e-3), so KoLeo's -log(distance)
    gradient is near-singular and amplifies fp-level noise into a lasting
    trajectory offset — an artifact of the tiny harness regime, not of the
    implementations (step-0 forward parity holds to ~1e-6 with KoLeo on).
    """
    torch_side = TorchDINOv2(seed=seed, koleo_weight=koleo_weight)
    jax_side = JaxDINOv2(torch_side.export_params(),
                         koleo_weight=koleo_weight)
    data = make_data(seed + 1, n_steps)
    sched = schedules(n_steps)
    records = []
    try:
        for t in range(n_steps):
            r_t = torch_side.step(
                data[t]["views"], data[t]["masks"], sched[t], t
            )
            r_j = jax_side.step(
                data[t]["views"], data[t]["masks"], sched[t], t
            )
            rel = abs(r_t["loss"] - r_j["loss"]) / max(
                abs(r_t["loss"]), 1e-9
            )
            records.append({
                "step": t, "torch_loss": r_t["loss"],
                "jax_loss": r_j["loss"],
                "torch_dino": r_t["dino"], "jax_dino": r_j["dino"],
                "torch_ibot": r_t["ibot"], "jax_ibot": r_j["ibot"],
                "torch_koleo": r_t["koleo"], "jax_koleo": r_j["koleo"],
                "rel_dev": rel,
            })
    finally:
        jax_side.close()
    return records
