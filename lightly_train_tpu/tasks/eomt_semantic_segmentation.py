"""EoMT (Encoder-only Mask Transformer) semantic segmentation.

Rebuild of ``src/lightly_train/_task_models/dinov3_eomt_semantic_segmentation/``
(+ dinov2 variant; 2,442+2,108 LoC): learned queries are appended to the ViT
token stream for the last ``num_joint_blocks`` blocks
(``train_model.py:136-146``); each joint block emits mask + class logits for
deep supervision; the loss is Mask2Former-style (Hungarian-matched class CE +
mask BCE + dice, ``mask_loss.py:28``); attention-mask annealing gates query->
patch attention on the previous block's mask prediction with a probability
annealed to zero (``train_model.py:437-455``), so inference needs no masking.

TPU-native design decisions:
- The trunk re-implements the ViT forward with the SAME parameter layout as
  ``models/vit.VisionTransformer`` so pretrained backbone params load 1:1;
  queries ride as extra prefix tokens (excluded from RoPE).
- Head architecture matches the reference exactly (``task_model.py:195-220,
  636-652``): ONE shared class head (Linear D->C+1), ONE shared mask head
  (3-layer MLP), and two ScaleBlocks upscaling patch features 4x; mask
  logits = einsum(mask_head(queries), upscale(patches)) at the 4x patch
  grid. Predictions are emitted from ``backbone.norm(x)`` BEFORE each joint
  block runs plus once after the final block (num_joint_blocks + 1 deep-
  supervision levels, ``task_model.py:437-505``), and per-level losses are
  SUMMED (``train_model.py:283-299``) — all verified step-by-step against
  the actual torch reference by ``tests/tasks/test_eomt_trajectory.py``.
- Semantic targets are fixed-shape: one binary mask per class (K =
  num_classes), invalid classes masked by cost -> static shapes everywhere.
- Hungarian matching runs on host via ``jax.pure_callback`` (scipy LSA), the
  one sequential/data-dependent step (SURVEY.md §7 hard parts); costs and
  losses are computed on device.
- Mask losses default to the reference's point-sampled formulation
  (``use_point_sampling=True``: CE+dice at importance-sampled label-
  resolution points, torch grid_sample-parity-tested); setting it False
  falls back to full masks at the mask-logit resolution.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.models.vit import Block, ViTConfig, interpolate_pos_embed, _rope_angles
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.tasks.base import TaskArgs, TaskTrainModel


class EoMTSemanticSegmentationArgs(TaskArgs):
    num_classes: int = 150
    num_queries: int = 100
    # None = auto by backbone size: 3 for 12-block ViTs (t/s/b), 4 for
    # ViT-L (24), 5 for ViT-H/g/7b (reference ``train_model.py:136-146``).
    num_joint_blocks: Optional[int] = None
    # Reference ``fix_num_upscale_blocks=True`` -> 2 ScaleBlocks always
    # (``task_model.py:206-214``).
    num_upscale_blocks: int = 2
    ignore_index: int = 255
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    no_object_weight: float = 0.1
    attn_mask_annealing: bool = True
    # Per-joint-block annealing windows; None = the reference's auto phase
    # split (``train_model.py:148-166``): num_joint_blocks + 2 equal phases,
    # block j anneals over phase j + 1.
    attn_mask_annealing_steps_start: Optional[List[int]] = None
    attn_mask_annealing_steps_end: Optional[List[int]] = None
    poly_power: float = 0.9
    # Two-stage warmup (heads, then backbone; ``train_model.py:102``).
    lr_warmup_steps: Tuple[int, int] = (500, 1000)
    # Point-sampled loss (reference ``train_model.py:81-83``): CE+dice at
    # num_points sampled label-resolution coordinates instead of full masks.
    use_point_sampling: bool = True
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    # Active-slot compaction: supervise at most this many classes per image
    # (the classes PRESENT in it — the reference builds targets only for
    # those, ~10/image on ADE20K, under torch dynamic shapes). Static-shape
    # equivalent: top-k presence compaction. Exact whenever every image has
    # <= max_active_slots classes; None supervises all num_classes slots.
    max_active_slots: Optional[int] = 32
    default_steps: int = 40_000
    default_batch_size: int = 16


class _ScaleBlock(nn.Module):
    """2x feature upscaling block (reference ``scale_block.py:19-45``):
    ConvTranspose(k=2, s=2) -> GELU -> depthwise Conv3x3 (no bias) ->
    LayerNorm over channels. Operates on NHWC feature maps."""

    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.ConvTranspose(
            self.dim, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.dim, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.dim, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(x)
        # torch LayerNorm default eps (1e-5), not the flax default (1e-6).
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class _EoMTTrunk(nn.Module):
    """ViT trunk + queries + shared EoMT heads (reference parity).

    Parameter names for backbone pieces mirror ``VisionTransformer`` exactly
    (patch_embed, pos_embed, cls_token, register_tokens, mask_token, block{i},
    norm) so a pretrained artifact's params load directly into this module's
    param tree. EoMT-specific params follow the reference layout
    (``task_model.py:195-214``): ``queries``, ``class_head`` (Linear D->C+1),
    ``mask_head{0,1,2}`` (3-layer MLP with exact GELU), and
    ``upscale{0,1}`` ScaleBlocks (each 2x) so mask logits live on the
    ``2^num_upscale``-times-patch grid.

    Per-level predictions are emitted from ``norm(x)`` (the backbone's final
    LayerNorm, shared) at ENTRY to each joint block plus once after the final
    block (``task_model.py:437-505``); the attention mask for joint block j
    is derived from the level-j mask logits bilinearly downsampled to the
    patch grid and thresholded at 0, with per-query bernoulli disabling at
    probability ``1 - mask_prob[j]`` (``task_model.py:656-672``).
    """

    cfg: ViTConfig
    num_queries: int
    num_joint_blocks: int
    num_classes: int
    num_upscale_blocks: int = 2

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        mask_prob: jax.Array,  # (num_joint_blocks,) annealed probabilities
        rng: Optional[jax.Array],
        train: bool,
        return_factors: bool = False,
    ) -> Tuple[List[Tuple[jax.Array, ...]], Tuple[int, int]]:
        # return_factors: additionally emit the (query embedding, pixel
        # embedding) FACTORS of each level's mask logits
        # (mask = einsum(q_emb, pixels)), so the point-sampled loss can
        # sample pixel features with cheap row gathers instead of
        # per-query scalar gathers in its matching stage.
        cfg = self.cfg
        B, H, W, _ = images.shape
        gh, gw = H // cfg.patch_size, W // cfg.patch_size
        n_prefix = 1 + cfg.num_register_tokens

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            name="patch_embed",
        )(images.astype(cfg.dtype))
        x = x.reshape(B, gh * gw, cfg.embed_dim)
        # Parity with VisionTransformer param tree (unused at fine-tune time).
        self.param("mask_token", nn.initializers.zeros, (cfg.embed_dim,))
        if cfg.use_pos_embed:
            # DINOv2 backbones carry a learned pos table; DINOv3 uses RoPE
            # only (vit.py:383) — creating one here would inject a fresh
            # random table the pretrained artifact can never overwrite.
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=0.02),
                (1, cfg.pos_embed_size * cfg.pos_embed_size, cfg.embed_dim),
            )
            x = x + interpolate_pos_embed(pos_embed, (gh, gw)).astype(x.dtype)
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02),
            (1, 1, cfg.embed_dim),
        )
        tokens = [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(x.dtype)]
        if cfg.num_register_tokens > 0:
            registers = self.param(
                "register_tokens",
                nn.initializers.normal(stddev=0.02),
                (1, cfg.num_register_tokens, cfg.embed_dim),
            )
            tokens.append(
                jnp.broadcast_to(
                    registers, (B, cfg.num_register_tokens, cfg.embed_dim)
                ).astype(x.dtype)
            )
        x = jnp.concatenate(tokens + [x], axis=1)

        rope = None
        if cfg.use_rope:
            head_dim = cfg.embed_dim // cfg.num_heads
            cos, sin = _rope_angles((gh, gw), head_dim, cfg.rope_base)
            rope = (cos.astype(cfg.dtype), sin.astype(cfg.dtype))

        dp = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        n_plain = cfg.depth - self.num_joint_blocks
        for i in range(n_plain):
            x = Block(
                cfg, drop_path=dp[i], num_prefix_tokens=n_prefix,
                name=f"block{i}",
            )(x, rope, deterministic=not train)

        # ---- joint blocks with queries + shared heads ----
        queries = self.param(
            "queries",
            nn.initializers.normal(stddev=0.02),
            (1, self.num_queries, cfg.embed_dim),
        )
        q = jnp.broadcast_to(
            queries, (B, self.num_queries, cfg.embed_dim)
        ).astype(x.dtype)
        x = jnp.concatenate([q, x], axis=1)
        Q = self.num_queries
        n_prefix_joint = Q + n_prefix
        N_total = x.shape[1]

        # Shared modules (instantiated once; reused at every level).
        norm = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="norm")
        class_head = nn.Dense(
            self.num_classes + 1, dtype=cfg.dtype, name="class_head"
        )
        mask_head = [
            nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name=f"mask_head{i}")
            for i in range(3)
        ]
        upscale = [
            _ScaleBlock(cfg.embed_dim, cfg.dtype, name=f"upscale{i}")
            for i in range(self.num_upscale_blocks)
        ]
        mh = gh * (2 ** self.num_upscale_blocks)
        mw = gw * (2 ** self.num_upscale_blocks)

        def predict(x_tokens: jax.Array):
            """Class + FLAT mask logits from current tokens, via norm(x)
            (reference ``_predict``, ``task_model.py:636-652``)."""
            xn = norm(x_tokens)
            q_tok = xn[:, :Q]
            cls_logits = class_head(q_tok)
            q_emb = q_tok
            for i, layer in enumerate(mask_head):
                q_emb = layer(q_emb)
                if i < 2:
                    q_emb = nn.gelu(q_emb, approximate=False)
            p = xn[:, n_prefix_joint:].reshape(B, gh, gw, cfg.embed_dim)
            for sb in upscale:
                p = sb(p)
            mask_logits = jnp.einsum(
                "bqd,bhwd->bqhw", q_emb, p
            )  # no scaling (reference einsum, ``task_model.py:648-650``)
            out = (
                cls_logits.astype(jnp.float32),
                mask_logits.astype(jnp.float32).reshape(B, Q, mh * mw),
            )
            if return_factors:
                out = out + (
                    q_emb.astype(jnp.float32),
                    p.astype(jnp.float32),
                )
            return out

        from lightly_train_tpu.ops.point_sampling import _uniform

        outputs: List[Tuple[jax.Array, jax.Array]] = []
        for j in range(self.num_joint_blocks):
            i = n_plain + j
            # Predict BEFORE the block runs; level-j logits gate block j.
            out_l = predict(x)
            mask_l = out_l[1]
            outputs.append(out_l)
            attn_mask = None
            if train:
                # Downsample level-j mask logits to the patch grid (torch
                # F.interpolate bilinear, no antialias) and threshold at 0.
                interp = jax.image.resize(
                    mask_l.reshape(B, Q, mh, mw), (B, Q, gh, gw),
                    "bilinear", antialias=False,
                )
                allowed = (interp > 0).reshape(B, Q, gh * gw)
                if rng is not None:
                    # Per-query disable at prob 1 - mask_prob[j]
                    # (reference ``_disable_attn_mask``).
                    u = _uniform(jax.random.fold_in(rng, j), (B, Q))
                    allowed = allowed | (u > mask_prob[j])[..., None]
                # Rows 0..Q (queries): prefix columns always open, patch
                # columns gated; rows Q.. attend to everything.
                top = jnp.concatenate(
                    [jnp.ones((B, Q, n_prefix_joint), bool), allowed], axis=2
                )
                rest = jnp.ones((B, N_total - Q, N_total), bool)
                attn_mask = jnp.concatenate([top, rest], axis=1)[:, None]
            x = Block(
                cfg, drop_path=dp[i], num_prefix_tokens=n_prefix_joint,
                name=f"block{i}",
            )(x, rope, deterministic=not train, attn_mask=attn_mask)
        outputs.append(predict(x))
        return outputs, (mh, mw)


# ---------------------------------------------------------------------------
# Hungarian matching (host callback)
# ---------------------------------------------------------------------------


def _hungarian_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """cost: (B, Q, K) float32; valid: (B, K) bool.

    Returns (B, K) int32: for each target k the assigned query index (or -1).
    """
    from scipy.optimize import linear_sum_assignment

    B, Q, K = cost.shape
    out = np.full((B, K), -1, dtype=np.int32)
    for b in range(B):
        cols = np.where(valid[b])[0]
        if len(cols) == 0:
            continue
        sub = cost[b][:, cols]  # (Q, k)
        sub = np.nan_to_num(sub, nan=1e6, posinf=1e6, neginf=-1e6)
        rows, col_idx = linear_sum_assignment(sub)
        for r, c in zip(rows, col_idx):
            out[b, cols[c]] = r
    return out


def hungarian_match_host(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """Optimal assignment via host callback (scipy LSA)."""
    B, Q, K = cost.shape
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((B, K), jnp.int32),
        cost,
        valid,
        vmap_method="sequential",
    )


_BIG = 1e9


def greedy_match(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """Device-native greedy assignment (no host callback).

    Repeatedly takes the globally cheapest remaining (query, target) pair —
    a standard near-optimal Hungarian approximation that stays entirely
    inside the jitted program. min(Q, K) sequential lax iterations of an
    O(Q*K) argmin each.
    """
    B, Q, K = cost.shape
    c0 = jnp.where(valid[:, None, :], cost.astype(jnp.float32), _BIG)

    def body(_, carry):
        assign, c = carry
        flat = c.reshape(B, Q * K)
        idx = jnp.argmin(flat, axis=1)
        q = (idx // K).astype(jnp.int32)
        k = (idx % K).astype(jnp.int32)
        ok = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0] < _BIG / 2

        def upd(a, cc, qq, kk, o):
            a = a.at[kk].set(jnp.where(o, qq, a[kk]))
            cc = jnp.where(
                o,
                cc.at[qq, :].set(_BIG).at[:, kk].set(_BIG),
                cc,
            )
            return a, cc

        assign, c = jax.vmap(upd)(assign, c, q, k, ok)
        return assign, c

    init = (jnp.full((B, K), -1, jnp.int32), c0)
    assign, _ = jax.lax.fori_loop(0, min(Q, K), body, init)
    return assign


def hungarian_match(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """Matching dispatcher.

    ``auto`` picks the DEVICE-NATIVE greedy matcher on TPU and on
    multi-device CPU, the host Hungarian (scipy LSA, optimal) on
    single-device CPU:

    - On TPU a per-step ``pure_callback`` serializes the pipeline on a
      device->host->device round trip (and relay-attached TPUs don't
      support host callbacks at all). Training-quality evidence for the
      greedy matcher: ``docs/task_convergence_r5_det.json`` — identical
      loss trajectories vs host Hungarian on the same data/seed.
    - On multi-device CPU, XLA's in-process collectives deadlock when a
      host callback shares the program with cross-device all-reduces
      (observed on the 8-device test mesh).
    - Single-device CPU (the torch-parity test platform) keeps the exact
      reference semantics (``matcher.py:34``).

    Override with LIGHTLY_TRAIN_MATCHER=hungarian|greedy.
    """
    import os

    choice = os.environ.get("LIGHTLY_TRAIN_MATCHER", "auto")
    if choice == "hungarian":
        return hungarian_match_host(cost, valid)
    if choice == "greedy":
        return greedy_match(cost, valid)
    platform = jax.devices()[0].platform
    if platform != "cpu" or jax.device_count() > 1:
        return greedy_match(cost, valid)
    return hungarian_match_host(cost, valid)


def _dice_loss(pred_sigmoid: jax.Array, target: jax.Array) -> jax.Array:
    """(..., N) -> (...) dice loss."""
    num = 2.0 * jnp.sum(pred_sigmoid * target, axis=-1)
    den = jnp.sum(pred_sigmoid, axis=-1) + jnp.sum(target, axis=-1)
    return 1.0 - (num + 1.0) / (den + 1.0)


def mask_classification_loss(
    cls_logits: jax.Array,  # (B, Q, C+1)
    mask_logits: jax.Array,  # (B, Q, N)
    targets: jax.Array,  # (B, K, N) binary masks
    valid: jax.Array,  # (B, K)
    tgt_classes: jax.Array,  # (B, K)
    *,
    num_classes: int,
    class_weight: float,
    mask_weight: float,
    dice_weight: float,
    no_object_weight: float,
) -> jax.Array:
    """Hungarian-matched Mask2Former loss shared by EoMT semantic / instance /
    panoptic heads (reference ``MaskClassificationLoss``, ``mask_loss.py:28``)."""
    B, Q, N = mask_logits.shape
    cls_prob = jax.nn.softmax(cls_logits, axis=-1)
    cost_class = -jnp.take_along_axis(
        cls_prob[:, :, None, :],
        tgt_classes[:, None, :, None].repeat(Q, 1),
        axis=-1,
    )[..., 0]
    pred_sig = jax.nn.sigmoid(mask_logits)
    pos = jax.nn.softplus(-mask_logits)
    neg = jax.nn.softplus(mask_logits)
    cost_bce = (
        jnp.einsum("bqn,bkn->bqk", pos, targets)
        + jnp.einsum("bqn,bkn->bqk", neg, 1.0 - targets)
    ) / N
    inter = jnp.einsum("bqn,bkn->bqk", pred_sig, targets)
    sums = pred_sig.sum(-1)[:, :, None] + targets.sum(-1)[:, None, :]
    cost_dice = 1.0 - (2 * inter + 1.0) / (sums + 1.0)
    cost = (
        class_weight * cost_class
        + mask_weight * cost_bce
        + dice_weight * cost_dice
    )
    assignment = hungarian_match(jax.lax.stop_gradient(cost), valid)
    assigned = assignment >= 0
    safe_idx = jnp.maximum(assignment, 0)

    matched_q = jnp.full((B, Q), num_classes, dtype=jnp.int32)
    matched_q = jax.vmap(
        lambda mq, idx, cls, ok: mq.at[jnp.where(ok, idx, Q)].set(
            jnp.where(ok, cls, num_classes), mode="drop"
        )
    )(matched_q, safe_idx, tgt_classes, assigned)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, matched_q[..., None], axis=-1)[..., 0]
    w = jnp.where(matched_q == num_classes, no_object_weight, 1.0)
    loss_class = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

    pred_matched = jnp.take_along_axis(mask_logits, safe_idx[..., None], axis=1)
    sig_matched = jax.nn.sigmoid(pred_matched)
    bce = jnp.mean(
        targets * jax.nn.softplus(-pred_matched)
        + (1.0 - targets) * jax.nn.softplus(pred_matched),
        axis=-1,
    )
    dice = _dice_loss(sig_matched, targets)
    denom = jnp.maximum(jnp.sum(assigned), 1.0)
    loss_mask = jnp.sum(bce * assigned) / denom
    loss_dice = jnp.sum(dice * assigned) / denom
    return (
        class_weight * loss_class
        + mask_weight * loss_mask
        + dice_weight * loss_dice
    )


def _slot_chunk_size(K: int, limit: int = 16) -> int:
    for c in range(min(limit, K), 0, -1):
        if K % c == 0:
            return c
    return 1


def point_sampled_mask_loss(
    cls_logits: jax.Array,  # (B, Q, C+1)
    mask_logits: jax.Array,  # (B, Q, n) at patch grid
    grid_hw: Tuple[int, int],
    id_map: jax.Array,  # (B, H, W) int32 slot ids (out-of-range = background)
    valid: jax.Array,  # (B, K)
    tgt_classes: jax.Array,  # (B, K)
    rng: jax.Array,
    *,
    num_classes: int,
    class_weight: float,
    mask_weight: float,
    dice_weight: float,
    no_object_weight: float,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    factors: Optional[Tuple[jax.Array, jax.Array]] = None,
    slot_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Point-sampled Mask2Former loss (reference ``mask_loss.py:28-54``).

    ``factors``: optional (q_emb (B, Q, D), pixels (B, gh, gw, D)) such
    that ``mask_logits == einsum(q_emb, pixels)`` (the trunk's
    ``return_factors=True`` outputs). When given, the matching stage
    samples the D-dim pixel embedding at the shared points with ROW
    gathers and contracts with q_emb on the MXU — element-granular
    gathers over (B, Q, P) run ~1e8 taps/s on TPU and dominated the step
    without it. Bilinear sampling commutes with the D-contraction, so the
    values match the materialized path up to fp32 rounding order.

    Matching costs use ``num_points`` shared uniform samples; the matched
    CE+dice use importance(uncertainty)+uniform samples per mask — both at
    the LABEL resolution (targets sampled bilinearly from the id map, pred
    logits sampled bilinearly from the patch grid), so high-resolution
    supervision never materializes (B, Q, H, W) upsampled masks. Static
    shapes throughout: fixed point budgets, per-slot chunked ``lax.scan``.

    ``slot_ids`` (B, K) optional per-image id list: slot k supervises
    ``id_map == slot_ids[b, k]`` (the active-slot compaction path — the
    reference builds targets only for the classes PRESENT in each image,
    so its per-image slot count is ~10, not ``num_classes``; compaction
    recovers that sparsity under static shapes). ``None`` keeps slot k ==
    id k.
    """
    from lightly_train_tpu.ops.point_sampling import (
        _uniform,
        bilinear_point_sample,
        bilinear_point_sample_rows,
        sample_id_indicator,
        sample_slot_indicator,
        uncertainty_point_coords,
    )

    # Keep XLA from fusing the mask-logits producer (the bqd,bhwd einsum +
    # upscale stack) into the many gather consumers below — a fused
    # producer would recompute per consumer. (Identity op; gradients pass
    # through unchanged.)
    cls_logits, mask_logits = jax.lax.optimization_barrier(
        (cls_logits, mask_logits)
    )

    B, Q, n = mask_logits.shape
    gh, gw = grid_hw
    K = valid.shape[1]
    P = num_points
    k_match, k_loss = jax.random.split(rng)
    pred_grid = mask_logits.reshape(B, Q, gh, gw)

    # ---- matching costs at per-image uniform points (HF matcher draws
    # rand(1, P, 2) per image; one (B, P, 2) batch draw is equivalent) ----
    coords_m = _uniform(k_match, (B, P, 2))
    if factors is not None:
        q_emb, pixels = factors
        pix_pts = bilinear_point_sample_rows(pixels, coords_m)  # (B, P, D)
        pred_pts = jnp.einsum("bqd,bpd->bqp", q_emb, pix_pts)
    else:
        pred_pts = bilinear_point_sample(pred_grid, coords_m)  # (B, Q, P)
    tgt_pts = sample_id_indicator(
        id_map, coords_m, K, slot_ids=slot_ids
    )  # (B, K, P)

    cls_prob = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    cost_class = -jnp.take_along_axis(
        cls_prob[:, :, None, :],
        tgt_classes[:, None, :, None].repeat(Q, 1),
        axis=-1,
    )[..., 0]
    pp = pred_pts.astype(jnp.float32)
    pos = jax.nn.softplus(-pp)
    neg = jax.nn.softplus(pp)
    cost_bce = (
        jnp.einsum("bqp,bkp->bqk", pos, tgt_pts)
        + jnp.einsum("bqp,bkp->bqk", neg, 1.0 - tgt_pts)
    ) / P
    pred_sig = jax.nn.sigmoid(pp)
    inter = jnp.einsum("bqp,bkp->bqk", pred_sig, tgt_pts)
    sums = pred_sig.sum(-1)[:, :, None] + tgt_pts.sum(-1)[:, None, :]
    cost_dice = 1.0 - (2 * inter + 1.0) / (sums + 1.0)
    cost = (
        class_weight * cost_class
        + mask_weight * cost_bce
        + dice_weight * cost_dice
    )
    assignment = hungarian_match(jax.lax.stop_gradient(cost), valid)
    assigned = assignment >= 0
    safe_idx = jnp.maximum(assignment, 0)

    # ---- class CE over queries ----
    matched_q = jnp.full((B, Q), num_classes, dtype=jnp.int32)
    matched_q = jax.vmap(
        lambda mq, idx, cls, ok: mq.at[jnp.where(ok, idx, Q)].set(
            jnp.where(ok, cls, num_classes), mode="drop"
        )
    )(matched_q, safe_idx, tgt_classes, assigned)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, matched_q[..., None], axis=-1)[..., 0]
    w = jnp.where(matched_q == num_classes, no_object_weight, 1.0)
    loss_class = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

    # ---- point-sampled CE + dice per matched slot, chunked over K ----
    pred_matched = jnp.take_along_axis(
        mask_logits, safe_idx[..., None], axis=1
    ).reshape(B, K, gh, gw)
    kc = _slot_chunk_size(K)
    nk = K // kc
    pred_chunks = pred_matched.reshape(B, nk, kc, gh, gw).transpose(
        1, 0, 2, 3, 4
    )  # (nk, B, kc, gh, gw)
    if slot_ids is None:
        slot_chunks = jnp.arange(K, dtype=id_map.dtype).reshape(nk, kc)
    else:
        slot_chunks = slot_ids.astype(id_map.dtype).reshape(
            B, nk, kc
        ).transpose(1, 0, 2)  # (nk, B, kc)
    keys = jax.random.split(k_loss, nk)

    def chunk_losses(xs):
        pred_c, slots_c, key = xs  # (B, kc, gh, gw), (kc,), key
        flat_pred = pred_c.reshape(B * kc, gh, gw)
        coords = uncertainty_point_coords(
            key, jax.lax.stop_gradient(flat_pred).astype(jnp.float32),
            P, oversample_ratio, importance_sample_ratio,
        ).reshape(B, kc, P, 2)
        tgt = sample_slot_indicator(id_map, coords, slots_c)  # (B, kc, P)
        pred_p = bilinear_point_sample(
            flat_pred[:, None, :, :], coords.reshape(B * kc, P, 2)
        ).reshape(B, kc, P).astype(jnp.float32)
        bce = jnp.mean(
            tgt * jax.nn.softplus(-pred_p)
            + (1.0 - tgt) * jax.nn.softplus(pred_p),
            axis=-1,
        )  # (B, kc)
        sig = jax.nn.sigmoid(pred_p)
        num = 2.0 * jnp.sum(sig * tgt, axis=-1)
        den = jnp.sum(sig, axis=-1) + jnp.sum(tgt, axis=-1)
        dice = 1.0 - (num + 1.0) / (den + 1.0)
        return bce, dice

    bce_chunks, dice_chunks = jax.lax.map(
        chunk_losses, (pred_chunks, slot_chunks, keys)
    )  # (nk, B, kc)
    bce = bce_chunks.transpose(1, 0, 2).reshape(B, K)
    dice = dice_chunks.transpose(1, 0, 2).reshape(B, K)

    use = (assigned & valid).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(use), 1.0)  # global num_masks (GSPMD psum)
    loss_mask = jnp.sum(bce * use) / denom
    loss_dice = jnp.sum(dice * use) / denom
    return (
        class_weight * loss_class
        + mask_weight * loss_mask
        + dice_weight * loss_dice
    )


class EoMTSemanticSegmentationTrainModel(TaskTrainModel):
    task = "semantic_segmentation"
    transform_kind = "semantic_segmentation"

    def __init__(self, wrapped: WrappedModel, args: EoMTSemanticSegmentationArgs):
        super().__init__(wrapped, args)
        self.args: EoMTSemanticSegmentationArgs = args
        cfg: ViTConfig = wrapped.module.cfg  # type: ignore[attr-defined]
        self.cfg = cfg
        if args.num_joint_blocks is None:
            # Scale with ViT size (reference ``train_model.py:136-146``:
            # vitt/s/b -> 3, vitl -> 4, vith/g/7b -> 5), keyed by depth.
            depth = cfg.depth
            auto = 3 if depth <= 12 else (4 if depth <= 24 else 5)
            args = args.model_copy(update={
                "num_joint_blocks": min(auto, depth)
            })
            self.args = args
        self.trunk = _EoMTTrunk(
            cfg,
            num_queries=args.num_queries,
            num_joint_blocks=args.num_joint_blocks,
            num_classes=args.num_classes,
            num_upscale_blocks=args.num_upscale_blocks,
        )

    # -- annealing schedule (host-computed per step, traced in) -------------
    def _anneal_windows(self, total_steps: int) -> Tuple[np.ndarray, np.ndarray]:
        """Per-joint-block [start, end) annealing step windows. Auto = the
        reference phase split (``train_model.py:148-166``): num_joint_blocks+2
        equal phases; block j anneals over phase j + 1."""
        a = self.args
        if (a.attn_mask_annealing_steps_start is not None
                and a.attn_mask_annealing_steps_end is not None):
            return (np.asarray(a.attn_mask_annealing_steps_start, np.float32),
                    np.asarray(a.attn_mask_annealing_steps_end, np.float32))
        jb = a.num_joint_blocks
        n_phases = jb + 2
        phases = [round(i * total_steps / n_phases) for i in range(n_phases + 1)]
        return (np.asarray(phases[1:-2], np.float32),
                np.asarray(phases[2:-1], np.float32))

    def _mask_probs(self, step: jax.Array, total_steps: int) -> jax.Array:
        """Per-joint-block annealed masking probabilities.

        Matches the reference exactly (``train_model.py:283-305, 438-455``):
        probs start at 1 and are recomputed at the END of each step with
        ``current_iter = step``, so the probs USED at step s equal
        ``anneal(s - 1)``; anneal is 1 before the window, 0 after, and
        ``(1 - progress) ** poly_power`` inside it."""
        if not self.args.attn_mask_annealing:
            return jnp.zeros((self.args.num_joint_blocks,), jnp.float32)
        starts, ends = self._anneal_windows(total_steps)
        cur = jnp.asarray(step, jnp.float32) - 1.0
        progress = (cur - starts) / np.maximum(ends - starts, 1.0)
        inside = (1.0 - jnp.clip(progress, 0.0, 1.0)) ** self.args.poly_power
        return jnp.where(
            cur < starts, 1.0, jnp.where(cur >= ends, 0.0, inside)
        )

    def init(self, rng, sample_batch):
        k1, k2 = jax.random.split(rng)
        variables = self.trunk.init(
            {"params": k1, "droppath": k2},
            sample_batch["images"].astype(self.cfg.dtype),
            jnp.zeros((self.args.num_joint_blocks,), jnp.float32),
            None,
            False,
        )
        return {"backbone": variables["params"]}, {}

    def _targets_from_mask(self, masks: jax.Array, grid_hw: Tuple[int, int]):
        """(B, H, W) int masks -> (B, K, n) binary target masks at patch res
        + (B, K) valid flags, K = num_classes."""
        K = self.args.num_classes
        gh, gw = grid_hw
        onehot = jax.nn.one_hot(
            jnp.where(masks == self.args.ignore_index, K, masks), K + 1,
            axis=-1,
        )[..., :K]  # (B, H, W, K); ignore pixels in no class
        # Downsample by average pooling to patch grid, threshold at 0.
        B, H, W, _ = onehot.shape
        t = jax.image.resize(onehot, (B, gh, gw, K), "linear")
        t = (t > 0.5).astype(jnp.float32)
        t = t.transpose(0, 3, 1, 2).reshape(B, K, gh * gw)
        valid = jnp.any(
            jax.nn.one_hot(
                jnp.where(masks == self.args.ignore_index, K, masks), K + 1
            )[..., :K] > 0,
            axis=(1, 2),
        )  # (B, K) class present in image
        return t, valid

    def _class_presence(self, masks: jax.Array) -> jax.Array:
        """(B, H, W) labels -> (B, K) presence flags without one-hot blowup."""
        K = self.args.num_classes
        safe = jnp.where(
            masks == self.args.ignore_index, K, masks
        ).astype(jnp.int32)
        counts = jax.vmap(
            lambda m: jnp.bincount(m.reshape(-1), length=K + 1)
        )(safe)
        return counts[:, :K] > 0

    def loss_fn(self, params, model_state, batch, rng, step):
        a = self.args
        images = batch["images"]
        masks = batch["masks"]
        # Annealing horizon: the RESOLVED run length (set by the runtime;
        # falls back to the family default when driven standalone).
        total_steps = getattr(self, "total_steps", None) or a.default_steps
        mask_probs = self._mask_probs(step, total_steps)
        # Disjoint PRNG streams: the trunk folds small ints for the per-
        # block annealing bernoullis, so loss-side fold_in(rng, li) would
        # REUSE those exact keys; split once instead.
        rng_trunk, rng_loss, rng_dp = jax.random.split(rng, 3)
        outputs, grid_hw = self.trunk.apply(
            {"params": params["backbone"]},
            images.astype(self.cfg.dtype),
            mask_probs,
            rng_trunk,
            True,
            return_factors=a.use_point_sampling,
            rngs={"droppath": rng_dp},
        )
        tgt_classes = jnp.arange(a.num_classes)[None, :].repeat(
            images.shape[0], 0
        )  # semantic: target k IS class k

        slot_ids = None
        if a.use_point_sampling:
            # Labels double as the slot-id map (class k == slot k); ignore
            # pixels map to an out-of-range id -> background for every slot.
            id_map = jnp.where(
                masks == a.ignore_index, -1, masks
            ).astype(jnp.int32)
            valid = self._class_presence(masks)
            targets = None
            K = a.num_classes
            Kc = K if a.max_active_slots is None else min(
                a.max_active_slots, K
            )
            if Kc < K:
                # Active-slot compaction: keep the present classes (ascending
                # id), pad with absent ones flagged invalid. Exact vs the
                # all-slots path whenever #present <= Kc (invalid slots are
                # never matched and contribute 0 to every loss term).
                score = jnp.where(
                    valid,
                    2.0 * K - jnp.arange(K, dtype=jnp.float32)[None, :],
                    -jnp.arange(K, dtype=jnp.float32)[None, :],
                )
                vals, slot_ids = jax.lax.top_k(score, Kc)
                valid = vals > float(K)
                tgt_classes = slot_ids
        else:
            targets, valid = self._targets_from_mask(masks, grid_hw)

        total = 0.0
        metrics: Dict[str, jax.Array] = {}
        for li, out_l in enumerate(outputs):
            cls_logits, mask_logits = out_l[0], out_l[1]
            if a.use_point_sampling:
                loss_l = point_sampled_mask_loss(
                    cls_logits, mask_logits, grid_hw, id_map, valid,
                    tgt_classes, jax.random.fold_in(rng_loss, li),
                    num_classes=a.num_classes,
                    class_weight=a.class_weight,
                    mask_weight=a.mask_weight,
                    dice_weight=a.dice_weight,
                    no_object_weight=a.no_object_weight,
                    num_points=a.num_points,
                    oversample_ratio=a.oversample_ratio,
                    importance_sample_ratio=a.importance_sample_ratio,
                    factors=out_l[2:] if len(out_l) > 2 else None,
                    slot_ids=slot_ids,
                )
            else:
                loss_l = self._single_level_loss(
                    cls_logits, mask_logits, targets, valid, tgt_classes
                )
            # Per-level losses are SUMMED across the num_joint_blocks + 1
            # deep-supervision levels (reference ``loss_total``,
            # ``mask_loss.py:106-124`` over ``train_model.py:283-299``).
            total = total + loss_l
            if li == len(outputs) - 1:
                metrics["loss_final"] = loss_l
        return total, (model_state, metrics)

    def _single_level_loss(self, cls_logits, mask_logits, targets, valid,
                           tgt_classes):
        a = self.args
        return mask_classification_loss(
            cls_logits, mask_logits, targets, valid, tgt_classes,
            num_classes=a.num_classes,
            class_weight=a.class_weight,
            mask_weight=a.mask_weight,
            dice_weight=a.dice_weight,
            no_object_weight=a.no_object_weight,
        )

    # -- inference ----------------------------------------------------------
    def _semantic_logits(self, params, images):
        """Per-pixel class scores (B, H, W, C) — reference ``_forward_logits``
        order exactly (``task_model.py:596-634``): upsample mask LOGITS to
        image resolution (bilinear), sigmoid, einsum with softmax(class)
        over C+1, then drop the no-object column."""
        outputs, (mh, mw) = self.trunk.apply(
            {"params": params["backbone"]},
            images.astype(self.cfg.dtype),
            jnp.zeros((self.args.num_joint_blocks,), jnp.float32),
            None,
            False,
        )
        cls_logits, mask_logits = outputs[-1]
        B = images.shape[0]
        Q = self.args.num_queries
        H, W = images.shape[1:3]
        mask_up = jax.image.resize(
            mask_logits.reshape(B, Q, mh, mw), (B, Q, H, W),
            "bilinear", antialias=False,
        )
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)  # (B, Q, C+1)
        sem = jnp.einsum(
            "bqhw,bqc->bhwc", jax.nn.sigmoid(mask_up), cls_prob
        )
        return sem[..., : self.args.num_classes]

    def _val_semantic_logits(self, params, images):
        """Full-forward at training resolution; tiled above it (reference
        tiled validation, ``dinov3_eomt_semantic_segmentation/train_model.py:
        358-420`` — ``val_tile_size`` is set to the train image_size by
        ``run_task_training``)."""
        from lightly_train_tpu.tasks.tiling import tiled_logits

        ts = getattr(self, "val_tile_size", None)
        H, W = images.shape[1:3]
        if ts is not None and (H > ts or W > ts):
            return tiled_logits(
                lambda t: self._semantic_logits(params, t),
                images, self.args.num_classes, int(ts),
            )
        return self._semantic_logits(params, images)

    def val_step(self, params, model_state, batch):
        images, masks = batch["images"], batch["masks"]
        sample_valid = batch.get("valid")
        sem = self._val_semantic_logits(params, images)
        pred = jnp.argmax(sem, axis=-1)
        valid = masks != self.args.ignore_index
        if sample_valid is not None:
            valid = valid & sample_valid[:, None, None]
        labels = jnp.where(valid, masks, 0)
        nc = self.args.num_classes
        idx = labels * nc + jnp.where(valid, pred, 0)
        cm = jnp.bincount(
            idx.reshape(-1),
            weights=valid.reshape(-1).astype(jnp.float32),
            length=nc * nc,
        ).reshape(nc, nc)
        return {"confusion": cm}

    def val_finalize(self, stats):
        cm = np.asarray(stats["confusion"])
        tp = np.diag(cm)
        union = cm.sum(0) + cm.sum(1) - tp
        present = union > 0
        iou = np.where(present, tp / np.maximum(union, 1e-9), 0.0)
        return {
            "val_miou": float(iou[present].mean()) if present.any() else 0.0
        }

    def predict(self, variables, images):
        """Per-pixel class ids (B, H, W)."""
        return jnp.argmax(
            self._semantic_logits(variables["params"], images), axis=-1
        )

    def predict_tiled(
        self,
        variables,
        images: jax.Array,
        tile_size: int = 512,
        stride: Optional[int] = None,
    ) -> jax.Array:
        """High-resolution inference via static-shape tiling.

        Rebuild of the reference's val-time tiling/untiling
        (``dinov3_eomt_semantic_segmentation/task_model.py:511-583``): the
        image is split into a static grid of overlapping ``tile_size`` crops,
        each tile runs the normal forward, and per-pixel logits are averaged
        back into the full canvas. The tile grid is static per input shape so
        one compiled program serves every image of that size.
        """
        from lightly_train_tpu.tasks.tiling import tiled_logits

        return jnp.argmax(
            tiled_logits(
                lambda t: self._semantic_logits(variables["params"], t),
                images, self.args.num_classes, tile_size, stride,
            ),
            axis=-1,
        )

    def default_optimizer_args(self):
        from lightly_train_tpu._optim import AdamWArgs

        # EoMT reference: lr 1e-4, LLRD 0.8, two-stage warmup poly, clip 0.01
        # (``train_model.py:96-103, 459-567``).
        return AdamWArgs(lr=1e-4, weight_decay=0.05)

    def grad_clip_norm(self):
        return 0.01

    def scaled_lr(self, base_lr, global_batch_size):
        # lr * sqrt(B / default_batch) (``train_model.py:474-476``).
        import math

        return base_lr * math.sqrt(
            global_batch_size / self.args.default_batch_size
        )

    def lr_schedule(self, base_lr, total_steps):
        # Logged/global schedule = the head clock; the backbone clock rides
        # lr_schedule_groups below.
        from lightly_train_tpu._optim.schedules import two_stage_warmup_poly

        return two_stage_warmup_poly(
            base_lr, total_steps, self.args.lr_warmup_steps,
            self.args.poly_power,
        )[1]

    @staticmethod
    def _is_vit_param(parts) -> bool:
        """True for ViT-backbone leaves (vs EoMT queries/heads/upscale).
        ``parts`` are path keys under the 'backbone' tree root."""
        top = parts[0]
        return (
            top.startswith("block")
            or top in ("patch_embed", "pos_embed", "cls_token",
                       "register_tokens", "mask_token", "norm")
        )

    def lr_schedule_groups(self, base_lr, total_steps, params):
        """Reference ``TwoStageWarmupPolySchedule``: ViT-backbone params idle
        for warmup[0] steps then warm up over warmup[1]; EoMT heads warm up
        immediately (``scheduler.py:14-52``, group split
        ``train_model.py:478-520``)."""
        from lightly_train_tpu._optim.schedules import two_stage_warmup_poly

        bb_sched, head_sched = two_stage_warmup_poly(
            base_lr, total_steps, self.args.lr_warmup_steps,
            self.args.poly_power,
        )

        def group(path, leaf):
            del leaf
            parts = [
                str(p.key) if hasattr(p, "key") else str(p) for p in path
            ]
            # path[0] == "backbone" (the task param tree root).
            return 0 if self._is_vit_param(parts[1:]) else 1

        groups = jax.tree_util.tree_map_with_path(group, params)
        return [bb_sched, head_sched], groups

    def lr_scales(self, params):
        """EoMT LLRD (``train_model.py:481-497``): block i gets
        ``llrd^(depth-1-i)``; pre-block params (patch_embed, tokens) inherit
        the FIRST block's exponent ``llrd^(depth-1)`` (the reference's
        reversed-iteration carryover); backbone.norm and all EoMT-specific
        params get 1.0."""
        llrd = 0.8
        depth = self.cfg.depth

        def scale(path, leaf):
            del leaf
            parts = [
                str(p.key) if hasattr(p, "key") else str(p) for p in path
            ][1:]  # drop the "backbone" root
            top = parts[0]
            if top.startswith("block") and top[5:].isdigit():
                return llrd ** (depth - 1 - int(top[5:]))
            if top in ("patch_embed", "pos_embed", "cls_token",
                       "register_tokens", "mask_token"):
                return llrd ** (depth - 1)
            return 1.0

        return jax.tree_util.tree_map_with_path(scale, params)

    @property
    def watch_metric(self):
        return ("val_miou", "max")
