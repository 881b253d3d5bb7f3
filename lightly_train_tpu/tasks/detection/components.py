"""LT-DETR building blocks: deformable attention, hybrid encoder, decoder.

Rebuild of ``src/lightly_train/_task_models/object_detection_components/``
(hybrid_encoder.py:221, rtdetrv2_decoder.py, dfine_decoder.py:89-605):

- ``MSDeformableAttention``: multi-scale deformable attention as a batched
  bilinear gather over level feature maps — pure-XLA vectorized sampling (the
  SURVEY.md §7 Pallas-kernel candidate; the gather formulation keeps it
  MXU/VPU-friendly until the kernel lands).
- ``HybridEncoder``: per-level input projections, a transformer (AIFI) layer
  on the lowest-resolution level with 2-D sincos positions, then top-down +
  bottom-up CSPRep fusion. ``RepVggBlock`` trains the reference's structural
  re-parameterization (3x3+BN plus 1x1+BN branches,
  ``hybrid_encoder.py:58-107``) and ``fuse_repvgg`` folds both branches into
  one biased 3x3 conv for deployment (``convert_to_deploy``
  ``hybrid_encoder.py:76-108``) as a pure tree-to-tree function.
- ``DETRDecoder``: top-k query selection from encoder logits, L layers of
  query self-attention + deformable cross-attention + FFN with iterative
  sigmoid box refinement (detached between layers like RT-DETRv2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.tasks.detection.box_utils import cxcywh_to_xyxy


@dataclasses.dataclass(frozen=True)
class DetrConfig:
    d_model: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    num_queries: int = 300
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    num_classes: int = 80
    # D-FINE decoder variant (``dfine_decoder.py:605``): distribution-based
    # box refinement (Integral over offset bins, ``Integral:345``) + LQE
    # (location quality estimator, ``:369``). False = RT-DETRv2-style direct
    # delta regression.
    use_dfine: bool = False
    dfine_bins: int = 17  # = reg_max + 1 (reference reg_max=32 -> 33 bins)
    # W(n) shape constants (non-trainable in the reference,
    # ``dfine_decoder.py:631, 671``).
    dfine_reg_scale: float = 4.0
    dfine_up: float = 0.5
    csp_blocks: int = 3  # RepVgg bottlenecks per CSPRep layer
    # Deploy mode: RepVgg branches replaced by single fused 3x3 convs whose
    # params come from ``fuse_repvgg`` (``hybrid_encoder.py:76-108``).
    deploy: bool = False
    dtype: Any = jnp.float32


def sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2-D sincos position embedding (h*w, dim)."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    d4 = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(d4, dtype=jnp.float32) / d4))
    out_y = ys[:, None] * omega[None, :]  # (h, d4)
    out_x = xs[:, None] * omega[None, :]  # (w, d4)
    pe = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.sin(out_x)[None, :, :], (h, w, d4)),
            jnp.broadcast_to(jnp.cos(out_x)[None, :, :], (h, w, d4)),
            jnp.broadcast_to(jnp.sin(out_y)[:, None, :], (h, w, d4)),
            jnp.broadcast_to(jnp.cos(out_y)[:, None, :], (h, w, d4)),
        ],
        axis=-1,
    )
    return pe.reshape(h * w, -1)


def _bilinear_sample(feat: jax.Array, pts: jax.Array) -> jax.Array:
    """feat: (H, W, D); pts: (P, 2) in [0,1] normalized (x, y) -> (P, D)."""
    H, W, _ = feat.shape
    x = pts[:, 0] * W - 0.5
    y = pts[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    f00 = feat[y0i, x0i]
    f01 = feat[y0i, x1i]
    f10 = feat[y1i, x0i]
    f11 = feat[y1i, x1i]
    wx = wx[:, None]
    wy = wy[:, None]
    return (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )


class MSDeformableAttention(nn.Module):
    """Deformable attention: per-query learned sampling offsets + weights."""

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self,
        queries: jax.Array,  # (B, Q, D)
        ref_points: jax.Array,  # (B, Q, 2) normalized cxcy
        value_levels: Sequence[jax.Array],  # [(B, Hl, Wl, D)] per level
    ) -> jax.Array:
        cfg = self.cfg
        B, Q, D = queries.shape
        H = cfg.num_heads
        L = len(value_levels)
        P = cfg.num_points
        head_dim = D // H

        offsets = nn.Dense(
            H * L * P * 2, dtype=cfg.dtype,
            kernel_init=nn.initializers.zeros, name="sampling_offsets",
        )(queries).reshape(B, Q, H, L, P, 2)
        attn = nn.Dense(
            H * L * P, dtype=cfg.dtype, name="attention_weights"
        )(queries).reshape(B, Q, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Q, H, L, P)
        value_proj = nn.Dense(D, dtype=cfg.dtype, name="value_proj")
        values = [value_proj(v) for v in value_levels]

        out_heads = []
        for l, val in enumerate(values):
            Hl, Wl = val.shape[1], val.shape[2]
            val_h = val.reshape(B, Hl, Wl, H, head_dim)
            # Sampling locations: ref + offset scaled by level size.
            scale = jnp.asarray([Wl, Hl], jnp.float32)
            locs = (
                ref_points[:, :, None, None, :]
                + offsets[:, :, :, l, :, :] / scale
            )  # (B, Q, H, P, 2)

            def sample_one(vb: jax.Array, lb: jax.Array) -> jax.Array:
                # vb: (Hl, Wl, H, hd); lb: (Q, H, P, 2)
                def per_head(vh: jax.Array, lh: jax.Array) -> jax.Array:
                    # vh: (Hl, Wl, hd); lh: (Q, P, 2)
                    return _bilinear_sample(
                        vh, lh.reshape(-1, 2)
                    ).reshape(Q, P, head_dim)

                return jax.vmap(per_head, in_axes=(2, 1), out_axes=1)(
                    vb, lb
                )  # (Q, H, P, hd)

            sampled = jax.vmap(sample_one)(val_h, locs)  # (B, Q, H, P, hd)
            out_heads.append(
                jnp.sum(sampled * attn[:, :, :, l, :, None], axis=3)
            )  # (B, Q, H, hd)
        out = sum(out_heads).reshape(B, Q, D)
        return nn.Dense(D, dtype=cfg.dtype, name="output_proj")(out)


class ConvBNAct(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.filters, (self.kernel, self.kernel),
            strides=(self.strides, self.strides), padding="SAME",
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn"
        )(x)
        return nn.silu(x)


class RepVggBlock(nn.Module):
    """Structural re-parameterization block (``hybrid_encoder.py:58-107``).

    Training: silu(bn(conv3x3(x)) + bn(conv1x1(x))). Deploy: silu(conv(x))
    with the single biased 3x3 kernel produced by :func:`fuse_repvgg`.
    """

    filters: int
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.deploy:
            y = nn.Conv(
                self.filters, (3, 3), padding="SAME", use_bias=True,
                dtype=self.dtype, name="fused",
            )(x)
        else:
            a = nn.Conv(
                self.filters, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name="conv1",
            )(x)
            a = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn1"
            )(a)
            b = nn.Conv(
                self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                name="conv2",
            )(x)
            b = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn2"
            )(b)
            y = a + b
        return nn.silu(y)


class FuseBlock(nn.Module):
    """CSPRep layer (``hybrid_encoder.py:110-146``): two 1x1 branches, a
    chain of RepVgg bottlenecks on one, summed (expansion 1.0 -> no conv3)."""

    filters: int
    dtype: Any = jnp.float32
    num_blocks: int = 3
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a = ConvBNAct(self.filters, 1, dtype=self.dtype, name="a")(x, train)
        for i in range(self.num_blocks):
            a = RepVggBlock(
                self.filters, self.deploy, self.dtype, name=f"rep{i}"
            )(a, train)
        b = ConvBNAct(self.filters, 1, dtype=self.dtype, name="b")(x, train)
        return a + b


def _fuse_one_repvgg(p: dict, s: dict, eps: float = 1e-5) -> dict:
    """Fold {conv1+bn1, conv2+bn2} params/stats into one biased 3x3 kernel.

    Flax kernels are (kh, kw, in, out); BN fold scales the out axis. The 1x1
    kernel is zero-padded to the 3x3 center (``hybrid_encoder.py:89-107``).
    """

    def branch(conv, bn, stats):
        k = conv["kernel"].astype(jnp.float32)
        gamma = bn["scale"].astype(jnp.float32)
        beta = bn["bias"].astype(jnp.float32)
        mean = stats["mean"].astype(jnp.float32)
        var = stats["var"].astype(jnp.float32)
        std = jnp.sqrt(var + eps)
        return k * (gamma / std), beta - mean * gamma / std

    k3, b3 = branch(p["conv1"], p["bn1"], s["bn1"])
    k1, b1 = branch(p["conv2"], p["bn2"], s["bn2"])
    k1 = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return {"fused": {"kernel": k3 + k1, "bias": b3 + b1}}


def fuse_repvgg(params: Any, batch_stats: Any) -> Any:
    """Return a deploy param tree: every RepVgg block subtree replaced by a
    single fused conv (pure function; pair with ``DetrConfig(deploy=True)``).

    Non-RepVgg leaves pass through unchanged; remaining ``batch_stats``
    (ConvBNAct et al.) stay in model_state and keep working in deploy mode.
    """

    def is_repvgg(p: Any, s: Any) -> bool:
        # Exactly the RepVgg subtree (a ResNet basic block shares the
        # conv1/bn1 naming but both its kernels are 3x3 and it has more
        # children), with running stats present for both branches.
        if not (isinstance(p, dict) and isinstance(s, dict)):
            return False
        if set(p.keys()) != {"conv1", "bn1", "conv2", "bn2"}:
            return False
        try:
            k3 = p["conv1"]["kernel"]
            k1 = p["conv2"]["kernel"]
        except (KeyError, TypeError):
            return False
        return (
            k3.shape[:2] == (3, 3)
            and k1.shape[:2] == (1, 1)
            and {"bn1", "bn2"} <= set(s.keys())
        )

    def walk(p: Any, s: Any) -> Any:
        if not isinstance(p, dict):
            return p
        if is_repvgg(p, s):
            return _fuse_one_repvgg(p, s)
        return {
            k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
            for k, v in p.items()
        }

    return walk(params, batch_stats)


def strip_fused_batch_stats(params: Any, batch_stats: Any) -> Any:
    """Drop bn1/bn2 running stats for subtrees ``fuse_repvgg`` fused away.

    Takes the ORIGINAL (pre-fuse) params so RepVgg positions are identified
    the same way as in :func:`fuse_repvgg`.
    """

    def is_repvgg(p: Any, s: Any) -> bool:
        if not (isinstance(p, dict) and isinstance(s, dict)):
            return False
        if set(p.keys()) != {"conv1", "bn1", "conv2", "bn2"}:
            return False
        try:
            return (
                p["conv1"]["kernel"].shape[:2] == (3, 3)
                and p["conv2"]["kernel"].shape[:2] == (1, 1)
                and {"bn1", "bn2"} <= set(s.keys())
            )
        except (KeyError, TypeError):
            return False

    def walk(p: Any, s: Any) -> Any:
        if not isinstance(s, dict):
            return s
        if is_repvgg(p, s):
            return {}
        return {
            k: walk(p.get(k, {}) if isinstance(p, dict) else {}, v)
            for k, v in s.items()
        }

    return walk(params, batch_stats)


class HybridEncoder(nn.Module):
    """Project levels to d_model, AIFI on the last level, FPN+PAN fusion."""

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self, features: Sequence[jax.Array], train: bool = False
    ) -> List[jax.Array]:
        cfg = self.cfg
        D = cfg.d_model
        proj = [
            nn.BatchNorm(
                use_running_average=not train, dtype=cfg.dtype,
                name=f"proj{i}_bn",
            )(nn.Conv(D, (1, 1), use_bias=False, dtype=cfg.dtype,
                      name=f"proj{i}_conv")(f))
            for i, f in enumerate(features)
        ]
        # AIFI transformer on the lowest-resolution level.
        top = proj[-1]
        B, Ht, Wt, _ = top.shape
        tokens = top.reshape(B, Ht * Wt, D)
        pe = sincos_2d(Ht, Wt, D).astype(tokens.dtype)
        h = tokens + pe[None]
        q = nn.Dense(3 * D, dtype=cfg.dtype, name="aifi_qkv")(
            nn.LayerNorm(dtype=cfg.dtype, name="aifi_ln1")(h)
        )
        qh, kh, vh = jnp.split(
            q.reshape(B, Ht * Wt, 3, cfg.num_heads, D // cfg.num_heads), 3,
            axis=2,
        )
        attn_out = jax.nn.dot_product_attention(
            qh.squeeze(2), kh.squeeze(2), vh.squeeze(2)
        ).reshape(B, Ht * Wt, D)
        h = tokens + nn.Dense(D, dtype=cfg.dtype, name="aifi_proj")(attn_out)
        h2 = nn.LayerNorm(dtype=cfg.dtype, name="aifi_ln2")(h)
        h = h + nn.Dense(D, dtype=cfg.dtype, name="aifi_fc2")(
            nn.gelu(nn.Dense(
                cfg.dim_feedforward, dtype=cfg.dtype, name="aifi_fc1"
            )(h2))
        )
        proj[-1] = h.reshape(B, Ht, Wt, D)

        # Top-down (FPN).
        levels = list(proj)
        for i in range(len(levels) - 1, 0, -1):
            up = jax.image.resize(
                levels[i],
                (B,) + levels[i - 1].shape[1:3] + (D,),
                "nearest",
            )
            levels[i - 1] = FuseBlock(
                D, cfg.dtype, cfg.csp_blocks, cfg.deploy, name=f"fpn{i}"
            )(
                jnp.concatenate([up, levels[i - 1]], axis=-1), train
            )
        # Bottom-up (PAN).
        for i in range(len(levels) - 1):
            down = ConvBNAct(D, 3, 2, cfg.dtype, name=f"pan_down{i}")(
                levels[i], train
            )
            levels[i + 1] = FuseBlock(
                D, cfg.dtype, cfg.csp_blocks, cfg.deploy, name=f"pan{i}"
            )(
                jnp.concatenate([down, levels[i + 1]], axis=-1), train
            )
        return levels


class DecoderLayer(nn.Module):
    cfg: DetrConfig

    @nn.compact
    def __call__(self, q, ref_points, value_levels, train, self_attn_mask=None):
        cfg = self.cfg
        D = cfg.d_model
        # Self-attention over queries (mask isolates denoising groups).
        h = nn.LayerNorm(dtype=cfg.dtype, name="ln1")(q)
        B, Q, _ = h.shape
        qkv = nn.Dense(3 * D, dtype=cfg.dtype, name="self_qkv")(h)
        qh, kh, vh = jnp.split(
            qkv.reshape(B, Q, 3, cfg.num_heads, D // cfg.num_heads), 3, axis=2
        )
        sa = jax.nn.dot_product_attention(
            qh.squeeze(2), kh.squeeze(2), vh.squeeze(2), mask=self_attn_mask
        ).reshape(B, Q, D)
        q = q + nn.Dense(D, dtype=cfg.dtype, name="self_proj")(sa)
        # Deformable cross-attention.
        h = nn.LayerNorm(dtype=cfg.dtype, name="ln2")(q)
        ca = MSDeformableAttention(cfg, name="cross_attn")(
            h, ref_points, value_levels
        )
        q = q + ca
        # FFN.
        h = nn.LayerNorm(dtype=cfg.dtype, name="ln3")(q)
        q = q + nn.Dense(D, dtype=cfg.dtype, name="fc2")(
            nn.gelu(nn.Dense(cfg.dim_feedforward, dtype=cfg.dtype,
                             name="fc1")(h))
        )
        return q


class DETRDecoder(nn.Module):
    """Top-k query selection + L refinement layers; returns per-layer preds.

    Denoising training (``denoising.py`` in the reference): ``dn_labels`` /
    ``dn_boxes`` (noised GT) prepend label-embedded queries whose
    self-attention is isolated from the matching queries (and between
    groups) via a static mask; callers split the per-layer outputs at
    ``dn_labels.shape[1]``.
    """

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self,
        levels: Sequence[jax.Array],
        train: bool = False,
        dn_labels: Any = None,  # (B, Dn) int labels (noised)
        dn_boxes: Any = None,  # (B, Dn, 4) cxcywh (noised)
        dn_group_size: int = 0,
    ) -> List[Tuple[jax.Array, jax.Array]]:
        cfg = self.cfg
        D = cfg.d_model
        B = levels[0].shape[0]
        memory = jnp.concatenate(
            [l.reshape(B, -1, D) for l in levels], axis=1
        )  # (B, N, D)
        # Anchor centers for each memory position.
        centers = []
        for l in levels:
            Hl, Wl = l.shape[1], l.shape[2]
            ys = (jnp.arange(Hl, dtype=jnp.float32) + 0.5) / Hl
            xs = (jnp.arange(Wl, dtype=jnp.float32) + 0.5) / Wl
            grid = jnp.stack(
                jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
            ).reshape(-1, 2)
            centers.append(grid)
        anchors = jnp.concatenate(centers, axis=0)  # (N, 2)

        # Encoder output heads -> top-k query selection (RT-DETR style).
        enc_logits = nn.Dense(
            cfg.num_classes, dtype=cfg.dtype, name="enc_class"
        )(memory)
        enc_boxes_delta = nn.Dense(4, dtype=cfg.dtype, name="enc_box")(memory)
        enc_scores = jnp.max(enc_logits, axis=-1)  # (B, N)
        k = min(cfg.num_queries, memory.shape[1])
        topk = jax.lax.top_k(enc_scores, k)[1]  # (B, k)
        sel_memory = jnp.take_along_axis(memory, topk[..., None], axis=1)
        sel_anchor = anchors[topk]  # (B, k, 2)
        sel_delta = jnp.take_along_axis(
            enc_boxes_delta, topk[..., None], axis=1
        )
        init_boxes = jax.nn.sigmoid(
            jnp.concatenate(
                [jax.scipy.special.logit(jnp.clip(sel_anchor, 1e-4, 1 - 1e-4)),
                 jnp.zeros_like(sel_delta[..., :2])], axis=-1,
            ) + sel_delta
        )  # (B, k, 4) cxcywh
        q = jax.lax.stop_gradient(sel_memory)
        boxes = jax.lax.stop_gradient(init_boxes)

        # Label embedding table for denoising queries (always created so the
        # param tree is identical between train and inference).
        dn_label_embed = self.param(
            "dn_label_embed",
            nn.initializers.normal(stddev=0.02),
            (cfg.num_classes + 1, cfg.d_model),
        )
        self_attn_mask = None
        n_dn = 0
        if dn_labels is not None:
            n_dn = dn_labels.shape[1]
            dn_q = dn_label_embed[dn_labels].astype(q.dtype)  # (B, Dn, D)
            q = jnp.concatenate([dn_q, q], axis=1)
            boxes = jnp.concatenate(
                [jax.lax.stop_gradient(dn_boxes.astype(boxes.dtype)), boxes],
                axis=1,
            )
            # Static mask: matching queries never attend dn; dn groups are
            # isolated from each other (each group attends itself + matching).
            N = n_dn + k
            idx = jnp.arange(N)
            group = jnp.where(
                idx < n_dn,
                idx // max(dn_group_size, 1),
                -1,
            )  # -1 = matching part
            is_dn_col = (idx < n_dn)[None, :]
            same_group = group[:, None] == group[None, :]
            allowed = jnp.where(
                is_dn_col,
                same_group,  # dn columns visible only to their own group
                True,  # matching columns visible to everyone
            )
            self_attn_mask = allowed[None, None, :, :]

        outputs: List[Tuple[jax.Array, jax.Array]] = []
        enc_out_logits = jnp.take_along_axis(
            jnp.pad(enc_logits, ((0, 0), (0, 0), (0, 1))),
            topk[..., None], axis=1,
        )
        outputs.append(
            (enc_out_logits.astype(jnp.float32),
             init_boxes.astype(jnp.float32))
        )
        # D-FINE FDR state (reference decoder loop, ``dfine_decoder.py:
        # 480-582``): a fixed anchor from the layer-0 pre-head, corner
        # logits ACCUMULATED across layers, boxes decoded from the ANCHOR
        # each layer via the non-uniform W(n) Integral.
        from lightly_train_tpu.tasks.detection.dfine_utils import (
            distance2bbox,
            integral,
            weighting_function,
        )

        anchor = None
        corners_accum = None
        project = weighting_function(
            cfg.dfine_bins - 1, cfg.dfine_up, cfg.dfine_reg_scale
        )
        for i in range(cfg.num_decoder_layers):
            q = DecoderLayer(cfg, name=f"layer{i}")(
                q, boxes[..., :2], levels, train, self_attn_mask
            )
            qn = nn.LayerNorm(dtype=cfg.dtype, name=f"head{i}_ln")(q)
            logits = nn.Dense(
                cfg.num_classes + 1, dtype=cfg.dtype, name=f"head{i}_class"
            )(qn)
            if cfg.use_dfine:
                nb = cfg.dfine_bins  # = reg_max + 1 bins per edge
                if i == 0:
                    # pre-head: sigmoid(delta + logit(initial boxes)) becomes
                    # the FIXED refinement anchor (``dfine_decoder.py:
                    # 531-540``); its predictions are the reference's
                    # 'pre_outputs' aux level (criterion matches it too).
                    pre_delta = nn.Dense(
                        4, dtype=cfg.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="pre_box",
                    )(qn)
                    pre_boxes = jax.nn.sigmoid(
                        pre_delta.astype(jnp.float32)
                        + jax.scipy.special.logit(
                            jnp.clip(boxes, 1e-4, 1 - 1e-4)
                        ).astype(jnp.float32)
                    )
                    anchor = jax.lax.stop_gradient(pre_boxes)
                    outputs.append(
                        (logits.astype(jnp.float32), pre_boxes)
                    )
                # Per-edge offset-bin logits, accumulated over layers
                # (``pred_corners = bbox_head[i](out) + undetach``).
                dist = nn.Dense(
                    4 * nb, dtype=cfg.dtype,
                    kernel_init=nn.initializers.zeros,
                    name=f"head{i}_dist",
                )(qn).reshape(qn.shape[0], qn.shape[1], 4, nb)
                dist = dist.astype(jnp.float32)
                if corners_accum is not None:
                    dist = dist + corners_accum
                corners_accum = dist
                new_boxes = distance2bbox(
                    anchor, integral(dist, project), cfg.dfine_reg_scale
                )
                # Expose (corner logits, anchor) for FGL/DDF
                # (criterion.dfine_local_loss).
                self.sow(
                    "intermediates", "dfine_dists",
                    (dist, anchor),
                )
                # LQE (``dfine_decoder.py:369-385``): class-logit refinement
                # from per-edge top-k bin probs + their mean.
                probs = jax.nn.softmax(dist, axis=-1)
                k_stat = min(4, nb)
                topk_p = jax.lax.top_k(probs, k_stat)[0]
                stats = jnp.concatenate(
                    [topk_p, topk_p.mean(axis=-1, keepdims=True)], axis=-1
                ).reshape(qn.shape[0], qn.shape[1], 4 * (k_stat + 1))
                lqe = nn.Dense(
                    1, dtype=cfg.dtype, kernel_init=nn.initializers.zeros,
                    name=f"head{i}_lqe",
                )(nn.gelu(nn.Dense(
                    32, dtype=cfg.dtype, name=f"head{i}_lqe_fc"
                )(stats.astype(cfg.dtype))))
                logits = logits + lqe.astype(logits.dtype)
            else:
                delta = nn.Dense(
                    4, dtype=cfg.dtype,
                    kernel_init=nn.initializers.zeros, name=f"head{i}_box",
                )(qn)
                new_boxes = jax.nn.sigmoid(
                    jax.scipy.special.logit(jnp.clip(boxes, 1e-4, 1 - 1e-4))
                    + delta
                )
            outputs.append(
                (logits.astype(jnp.float32), new_boxes.astype(jnp.float32))
            )
            boxes = jax.lax.stop_gradient(
                jnp.clip(new_boxes, 1e-4, 1.0).astype(q.dtype)
            )
        self.sow("intermediates", "final_queries", q)
        return outputs
