"""LT-DETR building blocks, parameter-isomorphic with the reference.

Rebuild of ``src/lightly_train/_task_models/object_detection_components/``
(``hybrid_encoder.py``, ``dfine_decoder.py``) with the module tree laid out
so every torch parameter has exactly one counterpart here (the torch->flax
converter in ``tasks/detection/convert.py`` is a mechanical rename +
transpose).  The numerics are reference-exact — verified by golden forward
and trajectory tests against the actual torch modules
(``tests/tasks/test_ltdetr_golden.py``) — while the implementation stays
TPU-native: NHWC convs, static shapes, batched gathers instead of
grid_sample, everything jit-compatible.

Blocks (reference file:line provenance):

- ``ConvNormLayer`` / ``RepVggBlock`` / ``CSPRepLayer``
  (``hybrid_encoder.py:39-146``): conv+BN(+act) stacks; RepVgg trains the
  3x3+1x1 two-branch form and ``fuse_repvgg`` folds it into one biased 3x3
  conv for deployment (``convert_to_deploy``, ``hybrid_encoder.py:76-108``).
- ``TorchMHA``: multi-head attention with torch's fused
  ``in_proj_weight``/``in_proj_bias`` parameter layout
  (q = k may differ from v, as in RT-DETR's pos-embedded attention).
- ``TransformerEncoderLayer`` (``hybrid_encoder.py:149-199``): post-norm
  AIFI layer.
- ``HybridEncoder`` (``hybrid_encoder.py:221-459``): per-level input
  projections, AIFI on ``use_encoder_idx=[2]`` with the RT-DETR 2-D sincos
  embedding, top-down FPN (lateral conv + CSPRep) and bottom-up PAN
  (downsample conv + CSPRep).
- ``MSDeformableAttention`` (``dfine_decoder.py:89-240``): D-FINE's
  projection-free deformable attention — per-level point counts, joint
  softmax over all points, 4-d reference boxes scaling the offsets, and
  grid_sample(zeros, align_corners=False)-exact bilinear sampling.
- ``Gate`` / ``LQE`` / ``MLP`` / ``TransformerDecoderLayer``
  (``dfine_decoder.py:241-385``).
- ``DETRDecoder`` == the reference ``DFINETransformer``
  (``dfine_decoder.py:605-1161``): anchor generation with the valid-mask
  +inf trick, ``enc_output`` projection, top-k query selection, denoising
  query support, and the FDR decoder loop (fixed pre-head anchor,
  accumulated corner logits, non-uniform W(n) Integral, per-layer LQE).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.tasks.detection.dfine_utils import (
    distance2bbox,
    integral,
    weighting_function,
)

# torch defaults everywhere in the reference detector.
BN_MOMENTUM = 0.9  # torch BatchNorm2d momentum=0.1 (flax convention flipped)
BN_EPS = 1e-5
LN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class DetrConfig:
    d_model: int = 256
    # HybridEncoder width when it differs from the decoder width (the CNN/
    # ConvNeXt presets run the encoder at 384 and the decoder at 256,
    # ``config.py`` CNNTiny: encoder hidden_dim=384, RTDETRv2 hidden_dim=256;
    # the decoder's input_proj convs bridge the gap). None = d_model.
    enc_d_model: Optional[int] = None
    num_heads: int = 8
    num_levels: int = 3
    # Per-level sampling point counts (``DFINETransformerConfig.num_points``;
    # an int means the same count per level).
    num_points: Any = (4, 4, 4)
    num_queries: int = 300
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    num_classes: int = 80
    # D-FINE decoder variant (``dfine_decoder.py:605``): distribution-based
    # box refinement (Integral over offset bins) + LQE. False = RT-DETRv2
    # style direct delta regression (same layer stack, delta heads).
    use_dfine: bool = False
    dfine_bins: int = 33  # = reg_max + 1 (reference reg_max=32)
    dfine_reg_scale: float = 4.0
    dfine_up: float = 0.5
    # Hybrid encoder (``HybridEncoderConfig``).
    csp_blocks: int = 3  # round(3 * depth_mult)
    expansion: float = 1.0
    # upsample=False (only the legacy dinov2 no-registers preset): all taps
    # share one spatial resolution, so FPN upsampling and PAN downsample
    # convs are identity (``hybrid_encoder.py:424-440``).
    upsample: bool = True
    enc_dim_feedforward: int = 1024
    enc_act: str = "gelu"
    act: str = "silu"
    pe_temperature: float = 10000.0
    # Anchor validity margin (``DFINETransformer eps=1e-2``).
    anchor_eps: float = 1e-2
    offset_scale: float = 0.5
    # Deploy mode: RepVgg branches replaced by single fused 3x3 convs whose
    # params come from ``fuse_repvgg``; decoder runs only up to eval_idx.
    deploy: bool = False
    dtype: Any = jnp.float32

    @property
    def enc_dim(self) -> int:
        return self.enc_d_model if self.enc_d_model is not None else self.d_model

    @property
    def points_list(self) -> Tuple[int, ...]:
        p = self.num_points
        if isinstance(p, int):
            return (p,) * self.num_levels
        return tuple(p)

    @property
    def reg_max(self) -> int:
        return self.dfine_bins - 1


def get_act(name: Optional[str]):
    if name is None or name == "identity":
        return lambda x: x
    name = name.lower()
    if name in ("silu", "swish"):
        return nn.silu
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    raise ValueError(f"unknown activation: {name}")


def rtdetr_sincos_pe(
    w: int, h: int, dim: int, temperature: float = 10000.0
) -> jax.Array:
    """RT-DETR's 2-D sincos embedding, bit-for-bit the reference formula
    (``hybrid_encoder.py:371-391``): meshgrid(indexing="ij") over (w, h)
    flattened w-major, concat [sin(w), cos(w), sin(h), cos(h)]."""
    gw, gh = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32),
        jnp.arange(h, dtype=jnp.float32),
        indexing="ij",
    )
    d4 = dim // 4
    omega = 1.0 / (
        temperature ** (jnp.arange(d4, dtype=jnp.float32) / d4)
    )
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)],
        axis=1,
    )  # (w*h, dim)


# Back-compat alias used by non-detection callers (yolo heads etc.): a
# conventional h-major sincos embedding.
def sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    d4 = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(d4, dtype=jnp.float32) / d4))
    out_y = ys[:, None] * omega[None, :]
    out_x = xs[:, None] * omega[None, :]
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


class ConvBNAct(nn.Module):
    """conv + BN + silu (PicoDet / YOLO-NAS building block; kept with its
    original param naming for checkpoint stability)."""

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


class ConvNormLayer(nn.Module):
    """conv(bias=False) + BatchNorm + optional act
    (``hybrid_encoder.py:39-57``; torch padding = (k-1)//2)."""

    ch_out: int
    kernel: int = 1
    stride: int = 1
    act: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.ch_out,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="norm",
        )(x)
        return get_act(self.act)(x)


class RepVggBlock(nn.Module):
    """3x3+BN plus 1x1+BN two-branch block (``hybrid_encoder.py:59-107``).

    ``deploy=True`` swaps in the single fused biased 3x3 conv produced by
    ``fuse_repvgg``."""

    ch_out: int
    act: Optional[str] = "silu"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.deploy:
            y = nn.Conv(
                self.ch_out, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=True, dtype=self.dtype, name="conv",
            )(x)
        else:
            y = ConvNormLayer(
                self.ch_out, 3, 1, act=None, dtype=self.dtype, name="conv1"
            )(x, train) + ConvNormLayer(
                self.ch_out, 1, 1, act=None, dtype=self.dtype, name="conv2"
            )(x, train)
        return get_act(self.act)(y)


class CSPRepLayer(nn.Module):
    """CSP block over RepVgg bottlenecks (``hybrid_encoder.py:110-146``)."""

    ch_out: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: Optional[str] = "silu"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.ch_out * self.expansion)
        x1 = ConvNormLayer(
            hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1"
        )(x, train)
        for i in range(self.num_blocks):
            x1 = RepVggBlock(
                hidden, act=self.act, deploy=self.deploy, dtype=self.dtype,
                name=f"bottlenecks{i}",
            )(x1, train)
        x2 = ConvNormLayer(
            hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2"
        )(x, train)
        y = x1 + x2
        if hidden != self.ch_out:
            y = ConvNormLayer(
                self.ch_out, 1, 1, act=self.act, dtype=self.dtype,
                name="conv3",
            )(y, train)
        return y


class TorchMHA(nn.Module):
    """Multi-head attention with torch's fused in_proj parameter layout
    (``nn.MultiheadAttention``): one (D, 3D) kernel + (3D,) bias, applied
    as separate q/k/v projections so q=k may carry a position embedding
    while v does not."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        mask_keep: Optional[jax.Array] = None,  # (..., Q, K) True = attend
    ) -> jax.Array:
        D = self.d_model
        H = self.num_heads
        hd = D // H
        w = self.param(
            "in_proj_kernel",
            nn.initializers.xavier_uniform(),
            (D, 3 * D),
            jnp.float32,
        ).astype(self.dtype)
        b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * D,), jnp.float32
        ).astype(self.dtype)
        qp = q @ w[:, :D] + b[:D]
        kp = k @ w[:, D : 2 * D] + b[D : 2 * D]
        vp = v @ w[:, 2 * D :] + b[2 * D :]
        B, Q = qp.shape[0], qp.shape[1]
        K = kp.shape[1]
        qh = qp.reshape(B, Q, H, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, K, H, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, K, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(hd, qh.dtype)
        )
        if mask_keep is not None:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
            logits = jnp.where(mask_keep, logits, neg)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            vh.dtype
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm AIFI layer (``hybrid_encoder.py:149-199``,
    normalize_before=False)."""

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self, src: jax.Array, pos: jax.Array, train: bool = False
    ) -> jax.Array:
        cfg = self.cfg
        qk = src + pos
        attn = TorchMHA(
            cfg.enc_dim, cfg.num_heads, dtype=cfg.dtype, name="self_attn"
        )(qk, qk, src)
        src = nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype, name="norm1")(
            src + attn
        )
        h = nn.Dense(
            cfg.enc_dim_feedforward, dtype=cfg.dtype, name="linear1"
        )(src)
        h = get_act(cfg.enc_act)(h)
        h = nn.Dense(cfg.enc_dim, dtype=cfg.dtype, name="linear2")(h)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype, name="norm2")(
            src + h
        )


class HybridEncoder(nn.Module):
    """Reference HybridEncoder (``hybrid_encoder.py:221-459``): input
    projections -> AIFI on the /32 level -> FPN -> PAN. ``upsample=True``
    variant (every shipped preset except the legacy no-registers one)."""

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self, features: Sequence[jax.Array], train: bool = False
    ) -> List[jax.Array]:
        cfg = self.cfg
        D = cfg.enc_dim
        n = len(features)
        proj = []
        for i, f in enumerate(features):
            x = nn.Conv(
                D, (1, 1), use_bias=False, dtype=cfg.dtype,
                name=f"input_proj{i}_conv",
            )(f)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=cfg.dtype,
                name=f"input_proj{i}_norm",
            )(x)
            proj.append(x)

        # AIFI transformer on the lowest-resolution level
        # (use_encoder_idx=[2], num_encoder_layers=1 in every preset).
        top = proj[-1]
        B, Ht, Wt, _ = top.shape
        tokens = top.reshape(B, Ht * Wt, D)
        pe = rtdetr_sincos_pe(Wt, Ht, D, cfg.pe_temperature).astype(
            tokens.dtype
        )
        tokens = TransformerEncoderLayer(cfg, name="encoder0_layer0")(
            tokens, pe[None], train
        )
        proj[-1] = tokens.reshape(B, Ht, Wt, D)

        # Top-down FPN: lateral 1x1 conv on the upper level, nearest
        # upsample, CSPRep fuse with the lower level.
        inner = [proj[-1]]
        for idx in range(n - 1, 0, -1):
            j = n - 1 - idx  # lateral/fpn module index
            feat_high = ConvNormLayer(
                D, 1, 1, act=cfg.act, dtype=cfg.dtype, name=f"lateral{j}"
            )(inner[0], train)
            inner[0] = feat_high
            feat_low = proj[idx - 1]
            up = (
                jax.image.resize(
                    feat_high,
                    (B,) + feat_low.shape[1:3] + (D,),
                    "nearest",
                )
                if cfg.upsample
                else feat_high
            )
            fused = CSPRepLayer(
                D, cfg.csp_blocks, cfg.expansion, act=cfg.act,
                deploy=cfg.deploy, dtype=cfg.dtype, name=f"fpn{j}",
            )(jnp.concatenate([up, feat_low], axis=-1), train)
            inner.insert(0, fused)

        # Bottom-up PAN.
        outs = [inner[0]]
        for idx in range(n - 1):
            down = (
                ConvNormLayer(
                    D, 3, 2, act=cfg.act, dtype=cfg.dtype,
                    name=f"downsample{idx}",
                )(outs[-1], train)
                if cfg.upsample
                else outs[-1]
            )
            out = CSPRepLayer(
                D, cfg.csp_blocks, cfg.expansion, act=cfg.act,
                deploy=cfg.deploy, dtype=cfg.dtype, name=f"pan{idx}",
            )(jnp.concatenate([down, inner[idx + 1]], axis=-1), train)
            outs.append(out)
        return outs


# ---------------------------------------------------------------------------
# RepVgg deploy-time fusion (pure tree-to-tree, ``hybrid_encoder.py:76-108``).
# ---------------------------------------------------------------------------


def _fuse_one_repvgg(p: dict, s: dict, eps: float = BN_EPS) -> dict:
    """{conv1: {conv,norm}, conv2: {conv,norm}} + stats -> fused 3x3 conv."""

    def branch(cn_p, cn_s):
        kernel = cn_p["conv"]["kernel"]  # (kh, kw, I, O)
        bn = cn_p["norm"]
        mean, var = cn_s["norm"]["mean"], cn_s["norm"]["var"]
        std = jnp.sqrt(var + eps)
        t = (bn["scale"] / std).reshape(1, 1, 1, -1)
        return kernel * t, bn["bias"] - mean * bn["scale"] / std

    k3, b3 = branch(p["conv1"], s["conv1"])
    k1, b1 = branch(p["conv2"], s["conv2"])
    k1 = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return {"conv": {"kernel": k3 + k1, "bias": b3 + b1}}


def _is_repvgg(p: Any, s: Any) -> bool:
    return (
        isinstance(p, dict)
        and set(p.keys()) == {"conv1", "conv2"}
        and isinstance(p.get("conv1"), dict)
        and "conv" in p["conv1"]
        and "norm" in p["conv1"]
        and isinstance(s, dict)
        and "conv1" in s
        and "norm" in s.get("conv1", {})
    )


def fuse_repvgg(params: Any, batch_stats: Any) -> Any:
    """Fold every RepVgg block's two conv+BN branches into one biased 3x3
    conv (``RepVggBlock.convert_to_deploy``)."""

    def walk(p: Any, s: Any) -> Any:
        if _is_repvgg(p, s):
            return _fuse_one_repvgg(p, s)
        if isinstance(p, dict):
            return {
                k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
                for k, v in p.items()
            }
        return p

    return walk(params, batch_stats or {})


def strip_fused_batch_stats(params: Any, batch_stats: Any) -> Any:
    """Drop batch_stats entries consumed by ``fuse_repvgg`` (the fused conv
    has no BN); keep everything else."""

    def walk(p: Any, s: Any) -> Any:
        if _is_repvgg(p, s):
            return None
        if isinstance(s, dict):
            out = {}
            for k, v in s.items():
                sub = walk(p.get(k, {}) if isinstance(p, dict) else {}, v)
                if sub is None:
                    continue
                if isinstance(sub, dict) and not sub:
                    continue
                out[k] = sub
            return out
        return s

    return walk(params or {}, batch_stats or {})


# ---------------------------------------------------------------------------
# D-FINE decoder (``dfine_decoder.py``).
# ---------------------------------------------------------------------------



def _grid_sample_zeros(level: jax.Array, locs: jax.Array) -> jax.Array:
    """torch ``grid_sample(mode=bilinear, padding_mode=zeros,
    align_corners=False)``-exact sampling as a batched gather.

    level: (B, Hl, Wl, NH, hd) per-head feature map; locs: (B, Q, NH, P, 2)
    sampling locations normalized to [0, 1] (the reference's ``2*loc-1``
    grid maps back to pixel coords ``x = loc*W - 0.5``).
    Returns (B, Q, NH, P, hd)."""
    B, Hl, Wl, NH, hd = level.shape
    Q, P = locs.shape[1], locs.shape[3]
    x = locs[..., 0].astype(jnp.float32) * Wl - 0.5
    y = locs[..., 1].astype(jnp.float32) * Hl - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None].astype(level.dtype)
    wy = (y - y0)[..., None].astype(level.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = level.transpose(0, 3, 1, 2, 4).reshape(B * NH, Hl * Wl, hd)

    def corner(xi, yi):
        inb = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
        idx = jnp.clip(yi, 0, Hl - 1) * Wl + jnp.clip(xi, 0, Wl - 1)
        idx_t = idx.transpose(0, 2, 1, 3).reshape(B * NH, Q * P)
        # vmapped integer indexing emits the canonical batched gather the
        # ONNX exporter lowers to GatherND (Pattern A).
        g = jax.vmap(lambda f, i: f[i])(flat, idx_t)
        g = g.reshape(B, NH, Q, P, hd).transpose(0, 2, 1, 3, 4)
        return g * inb[..., None].astype(level.dtype)

    f00 = corner(x0i, y0i)
    f01 = corner(x0i + 1, y0i)
    f10 = corner(x0i, y0i + 1)
    f11 = corner(x0i + 1, y0i + 1)
    return (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )


def _offset_bias_init(num_heads: int, points_list: Sequence[int]):
    """Reference ``MSDeformableAttention._reset_parameters``
    (``dfine_decoder.py:140-159``): ring-of-directions bias, scaled
    1..n per level."""
    total = sum(points_list)
    thetas = np.arange(num_heads, dtype=np.float32) * (
        2.0 * np.pi / num_heads
    )
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 2), (1, total, 1))
    scaling = np.concatenate(
        [np.arange(1, n + 1, dtype=np.float32) for n in points_list]
    ).reshape(1, -1, 1)
    grid = grid * scaling
    flat = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


def _bias_init_with_prob(p: float):
    v = float(-np.log((1.0 - p) / p))

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, v, dtype)

    return init


class MSDeformableAttention(nn.Module):
    """D-FINE deformable attention (``dfine_decoder.py:89-240``): no value
    or output projections, per-level point counts, joint softmax over all
    points, offsets scaled by the 4-d reference box. With
    ``with_value_proj=True`` it is instead the RT-DETRv2 variant
    (``rtdetrv2_decoder.py:66-237``): value_proj before sampling and
    output_proj after aggregation."""

    cfg: DetrConfig
    with_value_proj: bool = False

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, D)
        ref_points: jax.Array,  # (B, Q, 4) cxcywh in [0,1]
        value_levels: Sequence[jax.Array],  # [(B, Hl, Wl, D)]
    ) -> jax.Array:
        cfg = self.cfg
        B, Q, D = query.shape
        H = cfg.num_heads
        hd = D // H
        pts = cfg.points_list
        total = sum(pts)
        if self.with_value_proj:
            value_proj = nn.Dense(D, dtype=cfg.dtype, name="value_proj")
            value_levels = [value_proj(v) for v in value_levels]

        offsets = nn.Dense(
            H * total * 2,
            dtype=cfg.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(H, pts),
            name="sampling_offsets",
        )(query).reshape(B, Q, H, total, 2)
        attn = nn.Dense(
            H * total,
            dtype=cfg.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, H, total)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            query.dtype
        )

        # num_points_scale: 1/n_l repeated n_l times per level.
        nps = np.concatenate(
            [np.full((p,), 1.0 / p, np.float32) for p in pts]
        )
        # Plain slices first, then broadcast dims — combined None+slice
        # indexing lowers to lax.gather, which the ONNX exporter rejects.
        ref_xy = ref_points[..., :2][:, :, None, None, :]
        ref_wh = ref_points[..., 2:][:, :, None, None, :]
        offset = (
            offsets
            * jnp.asarray(nps)[None, None, None, :, None]
            * ref_wh.astype(offsets.dtype)
            * cfg.offset_scale
        )
        locs = ref_xy.astype(offsets.dtype) + offset  # (B, Q, H, total, 2)

        out = jnp.zeros((B, Q, H, hd), query.dtype)
        start = 0
        for l, val in enumerate(value_levels):
            p = pts[l]
            Hl, Wl = val.shape[1], val.shape[2]
            val_h = val.reshape(B, Hl, Wl, H, hd)
            loc_l = locs[:, :, :, start : start + p, :]
            sampled = _grid_sample_zeros(val_h, loc_l)  # (B,Q,H,p,hd)
            w_l = attn[:, :, :, start : start + p]
            out = out + jnp.sum(sampled * w_l[..., None], axis=3)
            start += p
        out = out.reshape(B, Q, D)
        if self.with_value_proj:
            out = nn.Dense(D, dtype=cfg.dtype, name="output_proj")(out)
        return out


class MLPRef(nn.Module):
    """torch ``MLP`` (``dfine_decoder.py:73-87``): Linear stack with relu
    between layers (none after the last). ``last_zero`` replicates the
    reference's zero-init of the final layer (bbox/LQE heads)."""

    dims: Tuple[int, ...]  # hidden..., out
    act: str = "relu"
    last_zero: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            kw = {}
            if self.last_zero and i == n - 1:
                kw = dict(
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                )
            x = nn.Dense(d, dtype=self.dtype, name=f"layers{i}", **kw)(x)
            if i < n - 1:
                x = get_act(self.act)(x)
        return x


class Gate(nn.Module):
    """Gated fusion of self-attn and cross-attn paths
    (``dfine_decoder.py:329-343``); gate zero-init with p=0.5 bias."""

    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        gates = jax.nn.sigmoid(
            nn.Dense(
                2 * self.d_model,
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=_bias_init_with_prob(0.5),
                name="gate",
            )(jnp.concatenate([x1, x2], axis=-1))
        )
        g1, g2 = jnp.split(gates, 2, axis=-1)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(
            g1 * x1 + g2 * x2
        )


class LQE(nn.Module):
    """Location quality estimator (``dfine_decoder.py:369-385``): class
    logits += MLP(top-k per-edge bin probs + their mean)."""

    cfg: DetrConfig
    k: int = 4
    hidden: int = 64

    @nn.compact
    def __call__(self, scores: jax.Array, corners: jax.Array) -> jax.Array:
        cfg = self.cfg
        B, Q = corners.shape[0], corners.shape[1]
        prob = jax.nn.softmax(
            corners.reshape(B, Q, 4, cfg.reg_max + 1).astype(jnp.float32),
            axis=-1,
        )
        topk = jax.lax.top_k(prob, self.k)[0]
        stat = jnp.concatenate(
            [topk, topk.mean(axis=-1, keepdims=True)], axis=-1
        ).reshape(B, Q, 4 * (self.k + 1))
        q = MLPRef(
            (self.hidden, 1),
            act="relu",
            last_zero=True,
            dtype=cfg.dtype,
            name="reg_conf",
        )(stat.astype(cfg.dtype))
        return scores + q.astype(scores.dtype)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer with gated cross-attention
    (``dfine_decoder.py:241-327``). When ``cfg.use_dfine`` is False this is
    instead the RT-DETRv2 layer (``rtdetrv2_decoder.py:240-320``): plain
    residual + norm2 after a value/output-projected deformable attention."""

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self,
        target: jax.Array,  # (B, Q, D)
        ref_points: jax.Array,  # (B, Q, 4)
        value_levels: Sequence[jax.Array],
        query_pos: jax.Array,  # (B, Q, D)
        mask_keep: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        D = cfg.d_model
        qk = target + query_pos
        sa = TorchMHA(
            D, cfg.num_heads, dtype=cfg.dtype, name="self_attn"
        )(qk, qk, target, mask_keep)
        target = nn.LayerNorm(
            epsilon=LN_EPS, dtype=cfg.dtype, name="norm1"
        )(target + sa)

        ca = MSDeformableAttention(
            cfg, with_value_proj=not cfg.use_dfine, name="cross_attn"
        )(target + query_pos, ref_points, value_levels)
        if cfg.use_dfine:
            target = Gate(D, dtype=cfg.dtype, name="gateway")(target, ca)
        else:
            target = nn.LayerNorm(
                epsilon=LN_EPS, dtype=cfg.dtype, name="norm2"
            )(target + ca)

        h = nn.Dense(cfg.dim_feedforward, dtype=cfg.dtype, name="linear1")(
            target
        )
        h = nn.Dense(D, dtype=cfg.dtype, name="linear2")(nn.relu(h))
        target = nn.LayerNorm(
            epsilon=LN_EPS, dtype=cfg.dtype, name="norm3"
        )(jnp.clip(target + h, -65504.0, 65504.0))
        return target


def generate_anchors(
    spatial_shapes: Sequence[Tuple[int, int]],
    grid_size: float = 0.05,
    eps: float = 1e-2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference ``_generate_anchors`` (``dfine_decoder.py:894-925``):
    per-level center grids with wh = 0.05 * 2^lvl, logit-space, +inf where
    outside the [eps, 1-eps] validity band. Static (numpy)."""
    anchors = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(
            np.arange(h, dtype=np.float32),
            np.arange(w, dtype=np.float32),
            indexing="ij",
        )
        gxy = np.stack([gx, gy], -1)
        gxy = (gxy + 0.5) / np.asarray([w, h], np.float32)
        wh = np.ones_like(gxy) * grid_size * (2.0 ** lvl)
        anchors.append(np.concatenate([gxy, wh], -1).reshape(h * w, 4))
    a = np.concatenate(anchors, 0)
    valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)
    with np.errstate(divide="ignore"):
        a = np.log(a / (1 - a))
    a = np.where(valid, a, np.inf).astype(np.float32)
    return a, valid


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Reference ``utils.inverse_sigmoid``: clip to [0,1] then logit with
    eps-clamped numerator/denominator."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(
        jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None)
    )


class DETRDecoder(nn.Module):
    """The reference ``DFINETransformer`` (``dfine_decoder.py:605-1161``)
    as one flax module: input projection, anchor/top-k query selection,
    denoising queries, and the FDR decoder loop. ``cfg.use_dfine=False``
    uses direct-delta refinement heads (RT-DETRv2 style) on the same layer
    stack.

    Returns ``[(logits, boxes)]`` per level — encoder top-k level, pre
    level (D-FINE only), then one per decoder layer — with class logits of
    reference width ``num_classes``. Sows ``dfine_dists`` (corner logits
    (B,Q,4,nb), anchor) per layer for the FGL/DDF losses and
    ``final_queries`` for the instance-segmentation mask head."""

    cfg: DetrConfig

    @nn.compact
    def __call__(
        self,
        levels: Sequence[jax.Array],
        train: bool = False,
        dn_labels: Any = None,  # (B, Dn) int noised labels
        dn_boxes: Any = None,  # (B, Dn, 4) cxcywh noised
        dn_group_size: int = 0,
    ) -> List[Tuple[jax.Array, jax.Array]]:
        cfg = self.cfg
        D = cfg.d_model
        C = cfg.num_classes
        B = levels[0].shape[0]

        # Input projection (``_build_input_proj_layer``): D-FINE uses the
        # identity when the encoder already emits hidden_dim channels
        # (``dfine_decoder.py:745-760``); RT-DETRv2 ALWAYS projects
        # (``rtdetrv2_decoder.py:559-603``), so its checkpoints carry
        # input_proj weights even at matching widths.
        proj = []
        for i, f in enumerate(levels):
            if f.shape[-1] != D or not cfg.use_dfine:
                x = nn.Conv(
                    D, (1, 1), use_bias=False, dtype=cfg.dtype,
                    name=f"input_proj{i}_conv",
                )(f)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=cfg.dtype,
                    name=f"input_proj{i}_norm",
                )(x)
                proj.append(x)
            else:
                proj.append(f)
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in proj]
        memory = jnp.concatenate(
            [f.reshape(B, -1, D) for f in proj], axis=1
        )  # (B, N, D)

        anchors_np, valid_np = generate_anchors(
            spatial_shapes, eps=cfg.anchor_eps
        )
        anchors = jnp.asarray(anchors_np)[None]  # (1, N, 4) logit space
        valid = jnp.asarray(valid_np.astype(np.float32))[None]

        masked_memory = memory * valid.astype(memory.dtype)
        out_mem = nn.Dense(D, dtype=cfg.dtype, name="enc_output_proj")(
            masked_memory
        )
        out_mem = nn.LayerNorm(
            epsilon=LN_EPS, dtype=cfg.dtype, name="enc_output_norm"
        )(out_mem)
        enc_logits = nn.Dense(
            C, dtype=cfg.dtype,
            bias_init=_bias_init_with_prob(0.01),
            name="enc_score_head",
        )(out_mem)

        k = min(cfg.num_queries, memory.shape[1])
        topk = jax.lax.top_k(
            jnp.max(enc_logits.astype(jnp.float32), axis=-1), k
        )[1]
        topk_mem = jnp.take_along_axis(out_mem, topk[..., None], axis=1)
        topk_logits = jnp.take_along_axis(
            enc_logits, topk[..., None], axis=1
        )
        topk_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (B,) + anchors.shape[1:]),
            topk[..., None],
            axis=1,
        )
        enc_bbox_unact = (
            MLPRef(
                (D, D, 4), last_zero=True, dtype=cfg.dtype,
                name="enc_bbox_head",
            )(topk_mem).astype(jnp.float32)
            + topk_anchors
        )
        enc_boxes = jax.nn.sigmoid(enc_bbox_unact)

        content = jax.lax.stop_gradient(topk_mem)
        ref_unact = jax.lax.stop_gradient(enc_bbox_unact)

        # Denoising queries (``denoising.py``): label-embedded content +
        # inverse-sigmoid boxes prepended; groups isolated via the
        # attention mask. Table created unconditionally so train/inference
        # param trees match; last row is the padding class (zero, torch
        # ``padding_idx=num_classes``).
        def _dn_embed_init(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)
            return w.at[-1].set(0.0)

        dn_embed = self.param(
            "denoising_class_embed", _dn_embed_init, (C + 1, D),
            jnp.float32,
        )
        mask_keep = None
        n_dn = 0
        if dn_labels is not None:
            n_dn = dn_labels.shape[1]
            dn_content = dn_embed[dn_labels].astype(content.dtype)
            content = jnp.concatenate([dn_content, content], axis=1)
            ref_unact = jnp.concatenate(
                [
                    inverse_sigmoid(dn_boxes.astype(jnp.float32)),
                    ref_unact,
                ],
                axis=1,
            )
            N = n_dn + k
            idx = jnp.arange(N)
            group = jnp.where(
                idx < n_dn, idx // max(dn_group_size, 1), -1
            )
            is_dn_col = (idx < n_dn)[None, :]
            same_group = group[:, None] == group[None, :]
            mask_keep = jnp.where(is_dn_col, same_group, True)[
                None, None, :, :
            ]

        outputs: List[Tuple[jax.Array, jax.Array]] = []
        outputs.append((topk_logits.astype(jnp.float32), enc_boxes))

        # Shared across layers (single instances, reference
        # ``query_pos_head`` / ``pre_bbox_head``).
        query_pos_head = MLPRef(
            (2 * D, D), dtype=cfg.dtype, name="query_pos_head"
        )
        pre_bbox_head = MLPRef(
            (D, D, 4), last_zero=True, dtype=cfg.dtype,
            name="pre_bbox_head",
        )

        project = weighting_function(
            cfg.reg_max, cfg.dfine_up, cfg.dfine_reg_scale
        )
        ref_detach = jax.nn.sigmoid(ref_unact)  # fp32
        output = content
        output_detach = None
        corners_undetach = None
        ref_initial = None
        for i in range(cfg.num_decoder_layers):
            qpe = query_pos_head(ref_detach.astype(cfg.dtype))
            if cfg.use_dfine:
                # D-FINE clamps the query pos embed (``dfine_decoder.py:497``);
                # RT-DETRv2 does not (``rtdetrv2_decoder.py:355``).
                qpe = jnp.clip(qpe, -10.0, 10.0)
            output = TransformerDecoderLayer(cfg, name=f"layer{i}")(
                output, ref_detach.astype(cfg.dtype), proj, qpe,
                mask_keep, train,
            )
            # Per-layer query state (torch ``return_query_states``,
            # ``dfine_decoder.py:519-520``) for the EdgeCrafter seg head.
            self.sow("intermediates", "query_states", output)
            out32 = output.astype(jnp.float32)
            score_head = nn.Dense(
                C, dtype=cfg.dtype,
                bias_init=_bias_init_with_prob(0.01),
                name=f"dec_score_head{i}",
            )

            if cfg.use_dfine:
                if i == 0:
                    pre_boxes = jax.nn.sigmoid(
                        pre_bbox_head(output).astype(jnp.float32)
                        + inverse_sigmoid(ref_detach)
                    )
                    ref_initial = jax.lax.stop_gradient(pre_boxes)
                    pre_logits = score_head(output).astype(jnp.float32)
                    outputs.append((pre_logits, pre_boxes))
                head_in = out32
                if output_detach is not None:
                    head_in = head_in + output_detach
                corners = MLPRef(
                    (D, D, 4 * (cfg.reg_max + 1)),
                    last_zero=True,
                    dtype=cfg.dtype,
                    name=f"dec_bbox_head{i}",
                )(head_in.astype(cfg.dtype)).astype(jnp.float32)
                if corners_undetach is not None:
                    corners = corners + corners_undetach
                new_boxes = distance2bbox(
                    ref_initial,
                    integral(
                        corners.reshape(
                            corners.shape[0], corners.shape[1], 4,
                            cfg.reg_max + 1,
                        ),
                        project,
                    ),
                    cfg.dfine_reg_scale,
                )
                self.sow(
                    "intermediates",
                    "dfine_dists",
                    (
                        corners.reshape(
                            corners.shape[0], corners.shape[1], 4,
                            cfg.reg_max + 1,
                        ),
                        ref_initial,
                    ),
                )
                scores = score_head(out32.astype(cfg.dtype)).astype(
                    jnp.float32
                )
                scores = LQE(cfg, name=f"lqe{i}")(scores, corners)
                outputs.append((scores, new_boxes))
                corners_undetach = corners
                ref_detach = jax.lax.stop_gradient(new_boxes)
                output_detach = jax.lax.stop_gradient(out32)
            else:
                logits = score_head(output).astype(jnp.float32)
                delta = MLPRef(
                    (D, D, 4), last_zero=True, dtype=cfg.dtype,
                    name=f"dec_bbox_head{i}",
                )(output).astype(jnp.float32)
                new_boxes = jax.nn.sigmoid(
                    delta + inverse_sigmoid(ref_detach)
                )
                outputs.append((logits, new_boxes))
                ref_detach = jax.lax.stop_gradient(new_boxes)

        self.sow("intermediates", "final_queries", output)
        return outputs
