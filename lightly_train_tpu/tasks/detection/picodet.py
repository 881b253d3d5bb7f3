"""PicoDet: ESNet backbone + CSP-PAN neck + GFL head with SimOTA assignment.

Rebuild of ``src/lightly_train/_task_models/picodet_object_detection/``
(``esnet.py``, ``csp_pan.py:196``, ``pico_head.py:188``,
``sim_ota_assigner.py:136``, ``train_model.py:493-668``; sizes s-416 / l-640,
``config.py:53-76``): an embedded-friendly detector trained with
Generalized Focal Loss — a shared-branch head emitting class logits plus a
discrete distance distribution per box side (DFL, ``Integral``
``pico_head.py:66``), supervised by VarifocalLoss + weighted GIoU + DFL under
SimOTA dynamic-k assignment.

The backbone/neck/head modules are PARAMETER-ISOMORPHIC with the
reference (round 5): ``ESNet`` reproduces ``EnhancedInvertedResidual{,DS}``
(ghost branch, SE placement, the DS blocks' MobileNetV1 dw/pw tail,
per-block mid channels from the size's ``channel_ratios``), ``CSPPAN`` the
``CSPLayer``/``DarknetBottleneck`` stacks + two-conv P6, ``PicoDetHead``
the ``share_cls_reg`` GFL head — so reference checkpoints convert exactly
(``convert.convert_torch_picodet_state_dict``; the deployed one-to-one
head becomes this model's single head, golden round-trip in
``tests/tasks/test_zoo_picodet_convert.py``).

TPU-native design notes (not a translation):
- SimOTA is data-dependent in the reference (per-image Python loop over gts
  with ``topk(k)`` for a *dynamic* k, ``sim_ota_assigner.py:352-420``). Here
  it is one fixed-shape vectorized program: per-gt candidate costs are
  ranked by a static ``top_k(candidate_topk)``, and "the dynamic_k cheapest"
  becomes a per-column cost threshold (the value at rank ``dynamic_k-1``),
  so matching is an elementwise compare — no scatter, no host callback,
  vmapped over the batch.
- Loss normalizers (num_pos / score-weight sums) are plain sums over the
  batch axis; under GSPMD with the batch sharded they become global psums,
  reproducing the reference's ``dist.all_reduce`` normalization
  (``train_model.py:643-655``) with zero collective code.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.tasks.base import TaskArgs
from lightly_train_tpu.tasks.detection.box_utils import cxcywh_to_xyxy
from lightly_train_tpu.tasks.detection.components import ConvBNAct
from lightly_train_tpu.tasks.detection.ltdetr import ObjectDetectionTrainModel

_INF = 1e8


class PicoDetArgs(TaskArgs):
    num_classes: int = 80
    # Reference size presets (``config.py:53-76``): "s" = Small416 (ESNet-s
    # scale 0.75, neck/head 96, 2 stacked head convs), "l" = Large640
    # (ESNet-l scale 1.25, neck/head 128, 3 stacked convs).
    model_size: str = "s"
    reg_max: int = 7
    center_radius: float = 2.5
    candidate_topk: int = 10
    iou_cost_weight: float = 6.0
    cls_cost_weight: float = 1.0
    loss_vfl_weight: float = 1.0
    loss_giou_weight: float = 2.0
    loss_dfl_weight: float = 0.25
    max_detections: int = 100
    score_threshold: float = 0.0
    default_steps: int = 60_000
    default_batch_size: int = 64


def _make_divisible(v: float, divisor: int, min_value: "int | None" = None) -> int:
    """Reference channel rounding (``esnet.py:23-40``)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# ESNet size settings (``esnet.py:273-330``): per-size width scale + the
# per-block mid-channel ratios.
_ESNET_SETTINGS: Dict[str, Tuple[float, Tuple[float, ...]]] = {
    "s": (0.75, (0.875, 0.5, 0.5, 0.5, 0.625, 0.5, 0.625, 0.5, 0.5, 0.5,
                 0.5, 0.5, 0.5)),
    "m": (1.0, (0.875, 0.5, 1.0, 0.625, 0.5, 0.75, 0.625, 0.625, 0.5,
                0.625, 1.0, 0.625, 0.75)),
    "l": (1.25, (0.875, 0.5, 1.0, 0.625, 0.5, 0.75, 0.625, 0.625, 0.5,
                 0.625, 1.0, 0.625, 0.75)),
    # Hidden CPU-test size (stage channels 16/32/64).
    "test": (0.125, (0.5,) * 13),
}
_ESNET_STAGE_REPEATS = (3, 7, 3)

# Task-model preset (``config.py:53-76``): neck/head channels + stacked
# head convs per size.
_PICODET_PRESETS: Dict[str, Tuple[int, int, int]] = {
    "s": (96, 96, 2),
    "l": (128, 128, 3),
    "test": (16, 16, 1),
}


def esnet_stage_channels(model_size: str) -> Tuple[int, ...]:
    scale, _ = _ESNET_SETTINGS[model_size]
    return (
        24,
        _make_divisible(128 * scale, 16),
        _make_divisible(256 * scale, 16),
        _make_divisible(512 * scale, 16),
    )


class PDConv(nn.Module):
    """Reference esnet ``ConvBNAct`` (``esnet.py:68-104``): conv(bias=False)
    + BN + {relu, identity}, torch (k-1)//2 padding."""

    out_ch: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.kernel // 2
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=((p, p), (p, p)),
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x) if self.act else x


class PDDWSep(nn.Module):
    """Reference ``DepthwiseSeparableConv`` (``csp_pan.py:23-60`` /
    ``pico_head.py:30-64``): dw conv + pw conv (both bias-free) + one BN +
    ReLU."""

    out_ch: int
    kernel: int = 5
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.kernel // 2
        x = nn.Conv(
            x.shape[-1], (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=((p, p), (p, p)),
            feature_group_count=x.shape[-1], use_bias=False,
            dtype=self.dtype, name="depthwise",
        )(x)
        x = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
            name="pointwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


class PDSE(nn.Module):
    """Reference ``SEModule`` (``esnet.py:106-125``): 1x1 fc convs WITH
    bias, relu then sigmoid gate."""

    ch: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(
            self.ch // self.reduction, (1, 1), dtype=self.dtype, name="fc1"
        )(s))
        s = jax.nn.sigmoid(nn.Conv(
            self.ch, (1, 1), dtype=self.dtype, name="fc2"
        )(s))
        return x * s


def _channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    B, H, W, C = x.shape
    return (
        x.reshape(B, H, W, groups, C // groups)
        .transpose(0, 1, 2, 4, 3)
        .reshape(B, H, W, C)
    )


class _EIR(nn.Module):
    """``EnhancedInvertedResidual`` (stride 1, ``esnet.py:127-175``): split,
    ghost branch (pw -> dw -> cat) + SE + linear, concat, shuffle."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        half_mid = self.mid_ch // 2
        x1, x2 = jnp.split(x, 2, axis=-1)
        x2 = PDConv(half_mid, 1, dtype=self.dtype, name="conv_pw")(x2, train)
        x3 = PDConv(
            half_mid, 3, groups=half_mid, act=False, dtype=self.dtype,
            name="conv_dw",
        )(x2, train)
        x3 = jnp.concatenate([x2, x3], axis=-1)
        x3 = PDSE(self.mid_ch, dtype=self.dtype, name="se")(x3)
        x3 = PDConv(
            self.out_ch // 2, 1, dtype=self.dtype, name="conv_linear"
        )(x3, train)
        return _channel_shuffle(jnp.concatenate([x1, x3], axis=-1))


class _EIRDS(nn.Module):
    """``EnhancedInvertedResidualDS`` (stride 2, ``esnet.py:178-252``): two
    downsampling branches + a MobileNetV1-style dw/pw tail."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        half_mid = self.mid_ch // 2
        x1 = PDConv(
            in_ch, 3, stride=2, groups=in_ch, act=False, dtype=self.dtype,
            name="conv_dw_1",
        )(x, train)
        x1 = PDConv(
            self.out_ch // 2, 1, dtype=self.dtype, name="conv_linear_1"
        )(x1, train)
        x2 = PDConv(half_mid, 1, dtype=self.dtype, name="conv_pw_2")(x, train)
        x2 = PDConv(
            half_mid, 3, stride=2, groups=half_mid, act=False,
            dtype=self.dtype, name="conv_dw_2",
        )(x2, train)
        x2 = PDSE(half_mid, dtype=self.dtype, name="se")(x2)
        x2 = PDConv(
            self.out_ch // 2, 1, dtype=self.dtype, name="conv_linear_2"
        )(x2, train)
        out = jnp.concatenate([x1, x2], axis=-1)
        out = PDConv(
            self.out_ch, 3, groups=self.out_ch, dtype=self.dtype,
            name="conv_dw_mv1",
        )(out, train)
        return PDConv(
            self.out_ch, 1, dtype=self.dtype, name="conv_pw_mv1"
        )(out, train)


class ESNet(nn.Module):
    """Parameter-isomorphic ESNet (``esnet.py:254-430``); out_indices
    (2, 9, 12) -> C3/C4/C5 at strides 8/16/32."""

    model_size: str = "s"
    out_indices: Tuple[int, ...] = (2, 9, 12)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        scale, ratios = _ESNET_SETTINGS[self.model_size]
        stage_ch = esnet_stage_channels(self.model_size)
        x = PDConv(stage_ch[0], 3, stride=2, dtype=self.dtype, name="conv1")(
            x, train
        )
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        feats = []
        arch_idx = 0
        for stage_id, num_repeat in enumerate(_ESNET_STAGE_REPEATS):
            for i in range(num_repeat):
                out_ch = stage_ch[stage_id + 1]
                mid_ch = _make_divisible(out_ch * ratios[arch_idx], 8)
                if i == 0:
                    x = _EIRDS(
                        mid_ch, out_ch, self.dtype, name=f"block{arch_idx}"
                    )(x, train)
                else:
                    x = _EIR(
                        mid_ch, out_ch, self.dtype, name=f"block{arch_idx}"
                    )(x, train)
                if arch_idx in self.out_indices:
                    feats.append(x)
                arch_idx += 1
        return feats  # strides 8, 16, 32


class _DarknetBottleneck(nn.Module):
    """``DarknetBottleneck`` (``csp_pan.py:93-136``): 1x1 ConvBNAct +
    k5 depthwise-separable; optional identity."""

    out_ch: int
    kernel: int = 5
    expansion: float = 0.5
    add_identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_ch * self.expansion)
        h = PDConv(hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        h = PDDWSep(self.out_ch, self.kernel, dtype=self.dtype, name="conv2")(
            h, train
        )
        if self.add_identity and x.shape[-1] == self.out_ch:
            h = h + x
        return h


class _CSPLayer(nn.Module):
    """``CSPLayer`` (``csp_pan.py:139-192``)."""

    out_ch: int
    kernel: int = 5
    expansion: float = 0.5
    num_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mid = int(self.out_ch * self.expansion)
        short = PDConv(mid, 1, dtype=self.dtype, name="short_conv")(x, train)
        main = PDConv(mid, 1, dtype=self.dtype, name="main_conv")(x, train)
        for j in range(self.num_blocks):
            main = _DarknetBottleneck(
                mid, self.kernel, self.expansion, dtype=self.dtype,
                name=f"blocks{j}",
            )(main, train)
        return PDConv(self.out_ch, 1, dtype=self.dtype, name="final_conv")(
            jnp.concatenate([main, short], axis=-1), train
        )


class CSPPAN(nn.Module):
    """Parameter-isomorphic CSP-PAN (``csp_pan.py:196-340``): per-level 1x1
    transforms, top-down + bottom-up k5 CSP layers, and the two-conv P6."""

    out_ch: int
    kernel: int = 5
    expansion: float = 1.0
    num_csp_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool) -> List[jax.Array]:
        n = len(feats)
        inputs = [
            PDConv(self.out_ch, 1, dtype=self.dtype, name=f"transforms{i}")(
                f, train
            )
            for i, f in enumerate(feats)
        ]
        B = inputs[0].shape[0]
        inner = [inputs[-1]]
        for idx in range(n - 1, 0, -1):
            up = jax.image.resize(
                inner[0],
                (B,) + inputs[idx - 1].shape[1:3] + (self.out_ch,),
                "nearest",
            )
            inner.insert(0, _CSPLayer(
                self.out_ch, self.kernel, self.expansion,
                self.num_csp_blocks, dtype=self.dtype,
                name=f"top_down_blocks{n - 1 - idx}",
            )(jnp.concatenate([up, inputs[idx - 1]], axis=-1), train))
        outs = [inner[0]]
        for idx in range(n - 1):
            down = PDDWSep(
                self.out_ch, self.kernel, 2, dtype=self.dtype,
                name=f"downsamples{idx}",
            )(outs[-1], train)
            outs.append(_CSPLayer(
                self.out_ch, self.kernel, self.expansion,
                self.num_csp_blocks, dtype=self.dtype,
                name=f"bottom_up_blocks{idx}",
            )(jnp.concatenate([down, inner[idx + 1]], axis=-1), train))
        p6 = PDDWSep(
            self.out_ch, self.kernel, 2, dtype=self.dtype,
            name="first_top_conv",
        )(inputs[-1], train) + PDDWSep(
            self.out_ch, self.kernel, 2, dtype=self.dtype,
            name="second_top_conv",
        )(outs[-1], train)
        return outs + [p6]


class PicoDetHead(nn.Module):
    """Parameter-isomorphic GFL head (``pico_head.py:188-370``,
    ``share_cls_reg=True``): per-level stacked k5 depthwise-separable convs
    + one 1x1 conv emitting ``num_classes + 4*(reg_max+1)`` channels."""

    num_classes: int
    feat_ch: int
    stacked_convs: int
    reg_max: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: Sequence[jax.Array], train: bool):
        cls_outs, reg_outs = [], []
        for li, f in enumerate(levels):
            h = f
            for i in range(self.stacked_convs):
                h = PDDWSep(
                    self.feat_ch, 5, dtype=self.dtype,
                    name=f"cls_convs{li}_{i}",
                )(h, train)
            out = nn.Conv(
                self.num_classes + 4 * (self.reg_max + 1), (1, 1),
                dtype=self.dtype, name=f"gfl_cls{li}",
            )(h)
            cls_outs.append(out[..., : self.num_classes])
            reg_outs.append(out[..., self.num_classes:])
        return cls_outs, reg_outs  # (B, H, W, C) / (B, H, W, 4*(reg_max+1))


class _PicoDetModule(nn.Module):
    args: PicoDetArgs

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False):
        size = self.args.model_size
        neck_ch, head_ch, stacked = _PICODET_PRESETS.get(
            size, _PICODET_PRESETS["s"]
        )
        feats = ESNet(size, name="backbone")(
            images.astype(jnp.float32), train
        )
        levels = CSPPAN(neck_ch, name="neck")(feats, train)
        return PicoDetHead(
            self.args.num_classes, head_ch, stacked, self.args.reg_max,
            name="head",
        )(levels, train)


_STRIDES = (8, 16, 32, 64)


def integral_decode(reg: jax.Array, reg_max: int) -> jax.Array:
    """Distribution → expected distance (``Integral``, ``pico_head.py:66``).

    reg: (..., 4*(reg_max+1)) logits → (..., 4) expectations in [0, reg_max].
    """
    bins = reg.reshape(*reg.shape[:-1], 4, reg_max + 1)
    probs = jax.nn.softmax(bins.astype(jnp.float32), axis=-1)
    project = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.einsum("...kb,b->...k", probs, project)


def _iou_xyxy(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU between (N,4) and (K,4) xyxy boxes → (N,K)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _giou_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """Aligned GIoU between (N,4) and (N,4) xyxy boxes → (N,)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, :2], b[:, :2])
    rb = jnp.minimum(a[:, 2:], b[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = jnp.clip(area_a + area_b - inter, 1e-9)
    iou = inter / union
    elt = jnp.minimum(a[:, :2], b[:, :2])
    erb = jnp.maximum(a[:, 2:], b[:, 2:])
    ewh = jnp.clip(erb - elt, 0)
    enclose = jnp.clip(ewh[:, 0] * ewh[:, 1], 1e-9)
    return iou - (enclose - union) / enclose


def simota_assign(
    scores: jax.Array,       # (N, C) sigmoid scores (stop-gradded)
    points: jax.Array,       # (N, 2) prior centers, px
    strides: jax.Array,      # (N,)
    decoded: jax.Array,      # (N, 4) decoded boxes xyxy px (stop-gradded)
    gt_boxes: jax.Array,     # (K, 4) xyxy px
    gt_labels: jax.Array,    # (K,)
    gt_valid: jax.Array,     # (K,) bool
    center_radius: float,
    candidate_topk: int,
    iou_weight: float,
    cls_weight: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape SimOTA (``sim_ota_assigner.py:136-420``).

    Returns (is_pos (N,), assigned_gt (N,), pair_iou (N,)): for positives,
    the matched gt index and the prior-gt IoU used as the VFL target basis.
    """
    N = points.shape[0]
    K = gt_boxes.shape[0]
    px, py = points[:, 0], points[:, 1]

    in_gt = (
        (px[:, None] > gt_boxes[None, :, 0])
        & (px[:, None] < gt_boxes[None, :, 2])
        & (py[:, None] > gt_boxes[None, :, 1])
        & (py[:, None] < gt_boxes[None, :, 3])
    )
    cxg = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    cyg = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = center_radius * strides[:, None]
    in_center = (
        (px[:, None] > cxg[None, :] - r)
        & (px[:, None] < cxg[None, :] + r)
        & (py[:, None] > cyg[None, :] - r)
        & (py[:, None] < cyg[None, :] + r)
    )
    gv = gt_valid[None, :]
    candidate = (in_gt | in_center) & gv          # reference valid rows
    strong = in_gt & in_center & gv               # finite-cost pairs
    valid_prior = jnp.any(candidate, axis=1)      # (N,)

    iou = _iou_xyxy(decoded, gt_boxes)            # (N, K)
    iou_valid = jnp.where(valid_prior[:, None] & gv, iou, 0.0)

    # GIoU cost (pairwise): expand aligned formula.
    area_p = jnp.clip(decoded[:, 2] - decoded[:, 0], 0) * jnp.clip(
        decoded[:, 3] - decoded[:, 1], 0
    )
    area_g = jnp.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 0) * jnp.clip(
        gt_boxes[:, 3] - gt_boxes[:, 1], 0
    )
    lt = jnp.maximum(decoded[:, None, :2], gt_boxes[None, :, :2])
    rb = jnp.minimum(decoded[:, None, 2:], gt_boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = jnp.clip(area_p[:, None] + area_g[None, :] - inter, 1e-9)
    elt = jnp.minimum(decoded[:, None, :2], gt_boxes[None, :, :2])
    erb = jnp.maximum(decoded[:, None, 2:], gt_boxes[None, :, 2:])
    ewh = jnp.clip(erb - elt, 0)
    enclose = jnp.clip(ewh[..., 0] * ewh[..., 1], 1e-9)
    giou = inter / union - (enclose - union) / enclose
    giou_cost = 1.0 - giou

    # VFL cost (``sim_ota_assigner.py:295-350``): per (prior, gt) pair, a
    # varifocal BCE between sigmoid scores and a target that is the pair IoU
    # at the gt class, 0 elsewhere. Computed without materializing
    # (N, K, C): split the per-class sum into the gt-class term plus the
    # all-negative background sum minus the gt-class background term.
    alpha, gamma = 0.75, 2.0
    p = jnp.clip(scores, 1e-7, 1 - 1e-7)          # (N, C)
    t = iou                                        # (N, K) target at gt class
    p_at = p[:, gt_labels]                         # (N, K) score at gt class
    pos_term = (
        -(t * jnp.log(p_at) + (1 - t) * jnp.log(1 - p_at))
        * jnp.where(t > 0, t, alpha * jnp.abs(p_at - t) ** gamma)
    )
    neg_all = (alpha * p**gamma) * (-jnp.log(1 - p))   # (N, C)
    neg_sum = jnp.sum(neg_all, axis=1)                  # (N,)
    neg_at = neg_all[:, gt_labels]                      # (N, K)
    vfl_cost = pos_term + (neg_sum[:, None] - neg_at)

    cost = (
        cls_weight * vfl_cost
        + iou_weight * giou_cost
        + jnp.where(strong, 0.0, _INF)
        + jnp.where(valid_prior[:, None], 0.0, _INF)
    )

    # Dynamic k per gt: floor(sum of top-candidate_topk IoUs), min 1.
    k_cand = min(candidate_topk, N)
    top_ious = jax.lax.top_k(iou_valid.T, k_cand)[0]        # (K, k_cand)
    dynamic_k = jnp.clip(
        jnp.floor(jnp.sum(top_ious, axis=1)).astype(jnp.int32), 1, k_cand
    )
    # "dynamic_k cheapest priors" == cost <= value at rank dynamic_k-1.
    neg_top_cost = jax.lax.top_k(-cost.T, k_cand)[0]        # (K, k_cand) desc
    sorted_cost = -neg_top_cost                              # asc per gt
    thresh = jnp.take_along_axis(
        sorted_cost, (dynamic_k - 1)[:, None], axis=1
    )[:, 0]                                                  # (K,)
    matched = (cost <= thresh[None, :]) & (cost < _INF / 2)  # (N, K)

    # Conflict resolution: a prior matched to several gts keeps the cheapest.
    best_gt = jnp.argmin(jnp.where(matched, cost, jnp.inf), axis=1)  # (N,)
    is_pos = jnp.any(matched, axis=1)
    pair_iou = jnp.take_along_axis(iou, best_gt[:, None], axis=1)[:, 0]
    return is_pos, best_gt, jnp.where(is_pos, pair_iou, 0.0)


class PicoDetTrainModel(ObjectDetectionTrainModel):
    task = "object_detection"
    val_mode = "collect"

    def __init__(self, wrapped, args: PicoDetArgs):
        # PicoDet owns its backbone (ESNet, trained from scratch like the
        # reference); ``wrapped`` is None.
        self.wrapped = wrapped
        self.args = args
        self.module = _PicoDetModule(args)

    def init(self, rng, sample_batch):
        k1, k2 = jax.random.split(rng)
        variables = self.module.init(
            {"params": k1, "droppath": k2},
            sample_batch["images"].astype(jnp.float32), train=False,
        )
        params = variables.pop("params")
        return {"backbone": params}, dict(variables)

    def convert_to_deploy(self, variables):
        """PicoDet has nothing to fuse: plain conv+BN stacks, no RepVgg
        branches (the LT-DETR override does not apply — it assumes the
        hybrid-encoder config this model doesn't carry). Deploy form ==
        eval form; BN folds are left to the serving compiler."""
        return self, variables

    def _forward(self, params, model_state, images, train, rng=None):
        variables = {"params": params["backbone"], **model_state}
        mutable = [k for k in model_state] if (model_state and train) else False
        out = self.module.apply(variables, images, train=train, mutable=mutable)
        if mutable:
            (cls_outs, reg_outs), new_state = out
        else:
            cls_outs, reg_outs = out
            new_state = model_state
        return cls_outs, reg_outs, new_state

    def _flatten(self, cls_outs, reg_outs):
        """Flatten levels → (B,N,C) logits, (B,N,4R) reg, points/strides."""
        a = self.args
        cls_flat, reg_flat, pts, sts = [], [], [], []
        for lvl, (c, rg) in enumerate(zip(cls_outs, reg_outs)):
            B, H, W, C = c.shape
            s = float(_STRIDES[lvl])
            cls_flat.append(c.reshape(B, H * W, C))
            reg_flat.append(rg.reshape(B, H * W, 4 * (a.reg_max + 1)))
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * s
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * s
            g = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
            pts.append(g.reshape(-1, 2))
            sts.append(jnp.full((H * W,), s, jnp.float32))
        return (
            jnp.concatenate(cls_flat, axis=1),
            jnp.concatenate(reg_flat, axis=1),
            jnp.concatenate(pts),
            jnp.concatenate(sts),
        )

    def _decode_boxes(self, reg, pts, strides):
        """(B,N,4R) distribution → (B,N,4) xyxy px via Integral decode."""
        dist = integral_decode(reg, self.args.reg_max)  # (B, N, 4) feat units
        dist = dist * strides[None, :, None]
        return jnp.stack(
            [
                pts[None, :, 0] - dist[..., 0],
                pts[None, :, 1] - dist[..., 1],
                pts[None, :, 0] + dist[..., 2],
                pts[None, :, 1] + dist[..., 3],
            ],
            axis=-1,
        )

    def loss_fn(self, params, model_state, batch, rng, step):
        del step
        a = self.args
        images = batch["images"]
        H, W = images.shape[1:3]
        cls_outs, reg_outs, new_state = self._forward(
            params, model_state, images, True, rng
        )
        cls, reg, pts, strides = self._flatten(cls_outs, reg_outs)
        cls = cls.astype(jnp.float32)
        reg = reg.astype(jnp.float32)
        boxes_px = self._decode_boxes(reg, pts, strides)  # (B, N, 4)
        B, N, C = cls.shape
        scale = jnp.asarray([W, H, W, H], jnp.float32)
        gt_xyxy = cxcywh_to_xyxy(batch["boxes"]) * scale  # (B, K, 4)
        gt_valid = batch["box_valid"]
        gt_labels = batch["labels"]

        assign = jax.vmap(
            lambda sc, dec, gb, gl, gv: simota_assign(
                sc, pts, strides, dec, gb, gl, gv,
                a.center_radius, a.candidate_topk,
                a.iou_cost_weight, a.cls_cost_weight,
            )
        )
        scores_sg = jax.lax.stop_gradient(jax.nn.sigmoid(cls))
        boxes_sg = jax.lax.stop_gradient(boxes_px)
        is_pos, assigned_gt, _ = assign(
            scores_sg, boxes_sg, gt_xyxy, gt_labels, gt_valid
        )  # (B, N) each

        tgt_boxes = jnp.take_along_axis(
            gt_xyxy, assigned_gt[..., None], axis=1
        )  # (B, N, 4) px
        tgt_cls = jnp.take_along_axis(gt_labels, assigned_gt, axis=1)

        # Feature-unit boxes for GIoU/DFL (``train_model.py:596-634``).
        su = strides[None, :, None]
        pred_feat = boxes_px / su
        gt_feat = tgt_boxes / su
        pos_iou = jnp.clip(
            jax.vmap(lambda p_, g_: _iou_xyxy(p_, g_).diagonal())(
                jax.lax.stop_gradient(pred_feat), gt_feat
            ),
            1e-6,
        )  # (B, N)

        # VFL over all priors; target = aligned IoU at the gt class.
        vfl_target = (
            jax.nn.one_hot(tgt_cls, C) * (pos_iou * is_pos)[..., None]
        )
        p = jax.nn.sigmoid(cls)
        focal_w = jnp.where(
            vfl_target > 0,
            vfl_target,
            0.75 * jnp.abs(p - vfl_target) ** 2.0,
        )
        bce = optax_sigmoid_bce(cls, vfl_target)
        vfl = jnp.sum(bce * focal_w, axis=-1)  # (B, N)

        weight_t = jnp.max(scores_sg, axis=-1) * is_pos  # (B, N)
        n_pos = jnp.sum(is_pos, axis=1)  # (B,)
        num_pos_avg = jnp.clip(jnp.sum(jnp.maximum(n_pos, 1)), 1)
        weight_sum_avg = jnp.clip(jnp.sum(weight_t), 1)

        loss_vfl = jnp.sum(vfl) / num_pos_avg

        giou = jax.vmap(_giou_pair)(
            pred_feat, jax.lax.stop_gradient(gt_feat)
        )
        loss_giou = jnp.sum((1.0 - giou) * weight_t) / weight_sum_avg

        # DFL: CE to the two bins bracketing the target distance.
        centers_feat = pts[None] / strides[None, :, None]  # (1, N, 2)
        gt_dist = jnp.stack(
            [
                centers_feat[..., 0] - gt_feat[..., 0],
                centers_feat[..., 1] - gt_feat[..., 1],
                gt_feat[..., 2] - centers_feat[..., 0],
                gt_feat[..., 3] - centers_feat[..., 1],
            ],
            axis=-1,
        )
        gt_dist = jnp.clip(gt_dist, 0.0, a.reg_max - 0.01)  # (B, N, 4)
        lo = jnp.floor(gt_dist).astype(jnp.int32)
        hi = lo + 1
        w_lo = hi.astype(jnp.float32) - gt_dist
        w_hi = gt_dist - lo.astype(jnp.float32)
        logp = jax.nn.log_softmax(
            reg.reshape(B, N, 4, a.reg_max + 1), axis=-1
        )
        ce = -(
            jnp.take_along_axis(logp, lo[..., None], axis=-1)[..., 0] * w_lo
            + jnp.take_along_axis(logp, hi[..., None], axis=-1)[..., 0] * w_hi
        )  # (B, N, 4)
        dfl = jnp.sum(ce, axis=-1) / 4.0  # (B, N)
        loss_dfl = jnp.sum(dfl * weight_t) / weight_sum_avg

        loss = (
            a.loss_vfl_weight * loss_vfl
            + a.loss_giou_weight * loss_giou
            + a.loss_dfl_weight * loss_dfl
        )
        return loss, (
            new_state,
            {
                "loss_vfl": loss_vfl,
                "loss_giou": loss_giou,
                "loss_dfl": loss_dfl,
                "num_pos": jnp.sum(n_pos).astype(jnp.float32),
            },
        )

    def _decode_flat(self, cls, boxes, image_hw):
        C = cls.shape[-1]
        scores = jax.nn.sigmoid(cls.astype(jnp.float32))
        B, N, _ = scores.shape
        flat = scores.reshape(B, N * C)
        k = min(self.args.max_detections, N * C)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        p_idx = top_idx // C
        labels = top_idx % C
        sel = jnp.take_along_axis(boxes, p_idx[..., None], axis=1)
        norm = jnp.asarray(
            [image_hw[1], image_hw[0], image_hw[1], image_hw[0]], jnp.float32
        )
        return sel / norm, top_scores, labels

    def val_step(self, params, model_state, batch):
        images = batch["images"]
        H, W = images.shape[1:3]
        cls_outs, reg_outs, _ = self._forward(
            params, model_state, images, False
        )
        cls, reg, pts, strides = self._flatten(cls_outs, reg_outs)
        boxes = self._decode_boxes(reg.astype(jnp.float32), pts, strides)
        sel_boxes, scores, labels = self._decode_flat(cls, boxes, (H, W))
        return {
            "pred_boxes": sel_boxes,
            "pred_scores": scores,
            "pred_labels": labels,
            "tgt_boxes": cxcywh_to_xyxy(batch["boxes"]),
            "tgt_labels": batch["labels"],
            "tgt_valid": batch["box_valid"],
            "sample_valid": batch.get(
                "valid", jnp.ones(images.shape[0], bool)
            ),
        }

    def predict(self, variables, images):
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        H, W = images.shape[1:3]
        cls_outs, reg_outs, _ = self._forward(
            {"backbone": params["backbone"]}, model_state, images, False
        )
        cls, reg, pts, strides = self._flatten(cls_outs, reg_outs)
        boxes = self._decode_boxes(reg.astype(jnp.float32), pts, strides)
        return self._decode_flat(cls, boxes, (H, W))

    def wrap_pretrained(self, variables):
        # PicoDet's ESNet is trained from scratch; SSL-pretrained ViT/CNN
        # backbones do not map onto it.
        return {"params": {}}

    def use_ema(self) -> bool:
        return True

    def default_optimizer_args(self):
        from lightly_train_tpu._optim import SGDArgs

        return SGDArgs(lr=0.1, momentum=0.9, weight_decay=4e-5)


def optax_sigmoid_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise BCE-with-logits (stable log-sum-exp form)."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def load_torch_picodet_zoo(name: str, init_args: Dict[str, Any], state):
    """Zoo conversion-on-load for ``picodet-{s,l}-coco`` checkpoints.

    Builds the parameter-isomorphic PicoDet and loads the reference torch
    weights via ``convert_torch_picodet_state_dict``. The reference deploys
    its one-to-one head (``task_model.py:430,540``), so that head becomes
    this model's single GFL head; the one-to-many training head is dropped
    (fine-tuning re-trains the head either way).
    """
    from lightly_train_tpu.errors import CheckpointError
    from lightly_train_tpu.tasks.detection.convert import (
        convert_torch_picodet_state_dict,
    )
    from lightly_train_tpu.tasks.model_io import LoadedTaskModel

    base = str(init_args.get("model_name", name))
    model_size = "l" if ("-l" in base or base.endswith("l")) else "s"
    classes = init_args.get("classes", {})
    img = init_args.get("image_size", 640 if model_size == "l" else 416)
    if isinstance(img, (tuple, list)):
        img = img[0]
    args = PicoDetArgs(
        num_classes=len(classes) if classes else 80,
        model_size=model_size,
        reg_max=int(init_args.get("reg_max", 7)),
    )
    train_model = PicoDetTrainModel(None, args)
    params, stats = convert_torch_picodet_state_dict(state, which_head="o2o")
    variables: Dict[str, Any] = {
        "params": {"backbone": params},
        "batch_stats": stats,
    }

    # Structural check against a fresh init.
    sample = {"images": jnp.zeros((1, 64, 64, 3), jnp.float32)}
    init_params, init_state = train_model.init(jax.random.key(0), sample)

    def _paths(tree):
        return {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = _paths(variables["params"]), _paths(init_params)
    got_s = _paths(stats)
    want_s = _paths((init_state or {}).get("batch_stats", {}))
    if got != want or got_s != want_s:
        missing = sorted(set(want) - set(got)) + sorted(set(want_s) - set(got_s))
        extra = sorted(set(got) - set(want)) + sorted(set(got_s) - set(want_s))
        shapes = [
            f"{k}: {got[k]} != {want[k]}"
            for k in set(got) & set(want)
            if got[k] != want[k]
        ]
        raise CheckpointError(
            f"Converted '{name}' does not match the PicoDet parameter tree "
            f"(missing: {missing[:4]}; extra: {extra[:4]}; shape "
            f"mismatches: {shapes[:4]})."
        )
    return LoadedTaskModel(
        train_model=train_model, variables=variables,
        task="object_detection", image_size=int(img),
    )
