"""torch -> flax weight conversion for the LT-DETR detector.

Maps the reference ``LTDETRObjectDetection`` state dict
(``ltdetr_object_detection/task_model.py``: ``backbone`` DINOSTAs /
ECViT wrapper, ``encoder`` HybridEncoder, ``decoder`` DFINETransformer)
onto the parameter-isomorphic flax modules in
``tasks/detection/components.py`` and ``backbone_adapter.py``.

Every mapping is a rename + transpose:
- torch Linear (out, in) -> Dense kernel (in, out)
- torch Conv2d (O, I, kh, kw) -> Conv kernel (kh, kw, I, O)
- torch BatchNorm weight/bias/running_mean/running_var ->
  params {scale, bias} + batch_stats {mean, var}
- torch MultiheadAttention in_proj_weight (3D, D) -> TorchMHA
  in_proj_kernel (D, 3D)

Golden-tested against the live torch modules in
``tests/tasks/test_ltdetr_golden.py``."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _t(x: Any) -> np.ndarray:
    try:
        return np.asarray(x.detach().cpu().float().numpy())
    except AttributeError:
        return np.asarray(x, np.float32)


def _lin(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _bn(
    sd: Mapping[str, Any], prefix: str
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    p = {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }
    s = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return p, s


def _mha(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "in_proj_kernel": _t(sd[f"{prefix}.in_proj_weight"]).T,
        "in_proj_bias": _t(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _mlp(
    sd: Mapping[str, Any], prefix: str, n_layers: int
) -> Dict[str, Any]:
    return {
        f"layers{i}": _lin(sd, f"{prefix}.layers.{i}")
        for i in range(n_layers)
    }


def _conv_norm_tree(
    sd: Mapping[str, Any], prefix: str
) -> Tuple[Dict, Dict]:
    """torch ConvNormLayer {conv, norm} -> flax ({conv, norm}, stats)."""
    bn_p, bn_s = _bn(sd, f"{prefix}.norm")
    return (
        {"conv": _conv(sd, f"{prefix}.conv"), "norm": bn_p},
        {"norm": bn_s},
    )


def _csp(
    sd: Mapping[str, Any], prefix: str, num_blocks: int
) -> Tuple[Dict, Dict]:
    """CSPRepLayer (``hybrid_encoder.py:110-146``)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for name in ("conv1", "conv2"):
        p[name], s[name] = _conv_norm_tree(sd, f"{prefix}.{name}")
    if f"{prefix}.conv3.conv.weight" in sd:
        p["conv3"], s["conv3"] = _conv_norm_tree(sd, f"{prefix}.conv3")
    for j in range(num_blocks):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for name in ("conv1", "conv2"):
            bp[name], bs[name] = _conv_norm_tree(
                sd, f"{prefix}.bottlenecks.{j}.{name}"
            )
        p[f"bottlenecks{j}"] = bp
        s[f"bottlenecks{j}"] = bs
    return p, s


def convert_torch_dinostas_state_dict(
    sd: Mapping[str, Any], prefix: str = "backbone."
) -> Tuple[Dict, Dict, Dict]:
    """DINOSTAs (``dino_vit_wrapper.py:125-296``) -> (trunk ViT params,
    adapter params, adapter batch_stats). The wrapped ViT lives at
    ``{prefix}_model_wrapper._model.``; the STA/projection modules at
    ``{prefix}sta.`` / ``{prefix}convs.`` / ``{prefix}norms.``."""
    from lightly_train_tpu.models.convert import convert_torch_vit_state_dict

    vit_prefix = f"{prefix}_model_wrapper._model."
    vit_sd = {
        k[len(vit_prefix):]: v
        for k, v in sd.items()
        if k.startswith(vit_prefix)
    }
    # Depth = number of blocks; handles both flat (blocks.{i}.) and
    # FSDP-chunked (blocks.{chunk}.{i}.) torch naming.
    depth = sum(
        1
        for k in vit_sd
        if k.startswith("blocks.") and k.endswith(".norm1.weight")
    )
    trunk = convert_torch_vit_state_dict(vit_sd, depth)

    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    if f"{prefix}sta.stem.0.weight" in sd:
        sta_p: Dict[str, Any] = {}
        sta_s: Dict[str, Any] = {}
        # stem: Sequential(Conv, BN, GELU, MaxPool); conv2: (Conv, BN);
        # conv3/conv4: (GELU, Conv, BN).
        sta_p["stem_conv"] = _conv(sd, f"{prefix}sta.stem.0")
        sta_p["stem_norm"], sta_s["stem_norm"] = _bn(
            sd, f"{prefix}sta.stem.1"
        )
        sta_p["conv2_conv"] = _conv(sd, f"{prefix}sta.conv2.0")
        sta_p["conv2_norm"], sta_s["conv2_norm"] = _bn(
            sd, f"{prefix}sta.conv2.1"
        )
        for name in ("conv3", "conv4"):
            sta_p[f"{name}_conv"] = _conv(sd, f"{prefix}sta.{name}.1")
            sta_p[f"{name}_norm"], sta_s[f"{name}_norm"] = _bn(
                sd, f"{prefix}sta.{name}.2"
            )
        p["sta"] = sta_p
        s["sta"] = sta_s
    for i in range(3):
        if f"{prefix}convs.{i}.weight" in sd:
            p[f"convs{i}"] = _conv(sd, f"{prefix}convs.{i}")
            p[f"norms{i}"], s[f"norms{i}"] = _bn(sd, f"{prefix}norms.{i}")
    return trunk, p, s


def convert_torch_hybrid_encoder_state_dict(
    sd: Mapping[str, Any],
    prefix: str = "encoder.",
    num_levels: int = 3,
    csp_blocks: int = 3,
) -> Tuple[Dict, Dict]:
    """HybridEncoder (``hybrid_encoder.py:221-459``) -> flax
    (params, batch_stats). Handles both the v1 (Sequential index) and v2
    (OrderedDict name) ``input_proj`` state-dict layouts."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i in range(num_levels):
        v2 = f"{prefix}input_proj.{i}.conv.weight" in sd
        conv_key = (
            f"{prefix}input_proj.{i}.conv"
            if v2
            else f"{prefix}input_proj.{i}.0"
        )
        norm_key = (
            f"{prefix}input_proj.{i}.norm"
            if v2
            else f"{prefix}input_proj.{i}.1"
        )
        p[f"input_proj{i}_conv"] = _conv(sd, conv_key)
        p[f"input_proj{i}_norm"], s[f"input_proj{i}_norm"] = _bn(
            sd, norm_key
        )

    enc = f"{prefix}encoder.0.layers.0."
    p["encoder0_layer0"] = {
        "self_attn": _mha(sd, f"{enc}self_attn"),
        "linear1": _lin(sd, f"{enc}linear1"),
        "linear2": _lin(sd, f"{enc}linear2"),
        "norm1": _ln(sd, f"{enc}norm1"),
        "norm2": _ln(sd, f"{enc}norm2"),
    }

    for j in range(num_levels - 1):
        p[f"lateral{j}"], s[f"lateral{j}"] = _conv_norm_tree(
            sd, f"{prefix}lateral_convs.{j}"
        )
        p[f"fpn{j}"], s[f"fpn{j}"] = _csp(
            sd, f"{prefix}fpn_blocks.{j}", csp_blocks
        )
        # upsample=False (legacy preset): no downsample convs exist.
        if f"{prefix}downsample_convs.{j}.conv.weight" in sd:
            p[f"downsample{j}"], s[f"downsample{j}"] = _conv_norm_tree(
                sd, f"{prefix}downsample_convs.{j}"
            )
        p[f"pan{j}"], s[f"pan{j}"] = _csp(
            sd, f"{prefix}pan_blocks.{j}", csp_blocks
        )
    return p, s


def convert_torch_dfine_decoder_state_dict(
    sd: Mapping[str, Any],
    prefix: str = "decoder.",
    num_layers: Optional[int] = None,
) -> Tuple[Dict, Dict]:
    """DFINETransformer (``dfine_decoder.py:605-1161``) -> flax
    (params, batch_stats) for ``DETRDecoder``."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    if num_layers is None:
        num_layers = 1 + max(
            int(k[len(prefix) + len("decoder.layers."):].split(".")[0])
            for k in sd
            if k.startswith(f"{prefix}decoder.layers.")
        )

    # Optional input projections (identity in every shipped preset).
    for i in range(4):
        v2 = f"{prefix}input_proj.{i}.conv.weight" in sd
        v1 = f"{prefix}input_proj.{i}.0.weight" in sd
        if not (v1 or v2):
            continue
        conv_key = (
            f"{prefix}input_proj.{i}.conv" if v2
            else f"{prefix}input_proj.{i}.0"
        )
        norm_key = (
            f"{prefix}input_proj.{i}.norm" if v2
            else f"{prefix}input_proj.{i}.1"
        )
        p[f"input_proj{i}_conv"] = _conv(sd, conv_key)
        p[f"input_proj{i}_norm"], s[f"input_proj{i}_norm"] = _bn(
            sd, norm_key
        )

    p["enc_output_proj"] = _lin(sd, f"{prefix}enc_output.proj")
    p["enc_output_norm"] = _ln(sd, f"{prefix}enc_output.norm")
    p["enc_score_head"] = _lin(sd, f"{prefix}enc_score_head")
    p["enc_bbox_head"] = _mlp(sd, f"{prefix}enc_bbox_head", 3)
    p["pre_bbox_head"] = _mlp(sd, f"{prefix}pre_bbox_head", 3)
    p["query_pos_head"] = _mlp(sd, f"{prefix}query_pos_head", 2)
    if f"{prefix}denoising_class_embed.weight" in sd:
        p["denoising_class_embed"] = _t(
            sd[f"{prefix}denoising_class_embed.weight"]
        )
    else:
        # Checkpoint trained with num_denoising=0: the flax module still
        # carries the (inference-inert) table — synthesize zeros.
        n_cls = p["enc_score_head"]["kernel"].shape[1]
        hidden = p["enc_score_head"]["kernel"].shape[0]
        p["denoising_class_embed"] = np.zeros(
            (n_cls + 1, hidden), np.float32
        )

    for i in range(num_layers):
        lp = f"{prefix}decoder.layers.{i}."
        p[f"layer{i}"] = {
            "self_attn": _mha(sd, f"{lp}self_attn"),
            "norm1": _ln(sd, f"{lp}norm1"),
            "cross_attn": {
                "sampling_offsets": _lin(
                    sd, f"{lp}cross_attn.sampling_offsets"
                ),
                "attention_weights": _lin(
                    sd, f"{lp}cross_attn.attention_weights"
                ),
            },
            "gateway": {
                "gate": _lin(sd, f"{lp}gateway.gate"),
                "norm": _ln(sd, f"{lp}gateway.norm"),
            },
            "linear1": _lin(sd, f"{lp}linear1"),
            "linear2": _lin(sd, f"{lp}linear2"),
            "norm3": _ln(sd, f"{lp}norm3"),
        }
        p[f"dec_score_head{i}"] = _lin(sd, f"{prefix}dec_score_head.{i}")
        n_bbox_layers = 3
        p[f"dec_bbox_head{i}"] = _mlp(
            sd, f"{prefix}dec_bbox_head.{i}", n_bbox_layers
        )
        if f"{prefix}decoder.lqe_layers.{i}.reg_conf.layers.0.weight" in sd:
            p[f"lqe{i}"] = {
                "reg_conf": _mlp(
                    sd, f"{prefix}decoder.lqe_layers.{i}.reg_conf", 2
                )
            }
    return p, s


def convert_torch_rtdetrv2_decoder_state_dict(
    sd: Mapping[str, Any],
    prefix: str = "decoder.",
    num_layers: Optional[int] = None,
) -> Tuple[Dict, Dict]:
    """RTDETRTransformerv2 (``rtdetrv2_decoder.py:405-720``) -> flax
    (params, batch_stats) for ``DETRDecoder`` with ``use_dfine=False``.
    Unlike D-FINE, the input projections always exist and each layer's
    deformable attention carries value/output projections."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    if num_layers is None:
        num_layers = 1 + max(
            int(k[len(prefix) + len("decoder.layers."):].split(".")[0])
            for k in sd
            if k.startswith(f"{prefix}decoder.layers.")
        )

    i = 0
    while f"{prefix}input_proj.{i}.conv.weight" in sd:
        p[f"input_proj{i}_conv"] = _conv(sd, f"{prefix}input_proj.{i}.conv")
        p[f"input_proj{i}_norm"], s[f"input_proj{i}_norm"] = _bn(
            sd, f"{prefix}input_proj.{i}.norm"
        )
        i += 1

    p["enc_output_proj"] = _lin(sd, f"{prefix}enc_output.proj")
    p["enc_output_norm"] = _ln(sd, f"{prefix}enc_output.norm")
    p["enc_score_head"] = _lin(sd, f"{prefix}enc_score_head")
    p["enc_bbox_head"] = _mlp(sd, f"{prefix}enc_bbox_head", 3)
    p["query_pos_head"] = _mlp(sd, f"{prefix}query_pos_head", 2)
    if f"{prefix}denoising_class_embed.weight" in sd:
        p["denoising_class_embed"] = _t(
            sd[f"{prefix}denoising_class_embed.weight"]
        )
    else:
        n_cls = p["enc_score_head"]["kernel"].shape[1]
        hidden = p["enc_score_head"]["kernel"].shape[0]
        p["denoising_class_embed"] = np.zeros(
            (n_cls + 1, hidden), np.float32
        )

    for i in range(num_layers):
        lp = f"{prefix}decoder.layers.{i}."
        p[f"layer{i}"] = {
            "self_attn": _mha(sd, f"{lp}self_attn"),
            "norm1": _ln(sd, f"{lp}norm1"),
            "cross_attn": {
                "sampling_offsets": _lin(
                    sd, f"{lp}cross_attn.sampling_offsets"
                ),
                "attention_weights": _lin(
                    sd, f"{lp}cross_attn.attention_weights"
                ),
                "value_proj": _lin(sd, f"{lp}cross_attn.value_proj"),
                "output_proj": _lin(sd, f"{lp}cross_attn.output_proj"),
            },
            "norm2": _ln(sd, f"{lp}norm2"),
            "linear1": _lin(sd, f"{lp}linear1"),
            "linear2": _lin(sd, f"{lp}linear2"),
            "norm3": _ln(sd, f"{lp}norm3"),
        }
        p[f"dec_score_head{i}"] = _lin(sd, f"{prefix}dec_score_head.{i}")
        p[f"dec_bbox_head{i}"] = _mlp(sd, f"{prefix}dec_bbox_head.{i}", 3)
    return p, s


def convert_torch_ecseg_mask_head_state_dict(
    sd: Mapping[str, Any], prefix: str = "decoder.mask_head."
) -> Dict[str, Any]:
    """EdgeCrafterInstanceSegmentationHead (``edgecrafter_head.py:91-224``)
    -> flax params for ``ECSegMaskHead`` (``tasks/detection/ltdetr_seg.py``)."""
    p: Dict[str, Any] = {}
    i = 0
    while f"{prefix}blocks.{i}.dwconv.weight" in sd:
        bp = f"{prefix}blocks.{i}."
        p[f"block{i}"] = {
            "dwconv": _conv(sd, f"{bp}dwconv"),
            "norm": _ln(sd, f"{bp}norm"),
            "pwconv1": _lin(sd, f"{bp}pwconv1"),
        }
        i += 1
    p["spatial_proj"] = _conv(sd, f"{prefix}spatial_features_proj")
    p["query_norm"] = _ln(sd, f"{prefix}query_features_block.norm_in")
    p["query_fc1"] = _lin(sd, f"{prefix}query_features_block.layers.0")
    p["query_fc2"] = _lin(sd, f"{prefix}query_features_block.layers.2")
    p["query_proj"] = _lin(sd, f"{prefix}query_features_proj")
    p["bias"] = _t(sd[f"{prefix}bias"]).reshape(1)
    return p


def convert_torch_ecvit_ltdetr_state_dict(
    sd: Mapping[str, Any],
    num_levels: int = 3,
    csp_blocks: int = 3,
    with_mask_head: bool = False,
) -> Tuple[Dict, Dict, Optional[Dict]]:
    """``LTDETRObjectDetection`` / ``LTDETRInstanceSegmentation`` state dict
    with an ECViT (EdgeCrafter) backbone -> flax (params, batch_stats,
    mask_head_params). The ECViT wrapper lives at
    ``backbone._model_wrapper.`` (``ecvit_vit_wrapper.py:52``); the trunk
    converts via ``models/convert.convert_ecvit_state_dict``."""
    from lightly_train_tpu.models.convert import convert_ecvit_state_dict

    wrapper_prefix = "backbone._model_wrapper."
    trunk_sd = {
        k[len(wrapper_prefix):]: v
        for k, v in sd.items()
        if k.startswith(wrapper_prefix)
    }
    depth = sum(
        1 for k in trunk_sd
        if k.startswith("backbone.blocks.") and k.endswith(".norm1.weight")
    )
    n_proj = sum(
        1 for k in trunk_sd
        if k.startswith("projector.") and k.endswith(".conv.weight")
    )
    trunk = convert_ecvit_state_dict(trunk_sd, depth, n_proj)
    enc_p, enc_s = convert_torch_hybrid_encoder_state_dict(
        sd, "encoder.", num_levels, csp_blocks
    )
    dec_p, dec_s = convert_torch_any_decoder_state_dict(sd, "decoder.")
    params = {
        "trunk": trunk["params"],
        "encoder": enc_p,
        "decoder": dec_p,
    }
    stats: Dict[str, Any] = {
        "trunk": trunk["batch_stats"],
        "encoder": enc_s,
    }
    if dec_s:
        stats["decoder"] = dec_s
    mask_head = (
        convert_torch_ecseg_mask_head_state_dict(sd)
        if with_mask_head
        else None
    )
    return params, stats, mask_head


def convert_torch_convnext_ltdetr_state_dict(
    sd: Mapping[str, Any],
    num_levels: int = 3,
    csp_blocks: int = 3,
) -> Tuple[Dict, Dict]:
    """``LTDETRObjectDetection`` state dict with a DINOv3 ConvNeXt backbone
    (``dinov3_convnext_wrapper.py``: pass-through of stages 1-3) -> flax
    (params, batch_stats)."""
    from lightly_train_tpu.models.convert import (
        convert_torch_convnext_state_dict,
    )

    wrapper_prefix = "backbone._model_wrapper._model."
    trunk_sd = {
        k[len(wrapper_prefix):]: v
        for k, v in sd.items()
        if k.startswith(wrapper_prefix)
    }
    trunk = convert_torch_convnext_state_dict(trunk_sd)
    enc_p, enc_s = convert_torch_hybrid_encoder_state_dict(
        sd, "encoder.", num_levels, csp_blocks
    )
    dec_p, dec_s = convert_torch_any_decoder_state_dict(sd, "decoder.")
    params = {
        "trunk": trunk["params"] if "params" in trunk else trunk,
        "encoder": enc_p,
        "decoder": dec_p,
    }
    stats: Dict[str, Any] = {"encoder": enc_s}
    if isinstance(trunk, dict) and "batch_stats" in trunk:
        stats["trunk"] = trunk["batch_stats"]
    if dec_s:
        stats["decoder"] = dec_s
    return params, stats


def _decoder_is_dfine(sd: Mapping[str, Any], prefix: str = "decoder.") -> bool:
    """D-FINE checkpoints carry ``pre_bbox_head``/``gateway`` weights;
    RT-DETRv2 checkpoints carry per-layer ``cross_attn.value_proj``."""
    return f"{prefix}pre_bbox_head.layers.0.weight" in sd


def convert_torch_any_decoder_state_dict(
    sd: Mapping[str, Any], prefix: str = "decoder."
) -> Tuple[Dict, Dict]:
    if _decoder_is_dfine(sd, prefix):
        return convert_torch_dfine_decoder_state_dict(sd, prefix)
    return convert_torch_rtdetrv2_decoder_state_dict(sd, prefix)


def convert_torch_ltdetr_state_dict(
    sd: Mapping[str, Any],
    num_levels: int = 3,
    csp_blocks: int = 3,
) -> Tuple[Dict, Dict]:
    """Full ``LTDETRObjectDetection`` state dict -> flax
    (params, batch_stats) for ``_LTDETRModule`` (ViT + DINOSTAs path).

    Layout produced (matching ``_LTDETRModule``):
    ``{trunk, backbone_sta, encoder, decoder}``."""
    trunk, sta_p, sta_s = convert_torch_dinostas_state_dict(sd, "backbone.")
    enc_p, enc_s = convert_torch_hybrid_encoder_state_dict(
        sd, "encoder.", num_levels, csp_blocks
    )
    dec_p, dec_s = convert_torch_any_decoder_state_dict(sd, "decoder.")
    params = {
        "trunk": trunk,
        "backbone_sta": sta_p,
        "encoder": enc_p,
        "decoder": dec_p,
    }
    stats: Dict[str, Any] = {"encoder": enc_s}
    if sta_s:
        stats["backbone_sta"] = sta_s
    if dec_s:
        stats["decoder"] = dec_s
    return params, stats


# ---------------------------------------------------------------------------
# PicoDet (ESNet + CSP-PAN + GFL head)
# ---------------------------------------------------------------------------


def _pd_conv(sd: Mapping[str, Any], prefix: str):
    bnp, bns = _bn(sd, f"{prefix}.bn")
    return (
        {"conv": _conv(sd, f"{prefix}.conv"), "bn": bnp},
        {"bn": bns},
    )


def _pd_dwsep(sd: Mapping[str, Any], prefix: str):
    bnp, bns = _bn(sd, f"{prefix}.bn")
    return (
        {
            "depthwise": _conv(sd, f"{prefix}.depthwise"),
            "pointwise": _conv(sd, f"{prefix}.pointwise"),
            "bn": bnp,
        },
        {"bn": bns},
    )


def _pd_csp(sd: Mapping[str, Any], prefix: str):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for unit in ("short_conv", "main_conv", "final_conv"):
        params[unit], stats[unit] = _pd_conv(sd, f"{prefix}.{unit}")
    j = 0
    while f"{prefix}.blocks.{j}.conv1.conv.weight" in sd:
        c1p, c1s = _pd_conv(sd, f"{prefix}.blocks.{j}.conv1")
        c2p, c2s = _pd_dwsep(sd, f"{prefix}.blocks.{j}.conv2")
        params[f"blocks{j}"] = {"conv1": c1p, "conv2": c2p}
        stats[f"blocks{j}"] = {"conv1": c1s, "conv2": c2s}
        j += 1
    return params, stats


def convert_torch_picodet_state_dict(
    sd: Mapping[str, Any], which_head: str = "o2o"
) -> Tuple[Dict, Dict]:
    """``PicoDetObjectDetection`` torch state dict -> flax
    (params, batch_stats) for ``_PicoDetModule``
    (``picodet_object_detection/{esnet,csp_pan,pico_head}.py``).

    ``which_head`` selects which of the reference's two GFL heads becomes
    the single head here: ``"o2o"`` (default) is the one-to-one head the
    reference's predict/export paths run (``task_model.py:430,540``);
    ``"o2m"`` is the one-to-many training head.
    """
    sd = {k: _t(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---- backbone (ESNet) ----
    bb_p: Dict[str, Any] = {}
    bb_s: Dict[str, Any] = {}
    bb_p["conv1"], bb_s["conv1"] = _pd_conv(sd, "backbone.conv1")
    i = 0
    while f"backbone.blocks.{i}.se.fc1.weight" in sd:
        prefix = f"backbone.blocks.{i}"
        units = (
            ("conv_dw_1", "conv_linear_1", "conv_pw_2", "conv_dw_2",
             "conv_linear_2", "conv_dw_mv1", "conv_pw_mv1")
            if f"{prefix}.conv_dw_1.conv.weight" in sd
            else ("conv_pw", "conv_dw", "conv_linear")
        )
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for u in units:
            bp[u], bs[u] = _pd_conv(sd, f"{prefix}.{u}")
        bp["se"] = {
            "fc1": _conv(sd, f"{prefix}.se.fc1"),
            "fc2": _conv(sd, f"{prefix}.se.fc2"),
        }
        bb_p[f"block{i}"] = bp
        bb_s[f"block{i}"] = bs
        i += 1
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    # ---- neck (CSPPAN) ----
    nk_p: Dict[str, Any] = {}
    nk_s: Dict[str, Any] = {}
    t = 0
    while f"neck.transforms.{t}.conv.weight" in sd:
        nk_p[f"transforms{t}"], nk_s[f"transforms{t}"] = _pd_conv(
            sd, f"neck.transforms.{t}"
        )
        t += 1
    for group, fn in (
        ("top_down_blocks", _pd_csp),
        ("bottom_up_blocks", _pd_csp),
        ("downsamples", _pd_dwsep),
    ):
        g = 0
        while any(k.startswith(f"neck.{group}.{g}.") for k in sd):
            nk_p[f"{group}{g}"], nk_s[f"{group}{g}"] = fn(
                sd, f"neck.{group}.{g}"
            )
            g += 1
    for unit in ("first_top_conv", "second_top_conv"):
        nk_p[unit], nk_s[unit] = _pd_dwsep(sd, f"neck.{unit}")
    params["neck"] = nk_p
    stats["neck"] = nk_s

    # ---- head ----
    hp = "o2o_head." if which_head == "o2o" else "head."
    hd_p: Dict[str, Any] = {}
    hd_s: Dict[str, Any] = {}
    lvl = 0
    while f"{hp}gfl_cls.{lvl}.weight" in sd:
        i = 0
        while f"{hp}cls_convs.{lvl}.{i}.depthwise.weight" in sd:
            (
                hd_p[f"cls_convs{lvl}_{i}"],
                hd_s[f"cls_convs{lvl}_{i}"],
            ) = _pd_dwsep(sd, f"{hp}cls_convs.{lvl}.{i}")
            i += 1
        hd_p[f"gfl_cls{lvl}"] = _conv(sd, f"{hp}gfl_cls.{lvl}")
        lvl += 1
    params["head"] = hd_p
    stats["head"] = hd_s
    return params, stats
