"""Torch-checkpoint weight converters (Meta DINOv2/DINOv3 naming -> Flax).

Rebuild of the reference's weight-loading path: the reference consumes Meta's
torch checkpoints directly (``dinov2_vit_package.py``, ``dinov3_package.py``);
this converter maps those state dicts onto the Flax parameter tree of
``models/vit.VisionTransformer`` so pretrained teachers initialize with
identical weights (critical for DistillationV3/DINOv2 output fidelity,
SURVEY.md §7).

Key mappings (torch -> flax):
- ``patch_embed.proj.weight`` (D,3,p,p) -> ``patch_embed.kernel`` (p,p,3,D)
- ``blocks.{i}.attn.qkv.weight`` (3D,D) row blocks [q;k;v] split into three
  ``block{i}.attn.{q,k,v}.kernel`` (D,D) matrices (the Flax attention uses
  separate projections to avoid strided qkv splits on TPU)
- ``pos_embed`` (1, 1+N, D): the CLS positional entry is folded into
  ``cls_token`` (both are learned constants summed at the same site), and
  the patch entries become the (1, N, D) grid table.
- LayerScale ``ls{1,2}.gamma`` -> ``ls{1,2}.gamma``; norms map weight/bias ->
  scale/bias; all Linear weights transpose.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Sequence

import numpy as np

from lightly_train_tpu._logging import get_logger

logger = get_logger("convert")


def _t(x: Any) -> np.ndarray:
    arr = np.asarray(x, dtype=np.float32)
    return arr


def convert_torch_vit_state_dict(
    state_dict: Mapping[str, Any], depth: int
) -> Dict[str, Any]:
    """Meta DINOv2/v3 ViT state dict -> Flax params for VisionTransformer."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    cls = sd["cls_token"]  # (1, 1, D)
    if "pos_embed" in sd:  # DINOv2; DINOv3 is RoPE-only with no pos_embed
        pos = sd["pos_embed"]  # (1, 1+N, D) or (1, N, D)
        if pos.shape[1] % 2 == 1:  # has a CLS positional entry
            cls = cls + pos[:, :1]
            pos = pos[:, 1:]
        params["pos_embed"] = pos
    params["cls_token"] = cls
    params["mask_token"] = sd.get(
        "mask_token", np.zeros((1, cls.shape[-1]), np.float32)
    ).reshape(-1)
    if "register_tokens" in sd:
        params["register_tokens"] = sd["register_tokens"]
    elif "storage_tokens" in sd:  # DINOv3 naming
        params["register_tokens"] = sd["storage_tokens"]

    w = sd["patch_embed.proj.weight"]  # (D, 3, p, p)
    params["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }

    for i in range(depth):
        p = f"blocks.{i}."
        if f"{p}norm1.weight" not in sd:
            # FSDP block-chunked naming: blocks.{chunk}.{i}.*
            alt = [k for k in sd if k.startswith("blocks.") and
                   k.endswith(f".{i}.norm1.weight")]
            if alt:
                p = alt[0][: -len("norm1.weight")]
            else:
                raise KeyError(f"Missing block {i} in state dict")
        wqkv = sd[f"{p}attn.qkv.weight"]  # (3D, D), rows [q; k; v]
        d = wqkv.shape[0] // 3
        block: Dict[str, Any] = {
            "norm1": {"scale": sd[f"{p}norm1.weight"],
                      "bias": sd[f"{p}norm1.bias"]},
            "norm2": {"scale": sd[f"{p}norm2.weight"],
                      "bias": sd[f"{p}norm2.bias"]},
            "attn": {
                "q": {"kernel": wqkv[:d].T},
                "k": {"kernel": wqkv[d : 2 * d].T},
                "v": {"kernel": wqkv[2 * d :].T},
                "proj": {"kernel": sd[f"{p}attn.proj.weight"].T,
                         "bias": sd[f"{p}attn.proj.bias"]},
            },
        }
        if f"{p}attn.qkv.bias" in sd:
            bqkv = sd[f"{p}attn.qkv.bias"]
            if f"{p}attn.qkv.bias_mask" in sd:
                # DINOv3 LinearKMaskedBias (``attention.py:37-53``): the
                # effective bias is bias*mask with the k section masked to
                # zero — the Flax k projection has no bias parameter.
                bqkv = bqkv * sd[f"{p}attn.qkv.bias_mask"]
                block["attn"]["q"]["bias"] = bqkv[:d]
                block["attn"]["v"]["bias"] = bqkv[2 * d :]
            else:
                block["attn"]["q"]["bias"] = bqkv[:d]
                block["attn"]["k"]["bias"] = bqkv[d : 2 * d]
                block["attn"]["v"]["bias"] = bqkv[2 * d :]
        if f"{p}ls1.gamma" in sd:
            block["ls1"] = {"gamma": sd[f"{p}ls1.gamma"]}
            block["ls2"] = {"gamma": sd[f"{p}ls2.gamma"]}
        else:
            # No layerscale in the checkpoint (timm vanilla ViT / Meta
            # init_values=None): identity gammas so the Flax LayerScale is a
            # no-op rather than keeping its tiny fresh init.
            block["ls1"] = {"gamma": np.ones((d,), np.float32)}
            block["ls2"] = {"gamma": np.ones((d,), np.float32)}
        if f"{p}mlp.fc1.weight" in sd:
            block["mlp"] = {
                "fc1": {"kernel": sd[f"{p}mlp.fc1.weight"].T,
                        "bias": sd[f"{p}mlp.fc1.bias"]},
                "fc2": {"kernel": sd[f"{p}mlp.fc2.weight"].T,
                        "bias": sd[f"{p}mlp.fc2.bias"]},
            }
        elif f"{p}mlp.w12.weight" in sd:
            # DINOv2 SwiGLUFFNFused: split the fused w12 rows into w1/w2
            # (the Flax FFN uses separate projections, no strided split).
            w12 = sd[f"{p}mlp.w12.weight"]  # (2h, D), rows [w1; w2]
            h = w12.shape[0] // 2
            b12 = sd[f"{p}mlp.w12.bias"]
            block["mlp"] = {
                "w1": {"kernel": w12[:h].T, "bias": b12[:h]},
                "w2": {"kernel": w12[h:].T, "bias": b12[h:]},
                "w3": {"kernel": sd[f"{p}mlp.w3.weight"].T,
                       "bias": sd[f"{p}mlp.w3.bias"]},
            }
        else:  # DINOv3 SwiGLUFFN: w1/w2/w3 map directly
            block["mlp"] = {
                "w1": {"kernel": sd[f"{p}mlp.w1.weight"].T},
                "w2": {"kernel": sd[f"{p}mlp.w2.weight"].T},
                "w3": {"kernel": sd[f"{p}mlp.w3.weight"].T},
            }
            for name in ("w1", "w2", "w3"):
                if f"{p}mlp.{name}.bias" in sd:
                    block["mlp"][name]["bias"] = sd[f"{p}mlp.{name}.bias"]
        params[f"block{i}"] = block

    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return params


def convert_torch_eomt_state_dict(
    state_dict: Mapping[str, Any], depth: int
) -> Dict[str, Any]:
    """Reference EoMT task-model state dict -> Flax params for
    ``tasks.eomt_semantic_segmentation._EoMTTrunk``.

    Layout per ``dinov3_eomt_semantic_segmentation/task_model.py:195-214``:
    ``backbone.*`` (DINOv3/DINOv2 ViT), ``queries.weight`` (Embedding Q x D),
    ``class_head`` (Linear D -> C+1), ``mask_head.{0,2,4}`` (3-layer MLP with
    GELU at 1, 3), ``upscale.{i}.{conv1,conv2,norm}`` ScaleBlocks
    (ConvTranspose2d k2s2, depthwise Conv3x3 no-bias, LayerNorm2D).
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    params = convert_torch_vit_state_dict(backbone_sd, depth)
    params["queries"] = sd["queries.weight"][None]  # (1, Q, D)
    params["class_head"] = {
        "kernel": sd["class_head.weight"].T,
        "bias": sd["class_head.bias"],
    }
    for i, ti in enumerate((0, 2, 4)):
        params[f"mask_head{i}"] = {
            "kernel": sd[f"mask_head.{ti}.weight"].T,
            "bias": sd[f"mask_head.{ti}.bias"],
        }
    n_up = len({k.split(".")[1] for k in sd if k.startswith("upscale.")})
    for i in range(n_up):
        p = f"upscale.{i}."
        params[f"upscale{i}"] = {
            # torch ConvTranspose2d weight (in, out, kh, kw) -> flax
            # ConvTranspose kernel (kh, kw, in, out) with the spatial axes
            # REVERSED: torch's op is the gradient-of-conv (rot180 kernel)
            # while lax.conv_transpose correlates the kernel directly.
            "conv1": {
                "kernel": np.ascontiguousarray(
                    sd[f"{p}conv1.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]
                ),
                "bias": sd[f"{p}conv1.bias"],
            },
            # depthwise Conv2d weight (D, 1, 3, 3) -> flax (3, 3, 1, D).
            "conv2": {
                "kernel": sd[f"{p}conv2.weight"].transpose(2, 3, 1, 0),
            },
            "norm": {
                "scale": sd[f"{p}norm.weight"],
                "bias": sd[f"{p}norm.bias"],
            },
        }
    return params


def convert_flax_vit_to_torch_state_dict(
    params: Mapping[str, Any], depth: int
) -> Dict[str, np.ndarray]:
    """Reverse converter: Flax VisionTransformer params -> Meta torch naming.

    Inverse of :func:`convert_torch_vit_state_dict`, used by
    ``export(format="torch_state_dict")`` so exported backbones load directly
    into the reference's vendored ``DinoVisionTransformer`` / DINOv3 modules.
    The CLS positional entry was folded into ``cls_token`` at import; a zero
    row is emitted in its place (mathematically identical forward).
    """
    p = jax_to_np(params)
    sd: Dict[str, np.ndarray] = {}
    d_model = p["cls_token"].shape[-1]
    sd["cls_token"] = p["cls_token"]
    sd["mask_token"] = p["mask_token"].reshape(1, d_model)
    if "pos_embed" in p:
        pos = p["pos_embed"]  # (1, N, D)
        sd["pos_embed"] = np.concatenate(
            [np.zeros((1, 1, d_model), np.float32), pos], axis=1
        )
    if "register_tokens" in p:
        key = "register_tokens" if "pos_embed" in p else "storage_tokens"
        sd[key] = p["register_tokens"]
    sd["patch_embed.proj.weight"] = p["patch_embed"]["kernel"].transpose(
        3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = p["patch_embed"]["bias"]
    for i in range(depth):
        b = p[f"block{i}"]
        o = f"blocks.{i}."
        sd[f"{o}norm1.weight"] = b["norm1"]["scale"]
        sd[f"{o}norm1.bias"] = b["norm1"]["bias"]
        sd[f"{o}norm2.weight"] = b["norm2"]["scale"]
        sd[f"{o}norm2.bias"] = b["norm2"]["bias"]
        attn = b["attn"]
        sd[f"{o}attn.qkv.weight"] = np.concatenate(
            [attn["q"]["kernel"].T, attn["k"]["kernel"].T,
             attn["v"]["kernel"].T], axis=0)
        if "bias" in attn["q"]:
            k_bias = attn.get("k", {}).get(
                "bias", np.zeros((d_model,), np.float32))
            sd[f"{o}attn.qkv.bias"] = np.concatenate(
                [attn["q"]["bias"], k_bias, attn["v"]["bias"]], axis=0)
        sd[f"{o}attn.proj.weight"] = attn["proj"]["kernel"].T
        sd[f"{o}attn.proj.bias"] = attn["proj"]["bias"]
        if "ls1" in b:
            sd[f"{o}ls1.gamma"] = b["ls1"]["gamma"]
            sd[f"{o}ls2.gamma"] = b["ls2"]["gamma"]
        mlp = b["mlp"]
        if "fc1" in mlp:
            sd[f"{o}mlp.fc1.weight"] = mlp["fc1"]["kernel"].T
            sd[f"{o}mlp.fc1.bias"] = mlp["fc1"]["bias"]
            sd[f"{o}mlp.fc2.weight"] = mlp["fc2"]["kernel"].T
            sd[f"{o}mlp.fc2.bias"] = mlp["fc2"]["bias"]
        else:  # SwiGLU
            sd[f"{o}mlp.w1.weight"] = mlp["w1"]["kernel"].T
            sd[f"{o}mlp.w2.weight"] = mlp["w2"]["kernel"].T
            sd[f"{o}mlp.w3.weight"] = mlp["w3"]["kernel"].T
            for name in ("w1", "w2", "w3"):
                if "bias" in mlp[name]:
                    sd[f"{o}mlp.{name}.bias"] = mlp[name]["bias"]
    sd["norm.weight"] = p["norm"]["scale"]
    sd["norm.bias"] = p["norm"]["bias"]
    return sd


def jax_to_np(tree: Any) -> Any:
    """Convert (nested) jax arrays to float32 numpy."""
    if isinstance(tree, Mapping):
        return {k: jax_to_np(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)


def convert_torch_convnext_state_dict(
    state_dict: Mapping[str, Any], depths: Any
) -> Dict[str, Any]:
    """DINOv3 ConvNeXt torch state dict -> Flax params for models/convnext.py.

    Torch naming (``dinov3_src/models/convnext.py:161-196``):
    ``downsample_layers.0.{0,1}`` stem conv+LN, ``downsample_layers.i.{0,1}``
    LN+conv, ``stages.i.j.{dwconv,norm,pwconv1,pwconv2,gamma}``, final
    ``norm``. Conv kernels transpose (O,I,kh,kw) -> (kh,kw,I,O); the
    depthwise kernel (C,1,7,7) -> (7,7,1,C).
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {
        "stem_conv": {
            "kernel": sd["downsample_layers.0.0.weight"].transpose(2, 3, 1, 0),
            "bias": sd["downsample_layers.0.0.bias"],
        },
        "stem_norm": {"scale": sd["downsample_layers.0.1.weight"],
                      "bias": sd["downsample_layers.0.1.bias"]},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(1, 4):
        params[f"down{i}_norm"] = {
            "scale": sd[f"downsample_layers.{i}.0.weight"],
            "bias": sd[f"downsample_layers.{i}.0.bias"],
        }
        params[f"down{i}_conv"] = {
            "kernel": sd[f"downsample_layers.{i}.1.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"downsample_layers.{i}.1.bias"],
        }
    for stage, depth in enumerate(depths):
        for b in range(depth):
            p = f"stages.{stage}.{b}."
            params[f"stage{stage}_block{b}"] = {
                "dwconv": {
                    "kernel": sd[f"{p}dwconv.weight"].transpose(2, 3, 1, 0),
                    "bias": sd[f"{p}dwconv.bias"],
                },
                "norm": {"scale": sd[f"{p}norm.weight"],
                         "bias": sd[f"{p}norm.bias"]},
                "pwconv1": {"kernel": sd[f"{p}pwconv1.weight"].T,
                            "bias": sd[f"{p}pwconv1.bias"]},
                "pwconv2": {"kernel": sd[f"{p}pwconv2.weight"].T,
                            "bias": sd[f"{p}pwconv2.bias"]},
                "gamma": sd[f"{p}gamma"],
            }
    return params


def convert_torch_resnet_state_dict(
    state_dict: Mapping[str, Any], stage_sizes: Sequence[int]
) -> Dict[str, Any]:
    """torchvision/timm ResNet state dict -> Flax variables.

    Naming (shared by torchvision and timm resnets): ``conv1``/``bn1`` stem,
    ``layer{s+1}.{b}.conv{k}``/``bn{k}`` blocks,
    ``layer{s+1}.{b}.downsample.0/1`` projection shortcuts. The ``fc``
    classifier head is dropped (backbone contract). Returns
    ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}

    def conv(prefix: str) -> Dict[str, Any]:
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    def bn(prefix: str):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
        return p, s

    params: Dict[str, Any] = {"stem_conv": conv("conv1")}
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = bn("bn1")
    for s, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            tp = f"layer{s + 1}.{b}"
            name = f"stage{s}_block{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for k in (1, 2, 3):
                if f"{tp}.conv{k}.weight" not in sd:
                    break
                bp[f"conv{k}"] = conv(f"{tp}.conv{k}")
                bp[f"bn{k}"], bs[f"bn{k}"] = bn(f"{tp}.bn{k}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["down_conv"] = conv(f"{tp}.downsample.0")
                bp["down_bn"], bs["down_bn"] = bn(f"{tp}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint_for_model(
    checkpoint_path: Path, model_name: str
) -> Dict[str, Any]:
    """Load a torch ``.pth`` checkpoint and convert for ``model_name``.

    Accepts raw Meta checkpoints ({'model': sd} or flat sd) for dinov2/
    dinov3 ViT names; returns flax ``{"params": ...}`` variables.
    """
    import torch

    from lightly_train_tpu.models.package_registry import get_wrapped_model

    wrapped = get_wrapped_model(model_name)
    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt and not hasattr(
        ckpt["model"], "numpy"
    ):
        ckpt = ckpt["model"]
    if hasattr(ckpt, "state_dict"):  # a pickled module (ultralytics style)
        ckpt = ckpt.state_dict()
    cfg = wrapped.module.cfg  # type: ignore[attr-defined]
    if model_name.startswith("ultralytics/"):
        # model.model.{i}.* / model.{i}.* naming handled by the converters.
        sd = {k: np.asarray(v) for k, v in ckpt.items()}
        short = model_name.split("/", 1)[1]
        if short.startswith("yolov5"):
            n_per_c3 = {
                i: cfg.n({2: 3, 4: 6, 6: 9, 8: 3}[i]) for i in (2, 4, 6, 8)
            }
            variables = convert_yolov5_state_dict(sd, n_per_c3)
        elif short.startswith("yolo11"):
            n_per_block = {i: cfg.n(2) for i in (2, 4, 6, 8, 10)}
            variables = convert_yolo11_state_dict(sd, n_per_block)
        else:
            n_per_c2f = {
                i: cfg.n(3 if i in (2, 8) else 6) for i in (2, 4, 6, 8)
            }
            variables = convert_ultralytics_state_dict(sd, n_per_c2f)
    elif model_name.startswith("ecvit/"):
        # ECViTModelWrapper checkpoints keep the backbone.* prefix.
        sd = {k: np.asarray(v) for k, v in ckpt.items()}
        n_proj = 1 if cfg.proj_dim is None else 3
        variables = convert_ecvit_state_dict(sd, cfg.depth, n_proj)
    else:
        sd = {
            k.removeprefix("module.").removeprefix("backbone."): v.numpy()
            for k, v in ckpt.items()
        }
        if "convnext" in model_name:
            variables = {
                "params": convert_torch_convnext_state_dict(sd, cfg.depths)
            }
        elif "resnet" in model_name or "conv1.weight" in sd:
            # torchvision/timm ResNet layout (timm/<resnet*> and
            # torchvision/<resnet*> checkpoints share it).
            variables = convert_torch_resnet_state_dict(sd, cfg.stage_sizes)
        else:
            # Meta DINOv2/v3 naming; also covers timm ViTs (fused qkv,
            # cls-entry pos_embed, optional layerscale).
            variables = {"params": convert_torch_vit_state_dict(sd, cfg.depth)}
    logger.info(
        "Converted %d torch tensors for %s", len(sd), model_name
    )
    return variables


# ---------------------------------------------------------------------------
# ultralytics YOLOv8 (models/yolo.py)
# ---------------------------------------------------------------------------

def _conv_unit_from_torch(
    sd: Mapping[str, np.ndarray], prefix: str
) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """One ultralytics ``Conv`` (conv+bn) -> flax params/batch_stats."""
    params = {
        "conv": {"kernel": sd[f"{prefix}.conv.weight"].transpose(2, 3, 1, 0)},
        "bn": {"scale": sd[f"{prefix}.bn.weight"],
               "bias": sd[f"{prefix}.bn.bias"]},
    }
    stats = {"bn": {"mean": sd[f"{prefix}.bn.running_mean"],
                    "var": sd[f"{prefix}.bn.running_var"]}}
    return params, stats


def convert_ultralytics_state_dict(
    state_dict: Mapping[str, Any], n_per_c2f: Mapping[int, int]
) -> Dict[str, Any]:
    """ultralytics YOLOv8 checkpoint -> Flax variables for models/yolo.py.

    Accepts the ``model.model.{i}.*`` naming of ``YOLO("yolov8s.pt")``
    checkpoints (the reference slices the same Sequential,
    ``ultralytics.py:100-135``). ``n_per_c2f`` maps sequential index of each
    C2f layer -> its bottleneck count (depends on the depth multiple).
    Returns ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("model.model.").removeprefix("model.")
        sd[k] = _t(v)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(layer: str, sub: tuple[str, ...], prefix: str) -> None:
        p, s = _conv_unit_from_torch(sd, prefix)
        dp, ds = params.setdefault(layer, {}), stats.setdefault(layer, {})
        for part in sub[:-1]:
            dp = dp.setdefault(part, {})
            ds = ds.setdefault(part, {})
        if sub:
            dp[sub[-1]] = p
            ds[sub[-1]] = s
        else:
            dp.update(p)
            ds.update(s)

    for i in (0, 1, 3, 5, 7):  # plain Conv layers
        put(f"layer{i}", (), str(i))
    for i in (2, 4, 6, 8):  # C2f layers
        put(f"layer{i}", ("cv1",), f"{i}.cv1")
        put(f"layer{i}", ("cv2",), f"{i}.cv2")
        for j in range(n_per_c2f[i]):
            put(f"layer{i}", (f"m{j}", "cv1"), f"{i}.m.{j}.cv1")
            put(f"layer{i}", (f"m{j}", "cv2"), f"{i}.m.{j}.cv2")
    put("layer9", ("cv1",), "9.cv1")
    put("layer9", ("cv2",), "9.cv2")
    return {"params": params, "batch_stats": stats}


def convert_yolov5_state_dict(
    state_dict: Mapping[str, Any], n_per_c3: Mapping[int, int]
) -> Dict[str, Any]:
    """ultralytics YOLOv5 checkpoint (``model.model.{i}.*``) -> Flax
    variables for ``models/yolo.YOLOv5Backbone`` (layers 0-8; the SPPF at
    index 9 is dropped — the reference's v5 SSL slice cuts before it)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("model.model.").removeprefix("model.")
        sd[k] = _t(v)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(layer: str, sub: tuple, prefix: str) -> None:
        p, s = _conv_unit_from_torch(sd, prefix)
        dp, ds = params.setdefault(layer, {}), stats.setdefault(layer, {})
        for part in sub[:-1]:
            dp = dp.setdefault(part, {})
            ds = ds.setdefault(part, {})
        if sub:
            dp[sub[-1]] = p
            ds[sub[-1]] = s
        else:
            dp.update(p)
            ds.update(s)

    for i in (0, 1, 3, 5, 7):
        put(f"layer{i}", (), str(i))
    for i in (2, 4, 6, 8):  # C3 layers
        for cv in ("cv1", "cv2", "cv3"):
            put(f"layer{i}", (cv,), f"{i}.{cv}")
        for j in range(n_per_c3[i]):
            put(f"layer{i}", (f"m{j}", "cv1"), f"{i}.m.{j}.cv1")
            put(f"layer{i}", (f"m{j}", "cv2"), f"{i}.m.{j}.cv2")
    return {"params": params, "batch_stats": stats}


def convert_yolo11_state_dict(
    state_dict: Mapping[str, Any], n_per_block: Mapping[int, int],
    c3k_layers: tuple = (6, 8),
) -> Dict[str, Any]:
    """ultralytics YOLO11 checkpoint -> Flax variables for
    ``models/yolo.YOLO11Backbone`` (layers 0-10 incl. SPPF + C2PSA)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("model.model.").removeprefix("model.")
        sd[k] = _t(v)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(layer: str, sub: tuple, prefix: str) -> None:
        p, s = _conv_unit_from_torch(sd, prefix)
        dp, ds = params.setdefault(layer, {}), stats.setdefault(layer, {})
        for part in sub[:-1]:
            dp = dp.setdefault(part, {})
            ds = ds.setdefault(part, {})
        if sub:
            dp[sub[-1]] = p
            ds[sub[-1]] = s
        else:
            dp.update(p)
            ds.update(s)

    for i in (0, 1, 3, 5, 7):
        put(f"layer{i}", (), str(i))
    for i in (2, 4, 6, 8):  # C3k2 layers
        put(f"layer{i}", ("cv1",), f"{i}.cv1")
        put(f"layer{i}", ("cv2",), f"{i}.cv2")
        for j in range(n_per_block[i]):
            if i in c3k_layers:  # m{j} is a C3k (cv1/cv2/cv3 + 2 bottlenecks)
                for cv in ("cv1", "cv2", "cv3"):
                    put(f"layer{i}", (f"m{j}", cv), f"{i}.m.{j}.{cv}")
                for b in range(2):
                    put(f"layer{i}", (f"m{j}", f"m{b}", "cv1"),
                        f"{i}.m.{j}.m.{b}.cv1")
                    put(f"layer{i}", (f"m{j}", f"m{b}", "cv2"),
                        f"{i}.m.{j}.m.{b}.cv2")
            else:  # plain bottleneck
                put(f"layer{i}", (f"m{j}", "cv1"), f"{i}.m.{j}.cv1")
                put(f"layer{i}", (f"m{j}", "cv2"), f"{i}.m.{j}.cv2")
    put("layer9", ("cv1",), "9.cv1")
    put("layer9", ("cv2",), "9.cv2")
    # C2PSA at index 10
    put("layer10", ("cv1",), "10.cv1")
    put("layer10", ("cv2",), "10.cv2")
    for j in range(n_per_block[10]):
        base = f"10.m.{j}"
        for flax_name, torch_name in (
            ("qkv", "attn.qkv"), ("proj", "attn.proj"), ("pe", "attn.pe"),
            ("ffn0", "ffn.0"), ("ffn1", "ffn.1"),
        ):
            sub = (f"m{j}", "attn", flax_name) if flax_name in (
                "qkv", "proj", "pe"
            ) else (f"m{j}", flax_name)
            put("layer10", sub, f"{base}.{torch_name}")
    return {"params": params, "batch_stats": stats}


def convert_yolov8_to_ultralytics_state_dict(
    variables: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_ultralytics_state_dict`` (backbone layers 0-9).

    Emits ``model.{i}.*`` keys loadable into an ultralytics ``DetectionModel``
    with ``strict=False`` — the reference's export-back-to-ultralytics path
    (``ultralytics_package.py`` export)."""
    params = jax_to_np(variables["params"])
    stats = jax_to_np(variables["batch_stats"])
    sd: Dict[str, np.ndarray] = {}

    def emit(prefix: str, p: Mapping[str, Any], s: Mapping[str, Any]) -> None:
        if "conv" in p:  # a ConvBNSiLU leaf
            sd[f"{prefix}.conv.weight"] = p["conv"]["kernel"].transpose(3, 2, 0, 1)
            sd[f"{prefix}.bn.weight"] = p["bn"]["scale"]
            sd[f"{prefix}.bn.bias"] = p["bn"]["bias"]
            sd[f"{prefix}.bn.running_mean"] = s["bn"]["mean"]
            sd[f"{prefix}.bn.running_var"] = s["bn"]["var"]
            return
        for name in p:
            # flax m{j} -> torch m.{j}
            tname = f"m.{name[1:]}" if name.startswith("m") and name[1:].isdigit() else name
            emit(f"{prefix}.{tname}", p[name], s[name])

    for layer, p in params.items():
        emit(f"model.{layer.removeprefix('layer')}", p, stats[layer])
    return sd


# ---------------------------------------------------------------------------
# ECViT / EdgeCrafter (models/ecvit.py)
# ---------------------------------------------------------------------------

def convert_ecvit_state_dict(
    state_dict: Mapping[str, Any], depth: int, n_projector: int
) -> Dict[str, Any]:
    """EdgeCrafter ECViTModelWrapper torch state dict -> Flax variables.

    Torch naming (``ecvit.py:115-612``): ``backbone.patch_embed.convs.{i}.
    {conv,norm}``, ``backbone.patch_embed.proj``, ``backbone.register_token``,
    ``backbone.blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}``,
    ``projector.{i}.{conv,norm}``. The fused qkv rows split into separate
    q/k/v kernels (same layout policy as the ViT converter).
    Returns ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_norm(dst: str, prefix: str) -> None:
        params[dst] = {
            "conv": {"kernel": sd[f"{prefix}.conv.weight"].transpose(2, 3, 1, 0)},
            "norm": {"scale": sd[f"{prefix}.norm.weight"],
                     "bias": sd[f"{prefix}.norm.bias"]},
        }
        stats[dst] = {"norm": {"mean": sd[f"{prefix}.norm.running_mean"],
                               "var": sd[f"{prefix}.norm.running_var"]}}

    for i in range(3):
        conv_norm(f"pe_conv{i}", f"backbone.patch_embed.convs.{i}")
    params["pe_proj"] = {
        "kernel": sd["backbone.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["backbone.patch_embed.proj.bias"],
    }
    params["register_token"] = sd["backbone.register_token"]

    for i in range(depth):
        p = f"backbone.blocks.{i}."
        qkv_w = sd[f"{p}attn.qkv.weight"]  # (3D, D)
        D = qkv_w.shape[1]
        wq, wk, wv = qkv_w[:D], qkv_w[D:2 * D], qkv_w[2 * D:]
        attn = {
            "q": {"kernel": wq.T},
            "k": {"kernel": wk.T},
            "v": {"kernel": wv.T},
            "proj": {"kernel": sd[f"{p}attn.proj.weight"].T,
                     "bias": sd[f"{p}attn.proj.bias"]},
        }
        if f"{p}attn.qkv.bias" in sd:
            b = sd[f"{p}attn.qkv.bias"]
            attn["q"]["bias"] = b[:D]
            attn["k"]["bias"] = b[D:2 * D]
            attn["v"]["bias"] = b[2 * D:]
        params[f"block{i}"] = {
            "norm1": {"scale": sd[f"{p}norm1.weight"],
                      "bias": sd[f"{p}norm1.bias"]},
            "norm2": {"scale": sd[f"{p}norm2.weight"],
                      "bias": sd[f"{p}norm2.bias"]},
            "attn": attn,
            "mlp": {
                "fc1": {"kernel": sd[f"{p}mlp.fc1.weight"].T,
                        "bias": sd[f"{p}mlp.fc1.bias"]},
                "fc2": {"kernel": sd[f"{p}mlp.fc2.weight"].T,
                        "bias": sd[f"{p}mlp.fc2.bias"]},
            },
        }

    for i in range(n_projector):
        conv_norm(f"projector{i}", f"projector.{i}")
    return {"params": params, "batch_stats": stats}
