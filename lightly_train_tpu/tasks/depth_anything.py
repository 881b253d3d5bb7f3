"""Depth Anything V2/V3 models: exact-parity DPT head + model zoo + converter.

Rebuild of ``src/lightly_train/_task_models/depth_estimation/task_model.py``
(model zoo, 1,102 LoC) and ``depth_estimation_components/dpt.py`` (DPT head):
relative + metric depth variants on DINOv2/DINOv3 backbones, with a
state-dict converter so official Depth Anything torch checkpoints load.

Structure parity with the torch DPT (``dpt.py:48-191``):
- per-stage 1x1 ``projects`` + ``resize_layers`` (x4/x2/x1/x0.5),
- ``scratch.layer{1..4}_rn`` 3x3 no-bias stage adapters,
- top-down ``refinenet{4..1}`` FeatureFusionBlocks (ResidualConvUnit pairs,
  refinenet4 has no lateral residual unit),
- ``output_conv1`` + bilinear(align_corners=True) to patch*grid resolution,
- ``output_conv2`` main head and optional 1-channel sky head.

Postprocessing (``task_model.py:682-724``): sky pixels (confidence >= 0.3)
filled with the 99th percentile of non-sky depth; metric V2 scales by
``max_depth``; metric V3 scales by ``focal/300``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.errors import ConfigError

METRIC_SCALE_FACTOR = 300.0  # DAv3: metric_depth = focal * output / 300


def _resize_bilinear_ac(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True (torch interpolate parity).

    jax.image.resize implements align_corners=False only; for AC=True the
    source coordinates are ``i * (src-1)/(dst-1)`` — computed with an explicit
    gather-free matmul pair (separable), which also rides the MXU.
    """
    B, H, W, C = x.shape
    th, tw = hw
    if (H, W) == (th, tw):
        return x

    def weights(src: int, dst: int) -> jax.Array:
        if dst == 1 or src == 1:
            return jnp.ones((dst, src), x.dtype) / src
        pos = jnp.arange(dst, dtype=jnp.float32) * (src - 1) / (dst - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 1)
        i1 = jnp.clip(i0 + 1, 0, src - 1)
        f = pos - i0
        w = jnp.zeros((dst, src), jnp.float32)
        w = w.at[jnp.arange(dst), i0].add(1.0 - f)
        w = w.at[jnp.arange(dst), i1].add(f)
        return w.astype(x.dtype)

    wy = weights(H, th)  # (th, H)
    wx = weights(W, tw)  # (tw, W)
    x = jnp.einsum("bhwc,th->btwc", x, wy)
    x = jnp.einsum("btwc,uw->btuc", x, wx)
    return x


class _ResidualConvUnit(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        return h + x


class _FeatureFusionBlock(nn.Module):
    features: int
    has_residual: bool
    dtype: Any

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        lateral: Optional[jax.Array],
        out_hw: Optional[Tuple[int, int]],
    ) -> jax.Array:
        if self.has_residual and lateral is not None:
            x = x + _ResidualConvUnit(
                self.features, self.dtype, name="resConfUnit1"
            )(lateral)
        x = _ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(x)
        B, H, W, C = x.shape
        target = out_hw if out_hw is not None else (H * 2, W * 2)
        x = _resize_bilinear_ac(x, target)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPT(nn.Module):
    """Depth Anything DPT head (channels-last Flax mirror of ``dpt.py:32``)."""

    dim_in: int
    patch_size: int = 14
    output_dim: int = 1
    activation: str = "exp"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    use_sky_head: bool = True
    sky_activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: List[jax.Array], image_hw: Tuple[int, int]
    ) -> Dict[str, jax.Array]:
        """feats: 4 patch-token maps (B, ph, pw, C), shallow -> deep."""
        H, W = image_hw
        B, ph, pw, _ = feats[0].shape
        oc = self.out_channels

        resized = []
        for i, x in enumerate(feats):
            x = nn.Conv(oc[i], (1, 1), dtype=self.dtype,
                        name=f"projects_{i}")(x)
            if i == 0:  # x4 upsample (ConvTranspose 4x4 s4)
                x = nn.ConvTranspose(
                    oc[0], (4, 4), strides=(4, 4), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name="resize_0",
                )(x)
            elif i == 1:  # x2 upsample (ConvTranspose 2x2 s2)
                x = nn.ConvTranspose(
                    oc[1], (2, 2), strides=(2, 2), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name="resize_1",
                )(x)
            elif i == 3:  # x0.5 downsample (Conv 3x3 s2 p1)
                x = nn.Conv(
                    oc[3], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="resize_3",
                )(x)
            resized.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name=f"layer{i + 1}_rn")(resized[i])
            for i in range(4)
        ]
        out = _FeatureFusionBlock(
            self.features, has_residual=False, dtype=self.dtype,
            name="refinenet4",
        )(rn[3], None, rn[2].shape[1:3])
        out = _FeatureFusionBlock(
            self.features, has_residual=True, dtype=self.dtype,
            name="refinenet3",
        )(out, rn[2], rn[1].shape[1:3])
        out = _FeatureFusionBlock(
            self.features, has_residual=True, dtype=self.dtype,
            name="refinenet2",
        )(out, rn[1], rn[0].shape[1:3])
        out = _FeatureFusionBlock(
            self.features, has_residual=True, dtype=self.dtype,
            name="refinenet1",
        )(out, rn[0], None)

        out = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                      dtype=self.dtype, name="output_conv1")(out)
        out = _resize_bilinear_ac(out, (ph * self.patch_size,
                                        pw * self.patch_size))

        def head(x, name, out_dim):
            h = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"{name}_0")(x)
            h = nn.relu(h)
            return nn.Conv(out_dim, (1, 1), dtype=self.dtype,
                           name=f"{name}_2")(h)

        main = head(out, "output_conv2", self.output_dim)[..., 0]
        outs = {"depth": _apply_activation(main.astype(jnp.float32),
                                           self.activation)}
        if self.use_sky_head:
            sky = head(out, "sky_output_conv2", 1)[..., 0]
            outs["sky"] = _apply_activation(sky.astype(jnp.float32),
                                            self.sky_activation)
        return outs


def _apply_activation(x: jax.Array, act: str) -> jax.Array:
    if act == "exp":
        return jnp.exp(x)
    if act == "relu":
        return nn.relu(x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    if act == "softplus":
        return jax.nn.softplus(x)
    return x  # linear


# ---------------------------------------------------------------------------
# Model zoo (``task_model.py:41-371``). Hyperparameters copied verbatim —
# they define the official Depth Anything checkpoints.
# ---------------------------------------------------------------------------

def _dav2(size: str, backbone: str, out_layers, out_channels, features,
          scale_mode: str = "none", max_depth: float = 20.0):
    return {
        "backbone": backbone,
        "image_size": 518,
        "activation": "relu" if scale_mode == "none" else "sigmoid",
        "use_sky_head": False,
        "sky_activation": "relu",
        "align_corners": True,
        "scale_mode": scale_mode,
        "max_depth": max_depth,
        "out_layers": tuple(out_layers),
        "patch_size": 14,
        "features": features,
        "out_channels": tuple(out_channels),
    }


def _dav3(backbone: str, out_layers, out_channels, features,
          scale_mode: str, image_size: int = 504, patch: int = 14,
          sky_activation: str = "sigmoid"):
    return {
        "backbone": backbone,
        "image_size": image_size,
        "activation": "exp",
        "use_sky_head": True,
        "sky_activation": sky_activation,
        "align_corners": False,
        "scale_mode": scale_mode,
        "max_depth": 0.0,
        "out_layers": tuple(out_layers),
        "patch_size": patch,
        "features": features,
        "out_channels": tuple(out_channels),
    }


DEPTH_MODEL_CONFIGS: Dict[str, Dict[str, Any]] = {
    # Depth Anything V2 relative (DINOv2 backbones, ``task_model.py:42-96``)
    "dinov2/dav2-relative-small": _dav2(
        "small", "dinov2/vits14", (2, 5, 8, 11), (48, 96, 192, 384), 64),
    "dinov2/dav2-relative-base": _dav2(
        "base", "dinov2/vitb14", (2, 5, 8, 11), (96, 192, 384, 768), 128),
    "dinov2/dav2-relative-large": _dav2(
        "large", "dinov2/vitl14", (4, 11, 17, 23), (256, 512, 1024, 1024),
        256),
    # Depth Anything V2 metric, per-domain (``task_model.py:97-213``)
    "dinov2/dav2-metric-small-hypersim": _dav2(
        "small", "dinov2/vits14", (2, 5, 8, 11), (48, 96, 192, 384), 64,
        scale_mode="max_depth", max_depth=20.0),
    "dinov2/dav2-metric-base-hypersim": _dav2(
        "base", "dinov2/vitb14", (2, 5, 8, 11), (96, 192, 384, 768), 128,
        scale_mode="max_depth", max_depth=20.0),
    "dinov2/dav2-metric-large-hypersim": _dav2(
        "large", "dinov2/vitl14", (4, 11, 17, 23), (256, 512, 1024, 1024),
        256, scale_mode="max_depth", max_depth=20.0),
    "dinov2/dav2-metric-small-vkitti": _dav2(
        "small", "dinov2/vits14", (2, 5, 8, 11), (48, 96, 192, 384), 64,
        scale_mode="max_depth", max_depth=80.0),
    "dinov2/dav2-metric-base-vkitti": _dav2(
        "base", "dinov2/vitb14", (2, 5, 8, 11), (96, 192, 384, 768), 128,
        scale_mode="max_depth", max_depth=80.0),
    "dinov2/dav2-metric-large-vkitti": _dav2(
        "large", "dinov2/vitl14", (4, 11, 17, 23), (256, 512, 1024, 1024),
        256, scale_mode="max_depth", max_depth=80.0),
    # Depth Anything V3 (DINOv2 backbones, ``task_model.py:214-292``)
    "dinov2/dav3-relative-small": _dav3(
        "dinov2/vits14", (2, 5, 8, 11), (48, 96, 192, 384), 64, "none"),
    "dinov2/dav3-metric-small": _dav3(
        "dinov2/vits14", (2, 5, 8, 11), (48, 96, 192, 384), 64, "focal"),
    "dinov2/dav3-relative-large": _dav3(
        "dinov2/vitl14", (4, 11, 17, 23), (256, 512, 1024, 1024), 256,
        "none"),
    "dinov2/dav3-metric-large": _dav3(
        "dinov2/vitl14", (4, 11, 17, 23), (256, 512, 1024, 1024), 256,
        "focal"),
    # Depth Anything V3 Tiny (DINOv3 backbones, ``task_model.py:293-371``)
    "dinov3/dav3-relative-tiny": _dav3(
        "dinov3/vitt16", (2, 5, 8, 11), (24, 48, 96, 192), 32, "none",
        image_size=576, patch=16),
    "dinov3/dav3-relative-tiny-plus": _dav3(
        "dinov3/vitt16plus", (2, 5, 8, 11), (24, 48, 96, 192), 32, "none",
        image_size=576, patch=16),
    "dinov3/dav3-metric-tiny": _dav3(
        "dinov3/vitt16", (2, 5, 8, 11), (24, 48, 96, 192), 32, "focal",
        image_size=576, patch=16),
    "dinov3/dav3-metric-tiny-plus": _dav3(
        "dinov3/vitt16plus", (2, 5, 8, 11), (24, 48, 96, 192), 32, "focal",
        image_size=576, patch=16),
    # hidden test entry
    "dinov3/dav3-relative-test": _dav3(
        "dinov3/vittest16", (0, 0, 1, 1), (8, 8, 16, 16), 8, "none",
        image_size=64, patch=16),
}


def list_depth_models() -> List[str]:
    return sorted(n for n in DEPTH_MODEL_CONFIGS if not n.endswith("-test"))


@dataclasses.dataclass
class DepthAnythingModel:
    """Relative/metric Depth Anything inference model (backbone + DPT)."""

    name: str
    config: Dict[str, Any]
    wrapped: Any
    dpt: DPT

    @classmethod
    def build(cls, name: str, dtype: Any = jnp.float32) -> "DepthAnythingModel":
        key = name.lower()
        cfg = DEPTH_MODEL_CONFIGS.get(key)
        if cfg is None:
            raise ConfigError(
                f"Unknown depth model '{name}'. Options: {list_depth_models()}"
            )
        from lightly_train_tpu.models.package_registry import get_wrapped_model

        # DAv2 runs at 518^2 with a 37x37 pos-embed grid: rebuild the dinov2
        # backbone config at the checkpoint resolution.
        kwargs: Dict[str, Any] = {}
        wrapped = get_wrapped_model(cfg["backbone"], dtype=dtype, **kwargs)
        if cfg["backbone"].startswith("dinov2"):
            import dataclasses as dc

            module_cfg = dc.replace(
                wrapped.module.cfg,
                pos_embed_size=cfg["image_size"] // cfg["patch_size"],
                layerscale_init=1.0,  # DA checkpoints use init_values=1.0
            )
            from lightly_train_tpu.models.vit import VisionTransformer

            wrapped = dataclasses.replace(
                wrapped, module=VisionTransformer(module_cfg)
            )
        dpt = DPT(
            dim_in=wrapped.feature_dim,
            patch_size=cfg["patch_size"],
            activation=cfg["activation"],
            features=cfg["features"],
            out_channels=cfg["out_channels"],
            use_sky_head=cfg["use_sky_head"],
            sky_activation=cfg["sky_activation"],
            dtype=dtype,
        )
        return cls(name=key, config=cfg, wrapped=wrapped, dpt=dpt)

    # -- params --------------------------------------------------------------
    def init(self, rng: jax.Array, sample: jax.Array) -> Dict[str, Any]:
        kb, kh = jax.random.split(rng)
        backbone_vars = self.wrapped.init(kb, sample)
        feats = self._backbone_feats(backbone_vars, sample)
        head_vars = self.dpt.init(kh, feats, sample.shape[1:3])
        return {
            "backbone": backbone_vars["params"],
            "decoder": head_vars["params"],
        }

    def _backbone_feats(self, backbone_vars, images) -> List[jax.Array]:
        out, aux = self.wrapped.module.apply(
            {"params": backbone_vars["params"]}
            if "params" in backbone_vars else backbone_vars,
            images, train=False, mutable=["intermediates"],
        )
        blocks = aux["intermediates"]["blocks"][0]
        B, H, W, _ = images.shape
        patch = self.config["patch_size"]
        gh, gw = H // patch, W // patch
        n_prefix = getattr(self.wrapped.module, "num_prefix_tokens", 1)
        picked = []
        for i in self.config["out_layers"]:
            t = blocks[min(i, len(blocks) - 1)][:, n_prefix:]
            picked.append(t.reshape(B, gh, gw, t.shape[-1]))
        return picked

    # -- inference -----------------------------------------------------------
    def forward(self, params: Dict[str, Any], images: jax.Array):
        """images: (B, H, W, 3) preprocessed floats. Returns dict of maps."""
        feats = self._backbone_feats({"params": params["backbone"]}, images)
        return self.dpt.apply(
            {"params": params["decoder"]}, feats, images.shape[1:3]
        )

    def predict(
        self,
        params: Dict[str, Any],
        images: jax.Array,
        focal: Optional[float] = None,
    ) -> np.ndarray:
        """Depth maps at input resolution with sky fill + metric scaling."""
        out = jax.jit(self.forward)(params, images)
        depth = np.asarray(out["depth"], np.float32)
        sky = np.asarray(out["sky"], np.float32) if "sky" in out else None
        result = []
        for i in range(depth.shape[0]):
            d = depth[i]
            if sky is not None:
                d = _fill_sky(d, sky[i])
            if self.config["scale_mode"] == "max_depth":
                d = d * self.config["max_depth"]
            elif self.config["scale_mode"] == "focal" and focal is not None:
                d = d * (focal / METRIC_SCALE_FACTOR)
            result.append(d)
        return np.stack(result)


def _fill_sky(depth: np.ndarray, sky: np.ndarray) -> np.ndarray:
    """Sky pixels (conf >= 0.3) -> 99th percentile of non-sky depth
    (``task_model.py:1043-1075``)."""
    non_sky = sky < 0.3
    if non_sky.sum() <= 10 or (~non_sky).sum() <= 10:
        return depth
    fill = np.percentile(depth[non_sky], 99)
    out = depth.copy()
    out[~non_sky] = fill
    return out


# ---------------------------------------------------------------------------
# Checkpoint converter (official Depth Anything torch checkpoints -> Flax)
# ---------------------------------------------------------------------------


def convert_depth_anything_state_dict(
    state_dict: Any, model: DepthAnythingModel
) -> Dict[str, Any]:
    """Official DAv2/v3 torch state dict -> params for DepthAnythingModel.

    Expects the reference's converted layout (``task_model.py:725-727``
    ``load_train_state_dict``): ``backbone.*`` ViT keys +
    ``decoder.{projects,resize_layers,scratch}.*`` DPT keys. Raw official
    checkpoints using ``pretrained.*``/``depth_head.*`` prefixes are
    normalized first.
    """
    from lightly_train_tpu.models.convert import (
        _t,
        convert_torch_vit_state_dict,
    )

    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        k = k.replace("pretrained.", "backbone.").replace(
            "depth_head.", "decoder.")
        sd[k] = v
    backbone_sd = {
        k.removeprefix("backbone."): v
        for k, v in sd.items() if k.startswith("backbone.")
    }
    backbone = None
    if backbone_sd:
        depth = model.wrapped.module.cfg.depth
        backbone = convert_torch_vit_state_dict(backbone_sd, depth)

    d = {k.removeprefix("decoder."): _t(v)
         for k, v in sd.items() if k.startswith("decoder.")}
    dec: Dict[str, Any] = {}
    for i in range(4):
        dec[f"projects_{i}"] = {
            "kernel": d[f"projects.{i}.weight"].transpose(2, 3, 1, 0),
            "bias": d[f"projects.{i}.bias"],
        }
    # resize_layers: 0/1 ConvTranspose (in, out, kh, kw) -> flax
    # transpose_kernel=True expects (kh, kw, out, in).
    for i in (0, 1):
        dec[f"resize_{i}"] = {
            "kernel": d[f"resize_layers.{i}.weight"].transpose(2, 3, 1, 0),
            "bias": d[f"resize_layers.{i}.bias"],
        }
    dec["resize_3"] = {
        "kernel": d["resize_layers.3.weight"].transpose(2, 3, 1, 0),
        "bias": d["resize_layers.3.bias"],
    }
    for i in range(4):
        dec[f"layer{i + 1}_rn"] = {
            "kernel": d[f"scratch.layer{i + 1}_rn.weight"].transpose(
                2, 3, 1, 0),
        }
    for r in range(1, 5):
        blk: Dict[str, Any] = {}
        units = ("resConfUnit2",) if r == 4 else ("resConfUnit1",
                                                  "resConfUnit2")
        for u in units:
            blk[u] = {
                "conv1": {
                    "kernel": d[
                        f"scratch.refinenet{r}.{u}.conv1.weight"
                    ].transpose(2, 3, 1, 0),
                    "bias": d[f"scratch.refinenet{r}.{u}.conv1.bias"],
                },
                "conv2": {
                    "kernel": d[
                        f"scratch.refinenet{r}.{u}.conv2.weight"
                    ].transpose(2, 3, 1, 0),
                    "bias": d[f"scratch.refinenet{r}.{u}.conv2.bias"],
                },
            }
        blk["out_conv"] = {
            "kernel": d[f"scratch.refinenet{r}.out_conv.weight"].transpose(
                2, 3, 1, 0),
            "bias": d[f"scratch.refinenet{r}.out_conv.bias"],
        }
        dec[f"refinenet{r}"] = blk
    dec["output_conv1"] = {
        "kernel": d["scratch.output_conv1.weight"].transpose(2, 3, 1, 0),
        "bias": d["scratch.output_conv1.bias"],
    }
    for head, prefix in (
        ("output_conv2", "scratch.output_conv2"),
        ("sky_output_conv2", "scratch.sky_output_conv2"),
    ):
        if f"{prefix}.0.weight" not in d:
            continue
        # Sequential indices: 0 = Conv3x3, last = Conv1x1 (ReLU between).
        last = 2
        dec[f"{head}_0"] = {
            "kernel": d[f"{prefix}.0.weight"].transpose(2, 3, 1, 0),
            "bias": d[f"{prefix}.0.bias"],
        }
        dec[f"{head}_2"] = {
            "kernel": d[f"{prefix}.{last}.weight"].transpose(2, 3, 1, 0),
            "bias": d[f"{prefix}.{last}.bias"],
        }
    return {"backbone": backbone, "decoder": dec}


def load_depth_model(
    name: str,
    weights: Optional[str] = None,
    dtype: Any = jnp.float32,
) -> Tuple[DepthAnythingModel, Optional[Dict[str, Any]]]:
    """Construct a zoo model; load + convert a torch checkpoint if given."""
    model = DepthAnythingModel.build(name, dtype=dtype)
    params = None
    if weights is not None:
        import torch

        ckpt = torch.load(weights, map_location="cpu", weights_only=True)
        if isinstance(ckpt, dict) and "model" in ckpt:
            ckpt = ckpt["model"]
        ckpt = {k: v.numpy() for k, v in ckpt.items()}
        params = convert_depth_anything_state_dict(ckpt, model)
    return model, params
