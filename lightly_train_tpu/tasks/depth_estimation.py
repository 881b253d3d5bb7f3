"""Depth estimation (DepthAnything-style DPT head, inference path).

Rebuild of ``src/lightly_train/_task_models/depth_estimation{,_components}/``
(DPT head ``depth_estimation_components/dpt.py``; metric + relative model
variants). The reference ships inference only (checkpoint converters +
predict); here the DPT head runs on 4 intermediate ViT layers captured via
the trunk's sown intermediates, with the standard eval metrics (delta1,
AbsRel, RMSE — BASELINE.md NYUv2 table) provided for parity evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu.models.wrapper import WrappedModel


class _FusionBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: Optional[jax.Array]) -> jax.Array:
        if skip is not None:
            h = nn.relu(x)
            h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name="res1")(h)
            h = nn.relu(h)
            h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name="res2")(h)
            x = x + h + skip
        B, H, W, D = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, D), "bilinear")
        return nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                       name="proj")(x)


class DPTHead(nn.Module):
    """Dense Prediction Transformer head over 4 ViT feature maps."""

    dim: int = 128
    dtype: Any = jnp.float32
    metric: bool = True  # metric depth (sigmoid*max) vs relative (relu)
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, layers: List[jax.Array]) -> jax.Array:
        # layers: 4 x (B, gh, gw, D) from shallow to deep.
        assert len(layers) == 4
        # Reassemble to scales x4, x2, x1, x0.5 relative to the patch grid.
        scales = [4, 2, 1, 0.5]
        feats = []
        for i, (l, s) in enumerate(zip(layers, scales)):
            h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name=f"read{i}")(l)
            B, gh, gw, D = h.shape
            th, tw = int(gh * s), int(gw * s)
            h = jax.image.resize(h, (B, th, tw, D), "bilinear")
            feats.append(h)
        x = feats[-1]
        for i, skip in enumerate(reversed(feats[:-1])):
            x = _FusionBlock(self.dim, self.dtype, name=f"fuse{i}")(
                x, jax.image.resize(skip, x.shape, "bilinear") if i else None
            )
            if i == 0:
                # First fusion consumes the deepest feature directly.
                pass
        x = nn.Conv(self.dim // 2, (3, 3), padding="SAME", dtype=self.dtype,
                    name="out1")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="out2")(x)
        x = nn.relu(x)
        depth = nn.Conv(1, (1, 1), dtype=self.dtype, name="out3")(x)[..., 0]
        if self.metric:
            return jax.nn.sigmoid(depth.astype(jnp.float32)) * self.max_depth
        return nn.relu(depth.astype(jnp.float32))


@dataclasses.dataclass
class DepthEstimationModel:
    """Inference wrapper: backbone intermediates -> DPT -> depth map."""

    wrapped: WrappedModel
    head: DPTHead
    layer_indices: Tuple[int, int, int, int] = (2, 5, 8, 11)

    def init(self, rng: jax.Array, sample: jax.Array) -> Dict[str, Any]:
        kb, kh = jax.random.split(rng)
        backbone_vars = self.wrapped.init(kb, sample)
        layers = self._backbone_layers(backbone_vars, sample)
        head_vars = self.head.init(kh, layers)
        return {"backbone": backbone_vars, "head": head_vars}

    def _backbone_layers(self, backbone_vars, images) -> List[jax.Array]:
        out, aux = self.wrapped.module.apply(
            backbone_vars, images, train=False, mutable=["intermediates"]
        )
        blocks = aux["intermediates"]["blocks"][0]
        B, H, W, _ = images.shape
        patch = self.wrapped.patch_size or 16
        gh, gw = H // patch, W // patch
        n_prefix = getattr(self.wrapped.module, "num_prefix_tokens", 1)
        picked = []
        for i in self.layer_indices:
            i = min(i, len(blocks) - 1)
            t = blocks[i][:, n_prefix:]
            picked.append(t.reshape(B, gh, gw, t.shape[-1]))
        return picked

    def predict_depth(self, variables: Dict[str, Any], images: jax.Array):
        layers = self._backbone_layers(variables["backbone"], images)
        depth = self.head.apply(variables["head"], layers)
        B, H, W, _ = images.shape
        return jax.image.resize(depth[..., None], (B, H, W, 1), "bilinear")[
            ..., 0
        ]


def depth_metrics(pred: np.ndarray, target: np.ndarray,
                  mask: Optional[np.ndarray] = None) -> Dict[str, float]:
    """NYUv2-style eval: delta1, AbsRel, RMSE (BASELINE.md depth table)."""
    if mask is None:
        mask = target > 1e-6
    p = pred[mask]
    t = target[mask]
    ratio = np.maximum(p / np.maximum(t, 1e-9), t / np.maximum(p, 1e-9))
    return {
        "delta1": float((ratio < 1.25).mean()),
        "abs_rel": float((np.abs(p - t) / np.maximum(t, 1e-9)).mean()),
        "rmse": float(np.sqrt(((p - t) ** 2).mean())),
    }
