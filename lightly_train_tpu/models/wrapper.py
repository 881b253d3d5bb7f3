"""Functional model-wrapper protocol.

TPU-native rebuild of ``src/lightly_train/_models/model_wrapper.py:30-246``:
every backbone family exposes the same feature-extraction contract. In JAX the
contract is a frozen descriptor around a Flax module, with pure functions
instead of stateful nn.Module methods:

  wrapped.init(rng, sample)                       -> variables
  wrapped.forward_features(vars, x, mask, train)  -> {features, cls_token,
                                                      patch_tokens, ...}
  wrapped.forward_pool(out)                       -> (B, D) pooled embedding
  wrapped.feature_dim                             -> D

``forward_features`` returns (B, H, W, D) channels-last feature maps (the
reference returns (B, D, H, W) channels-first — NHWC is the TPU layout).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

FeatureDict = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class WrappedModel:
    """A backbone + its feature contract metadata."""

    name: str
    module: nn.Module
    feature_dim: int
    patch_size: Optional[int] = None  # None for CNN backbones
    architecture: str = "transformer"  # transformer | conv | hybrid
    # Extra kwargs the module's __call__ accepts (e.g. ViT supports mask=).
    supports_mask: bool = True

    def init(self, rng: jax.Array, sample: jax.Array) -> Any:
        """Initialize variables from a sample batch (B, H, W, 3)."""
        rngs = {"params": rng, "droppath": jax.random.fold_in(rng, 1)}
        return self.module.init(rngs, sample, train=False)

    def forward_features(
        self,
        variables: Any,
        images: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
        mutable: Any = False,
    ) -> FeatureDict:
        kwargs: Dict[str, Any] = {"train": train}
        if self.supports_mask:
            kwargs["mask"] = mask
        out = self.module.apply(
            variables, images, rngs=rngs, mutable=mutable, **kwargs
        )
        return out

    def forward_pool(self, out: FeatureDict) -> jax.Array:
        """Pooled (B, D) embedding: CLS token for ViTs, GAP for CNNs."""
        features = out if not isinstance(out, tuple) else out[0]
        cls = features.get("cls_token")
        if cls is not None:
            return cls
        return jnp.mean(features["features"], axis=(1, 2))
