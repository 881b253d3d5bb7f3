"""EmbeddingModel: backbone + optional linear embedding head.

Rebuild of ``src/lightly_train/_models/embedding_model.py:22-80``: wraps any
WrappedModel and optionally projects pooled features to ``embed_dim`` with a
linear layer (the reference uses a 1x1 Conv on the feature map; on pooled
features that is a Dense).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.models.wrapper import WrappedModel


class _EmbedHead(nn.Module):
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")(x)


class ProjectedFeaturesModule(nn.Module):
    """Backbone + shared linear projection of every feature output.

    The training-time form of ``embed_dim`` on ``pretrain`` (reference
    ``_commands/train.py:60,394``: the EmbeddingModel's 1x1-conv head is part
    of the trainable model, so SSL heads size from ``embed_dim`` and the
    projection learns with the backbone). A single Dense projects the
    feature map, CLS token, and patch tokens consistently — a 1x1 conv on
    an NHWC map IS a Dense over the channel dim, and pooling commutes with
    it.

    Param scopes: ``{"backbone": <wrapped module>, "embed": <Dense>}`` so
    the bare backbone subtree exports unchanged for fine-tuning.
    """

    backbone: nn.Module
    embed_dim: int
    dtype: Any = jnp.float32
    supports_mask: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        kwargs: Dict[str, Any] = {"train": train}
        if self.supports_mask:
            kwargs["mask"] = mask
        out = dict(self.backbone(x, **kwargs))
        proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")
        for k in ("features", "cls_token", "patch_tokens"):
            if out.get(k) is not None:
                out[k] = proj(out[k])
        return out


def project_wrapped(wrapped: WrappedModel, embed_dim: int, dtype: Any):
    """Wrap a WrappedModel so all feature outputs project to ``embed_dim``."""
    module = ProjectedFeaturesModule(
        backbone=wrapped.module,
        embed_dim=embed_dim,
        dtype=dtype,
        supports_mask=wrapped.supports_mask,
    )
    return dataclasses.replace(
        wrapped, module=module, feature_dim=embed_dim, supports_mask=wrapped.supports_mask
    )


@dataclasses.dataclass(frozen=True)
class EmbeddingModel:
    wrapped: WrappedModel
    embed_dim: Optional[int] = None  # None -> raw backbone features

    @property
    def out_dim(self) -> int:
        return self.embed_dim if self.embed_dim is not None else self.wrapped.feature_dim

    def init(self, rng: jax.Array, sample: jax.Array) -> Dict[str, Any]:
        k_backbone, k_head = jax.random.split(rng)
        variables = {"backbone": self.wrapped.init(k_backbone, sample)}
        if self.embed_dim is not None:
            head = _EmbedHead(self.embed_dim)
            pooled_dim = self.wrapped.feature_dim
            variables["head"] = head.init(
                k_head, jnp.zeros((1, pooled_dim), dtype=jnp.float32)
            )
        return variables

    def embed(
        self,
        variables: Dict[str, Any],
        images: jax.Array,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """(B, H, W, 3) images -> (B, out_dim) embeddings."""
        out = self.wrapped.forward_features(
            variables["backbone"], images, train=train, rngs=rngs
        )
        pooled = self.wrapped.forward_pool(out)
        if self.embed_dim is not None:
            pooled = _EmbedHead(self.embed_dim).apply(variables["head"], pooled)
        return pooled
