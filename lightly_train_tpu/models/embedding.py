"""Embedding projection: backbone + trainable linear embedding head.

Rebuild of ``src/lightly_train/_models/embedding_model.py:22-80`` as the
``embed_dim`` pathway: during pretraining ``project_wrapped`` joins a shared
Dense (the NHWC analog of the reference's 1x1 Conv) to every feature output;
at inference ``_EmbedHead`` applies the exported head sidecar to pooled
features (identical by linearity)."""

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


