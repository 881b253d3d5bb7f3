"""Projection heads for SSL methods.

Rebuilds: DINO head with weight-normalized prototype layer
(``src/lightly_train/_methods/dinov2/dinov2_head.py:32-95``), plain linear
projection heads for DistillationV3 (``distillationv3.py`` two Dense heads),
and the SimCLR MLP projection head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class WeightNormDense(nn.Module):
    """Dense layer with weight-normalized kernel and TRAINABLE per-output
    gain: ``W = g * v / ||v||_col``.

    Matches torch ``parametrizations.weight_norm(Linear(...), dim=0)`` as the
    reference DINO prototype layer uses it (``dinov2_head.py:51-56``): the
    gain (torch ``original0``) is initialized to 1 and TRAINED — it is not
    frozen. (It IS frozen for the first ``freeze_last_layer_steps`` along
    with ``v`` via the prototype update mask.)
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        v = self.param(
            "v",
            nn.initializers.truncated_normal(stddev=0.02),
            (x.shape[-1], self.features),
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        v32 = v.astype(jnp.float32)
        w = v32 * (
            g.astype(jnp.float32)
            / jnp.maximum(jnp.linalg.norm(v32, axis=0, keepdims=True), 1e-8)
        )
        return x @ w.astype(x.dtype)


class DINOHead(nn.Module):
    """3-layer MLP -> l2-normalize -> weight-normed prototypes.

    hidden 2048, bottleneck 256, GELU — the reference defaults
    (``dinov2_head.py:32-95``).
    """

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.dtype)
        for i in range(self.n_layers - 1):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp{i}")(h)
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.bottleneck_dim, dtype=self.dtype, name="bottleneck")(h)
        h32 = h.astype(jnp.float32)
        h32 = h32 / jnp.maximum(jnp.linalg.norm(h32, axis=-1, keepdims=True), 1e-8)
        return WeightNormDense(self.out_dim, dtype=self.dtype, name="prototypes")(
            h32.astype(self.dtype)
        )


class ProjectionHead(nn.Module):
    """Single linear projection (DistillationV3 global/local heads)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)


class SimCLRProjectionHead(nn.Module):
    """2-layer MLP head (SimCLR reference defaults: hidden = input dim)."""

    hidden_dim: int = 2048
    out_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="fc2")(h)
