"""8-bit AdamW: int8-quantized optimizer moments with stochastic rounding.

TPU-native rebuild of the reference's bitsandbytes AdamW8bit
(``src/lightly_train/_optim/adamw8bit_args.py``): first and second moments
are stored as int8 with per-block fp32 absmax scales (block size 256 along
the flattened parameter), cutting optimizer-state HBM by ~4x (the reference's
motivation for ViT-g scale training). Quantization uses stochastic rounding
driven by a per-step PRNG key carried in the optimizer state; all math is
plain XLA (a Pallas fused dequant-update-requant kernel is the planned
round-2 upgrade).
"""

from __future__ import annotations

from typing import Any, Literal, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

from lightly_train_tpu._configs.config import AUTO, Auto
from lightly_train_tpu._optim.optimizers import OptimizerArgs

BLOCK = 256


class AdamW8bitArgs(OptimizerArgs):
    type: Literal["adamw8bit"] = "adamw8bit"
    lr: Union[float, Auto] = AUTO
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 1e-2


def _quantize(x: jax.Array, key: jax.Array):
    """f32 array -> (int8 values, per-block f32 scales). Stochastic rounding."""
    flat = x.reshape(-1)
    pad = (-flat.size) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    scaled = blocks / scale
    noise = jax.random.uniform(key, scaled.shape) - 0.5
    q = jnp.clip(jnp.round(scaled + noise), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_nearest(x: jax.Array):
    """f32 array -> (int8, per-block scales), round-to-nearest."""
    flat = x.reshape(-1)
    pad = (-flat.size) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize(q: jax.Array, scale: jax.Array, shape) -> jax.Array:
    flat = (q.astype(jnp.float32) * scale).reshape(-1)
    size = 1
    for s in shape:
        size *= s
    return flat[:size].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu_q: Any  # int8 moment trees
    mu_scale: Any
    nu_q: Any
    nu_scale: Any
    key: jax.Array


def scale_by_adam8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    seed: int = 0,
) -> optax.GradientTransformation:
    def init_fn(params):
        key = jax.random.key(seed)

        def q_zero(p):
            n_blocks = -(-p.size // BLOCK)
            return (
                jnp.zeros((n_blocks, BLOCK), jnp.int8),
                jnp.full((n_blocks, 1), 1e-12, jnp.float32),
            )

        zeros = jax.tree_util.tree_map(q_zero, params)
        mu_q = jax.tree_util.tree_map(lambda z: z[0], zeros,
                                      is_leaf=lambda z: isinstance(z, tuple))
        mu_scale = jax.tree_util.tree_map(lambda z: z[1], zeros,
                                          is_leaf=lambda z: isinstance(z, tuple))
        zeros2 = jax.tree_util.tree_map(q_zero, params)
        nu_q = jax.tree_util.tree_map(lambda z: z[0], zeros2,
                                      is_leaf=lambda z: isinstance(z, tuple))
        nu_scale = jax.tree_util.tree_map(lambda z: z[1], zeros2,
                                          is_leaf=lambda z: isinstance(z, tuple))
        return ScaleByAdam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu_q=mu_q, mu_scale=mu_scale, nu_q=nu_q, nu_scale=nu_scale,
            key=key,
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        key = jax.random.fold_in(state.key, count)
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        mu_q_l = treedef.flatten_up_to(state.mu_q)
        mu_s_l = treedef.flatten_up_to(state.mu_scale)
        nu_q_l = treedef.flatten_up_to(state.nu_q)
        nu_s_l = treedef.flatten_up_to(state.nu_scale)
        new_updates, new_mu_q, new_mu_s, new_nu_q, new_nu_s = [], [], [], [], []
        for i, g in enumerate(leaves):
            k1 = jax.random.fold_in(key, i)
            g32 = g.astype(jnp.float32)
            mu = _dequantize(mu_q_l[i], mu_s_l[i], g.shape)
            # Second moment is stored in the SQRT domain: linear int8 cannot
            # hold nu's dynamic range (bias correction amplifies the
            # quantization noise ~1/(1-b2) at early steps); sqrt compresses
            # the range quadratically and keeps nu non-negative. This plays
            # the role of bitsandbytes' dynamic-exponent 8-bit map.
            nu_sqrt = _dequantize(nu_q_l[i], nu_s_l[i], g.shape)
            nu = nu_sqrt * nu_sqrt
            mu = b1 * mu + (1 - b1) * g32
            nu = b2 * nu + (1 - b2) * g32 * g32
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            new_updates.append(
                (mu_hat / (jnp.sqrt(nu_hat) + eps)).astype(g.dtype)
            )
            q1, s1 = _quantize(mu, k1)
            # Round-to-nearest for the sqrt moment (zero-mean noise on a
            # squared quantity would bias it upward).
            q2, s2 = _quantize_nearest(jnp.sqrt(nu))
            new_mu_q.append(q1)
            new_mu_s.append(s1)
            new_nu_q.append(q2)
            new_nu_s.append(s2)
        return (
            jax.tree_util.tree_unflatten(treedef, new_updates),
            ScaleByAdam8bitState(
                count=count,
                mu_q=jax.tree_util.tree_unflatten(treedef, new_mu_q),
                mu_scale=jax.tree_util.tree_unflatten(treedef, new_mu_s),
                nu_q=jax.tree_util.tree_unflatten(treedef, new_nu_q),
                nu_scale=jax.tree_util.tree_unflatten(treedef, new_nu_s),
                key=state.key,
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)
