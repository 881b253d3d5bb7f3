"""Optimizer factories: AdamW, SGD, LARS with wd-masking and layerwise decay.

Rebuild of ``src/lightly_train/_optim/`` (449 LoC): the ``OptimizerArgs``
hierarchy maps to pydantic arg models + optax transformations. Parameter
grouping (no weight decay for norm/bias, ``trainable_modules.py:15``) becomes
an optax mask; DINOv2's layer-wise LR decay + patch-embed LR multiplier
(``_methods/dinov2/utils.py:155-253``) becomes a per-leaf update scaling
transform keyed on the flax parameter path.

AdamW8bit: the reference wraps bitsandbytes; the TPU-native equivalent
(int8 block-quantized moments, sqrt-domain second moment, stochastic
rounding) lives in ``adamw8bit.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax
from pydantic import Field

from lightly_train_tpu._configs.config import AUTO, Auto, PydanticConfig


class OptimizerArgs(PydanticConfig):
    type: str = "adamw"
    lr: Union[float, Auto] = AUTO
    weight_decay: float = 0.0


class AdamWArgs(OptimizerArgs):
    type: Literal["adamw"] = "adamw"
    lr: Union[float, Auto] = AUTO
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 1e-2


class SGDArgs(OptimizerArgs):
    type: Literal["sgd"] = "sgd"
    lr: Union[float, Auto] = AUTO
    momentum: float = 0.9
    weight_decay: float = 0.0


class LARSArgs(OptimizerArgs):
    type: Literal["lars"] = "lars"
    lr: Union[float, Auto] = AUTO
    momentum: float = 0.9
    weight_decay: float = 0.0
    trust_coefficient: float = 0.001


# Filled below (adamw8bit appended at module bottom to avoid a cycle).
OPTIMIZER_ARGS_TYPES = {"adamw": AdamWArgs, "sgd": SGDArgs, "lars": LARSArgs}


def no_weight_decay_mask(params: Any) -> Any:
    """False for 1-D params (biases, norm scales, layerscale gammas, tokens).

    Generic task-training default. The DINOv2 SSL family uses the exact
    reference rule instead (:func:`dinov2_wd_mask`)."""

    def _mask(path: Tuple[Any, ...], leaf: Any) -> bool:
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if leaf.ndim <= 1:
            return False
        # token / embedding / query params are also exempt in the reference
        # (``_optim/optimizer_helpers.py:83-113``: tokens, embeddings,
        # positional embeddings, query parameters).
        if name in ("cls_token", "mask_token", "register_tokens", "pos_embed",
                    "queries"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(_mask, params)


def dinov2_wd_mask(params: Any) -> Any:
    """The reference DINOv2 weight-decay rule, verbatim
    (``_methods/dinov2/utils.py:240-243``): decay everything EXCEPT params
    whose name ends with ``.bias``, or whose path contains ``norm`` or
    ``gamma``. Notably cls/pos/mask tokens, the patch-embed kernel and the
    weight-norm prototype gain DO get weight decay (unlike the generic task
    mask above). Verified against the torch reference by the trajectory
    parity harness (tests/methods/test_trajectory_parity.py)."""

    def _mask(path: Tuple[Any, ...], leaf: Any) -> bool:
        del leaf
        parts = [
            str(p.key) if hasattr(p, "key") else str(p) for p in path
        ]
        if parts[-1] == "bias":
            return False
        joined = "/".join(parts)
        if "norm" in joined or "gamma" in joined:
            return False
        return True

    return jax.tree_util.tree_map_with_path(_mask, params)


def layerwise_lr_scales(
    params: Any,
    decay: float,
    num_layers: int,
    patch_embed_multiplier: float = 1.0,
) -> Any:
    """Per-leaf LR multipliers implementing DINOv2 layerwise decay.

    Path rules (``dinov2/utils.py:155-247``): ``block{i}`` params get
    ``decay^(num_layers - i)``; embedding-level params (patch_embed,
    pos_embed, cls/register/mask tokens) get ``decay^(num_layers + 1)``;
    ``patch_embed_multiplier`` applies to patch_embed params ONLY
    (``utils.py:246``: ``if "patch_embed" in name``; reference default 0.2);
    everything else (final norm, heads) gets 1.0.
    """

    def _scale(path: Tuple[Any, ...], leaf: Any) -> float:
        parts = [
            str(p.key) if hasattr(p, "key") else str(p) for p in path
        ]
        joined = "/".join(parts)
        for part in parts:
            if part.startswith("block") and part[5:].isdigit():
                layer = int(part[5:])
                return float(decay ** (num_layers - layer))
        if any(
            n in joined
            for n in ("patch_embed", "pos_embed", "cls_token", "mask_token",
                      "register_tokens")
        ):
            s = float(decay ** (num_layers + 1))
            if "patch_embed" in joined:
                s *= patch_embed_multiplier
            return s
        return 1.0

    return jax.tree_util.tree_map_with_path(_scale, params)


def scale_by_grouped_schedules(
    schedules: Any, groups: Any
) -> optax.GradientTransformation:
    """Final LR step with a DIFFERENT schedule per parameter group.

    ``groups`` is a tree (matching params) of static ints indexing into
    ``schedules``. Rebuild of the reference's per-param-group LR schedules
    (EoMT ``TwoStageWarmupPolySchedule`` drives backbone and head groups on
    different warmup clocks). Applies ``-schedules[g](count)`` like
    ``optax.scale_by_learning_rate``.
    """

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        vals = [jnp.asarray(s(state.count), jnp.float32) for s in schedules]
        updates = jax.tree_util.tree_map(
            lambda u, g: u * (-vals[g]).astype(u.dtype), updates, groups
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by a static scalar tree (layerwise decay)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scales
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    args: OptimizerArgs,
    learning_rate: Union[float, optax.Schedule],
    params: Any,
    grad_clip_norm: Optional[float] = None,
    lr_scales: Optional[Any] = None,
    weight_decay_schedule: Optional[optax.Schedule] = None,
    wd_mask: Optional[Any] = None,
    schedule_groups: Optional[Tuple[Any, Any]] = None,
) -> optax.GradientTransformation:
    """Assemble the full update chain: clip -> optimizer -> lr scales.

    ``weight_decay_schedule`` overrides the static wd (DINOv2 cosine wd
    0.04 -> 0.4, applied via optax.add_decayed_weights with a mask and an
    injected schedule using inject_hyperparams). ``wd_mask`` overrides the
    generic no-decay mask (the DINOv2 family passes
    :func:`dinov2_wd_mask` to match the reference rule exactly).
    ``schedule_groups`` = (schedules list, per-leaf int group tree): when
    given, the final LR step uses :func:`scale_by_grouped_schedules` and
    ``learning_rate`` is ignored (EoMT's two-clock warmup).
    """
    from lightly_train_tpu._optim.adamw8bit import (
        AdamW8bitArgs,
        scale_by_adam8bit,
    )

    if wd_mask is None:
        wd_mask = no_weight_decay_mask(params)
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if isinstance(args, AdamW8bitArgs):
        chain.append(
            scale_by_adam8bit(b1=args.betas[0], b2=args.betas[1], eps=args.eps)
        )
    elif isinstance(args, AdamWArgs):
        chain.append(
            optax.scale_by_adam(b1=args.betas[0], b2=args.betas[1], eps=args.eps)
        )
    elif isinstance(args, SGDArgs):
        if args.momentum > 0:
            chain.append(optax.trace(decay=args.momentum))
    elif isinstance(args, LARSArgs):
        # optax.lars is a full optimizer; build the trust-ratio chain manually
        # so it composes with our wd mask and lr-scale tree.
        chain.append(
            optax.scale_by_trust_ratio(trust_coefficient=args.trust_coefficient)
        )
        if args.momentum > 0:
            chain.append(optax.trace(decay=args.momentum))
    else:
        raise ValueError(f"Unknown optimizer args type: {type(args)}")

    if weight_decay_schedule is not None:
        chain.append(
            optax.inject_hyperparams(
                lambda wd: optax.add_decayed_weights(wd, mask=wd_mask)
            )(wd=weight_decay_schedule)
        )
    elif args.weight_decay > 0:
        chain.append(optax.add_decayed_weights(args.weight_decay, mask=wd_mask))

    if lr_scales is not None:
        chain.append(scale_by_tree(lr_scales))
    if schedule_groups is not None:
        chain.append(scale_by_grouped_schedules(*schedule_groups))
    else:
        chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


# Registered here (bottom) to avoid a circular import with adamw8bit.py.
from lightly_train_tpu._optim.adamw8bit import AdamW8bitArgs  # noqa: E402

OPTIMIZER_ARGS_TYPES["adamw8bit"] = AdamW8bitArgs
