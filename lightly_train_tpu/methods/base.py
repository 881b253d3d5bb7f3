"""SSL method protocol + train state.

Rebuild of the reference ``Method(LightningModule)`` base
(``src/lightly_train/_methods/method.py:50-217``) as a functional protocol:
a Method owns its view-augmentation configs, parameter/state initialization,
a pure ``loss_fn`` (differentiated by the runtime), and a ``post_update`` hook
(EMA teacher momentum, queue updates) fused into the jitted step.

State layout:
- ``params``: trainable pytree (student backbone + heads).
- ``model_state``: non-trainable forward collections (BatchNorm stats).
- ``method_state``: method-owned buffers (EMA teacher params, centers,
  teacher queues) — saved in checkpoints, never differentiated.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp

from lightly_train_tpu._configs.config import AUTO, Auto, PydanticConfig
from lightly_train_tpu._scaling import ScalingInfo
from lightly_train_tpu.models.wrapper import WrappedModel
from lightly_train_tpu.ops.augment import ViewAugmentConfig


class MethodArgs(PydanticConfig):
    """Base method hyperparameters (``method_args.py:38``)."""

    reference_batch_size: int = 1024
    lr_scale_method: str = "sqrt"  # linear | sqrt

    def resolve_auto(self, scaling_info: ScalingInfo) -> None:
        """Fill "auto" fields from dataset scale. Override per method."""


@flax.struct.dataclass
class TrainState:
    """Everything the jitted train step carries (replicated over the mesh)."""

    step: jax.Array  # int32 scalar
    params: Any
    model_state: Any  # e.g. {"batch_stats": ...} or {} for stateless models
    opt_state: Any
    method_state: Any


@dataclasses.dataclass(frozen=True)
class ViewSpec:
    """How many views of each config a method consumes per step."""

    config: ViewAugmentConfig
    count: int


class Method(abc.ABC):
    """A pretraining objective. Instances are static (hashable closure data);
    all mutable state flows through ``TrainState``."""

    name: str = "method"
    default_steps: int = 125_000
    default_batch_size: int = 1024

    def __init__(self, wrapped: WrappedModel, args: MethodArgs):
        self.wrapped = wrapped
        self.args = args

    # -- data ---------------------------------------------------------------
    @abc.abstractmethod
    def view_specs(self) -> List[ViewSpec]:
        """Augmentation configs; the runtime stacks same-shape views."""

    # -- state --------------------------------------------------------------
    @abc.abstractmethod
    def init(
        self, rng: jax.Array, sample_images: jax.Array
    ) -> Tuple[Any, Any, Any]:
        """Returns (params, model_state, method_state)."""

    # -- step ---------------------------------------------------------------
    @abc.abstractmethod
    def loss_fn(
        self,
        params: Any,
        model_state: Any,
        method_state: Any,
        views: List[jax.Array],
        rng: jax.Array,
        step: jax.Array,
        total_steps: int,
    ) -> Tuple[jax.Array, Tuple[Any, Any, Dict[str, jax.Array]]]:
        """Returns (loss, (new_model_state, new_method_state, metrics)).

        Differentiated w.r.t. ``params`` only. Runs inside jit over the
        globally-sharded views; any batch-axis reduction is a global psum.
        """

    def post_update(
        self, params: Any, method_state: Any, step: jax.Array, total_steps: int
    ) -> Any:
        """After-optimizer hook (EMA teacher update). Default: no-op."""
        del params, step, total_steps
        return method_state

    # -- optimization defaults ---------------------------------------------
    def default_optimizer_args(self) -> Any:
        from lightly_train_tpu._optim import AdamWArgs

        return AdamWArgs(lr=1e-3)

    def learning_rate_for(self, global_batch_size: int, base_lr: float) -> float:
        from lightly_train_tpu._optim import scale_lr_for_batch_size

        return scale_lr_for_batch_size(
            base_lr,
            global_batch_size,
            self.args.reference_batch_size,
            self.args.lr_scale_method,
        )

    def grad_clip_norm(self) -> Optional[float]:
        return None

    def lr_scales(self, params: Any) -> Optional[Any]:
        """Per-leaf LR multipliers (layerwise decay); None = uniform."""
        del params
        return None

    def wd_mask(self, params: Any) -> Optional[Any]:
        """Weight-decay mask tree; None = the generic no-decay default."""
        del params
        return None

    def weight_decay_schedule(self, total_steps: int) -> Optional[Any]:
        return None

    def trainable_filter(self, params: Any) -> Any:
        """Mask of trainable leaves; default all True."""
        return jax.tree_util.tree_map(lambda _: True, params)

    def mask_updates(self, updates: Any, step: jax.Array) -> Any:
        """Step-conditional update masking (e.g. frozen prototype warmup)."""
        del step
        return updates

    # -- fused-update hooks -------------------------------------------------
    def fused_ema_momentum(
        self, step: jax.Array, total_steps: int
    ) -> Optional[jax.Array]:
        """Traced EMA momentum IF ``post_update`` is exactly the teacher EMA
        ``t <- m*t + (1-m)*p`` over ``method_state['teacher']``.

        Returning non-None opts the method into the fused AdamW+EMA update
        (``_optim/fused_update.py``), which replaces BOTH ``mask_updates``
        (via :meth:`update_scales`) and ``post_update``. Default: None
        (method keeps the unfused optax path).
        """
        del step, total_steps
        return None

    def update_scales(self, params: Any, step: jax.Array) -> Optional[Any]:
        """Per-leaf scalar multipliers on the final update — the fused-path
        analog of :meth:`mask_updates`. None = all ones."""
        del params, step
        return None
