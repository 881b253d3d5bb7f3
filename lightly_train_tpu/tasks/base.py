"""Fine-tuning task protocol.

Rebuild of the reference dual-class pattern
(``src/lightly_train/_task_models/train_model.py:47-151`` +
``task_model.py:30-177``): a ``TaskTrainModel`` owns the training/validation
step math and wraps a pure inference path (``predict``) that is exported with
``class_path``-style metadata. Functional layout mirrors the SSL Method
protocol: params/model_state pytrees + pure loss/metric functions that run
inside one jitted step over the sharded batch.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax

from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu.models.wrapper import WrappedModel


class TaskArgs(PydanticConfig):
    """Base per-task hyperparameters (reference ``TrainModelArgs``)."""

    default_steps: int = 10_000
    default_batch_size: int = 16


@flax.struct.dataclass
class TaskTrainState:
    step: jax.Array
    params: Any
    model_state: Any
    opt_state: Any
    ema_params: Optional[Any] = None  # detection-style EMA weights


class TaskTrainModel(abc.ABC):
    """A fine-tuning architecture + objective."""

    task: str = "task"
    # Name of the train-transform schema in TASK_TRANSFORM_ARGS
    # (``_transforms/task_transforms.py``); None = no schema (detection
    # tasks configure their pipeline via task_args/augment_batch).
    transform_kind: Optional[str] = None

    def __init__(self, wrapped: WrappedModel, args: TaskArgs):
        self.wrapped = wrapped
        self.args = args

    @abc.abstractmethod
    def init(self, rng: jax.Array, sample_batch: Dict[str, Any]):
        """Returns (params, model_state)."""

    def augment_batch(
        self, batch: Dict[str, Any], key: jax.Array, step: jax.Array
    ) -> Dict[str, Any]:
        """Task-specific on-device batch augmentation (after the shared
        flip+normalize), with traced step for activation windows. Default:
        identity."""
        del key, step
        return batch

    def wrap_pretrained(self, variables: Dict[str, Any]) -> Dict[str, Any]:
        """Re-nest a pretrained backbone artifact's variables into this
        task's parameter namespace (identity when the trunk params sit
        directly under ``params['backbone']``)."""
        return variables

    @abc.abstractmethod
    def loss_fn(
        self,
        params: Any,
        model_state: Any,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        step: jax.Array,
    ) -> Tuple[jax.Array, Tuple[Any, Dict[str, jax.Array]]]:
        """Returns (loss, (new_model_state, metrics))."""

    @abc.abstractmethod
    def val_step(
        self, params: Any, model_state: Any, batch: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        """Per-batch validation statistics (summable across batches)."""

    @abc.abstractmethod
    def val_finalize(self, stats: Dict[str, jax.Array]) -> Dict[str, float]:
        """Reduce summed validation statistics to final metrics."""

    @abc.abstractmethod
    def predict(
        self, variables: Any, images: jax.Array
    ) -> Any:
        """Pure inference on preprocessed images."""

    # -- optimization defaults ---------------------------------------------
    def default_optimizer_args(self) -> Any:
        from lightly_train_tpu._optim import AdamWArgs

        return AdamWArgs(lr=1e-4, weight_decay=0.05)

    def grad_clip_norm(self) -> Optional[float]:
        return None

    def lr_scales(self, params: Any) -> Optional[Any]:
        return None

    def lr_schedule(self, base_lr: float, total_steps: int):
        from lightly_train_tpu._optim import cosine_warmup

        return cosine_warmup(base_lr, total_steps, int(0.05 * total_steps))

    def lr_schedule_groups(
        self, base_lr: float, total_steps: int, params: Any
    ) -> Optional[Tuple[Any, Any]]:
        """Optional (schedules list, per-leaf int group tree): families whose
        reference runs param groups on different schedule clocks (EoMT's
        two-stage warmup) return one; None keeps the single global schedule."""
        return None

    def scaled_lr(self, base_lr: float, global_batch_size: int) -> float:
        """Global-batch LR scaling hook (EoMT: sqrt(B / default_batch))."""
        return base_lr

    def use_ema(self) -> bool:
        return False

    @property
    def watch_metric(self) -> Tuple[str, str]:
        """(metric name, 'max'|'min') driving best-checkpoint selection."""
        return ("val_loss", "min")
