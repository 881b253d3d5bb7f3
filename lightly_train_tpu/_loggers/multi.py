"""Logger backends: TensorBoard, W&B, MLflow + fan-out MultiLogger.

Rebuild of ``src/lightly_train/_loggers/`` (455 LoC): JSONL is always on
(``jsonl.py``); TensorBoard/W&B/MLflow are optional wrappers that lazily
import their backend and degrade to a warning when the package is absent —
mirroring the reference's optional-dependency handling. All loggers share
the ``log_metrics(metrics, step)`` / ``log_hyperparams(params)`` / ``close``
surface and log on process 0 only.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Union

from lightly_train_tpu._loggers.jsonl import JSONLLogger
from lightly_train_tpu._logging import get_logger
from lightly_train_tpu.parallel.distributed import is_main_process

logger = get_logger("loggers")


class TensorBoardLogger:
    def __init__(self, out_dir: Path):
        self._writer = None
        if not is_main_process():
            return
        try:
            from flax.metrics.tensorboard import SummaryWriter

            self._writer = SummaryWriter(str(Path(out_dir) / "tensorboard"))
        except Exception as e:
            logger.warning("TensorBoard logging unavailable: %s", e)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        if self._writer is None:
            return
        for k, v in metrics.items():
            try:
                self._writer.scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        if self._writer is None:
            return
        try:
            self._writer.hparams(
                {k: v for k, v in params.items()
                 if isinstance(v, (int, float, str, bool))}
            )
        except Exception:
            pass

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class WandbLogger:
    def __init__(self, out_dir: Path, project: str = "lightly-train-tpu",
                 **kwargs: Any):
        self._run = None
        if not is_main_process():
            return
        try:
            import wandb

            self._run = wandb.init(
                project=project, dir=str(out_dir), **kwargs
            )
        except Exception as e:
            logger.warning("W&B logging unavailable: %s", e)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        if self._run is not None:
            self._run.config.update(params, allow_val_change=True)

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()


class MLflowLogger:
    def __init__(self, out_dir: Path, run_name: Optional[str] = None,
                 **kwargs: Any):
        self._mlflow = None
        if not is_main_process():
            return
        try:
            import mlflow

            mlflow.start_run(run_name=run_name)
            self._mlflow = mlflow
        except Exception as e:
            logger.warning("MLflow logging unavailable: %s", e)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        if self._mlflow is None:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k.replace("/", "_")] = float(v)
            except (TypeError, ValueError):
                pass
        self._mlflow.log_metrics(clean, step=step)

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        if self._mlflow is not None:
            self._mlflow.log_params(
                {k: str(v)[:250] for k, v in params.items()}
            )

    def close(self) -> None:
        if self._mlflow is not None:
            self._mlflow.end_run()


class MultiLogger:
    """Fans every call out to all configured backends."""

    def __init__(self, loggers: List[Any]):
        self.loggers = loggers

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def close(self) -> None:
        for lg in self.loggers:
            lg.close()


_BACKENDS = {
    "jsonl": JSONLLogger,
    "tensorboard": TensorBoardLogger,
    "wandb": WandbLogger,
    "mlflow": MLflowLogger,
}


def build_loggers(
    out_dir: Path,
    spec: Union[List[str], Dict[str, Optional[Dict[str, Any]]]],
) -> MultiLogger:
    """Build the logger fan-out from a list of names or a config dict.

    List form: ``["jsonl", "tensorboard"]``. Dict form (reference
    ``loggers:`` semantics, ``_commands/train.py:179-182``): name -> kwargs
    dict to configure a backend, or -> None to disable a default one, e.g.
    ``{"wandb": {"project": "exp"}, "jsonl": None}``. The dict form starts
    from the default ("jsonl" on). Unknown names raise.
    """
    if isinstance(spec, dict):
        merged: Dict[str, Optional[Dict[str, Any]]] = {"jsonl": {}}
        merged.update(spec)
        entries = [(n, kw) for n, kw in merged.items() if kw is not None]
    else:
        entries = [(n, {}) for n in spec]
    loggers = []
    for name, kwargs in entries:
        if name not in _BACKENDS:
            raise ValueError(
                f"Unknown logger '{name}'. Options: {sorted(_BACKENDS)}"
            )
        loggers.append(_BACKENDS[name](out_dir, **(kwargs or {})))
    return MultiLogger(loggers)
