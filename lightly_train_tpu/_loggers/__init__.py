from lightly_train_tpu._loggers.jsonl import JSONLLogger
from lightly_train_tpu._loggers.multi import (
    MLflowLogger,
    MultiLogger,
    TensorBoardLogger,
    WandbLogger,
    build_loggers,
)

__all__ = [
    "JSONLLogger",
    "MLflowLogger",
    "MultiLogger",
    "TensorBoardLogger",
    "WandbLogger",
    "build_loggers",
]
