"""Console + file logging, process-zero aware.

Rebuild of ``src/lightly_train/_logging.py:71-100``: colored console handler on
process 0 only, rotating file log in the output dir on every process, and a
helper to capture warnings into the log.
"""

from __future__ import annotations

import logging
import sys
import warnings
from pathlib import Path

from lightly_train_tpu._env import Env
from lightly_train_tpu.parallel.distributed import is_main_process

LOGGER_NAME = "lightly_train_tpu"

_FORMAT = "%(asctime)s [%(levelname).1s] %(name)s: %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def get_logger(name: str | None = None) -> logging.Logger:
    if name is None:
        return logging.getLogger(LOGGER_NAME)
    return logging.getLogger(f"{LOGGER_NAME}.{name}")


def set_up_console_logging(level: str | int | None = None) -> None:
    """Install a console handler on the framework logger (main process only)."""
    logger = logging.getLogger(LOGGER_NAME)
    if level is None:
        level = Env.LIGHTLY_TRAIN_LOG_LEVEL.value
    logger.setLevel(level)
    if not is_main_process():
        return
    for handler in logger.handlers:
        if getattr(handler, "_lt_console", False):
            return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    handler._lt_console = True  # type: ignore[attr-defined]
    logger.addHandler(handler)
    logging.captureWarnings(True)
    warnings.filterwarnings("default")


def set_up_file_logging(log_file: Path, level: str | int = logging.DEBUG) -> None:
    """Install a file handler writing to ``log_file`` (all processes)."""
    log_file = Path(log_file)
    log_file.parent.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(LOGGER_NAME)
    for handler in logger.handlers:
        if isinstance(handler, logging.FileHandler) and Path(
            handler.baseFilename
        ) == log_file.resolve():
            return
    handler = logging.FileHandler(log_file)
    handler.setLevel(level)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    logger.addHandler(handler)


def remove_file_handlers() -> None:
    logger = logging.getLogger(LOGGER_NAME)
    for handler in list(logger.handlers):
        if isinstance(handler, logging.FileHandler):
            logger.removeHandler(handler)
            handler.close()
