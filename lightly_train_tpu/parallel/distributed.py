"""Multi-host process helpers.

TPU-native replacement for the reference rank helpers
(``src/lightly_train/_distributed.py:21-87``). Where the reference derives ranks
from torch.distributed / SLURM env vars, here JAX owns process identity:
``jax.process_index()`` / ``jax.process_count()``. ``initialize_distributed``
wraps ``jax.distributed.initialize`` for multi-host (DCN) jobs and is a no-op
for single-process runs.

There is no ``reduce_dict`` equivalent: cross-replica reductions happen *inside*
the jitted step as ``psum``/``pmean`` over the mesh batch axis (GSPMD inserts
them automatically for sharded-batch reductions).
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("lightly_train_tpu.distributed")

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX multi-host runtime if running under a multi-process launcher.

    Safe to call multiple times and in single-process runs (no-op). Multi-host
    environments (GKE/TPU VMs) are usually auto-detected by
    ``jax.distributed.initialize`` with no arguments.
    """
    global _initialized
    if _initialized:
        return
    # Forward an explicitly supplied coordinator (env or arg) — these env
    # vars are OURS, not ones jax's cluster auto-detection reads, so the
    # address must be passed through. num_processes/process_id fall back to
    # the conventional launcher envs.
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    coordinator_address = coordinator_address or env_addr
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "Initialized JAX distributed: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        _initialized = True
    # No-op path: do NOT latch, so a later explicit
    # initialize_distributed(coordinator_address=...) still works.


def get_process_index() -> int:
    return jax.process_index()


def get_process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0
