"""Numerical failure detection: NaN capture + overflow statistics.

Rebuild of the reference debug subsystem (SURVEY.md §5.3):
- ``NaNCaptureMonitor`` (``_debug/nan_capture.py:8-80``) — buffers the step's
  inputs + RNG, scans gradients before the optimizer step, and writes a
  replayable capture on detection. Here the scan is a single fused
  ``isfinite`` reduction over the grad tree computed inside the jitted step
  (free on TPU); the host checks the flag at log boundaries and dumps
  ``nan_capture.npz`` (step, batch, key, per-leaf finite flags) then raises
  ``NaNDetectedError``.
- ``UnderflowOverflowMonitor`` (``_debug/underflow_overflow.py:37-100``) —
  per-module abs min/max; here ``OverflowStats.tree_abs_stats`` computes
  per-leaf |min|/|max| of params or grads for the offender report.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._logging import get_logger
from lightly_train_tpu.errors import NaNDetectedError

logger = get_logger("debug")


def all_finite(tree: Any) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite. Jit-safe."""
    leaves = [
        jnp.all(jnp.isfinite(x))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
    ]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


class OverflowStats:
    """Host-side per-leaf statistics for the offender report."""

    @staticmethod
    def tree_abs_stats(tree: Any) -> Dict[str, Tuple[float, float, bool]]:
        """path -> (abs_min, abs_max, finite)."""
        out: Dict[str, Tuple[float, float, bool]] = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            if not hasattr(leaf, "dtype"):
                continue
            arr = np.asarray(leaf, dtype=np.float32)
            name = "/".join(
                str(p.key) if hasattr(p, "key") else str(p) for p in path
            )
            finite = bool(np.isfinite(arr).all())
            absa = np.abs(arr[np.isfinite(arr)]) if not finite else np.abs(arr)
            amin = float(absa.min()) if absa.size else float("nan")
            amax = float(absa.max()) if absa.size else float("nan")
            out[name] = (amin, amax, finite)
        return out


class NaNGuard:
    """Checks the step's finite-flag and captures a replayable payload."""

    def __init__(self, out_dir: Path, enabled: bool = True):
        self.out_dir = Path(out_dir) / "debug"
        self.enabled = enabled

    def check(
        self,
        finite_flag: jax.Array,
        step: int,
        batch: Any,
        base_key: jax.Array,
        grads_or_params: Optional[Any] = None,
    ) -> None:
        if not self.enabled or bool(finite_flag):
            return
        self.out_dir.mkdir(parents=True, exist_ok=True)

        def _to_host(v: Any) -> np.ndarray:
            # Multi-host mesh: the global batch spans non-addressable
            # devices; save this process's shard (the replay driver accepts
            # any batch size), instead of crashing in np.asarray.
            if isinstance(v, jax.Array) and not v.is_fully_addressable:
                return np.concatenate(
                    [np.asarray(s.data) for s in v.addressable_shards], axis=0
                )
            return np.asarray(v)

        payload = {
            "step": np.asarray(step),
            "key": np.asarray(jax.random.key_data(base_key)),
        }
        if isinstance(batch, dict):
            for k, v in batch.items():
                payload[f"batch_{k}"] = _to_host(v)
        else:
            payload["batch"] = _to_host(batch)
        suffix = (
            f"_proc{jax.process_index()}" if jax.process_count() > 1 else ""
        )
        path = self.out_dir / f"nan_capture_step{step}{suffix}.npz"
        np.savez_compressed(path, **payload)
        offenders = []
        if grads_or_params is not None:
            stats = OverflowStats.tree_abs_stats(grads_or_params)
            offenders = [
                f"{name}: abs_max={amax:.3e} finite={fin}"
                for name, (amin, amax, fin) in sorted(stats.items())
                if not fin
            ][:20]
        msg = (
            f"Non-finite loss/gradients at step {step}. Replay payload: "
            f"{path}." + ("\nOffending leaves:\n" + "\n".join(offenders)
                          if offenders else "")
        )
        logger.error(msg)
        raise NaNDetectedError(msg)


def replay_capture(path: Path) -> Dict[str, np.ndarray]:
    """Load a capture for deterministic replay (``NaNCaptureState.replay``)."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
