"""Generic dict-batch loaders for fine-tuning tasks.

Replaces the reference's per-task torch DataLoader + collate classes
(``_commands/train_task.py:1415-1521``): datasets yield dict items
({"images": u8 HWC, "labels"/"masks": ...}); the loader stacks them and
places each leaf on the mesh with the batch axis sharded. The val loader is
single-pass with zero-padding + a ``valid`` flag so shapes stay static on
the final partial batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightly_train_tpu.parallel.mesh import BATCH_AXIS


def _collate(items: list) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in items[0]:
        out[key] = np.stack([np.asarray(it[key]) for it in items])
    return out


class TaskTrainLoader:
    """Infinite shuffled loader of sharded dict batches."""

    def __init__(
        self,
        dataset: Any,
        global_batch_size: int,
        mesh: Mesh,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        start_step: int = 0,
    ):
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()
        self.mesh = mesh
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        # Resume support: skip the batches steps [0, start_step) consumed so
        # a resumed run continues the SAME shuffled stream instead of
        # retraining on epoch 0's first batches.
        self.start_step = start_step
        self.sharding = NamedSharding(mesh, P(BATCH_AXIS))

    def steps_per_epoch(self) -> int:
        return max(len(self.dataset) // self.global_batch_size, 1)

    def _indices(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        proc = jax.process_index()
        spe = self.steps_per_epoch()
        epoch = self.start_step // spe
        skip = self.start_step % spe
        while True:
            rng = np.random.default_rng(self.seed + epoch)
            perm = rng.permutation(n)
            if n < self.global_batch_size:
                perm = np.tile(perm, -(-self.global_batch_size // n))
            usable = len(perm) - (len(perm) % self.global_batch_size)
            for s in range(
                skip * self.global_batch_size, usable, self.global_batch_size
            ):
                g = perm[s : s + self.global_batch_size]
                yield g[
                    proc * self.local_batch_size : (proc + 1)
                    * self.local_batch_size
                ]
            skip = 0
            epoch += 1

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return {
            k: jax.make_array_from_process_local_data(self.sharding, v)
            for k, v in batch.items()
        }

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _offer(item) -> bool:
            # Bounded put re-checking stop: an exited consumer must not
            # leave the producer parked forever on the full queue.
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in self._indices():
                        if stop.is_set():
                            return
                        items = list(
                            pool.map(lambda i: self.dataset[int(i)], idx)
                        )
                        if not _offer(_collate(items)):
                            return
            except Exception as e:  # pragma: no cover
                if not stop.is_set():
                    _offer(e)

        threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield self._put(item)
        finally:
            stop.set()


class TaskValLoader:
    """Single-pass loader with padding + ``valid`` flags (static shapes)."""

    def __init__(
        self,
        dataset: Any,
        global_batch_size: int,
        mesh: Mesh,
        num_workers: int = 8,
    ):
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()
        self.sharding = NamedSharding(mesh, P(BATCH_AXIS))
        self.num_workers = max(1, num_workers)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        n = len(self.dataset)
        proc = jax.process_index()
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, n, self.global_batch_size):
                idx = np.arange(start, min(start + self.global_batch_size, n))
                pad = self.global_batch_size - len(idx)
                valid = np.concatenate(
                    [np.ones(len(idx), bool), np.zeros(pad, bool)]
                )
                idx_padded = np.concatenate([idx, np.zeros(pad, np.int64)])
                local = idx_padded[
                    proc * self.local_batch_size : (proc + 1)
                    * self.local_batch_size
                ]
                local_valid = valid[
                    proc * self.local_batch_size : (proc + 1)
                    * self.local_batch_size
                ]
                items = list(pool.map(lambda i: self.dataset[int(i)], local))
                batch = _collate(items)
                batch["valid"] = local_valid
                yield {
                    k: jax.make_array_from_process_local_data(self.sharding, v)
                    for k, v in batch.items()
                }
