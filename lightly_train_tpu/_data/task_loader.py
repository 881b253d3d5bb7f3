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
    ):
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()
        self.mesh = mesh
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.sharding = NamedSharding(mesh, P(BATCH_AXIS))

    def steps_per_epoch(self) -> int:
        return max(len(self.dataset) // self.global_batch_size, 1)

    def _indices(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        proc = jax.process_index()
        epoch = 0
        while True:
            rng = np.random.default_rng(self.seed + epoch)
            perm = rng.permutation(n)
            if n < self.global_batch_size:
                perm = np.tile(perm, -(-self.global_batch_size // n))
            usable = len(perm) - (len(perm) % self.global_batch_size)
            for s in range(0, usable, self.global_batch_size):
                g = perm[s : s + self.global_batch_size]
                yield g[
                    proc * self.local_batch_size : (proc + 1)
                    * self.local_batch_size
                ]
            epoch += 1

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return {
            k: jax.make_array_from_process_local_data(self.sharding, v)
            for k, v in batch.items()
        }

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in self._indices():
                        if stop.is_set():
                            return
                        items = list(
                            pool.map(lambda i: self.dataset[int(i)], idx)
                        )
                        out_q.put(_collate(items))
            except Exception as e:  # pragma: no cover
                out_q.put(e)

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
