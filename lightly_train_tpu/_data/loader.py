"""Host-side data loader feeding the device augmentation stage.

TPU-native replacement for the reference's torch DataLoader + worker
subprocesses (``_commands/train.py:470``): a thread pool decodes images to
canonical uint8 batches, a background prefetcher keeps ``prefetch`` batches
in flight, and each batch is placed on the mesh with the batch axis sharded
(multi-host: each process loads only its own slice of the global batch and
``jax.make_array_from_process_local_data`` assembles the global array).

Decode (CPU-bound, PIL releases the GIL for I/O + resize) is the only host
work — augmentation moved on device — so thread workers suffice where the
reference needed worker *processes* for albumentations.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightly_train_tpu._data.image_dataset import ImageDataset
from lightly_train_tpu.parallel.mesh import BATCH_AXIS

logger = logging.getLogger("lightly_train_tpu.data")


class PretrainLoader:
    """Infinite shuffled loader of sharded uint8 (B, H0, W0, 3) batches."""

    def __init__(
        self,
        dataset: ImageDataset,
        global_batch_size: int,
        mesh: Mesh,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        if global_batch_size % jax.process_count() != 0:
            raise ValueError(
                f"global_batch_size {global_batch_size} must divide evenly "
                f"across {jax.process_count()} processes"
            )
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()
        self.mesh = mesh
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        # Resume support: fast-forward the index stream past the batches
        # steps [0, start_step) consumed, so a resumed run continues the
        # same shuffled stream instead of re-reading epoch 0.
        self.start_step = 0
        self.sharding = NamedSharding(mesh, P(BATCH_AXIS))

    def steps_per_epoch(self) -> int:
        return max(len(self.dataset) // self.global_batch_size, 1)

    def _index_stream(self) -> Iterator[np.ndarray]:
        """Yields per-process index arrays of local_batch_size, epoch-shuffled."""
        n = len(self.dataset)
        epoch = 0
        proc = jax.process_index()
        carry = np.empty((0,), dtype=np.int64)
        while True:
            rng = np.random.default_rng(self.seed + epoch)
            perm = np.concatenate([carry, rng.permutation(n)])
            # Pad to a multiple of the global batch by wrapping (tiny datasets
            # still produce full static-shape batches).
            if len(perm) < self.global_batch_size:
                reps = -(-self.global_batch_size // max(len(perm), 1))
                perm = np.tile(perm, reps)
            usable = len(perm) - (len(perm) % self.global_batch_size)
            for start in range(0, usable, self.global_batch_size):
                g = perm[start : start + self.global_batch_size]
                yield g[
                    proc * self.local_batch_size : (proc + 1)
                    * self.local_batch_size
                ]
            # drop_last=False: the epoch remainder leads the next epoch's
            # stream (batches stay full static shape; no sample is skipped).
            carry = (
                perm[usable:]
                if not self.drop_last
                else np.empty((0,), dtype=np.int64)
            )
            epoch += 1

    def _collate(self, items):
        if isinstance(items[0], dict):
            return {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }
        return np.stack(items, axis=0)

    def __iter__(self) -> Iterator[jax.Array]:
        """Decode with a persistent thread pool, pipelined across batches.

        One shared executor lives for the whole iteration (the previous
        per-batch pool paid thread spawn/teardown on every batch); the
        producer keeps ``prefetch + 1`` batches of decode futures in flight
        so workers never drain between batches.
        """
        from concurrent.futures import ThreadPoolExecutor

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = ThreadPoolExecutor(
            max_workers=self.num_workers, thread_name_prefix="lt-decode"
        )

        def _offer(item) -> bool:
            """Bounded put that re-checks stop: an abandoned iterator must
            not leave the producer parked forever in a full-queue put."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                # Keep a window of batches' futures pending so the pool
                # always has work even while a finished batch sits in out_q.
                window: "queue.Queue" = queue.Queue()
                stream = self._index_stream()
                for _ in range(self.start_step):  # resume fast-forward
                    next(stream)
                for _ in range(self.prefetch + 1):
                    window.put(
                        [
                            pool.submit(self.dataset.__getitem__, int(i))
                            for i in next(stream)
                        ]
                    )
                # Single-process: jax.device_put with a sharding is ASYNC —
                # it enqueues the transfer and returns, so decode of batch
                # N+1 overlaps the copy of batch N (the r4 synchronous
                # make_array_from_process_local_data serialized decode
                # behind each transfer and cost ~35% of the measured host
                # rate). Multi-process still needs the process-local
                # assembly helper.
                single = jax.process_count() == 1

                def _place(arr):
                    if single:
                        return jax.device_put(arr, self.sharding)
                    return jax.make_array_from_process_local_data(
                        self.sharding, arr
                    )

                while not stop.is_set():
                    futures = window.get()
                    batch = self._collate([f.result() for f in futures])
                    # Host->device transfer HERE, in the producer thread:
                    # the device_put of batch N overlaps the device compute
                    # of step N-1 (double buffering; the queue bound keeps
                    # at most ``prefetch`` device-resident batches alive).
                    if isinstance(batch, dict):
                        batch = {k: _place(v) for k, v in batch.items()}
                    else:
                        batch = _place(batch)
                    if not _offer(batch):
                        return
                    window.put(
                        [
                            pool.submit(self.dataset.__getitem__, int(i))
                            for i in next(stream)
                        ]
                    )
            except BaseException as e:  # incl. CancelledError on shutdown
                if not stop.is_set():  # pragma: no cover - surfaced on get()
                    _offer(e if isinstance(e, Exception) else RuntimeError(repr(e)))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item  # already device-placed by the producer
        finally:
            stop.set()
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:  # interpreter teardown: modules may be gone
                pass


class SyntheticLoader:
    """Random-image loader for benchmarks and tests (no disk I/O)."""

    def __init__(
        self,
        global_batch_size: int,
        mesh: Mesh,
        canonical_hw: Tuple[int, int] = (256, 256),
        seed: int = 0,
    ):
        if global_batch_size % jax.process_count() != 0:
            raise ValueError(
                f"global_batch_size {global_batch_size} must divide evenly "
                f"across {jax.process_count()} processes"
            )
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()
        self.canonical_hw = canonical_hw
        self.sharding = NamedSharding(mesh, P(BATCH_AXIS))
        self.seed = seed

    def __iter__(self) -> Iterator[jax.Array]:
        rng = np.random.default_rng(self.seed)
        h, w = self.canonical_hw
        batch = rng.integers(
            0, 256, size=(self.local_batch_size, h, w, 3), dtype=np.uint8
        )
        while True:
            yield jax.make_array_from_process_local_data(self.sharding, batch)
