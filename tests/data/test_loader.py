"""PretrainLoader semantics: drop_last carry-over, abandoned-iterator
cleanup, synthetic loader divisibility."""

import threading
import time

import numpy as np
import pytest

from lightly_train_tpu._data.loader import PretrainLoader, SyntheticLoader
from lightly_train_tpu.parallel.mesh import MeshConfig


class _IndexDataset:
    """Items are their own indices, so batches reveal the index stream."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2, 3), i, np.uint8)


def _mesh():
    return MeshConfig().build()


def test_drop_last_false_carries_remainder():
    loader = PretrainLoader(
        _IndexDataset(10), global_batch_size=4, mesh=_mesh(),
        num_workers=2, drop_last=False,
    )
    stream = loader._index_stream()
    seen = []
    for _ in range(5):  # 20 indices = 2 epochs of 10, no drops
        seen.extend(int(i) for i in next(stream))
    assert sorted(seen) == sorted(list(range(10)) * 2)


def test_drop_last_true_drops_remainder():
    loader = PretrainLoader(
        _IndexDataset(10), global_batch_size=4, mesh=_mesh(),
        num_workers=2, drop_last=True,
    )
    stream = loader._index_stream()
    epoch1 = [int(i) for _ in range(2) for i in next(stream)]
    assert len(set(epoch1)) == 8  # 2 of 10 dropped


def test_abandoned_iterator_does_not_leak_producer():
    loader = PretrainLoader(
        _IndexDataset(64), global_batch_size=8, mesh=_mesh(),
        num_workers=2, prefetch=1,
    )
    before = {t.name for t in threading.enumerate()}
    it = iter(loader)
    next(it)
    it.close()  # abandon: generator finally sets stop
    deadline = time.time() + 10.0
    while time.time() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.name not in before and t.is_alive()
            and not t.name.startswith("lt-decode")  # pool threads are daemons
        ]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"producer thread leaked: {leaked}"


def test_synthetic_loader_rejects_indivisible_batch():
    # Single process in tests: any batch divides; exercise via the check
    # directly by faking process_count would be invasive — assert the
    # constructor accepts a valid size and the batch shape matches it.
    loader = SyntheticLoader(8, _mesh(), canonical_hw=(16, 16))
    batch = next(iter(loader))
    assert batch.shape == (8, 16, 16, 3)


def test_knn_chunked_matches_unchunked():
    import jax.numpy as jnp

    from lightly_train_tpu.utils.knn import knn_accuracy, knn_predict

    rng = np.random.default_rng(0)
    train = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    train_y = jnp.asarray(rng.integers(0, 5, 50).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(23, 8)).astype(np.float32))
    q_y = jnp.asarray(rng.integers(0, 5, 23).astype(np.int32))
    full_pred = knn_predict(q, train, train_y, num_classes=5, k=7)
    want = float(np.mean(np.asarray(full_pred) == np.asarray(q_y)))
    got = knn_accuracy(
        q, q_y, train, train_y, num_classes=5, k=7, chunk_size=6
    )
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_classification_val_classes_pinned(tmp_path):
    """A val split missing a class dir must not shift later labels."""
    from PIL import Image

    from lightly_train_tpu.errors import DatasetError
    from lightly_train_tpu.tasks.image_classification import (
        ImageClassificationDataset,
    )

    rng = np.random.default_rng(0)
    for split, classes in (("train", ["a", "b", "c"]), ("val", ["a", "c"])):
        for c in classes:
            d = tmp_path / split / c
            d.mkdir(parents=True)
            Image.fromarray(
                rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            ).save(d / "0.png")
    train = ImageClassificationDataset(tmp_path / "train", (8, 8))
    val = ImageClassificationDataset(
        tmp_path / "val", (8, 8), classes=train.classes
    )
    # "c" keeps index 2 even though "b" is absent from val.
    assert dict(val.samples)[str(tmp_path / "val" / "c" / "0.png")] == 2
    # A val class unknown to train raises instead of mis-mapping.
    (tmp_path / "val" / "zzz").mkdir()
    Image.fromarray(
        rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    ).save(tmp_path / "val" / "zzz" / "0.png")
    with pytest.raises(DatasetError, match="zzz"):
        ImageClassificationDataset(
            tmp_path / "val", (8, 8), classes=train.classes
        )
