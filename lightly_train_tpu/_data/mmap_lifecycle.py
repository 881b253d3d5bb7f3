"""Dataset mmap file lifecycle: filelock + refcount + reuse semantics.

Rebuild of the reference's mmap lifecycle
(``src/lightly_train/_commands/common_helpers.py:395-523``):

- The file-list mmap lives in the data cache dir under a deterministic hash
  of the run's ``out`` dir (or ``data`` when
  ``LIGHTLY_TRAIN_MMAP_REUSE_FILE=1``) + node rank, so every process of a
  run on a node converges on the same path without coordination.
- A sibling ``.ref_count`` file (guarded by a ``filelock``) counts the
  processes using the file; the last one out deletes it (unless reuse mode
  keeps it as a cross-run cache).
- A pre-existing mmap file without resume/overwrite means another run (or a
  crashed one) owns the out dir — raising beats silently mixing file lists.
"""

from __future__ import annotations

import contextlib
import hashlib
from pathlib import Path
from typing import Any, Generator, Union

from lightly_train_tpu._env import Env
from lightly_train_tpu._logging import get_logger

logger = get_logger("mmap")


def _node_rank() -> int:
    import jax

    try:
        return jax.process_index()
    except Exception:  # pragma: no cover - before distributed init
        return 0


def _data_cache_dir() -> Path:
    d = Path(Env.LIGHTLY_TRAIN_CACHE_DIR.value) / "data"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _increment_ref_count(ref_file: Path) -> None:
    from filelock import FileLock

    with FileLock(str(ref_file.with_suffix(".lock")), timeout=300):
        ref_file.touch()
        with open(ref_file, "r+") as f:
            count = int(f.read() or "0")
            f.seek(0)
            f.write(str(count + 1))
            f.truncate()


def _decrement_and_cleanup_if_zero(mmap_file: Path, ref_file: Path) -> None:
    from filelock import FileLock

    try:
        with FileLock(str(ref_file.with_suffix(".lock")), timeout=300):
            with open(ref_file, "r+") as f:
                count = max(0, int(f.read() or "1") - 1)
                f.seek(0)
                f.write(str(count))
                f.truncate()
            if count <= 0 and not Env.LIGHTLY_TRAIN_MMAP_REUSE_FILE.value:
                for p in (mmap_file, ref_file):
                    with contextlib.suppress(FileNotFoundError, OSError):
                        p.unlink()
    except (FileNotFoundError, OSError):  # pragma: no cover
        pass  # another process already cleaned up


@contextlib.contextmanager
def dataset_mmap_path(
    data: Union[str, Path, Any],
    out: Union[str, Path],
    resume_interrupted: bool,
    overwrite: bool,
) -> Generator[Path, None, None]:
    """Yield the run's mmap file path with refcounted cleanup."""
    if Env.LIGHTLY_TRAIN_MMAP_REUSE_FILE.value:
        if isinstance(data, (str, Path)):
            data = Path(data).resolve()
        identifier = f"{data}-{_node_rank()}"
    else:
        identifier = f"{Path(out).resolve()}-{_node_rank()}"
    digest = hashlib.sha256(identifier.encode()).hexdigest()
    mmap_filepath = (_data_cache_dir() / digest).with_suffix(".arrow")
    ref_count_filepath = mmap_filepath.with_suffix(".ref_count")

    if (
        not Env.LIGHTLY_TRAIN_MMAP_REUSE_FILE.value
        and not resume_interrupted
        and not overwrite
        and mmap_filepath.exists()
    ):
        raise RuntimeError(
            f"Detected multiple runs using output directory '{out}' "
            "concurrently! This can also happen if a previous run crashed "
            "without shutting down. If no other run is using this output "
            "directory, delete the leftover files:\n"
            f"  - {mmap_filepath}\n  - {ref_count_filepath}"
        )

    _increment_ref_count(ref_count_filepath)
    try:
        yield mmap_filepath
    finally:
        _decrement_and_cleanup_if_zero(mmap_filepath, ref_count_filepath)
