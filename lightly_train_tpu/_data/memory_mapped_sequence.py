"""Memory-mapped file-list sequence via PyArrow IPC.

Rebuild of ``src/lightly_train/_data/_serialize/memory_mapped_sequence.py:34-212``:
the dataset's filename list is written once to an Arrow IPC file and
memory-mapped by every loader worker/process — a 100M-image list costs no
per-worker RAM. Pickles by path, so it crosses process boundaries cheaply.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Sequence

import pyarrow as pa
import pyarrow.ipc as ipc

_COLUMN = "item"


def write_items_to_file(items: Sequence[str], path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    table = pa.table({_COLUMN: pa.array(items, type=pa.string())})
    tmp = path.with_suffix(path.suffix + ".tmp")
    with ipc.new_file(str(tmp), table.schema) as writer:
        writer.write_table(table)
    tmp.replace(path)  # atomic publish (reference writes behind filelock)


class MemoryMappedSequence(Sequence[str]):
    """Zero-copy string sequence backed by an Arrow IPC file."""

    def __init__(self, path: Path):
        self._path = Path(path)
        self._table = None

    @property
    def path(self) -> Path:
        return self._path

    def _load(self) -> pa.Table:
        if self._table is None:
            source = pa.memory_map(str(self._path), "r")
            self._table = ipc.open_file(source).read_all()
        return self._table

    def __len__(self) -> int:
        return self._load().num_rows

    def __getitem__(self, index):  # type: ignore[override]
        table = self._load()
        if isinstance(index, slice):
            return [str(v) for v in table[_COLUMN][index]]
        return str(table[_COLUMN][index])

    def __iter__(self) -> Iterator[str]:
        for v in self._load()[_COLUMN]:
            yield str(v)

    # Pickle by path: workers re-mmap instead of copying data.
    def __getstate__(self):
        return {"path": str(self._path)}

    def __setstate__(self, state):
        self._path = Path(state["path"])
        self._table = None
