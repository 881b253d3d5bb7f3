"""mmap lifecycle: refcount cleanup, reuse mode, concurrent-run detection."""

from pathlib import Path

import pytest

from lightly_train_tpu._data.mmap_lifecycle import dataset_mmap_path


def test_cleanup_on_exit(tmp_path):
    with dataset_mmap_path("/data", tmp_path / "out", False, False) as p:
        p.write_bytes(b"x")
        assert p.exists()
        ref = p.with_suffix(".ref_count")
        assert ref.read_text() == "1"
    assert not p.exists()
    assert not ref.exists()


def test_nested_refcount_keeps_file(tmp_path):
    with dataset_mmap_path(
        "/data", tmp_path / "out", True, False
    ) as p1:  # resume_interrupted bypasses the concurrency check
        p1.write_bytes(b"x")
        with dataset_mmap_path("/data", tmp_path / "out", True, False) as p2:
            assert p1 == p2
            assert p1.with_suffix(".ref_count").read_text() == "2"
        assert p1.exists()  # still one user
    assert not p1.exists()


def test_concurrent_run_detection(tmp_path):
    ctx = dataset_mmap_path("/data", tmp_path / "out", False, False)
    p = ctx.__enter__()
    try:
        p.write_bytes(b"x")
        with pytest.raises(RuntimeError, match="multiple runs"):
            with dataset_mmap_path("/data", tmp_path / "out", False, False):
                pass
    finally:
        ctx.__exit__(None, None, None)


def test_reuse_mode_keeps_file(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHTLY_TRAIN_MMAP_REUSE_FILE", "1")
    with dataset_mmap_path(tmp_path, tmp_path / "out", False, False) as p:
        p.write_bytes(b"cache")
    assert p.exists()  # reuse mode: file survives as a cross-run cache
    with dataset_mmap_path(tmp_path, tmp_path / "out", False, False) as p2:
        assert p2 == p
        assert p2.read_bytes() == b"cache"


def test_different_out_dirs_get_different_files(tmp_path):
    with dataset_mmap_path("/data", tmp_path / "a", False, False) as p1:
        with dataset_mmap_path("/data", tmp_path / "b", False, False) as p2:
            assert p1 != p2
