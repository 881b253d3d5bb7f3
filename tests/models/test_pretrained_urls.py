"""fetch_pretrained: cache, sha256 verify, and offline error paths
(tested via file:// URLs — no egress in this environment)."""

import hashlib

import pytest

from lightly_train_tpu.models.pretrained_urls import (
    PRETRAINED_URLS,
    fetch_pretrained,
)


def test_registry_covers_meta_dinov2():
    for name in ("dinov2/vits14", "dinov2/vitb14", "dinov2/vitl14"):
        assert PRETRAINED_URLS[name].startswith(
            "https://dl.fbaipublicfiles.com/dinov2/"
        )


def test_fetch_caches_and_verifies(tmp_path):
    src = tmp_path / "weights.pth"
    src.write_bytes(b"fake checkpoint bytes")
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    dest_dir = tmp_path / "cache"
    dest_dir.mkdir()

    p = fetch_pretrained(
        "custom/x", url=src.as_uri(), sha256=digest, dest_dir=dest_dir
    )
    assert p.read_bytes() == b"fake checkpoint bytes"
    # Cache hit: the source is gone and the URL unreachable, but the cached
    # file (same basename) satisfies the request without any fetch.
    src.unlink()
    p2 = fetch_pretrained(
        "custom/x", url="file:///nonexistent/weights.pth", sha256=digest,
        dest_dir=dest_dir,
    )
    assert p2 == p


def test_fetch_checksum_mismatch(tmp_path):
    src = tmp_path / "w.pth"
    src.write_bytes(b"abc")
    dest_dir = tmp_path / "c"
    dest_dir.mkdir()
    with pytest.raises(RuntimeError, match="Checksum"):
        fetch_pretrained(
            "custom/y", url=src.as_uri(), sha256="0" * 64, dest_dir=dest_dir
        )


def test_unknown_model_error():
    with pytest.raises(ValueError, match="No pretrained URL"):
        fetch_pretrained("nope/nothing")


def test_offline_error_names_alternative(tmp_path):
    with pytest.raises(RuntimeError, match="local"):
        fetch_pretrained(
            "custom/z", url="file:///definitely/not/here.pth",
            dest_dir=tmp_path,
        )
