"""Test configuration: force a virtual 8-device CPU platform.

Mirrors the reference's test-isolation approach (``tests/conftest.py:22-51``)
but adds what the reference lacks (SURVEY.md §4): multi-device collective
coverage via ``--xla_force_host_platform_device_count=8`` so sharding and
psum semantics are exercised in every CI run without TPU hardware.
"""

import os

# Must happen before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import tempfile
from pathlib import Path

import pytest


@pytest.fixture(autouse=True)
def lightly_train_cache_dir(monkeypatch):
    with tempfile.TemporaryDirectory() as tmp:
        monkeypatch.setenv("LIGHTLY_TRAIN_CACHE_DIR", tmp)
        yield Path(tmp)
