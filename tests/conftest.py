"""Test configuration: force a virtual 8-device CPU platform.

Mirrors the reference's test-isolation approach (``tests/conftest.py:22-51``)
but adds what the reference lacks (SURVEY.md §4): multi-device collective
coverage via ``--xla_force_host_platform_device_count=8`` so sharding and
psum semantics are exercised in every CI run without TPU hardware.
"""

import os

# Must happen before jax import. Force CPU even if the environment points at
# a real TPU — tests exercise the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# A TPU PJRT plugin (axon sitecustomize) may have force-registered itself at
# interpreter start; override the platform before the backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")
# XLA:CPU routes fp32 convs/dots through oneDNN, which on AMX-BF16 hosts
# computes them in bf16 fast-math (measured 4.5e-3 abs error vs float64 on a
# 3x3 conv; torch's fp32 conv is exact). Golden parity tests against torch
# need true fp32 — force HIGHEST everywhere on the test platform.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: CPU compiles of the model zoo dominate test
# time (single-core CI box); cache them across pytest runs. jax 0.9 ignores
# the JAX_COMPILATION_CACHE_DIR env var for cache READS ("cache is
# disabled/not initialized") — explicit config updates are required.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_comp_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import tempfile
from pathlib import Path

import pytest


@pytest.fixture(autouse=True)
def lightly_train_cache_dir(monkeypatch):
    with tempfile.TemporaryDirectory() as tmp:
        monkeypatch.setenv("LIGHTLY_TRAIN_CACHE_DIR", tmp)
        yield Path(tmp)
