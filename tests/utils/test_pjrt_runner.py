"""Native C++ PJRT runner: end-to-end vs Python predictions.

Opt-in (needs the real TPU relay plugin + slow remote compile):
``LIGHTLY_TRAIN_RUN_TPU_TESTS=1 pytest tests/utils/test_pjrt_runner.py``.
The build itself (compile lt_runner from source) always runs when g++ and
the PJRT header are available.
"""

import os
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
PLUGIN = Path("/opt/axon/libaxon_pjrt.so")


def _pjrt_include() -> str:
    try:
        import tensorflow

        return str(
            Path(tensorflow.__file__).parent / "include" / "xla" / "pjrt" / "c"
        )
    except Exception:
        return ""


@pytest.mark.skipif(
    shutil.which("g++") is None or not _pjrt_include(),
    reason="g++ or PJRT header unavailable",
)
def test_runner_builds(tmp_path):
    out = tmp_path / "lt_runner"
    subprocess.run(
        [
            "g++", "-O3", "-std=c++17", f"-I{_pjrt_include()}",
            "-o", str(out), str(REPO / "native" / "src" / "lt_runner.cpp"),
            "-ldl",
        ],
        check=True,
    )
    assert out.exists()


@pytest.mark.skipif(
    os.environ.get("LIGHTLY_TRAIN_RUN_TPU_TESTS") != "1"
    or not PLUGIN.exists(),
    reason="TPU runner test is opt-in (LIGHTLY_TRAIN_RUN_TPU_TESTS=1)",
)
def test_runner_matches_python_on_tpu(tmp_path):
    import numpy as np

    # Export + golden in a TPU-backend subprocess (tests force CPU here).
    script = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
import numpy as np, jax, jax.numpy as jnp
from lightly_train_tpu._checkpoint.checkpoint import export_model
from lightly_train_tpu._commands.export_task import export_stablehlo
from lightly_train_tpu.models.package_registry import get_wrapped_model
w = get_wrapped_model('dinov2/vittest14')
variables = w.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
export_model({str(tmp_path / 'ckpt')!r}, 'dinov2/vittest14', variables['params'])
export_stablehlo(out={str(tmp_path / 'm.shlo')!r}, checkpoint={str(tmp_path / 'ckpt')!r},
                 image_size=64, batch_size=1, verify=False)
x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
x.tofile({str(tmp_path / 'input.bin')!r})
out = w.forward_features(variables, jnp.asarray(x), train=False)
np.save({str(tmp_path / 'golden.npy')!r}, np.asarray(w.forward_pool(out), np.float32))
"""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    subprocess.run(["python", "-c", script], check=True, env=env)

    runner = REPO / "native" / "lt_runner"
    if not runner.exists():
        subprocess.run(["make", "runner"], cwd=REPO / "native", check=True)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    env.setdefault("AXON_LOOPBACK_RELAY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    subprocess.run(
        [
            str(runner), str(PLUGIN), str(tmp_path / "m.shlo.mlir"),
            str(tmp_path / "m.shlo.compile_options.pb"),
            str(tmp_path / "input.bin"), "1,64,64,3",
            str(tmp_path / "out"),
        ],
        check=True, env=env,
    )
    got = np.fromfile(tmp_path / "out.0.bin", np.float32).reshape(1, -1)
    want = np.load(tmp_path / "golden.npy")
    np.testing.assert_allclose(got, want, atol=5e-3)
