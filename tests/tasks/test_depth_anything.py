"""Depth Anything: DPT golden parity vs the vendored torch head + zoo API."""

import importlib
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.tasks.depth_anything import (
    DEPTH_MODEL_CONFIGS,
    DPT,
    DepthAnythingModel,
    convert_depth_anything_state_dict,
    list_depth_models,
)

REF = Path("/root/reference/src/lightly_train")


def _load_reference_dpt():
    pytest.importorskip("torch")
    if not REF.exists():
        pytest.skip("reference source tree not available")
    import sys
    import types

    if "lightly_train" not in sys.modules:
        pkg = types.ModuleType("lightly_train")
        pkg.__path__ = [str(REF)]
        sys.modules["lightly_train"] = pkg
    return importlib.import_module(
        "lightly_train._task_models.depth_estimation_components.dpt"
    )


def test_dpt_golden_parity_vs_torch():
    import torch

    dpt_mod = _load_reference_dpt()
    rng = np.random.default_rng(0)
    dim_in, feats_dim, oc = 16, 8, (8, 8, 16, 16)
    torch_dpt = dpt_mod.DPT(
        dim_in=dim_in, patch_size=16, output_dim=1, activation="exp",
        features=feats_dim, out_channels=oc, use_sky_head=True,
        sky_activation="sigmoid",
    )
    with torch.no_grad():
        for p in torch_dpt.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    torch_dpt.eval()

    B, ph, pw = 2, 4, 4
    H = W = ph * 16
    feats = [
        rng.normal(size=(B, ph * pw, dim_in)).astype(np.float32)
        for _ in range(4)
    ]
    with torch.no_grad():
        t_out = torch_dpt(
            [torch.from_numpy(f) for f in feats], H, W
        )

    sd = {f"decoder.{k}": v.numpy() for k, v in torch_dpt.state_dict().items()}

    class _FakeModel:
        class wrapped:
            class module:
                class cfg:
                    depth = 0

    flax_dpt = DPT(
        dim_in=dim_in, patch_size=16, output_dim=1, activation="exp",
        features=feats_dim, out_channels=oc, use_sky_head=True,
        sky_activation="sigmoid",
    )
    # Convert only the decoder part (no backbone keys present).
    params = convert_depth_anything_state_dict(sd, _FakeModel)["decoder"]
    f_feats = [jnp.asarray(f.reshape(B, ph, pw, dim_in)) for f in feats]
    f_out = flax_dpt.apply({"params": params}, f_feats, (H, W))

    np.testing.assert_allclose(
        t_out["depth"][:, 0].numpy(), np.asarray(f_out["depth"]),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        t_out["sky"][:, 0].numpy(), np.asarray(f_out["sky"]),
        atol=2e-4, rtol=1e-3,
    )


def test_zoo_names_match_baseline_table():
    names = list_depth_models()
    for required in (
        "dinov3/dav3-metric-tiny",
        "dinov3/dav3-metric-tiny-plus",
        "dinov2/dav3-metric-small",
        "dinov2/dav3-metric-large",
        "dinov2/dav2-relative-large",
        "dinov2/dav2-metric-small-hypersim",
    ):
        assert required in names


def test_depth_model_builds_and_predicts():
    model = DepthAnythingModel.build("dinov3/dav3-relative-test")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.forward(params, x)
    assert out["depth"].shape == (1, 64, 64)
    assert out["sky"].shape == (1, 64, 64)
    pred = model.predict(params, x)
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(pred).all()


def test_metric_focal_scaling():
    model = DepthAnythingModel.build("dinov3/dav3-relative-test")
    model.config["scale_mode"] = "focal"
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    p1 = model.predict(params, x, focal=300.0)
    p2 = model.predict(params, x, focal=600.0)
    np.testing.assert_allclose(p2, p1 * 2.0, rtol=1e-5)
