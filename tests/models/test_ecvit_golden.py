"""Golden output-parity test for ECViT against the vendored EdgeCrafter module.

Instantiates the reference ``ECViTModelWrapper``
(``/root/reference/src/lightly_train/_models/ecvit/ecvit.py:440``) at a tiny
size, converts its state dict via ``convert_ecvit_state_dict``, and asserts
the Flax (P3, P4, P5) pyramid matches the torch forward.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference/src/lightly_train")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference source tree not available"
)


def _load_reference_ecvit():
    torch = pytest.importorskip("torch")
    del torch
    if "lightly_train" not in sys.modules:
        pkg = types.ModuleType("lightly_train")
        pkg.__path__ = [str(REF)]
        sys.modules["lightly_train"] = pkg
    if "lightning_utilities" not in sys.modules:
        lu = types.ModuleType("lightning_utilities")
        lu.__path__ = []
        core = types.ModuleType("lightning_utilities.core")
        core.__path__ = []
        imports = types.ModuleType("lightning_utilities.core.imports")

        class RequirementCache:
            def __init__(self, *args, **kwargs):
                pass

            def __bool__(self):
                return False

        imports.RequirementCache = RequirementCache
        sys.modules["lightning_utilities"] = lu
        sys.modules["lightning_utilities.core"] = core
        sys.modules["lightning_utilities.core.imports"] = imports
    if "torchvision" not in sys.modules:
        # lightly_train.types imports torchvision.tv_tensors for type aliases
        # only — a stub with the referenced names suffices.
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.tv_tensors")
        for name in ("Image", "BoundingBoxes", "Mask", "Video", "TVTensor"):
            setattr(tvt, name, type(name, (), {}))
        tv.tv_tensors = tvt
        # A spec-less sys.modules entry makes importlib.util.find_spec
        # RAISE (ValueError: __spec__ is None) for every later caller —
        # transformers probes torchvision at import in tests/tasks.
        tv.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision", loader=None, is_package=True
        )
        tvt.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.tv_tensors", loader=None
        )
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.tv_tensors"] = tvt
    import importlib

    return importlib.import_module("lightly_train._models.ecvit.ecvit")


def test_ecvit_pyramid_outputs_match():
    ecvit_ref = _load_reference_ecvit()
    import torch

    from lightly_train_tpu.models.convert import convert_ecvit_state_dict
    from lightly_train_tpu.models.ecvit import ECViT, ecvit_config

    cfg = ecvit_config("ecvittest")
    tm = ecvit_ref.ECViTModelWrapper(
        name="ecvitt",  # preset overridden below to the test size
        embed_dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        proj_dim=cfg.proj_dim,
        interaction_indexes=list(cfg.interaction_indexes),
        depth=cfg.depth,
    ).eval()
    # randomize parameters + BN stats (defaults are zeros for register etc.)
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    n_proj = 1 if cfg.proj_dim is None else 3
    variables = convert_ecvit_state_dict(sd, depth=cfg.depth, n_projector=n_proj)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        p3, p4, p5 = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    f_out = ECViT(cfg).apply(variables, jnp.asarray(x))
    got = [np.asarray(t, np.float32) for t in f_out["stage_features"]]
    for name, ref_t, got_t in zip(("P3", "P4", "P5"), (p3, p4, p5), got):
        np.testing.assert_allclose(
            got_t,
            ref_t.numpy().transpose(0, 2, 3, 1),
            atol=5e-4,
            rtol=5e-4,
            err_msg=name,
        )
    assert f_out["features"].shape == got[-1].shape
