"""Live-package wrap paths: ultralytics layer-graph slicing + gating.

timm/ultralytics are not installed in CI, so the routing logic is tested
with structural stand-ins that mimic the ultralytics layer graph
(``f``/``i`` attributes on an ``nn.Sequential``), and the gated paths are
tested for their error surface. Reference analog:
``_models/ultralytics/ultralytics.py:57-235``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.models.torch_packages import (
    UltralyticsBackbone,
    timm_available,
    ultralytics_available,
    wrap_timm_model,
    wrap_ultralytics_model,
)


def _fake_yolo_layers() -> nn.Sequential:
    """Mini ultralytics-style layer graph: stem -> c1 -> c2 -> concat ->
    fuse -> head, with explicit f/i routing like a real DetectionModel."""
    torch.manual_seed(0)

    class Concat(nn.Module):
        def forward(self, xs):
            return torch.cat(xs, dim=1)

    stem = nn.Conv2d(3, 8, 3, 2, 1)
    c1 = nn.Conv2d(8, 16, 3, 2, 1)
    c2 = nn.Conv2d(16, 16, 3, 1, 1)
    concat = Concat()
    fuse = nn.Conv2d(32, 24, 1)
    head = nn.Conv2d(24, 99, 1)  # stands in for Detect
    layers = nn.Sequential(stem, c1, c2, concat, fuse, head)
    froms = [-1, -1, -1, [-1, 1], -1, -1]
    for i, (m, f) in enumerate(zip(layers, froms)):
        m.f = f
        m.i = i
    return layers


class TestUltralyticsSlicing:
    def test_routing_matches_manual_forward(self):
        layers = _fake_yolo_layers()
        backbone = UltralyticsBackbone(layers)
        x = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            got = backbone(x)
            # Manual: stem -> c1 -> c2 -> cat([c2, c1]) -> fuse
            a = layers[0](x)
            b = layers[1](a)
            c = layers[2](b)
            ref = layers[4](torch.cat([c, b], dim=1))
        assert got.shape == (2, 24, 8, 8)
        np.testing.assert_allclose(got.numpy(), ref.numpy(), atol=1e-6)

    def test_head_is_dropped(self):
        backbone = UltralyticsBackbone(_fake_yolo_layers())
        assert len(backbone.layers) == 5  # the 99-channel head is gone

    def test_bridges_to_wrapped_model(self):
        from lightly_train_tpu.models.torch_bridge import wrap_torch_module

        backbone = UltralyticsBackbone(_fake_yolo_layers())
        wrapped = wrap_torch_module(
            backbone, name="ultralytics/fake", sample_hw=(32, 32)
        )
        assert wrapped.feature_dim == 24
        sample = jnp.ones((1, 32, 32, 3))
        variables = wrapped.init(jax.random.key(0), sample)
        out = wrapped.forward_features(variables, sample)
        assert out["features"].shape == (1, 8, 8, 24)


class TestGating:
    def test_timm_gate_message(self):
        if timm_available():
            pytest.skip("timm installed; gate not reachable")
        with pytest.raises(ConfigError, match="timm"):
            wrap_timm_model("convnextv2_nano")

    def test_ultralytics_gate_message(self):
        if ultralytics_available():
            pytest.skip("ultralytics installed; gate not reachable")
        with pytest.raises(ConfigError, match="ultralytics"):
            wrap_ultralytics_model("yolo11n.pt")

    def test_registry_unknown_timm_name_raises_clearly(self):
        from lightly_train_tpu.errors import UnknownModelError
        from lightly_train_tpu.models.package_registry import (
            get_wrapped_model,
        )

        if timm_available():
            pytest.skip("timm installed; name would resolve live")
        with pytest.raises(UnknownModelError):
            get_wrapped_model("timm/some_exotic_model_xyz")
