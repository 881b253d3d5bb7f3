"""Golden tests for generic timm/torchvision checkpoint ingestion
(VERDICT r2 #7).

- timm-style ViT: fused qkv + cls-entry pos_embed + NO layerscale (the
  vendored DinoVisionTransformer with ``init_values=None`` produces exactly
  the timm vanilla-ViT state-dict core) -> forward parity after conversion.
- torchvision/timm ResNet layout: a torch BasicBlock resnet18 (standard
  torchvision graph, written inline — torchvision itself is not installed)
  with random weights AND random running stats -> forward parity including
  the stride-2 padding alignment.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = Path("/root/reference/src/lightly_train")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference source tree not available"
)

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tests.models.test_torch_golden import _load_reference_vit  # noqa: E402


def test_timm_style_vit_without_layerscale_ingests():
    from lightly_train_tpu.models.convert import convert_torch_vit_state_dict
    from lightly_train_tpu.models.vit import ViTConfig, VisionTransformer

    vt = _load_reference_vit()
    torch_model = vt._vit_test(patch_size=16, init_values=None, img_size=224)
    with torch.no_grad():
        for p in torch_model.parameters():
            if p.ndim >= 1:
                p.add_(torch.randn_like(p) * 0.02)
    torch_model.eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    assert not any("ls1" in k for k in sd), "timm layout must lack layerscale"

    cfg = ViTConfig(
        patch_size=16, embed_dim=8, depth=3, num_heads=2, mlp_ratio=1.0,
        layerscale_init=1e-5, pos_embed_size=14,
    )
    params = convert_torch_vit_state_dict(sd, depth=cfg.depth)
    # Missing layerscale -> identity gammas, not the 1e-5 fresh init.
    np.testing.assert_array_equal(
        np.asarray(params["block0"]["ls1"]["gamma"]), np.ones(8, np.float32)
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = torch_model.forward_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    model = VisionTransformer(cfg)
    f_out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(
        t_out["x_norm_clstoken"].numpy(),
        np.asarray(f_out["cls_token"], np.float32),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        t_out["x_norm_patchtokens"].numpy(),
        np.asarray(f_out["patch_tokens"], np.float32),
        atol=1e-4, rtol=1e-4,
    )


def _torch_resnet18():
    """torchvision-identical resnet18 feature trunk (inline; torchvision is
    not installed in this image)."""
    from torch import nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU()
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return self.relu(h + idt)

    class ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths = (64, 128, 256, 512)
            for s, w in enumerate(widths):
                cin = 64 if s == 0 else widths[s - 1]
                setattr(self, f"layer{s + 1}", nn.Sequential(
                    BasicBlock(cin, w, 1 if s == 0 else 2),
                    BasicBlock(w, w, 1),
                ))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in range(4):
                x = getattr(self, f"layer{s + 1}")(x)
            return x

    return ResNet18()


def test_torchvision_resnet18_checkpoint_ingests(tmp_path):
    from lightly_train_tpu.models.convert import (
        convert_torch_resnet_state_dict,
        load_torch_checkpoint_for_model,
    )
    from lightly_train_tpu.models.package_registry import get_wrapped_model

    tm = _torch_resnet18()
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = convert_torch_resnet_state_dict(sd, (2, 2, 2, 2))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    wrapped = get_wrapped_model("torchvision/resnet18")
    out = wrapped.module.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x), train=False,
    )
    got = np.asarray(out["features"], np.float32).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    # 18 conv layers of randomly-scaled weights amplify activations to
    # O(1e3); 1% relative tolerance still falsifies any stride-2 padding
    # misalignment (which produces O(100%) differences).
    np.testing.assert_allclose(ref, got, atol=1e-2, rtol=1e-2)

    # End-to-end: the .pth -> variables path used by task training.
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "r18.pth")
    via_loader = load_torch_checkpoint_for_model(
        tmp_path / "r18.pth", "timm/resnet18"
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(via_loader),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
