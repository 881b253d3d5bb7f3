"""Golden output-parity tests against the vendored torch reference ViT.

Instantiates the reference ``DinoVisionTransformer``
(``/root/reference/src/lightly_train/_models/dinov2_vit/dinov2_vit_src/models/vision_transformer.py:84``)
with random weights, converts its state dict via ``models/convert.py``, and
asserts the Flax forward (cls + patch tokens) matches the torch forward to
fp32 tolerance. This proves Meta checkpoints provably load, not just that the
converter "looks right".

The reference package's top-level __init__ pulls heavy deps (lightning,
torchvision) that are absent here; all intermediate __init__ files on the
import chain are empty, so we mount a stub parent package pointing at the
reference source tree and stub ``lightning_utilities``.
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


def _load_reference_vit():
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
    import importlib

    return importlib.import_module(
        "lightly_train._models.dinov2_vit.dinov2_vit_src.models.vision_transformer"
    )


def _forward_pair(torch_model, flax_cfg, image_hw, mask=None, seed=0):
    """Run both models on identical random input; return (torch, flax) dicts."""
    import torch

    from lightly_train_tpu.models.convert import convert_torch_vit_state_dict
    from lightly_train_tpu.models.vit import VisionTransformer

    torch_model.eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert_torch_vit_state_dict(sd, depth=flax_cfg.depth)

    rng = np.random.default_rng(seed)
    h, w = image_hw
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        t_mask = (
            torch.from_numpy(np.asarray(mask)) if mask is not None else None
        )
        t_out = torch_model.forward_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), masks=t_mask
        )

    flax_model = VisionTransformer(flax_cfg)
    f_out = flax_model.apply(
        {"params": params},
        jnp.asarray(x),
        mask=jnp.asarray(mask) if mask is not None else None,
    )
    return (
        {
            "cls": t_out["x_norm_clstoken"].numpy(),
            "patch": t_out["x_norm_patchtokens"].numpy(),
        },
        {
            "cls": np.asarray(f_out["cls_token"], np.float32),
            "patch": np.asarray(f_out["patch_tokens"], np.float32),
        },
    )


def test_dinov2_vit_test_size_outputs_match():
    from lightly_train_tpu.models.vit import ViTConfig

    vt = _load_reference_vit()
    torch_model = vt._vit_test(patch_size=16, init_values=1e-5, img_size=224)
    cfg = ViTConfig(
        patch_size=16, embed_dim=8, depth=3, num_heads=2, mlp_ratio=1.0,
        layerscale_init=1e-5, pos_embed_size=14,
    )
    t, f = _forward_pair(torch_model, cfg, (224, 224))
    np.testing.assert_allclose(t["cls"], f["cls"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t["patch"], f["patch"], atol=1e-4, rtol=1e-4)


def test_dinov2_vit_small_with_registers_outputs_match():
    from lightly_train_tpu.models.vit import vit_config

    vt = _load_reference_vit()
    torch_model = vt.vit_small(
        patch_size=14, num_register_tokens=4, init_values=1e-5, img_size=224
    )
    cfg = vit_config("vits", 14)
    cfg = type(cfg)(**{**cfg.__dict__, "num_register_tokens": 4})
    t, f = _forward_pair(torch_model, cfg, (224, 224))
    np.testing.assert_allclose(t["cls"], f["cls"], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(t["patch"], f["patch"], atol=2e-4, rtol=1e-4)


def _load_reference_dinov3():
    _load_reference_vit()  # mounts the stub parent package
    import importlib

    return importlib.import_module(
        "lightly_train._models.dinov3.dinov3_src.models.vision_transformer"
    )


def _dinov3_pair(ffn_layer, ffn_ratio, use_swiglu, seed=0):
    """Construct matched torch/flax DINOv3 models (random weights)."""
    import torch

    from lightly_train_tpu.models.vit import ViTConfig

    vt3 = _load_reference_dinov3()
    torch_model = vt3.DinoVisionTransformer(
        img_size=224, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        ffn_ratio=ffn_ratio, qkv_bias=True, layerscale_init=1e-5,
        norm_layer="layernormbf16", ffn_layer=ffn_layer,
        n_storage_tokens=4, mask_k_bias=True,
        pos_embed_rope_base=100.0, pos_embed_rope_dtype="fp32",
    )
    torch_model.init_weights()
    with torch.no_grad():
        # Random weights: init_weights leaves some params zero; randomize for
        # a discriminating comparison. bias_mask is NaN at construction
        # (checkpoints carry it): set the DINOv3 mask (k section zeroed).
        for p in torch_model.parameters():
            if p.ndim >= 1:
                p.add_(torch.randn_like(p) * 0.02)
        for blk in torch_model.blocks:
            m = blk.attn.qkv.bias_mask
            d = m.shape[0] // 3
            m.fill_(1.0)
            m[d : 2 * d] = 0.0
    cfg = ViTConfig(
        patch_size=16, embed_dim=64, depth=2, num_heads=2,
        mlp_ratio=ffn_ratio, layerscale_init=1e-5, num_register_tokens=4,
        use_rope=True, rope_base=100.0, use_swiglu=use_swiglu,
        swiglu_align=8, qkv_bias=True, mask_k_bias=True,
        use_pos_embed=False, norm_eps=1e-5,
    )
    return torch_model, cfg


def test_dinov3_mlp_outputs_match():
    torch_model, cfg = _dinov3_pair("mlp", 4.0, use_swiglu=False)
    t, f = _forward_pair(torch_model, cfg, (224, 224))
    np.testing.assert_allclose(t["cls"], f["cls"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t["patch"], f["patch"], atol=1e-4, rtol=1e-4)


def test_dinov3_swiglu_outputs_match():
    torch_model, cfg = _dinov3_pair("swiglu", 6.0, use_swiglu=True)
    t, f = _forward_pair(torch_model, cfg, (224, 224))
    np.testing.assert_allclose(t["cls"], f["cls"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t["patch"], f["patch"], atol=1e-4, rtol=1e-4)


def test_dinov3_non_square_grid_matches():
    """RoPE separate-axis coordinate normalization on a non-square grid."""
    torch_model, cfg = _dinov3_pair("mlp", 4.0, use_swiglu=False)
    t, f = _forward_pair(torch_model, cfg, (96, 160))
    np.testing.assert_allclose(t["patch"], f["patch"], atol=1e-4, rtol=1e-4)


def test_reverse_converter_roundtrip_into_torch():
    """Flax params -> Meta torch naming -> vendored torch module: the torch
    forward must match the Flax forward (export format=torch_state_dict)."""
    import torch

    from lightly_train_tpu.models.convert import (
        convert_flax_vit_to_torch_state_dict,
    )
    from lightly_train_tpu.models.vit import ViTConfig, VisionTransformer

    vt = _load_reference_vit()
    cfg = ViTConfig(
        patch_size=16, embed_dim=8, depth=3, num_heads=2, mlp_ratio=1.0,
        layerscale_init=1e-5, pos_embed_size=14,
    )
    flax_model = VisionTransformer(cfg)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    variables = flax_model.init(
        {"params": jax.random.key(5), "droppath": jax.random.key(6)},
        jnp.asarray(x),
    )
    # Randomize (init leaves LayerScale constant etc.)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(1).normal(
            size=a.shape
        ).astype(np.float32),
        variables["params"],
    )
    sd = convert_flax_vit_to_torch_state_dict(params, depth=cfg.depth)

    torch_model = vt._vit_test(
        patch_size=16, init_values=1e-5, img_size=224, block_chunks=0
    )
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    torch_model.eval()
    with torch.no_grad():
        t_out = torch_model.forward_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    f_out = flax_model.apply({"params": params}, jnp.asarray(x))
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


def test_dinov3_convnext_outputs_match():
    """ConvNeXt converter golden test against the vendored torch model
    (``dinov3_src/models/convnext.py:126``)."""
    import importlib

    import torch

    from lightly_train_tpu.models.convert import convert_torch_convnext_state_dict
    from lightly_train_tpu.models.convnext import ConvNeXt, ConvNeXtConfig

    _load_reference_vit()
    cn = importlib.import_module(
        "lightly_train._models.dinov3.dinov3_src.models.convnext"
    )
    depths, dims = (2, 1, 1, 2), (8, 16, 32, 64)
    torch_model = cn.ConvNeXt(depths=list(depths), dims=list(dims))
    torch_model.init_weights()
    with torch.no_grad():
        for p in torch_model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    torch_model.eval()

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert_torch_convnext_state_dict(sd, depths)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = torch_model.forward_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    flax_model = ConvNeXt(ConvNeXtConfig(depths=depths, dims=dims))
    f_out = flax_model.apply({"params": params}, jnp.asarray(x))
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


def test_dinov2_masked_forward_matches():
    """iBOT mask-token substitution follows the same semantics (mask before
    pos-add, ``vision_transformer.py:307-316``)."""
    from lightly_train_tpu.models.vit import ViTConfig

    vt = _load_reference_vit()
    torch_model = vt._vit_test(patch_size=16, init_values=1e-5, img_size=224)
    # Give the (zero-init) mask token distinguishable values.
    import torch

    with torch.no_grad():
        torch_model.mask_token.normal_(std=0.5)
    cfg = ViTConfig(
        patch_size=16, embed_dim=8, depth=3, num_heads=2, mlp_ratio=1.0,
        layerscale_init=1e-5, pos_embed_size=14,
    )
    n_patches = (224 // 16) ** 2
    rng = np.random.default_rng(3)
    mask = rng.random((2, n_patches)) < 0.4
    t, f = _forward_pair(torch_model, cfg, (224, 224), mask=mask)
    np.testing.assert_allclose(t["cls"], f["cls"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t["patch"], f["patch"], atol=1e-4, rtol=1e-4)
