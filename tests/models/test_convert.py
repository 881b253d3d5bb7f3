"""Torch->Flax weight conversion: structural + numerical equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.models.convert import convert_torch_vit_state_dict
from lightly_train_tpu.models.package_registry import get_wrapped_model


def _fake_meta_state_dict(depth=2, dim=32, heads=2, patch=16, grid=2,
                          registers=0, with_cls_pos=True):
    """Random state dict with Meta DINOv2 naming/shapes."""
    rng = np.random.default_rng(0)
    n = grid * grid + (1 if with_cls_pos else 0)
    sd = {
        "cls_token": rng.normal(size=(1, 1, dim)),
        "pos_embed": rng.normal(size=(1, n, dim)),
        "mask_token": rng.normal(size=(1, dim)),
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, patch, patch)),
        "patch_embed.proj.bias": rng.normal(size=(dim,)),
        "norm.weight": rng.normal(size=(dim,)),
        "norm.bias": rng.normal(size=(dim,)),
    }
    if registers:
        sd["register_tokens"] = rng.normal(size=(1, registers, dim))
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            f"{p}norm1.weight": rng.normal(size=(dim,)),
            f"{p}norm1.bias": rng.normal(size=(dim,)),
            f"{p}norm2.weight": rng.normal(size=(dim,)),
            f"{p}norm2.bias": rng.normal(size=(dim,)),
            f"{p}attn.qkv.weight": rng.normal(size=(3 * dim, dim)),
            f"{p}attn.qkv.bias": rng.normal(size=(3 * dim,)),
            f"{p}attn.proj.weight": rng.normal(size=(dim, dim)),
            f"{p}attn.proj.bias": rng.normal(size=(dim,)),
            f"{p}ls1.gamma": rng.normal(size=(dim,)),
            f"{p}ls2.gamma": rng.normal(size=(dim,)),
            f"{p}mlp.fc1.weight": rng.normal(size=(4 * dim, dim)),
            f"{p}mlp.fc1.bias": rng.normal(size=(4 * dim,)),
            f"{p}mlp.fc2.weight": rng.normal(size=(dim, 4 * dim)),
            f"{p}mlp.fc2.bias": rng.normal(size=(dim,)),
        })
    return sd


def test_converted_params_load_and_run():
    # dinov2/vittest14: dim 32, depth 2, patch 14, pos grid 16.
    sd = _fake_meta_state_dict(depth=2, dim=32, patch=14, grid=16)
    params = convert_torch_vit_state_dict(sd, depth=2)
    m = get_wrapped_model("dinov2/vittest14")
    x = jnp.zeros((1, 28, 28, 3))
    init_params = m.init(jax.random.key(0), x)["params"]
    # Same tree structure (ignoring leaf values).
    init_paths = set(jax.tree_util.tree_structure(init_params).__repr__())
    conv_paths = set(jax.tree_util.tree_structure(params).__repr__())
    assert jax.tree_util.tree_structure(
        init_params
    ) == jax.tree_util.tree_structure(params)
    out = m.forward_features({"params": params}, x)
    assert out["cls_token"].shape == (1, 32)
    assert np.isfinite(np.asarray(out["cls_token"])).all()


def test_qkv_transpose_matches_torch_linear():
    import torch

    rng = np.random.default_rng(1)
    W = rng.normal(size=(12, 4)).astype(np.float32)  # torch (out, in)
    b = rng.normal(size=(12,)).astype(np.float32)
    x = rng.normal(size=(5, 4)).astype(np.float32)
    torch_out = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(W), torch.from_numpy(b)
    ).numpy()
    flax_out = x @ W.T + b  # flax kernel = W.T
    np.testing.assert_allclose(torch_out, flax_out, atol=1e-5)


def test_cls_pos_embed_folding():
    sd = _fake_meta_state_dict(depth=2, dim=32, patch=14, grid=16)
    params = convert_torch_vit_state_dict(sd, depth=2)
    expected_cls = sd["cls_token"] + sd["pos_embed"][:, :1]
    np.testing.assert_allclose(
        params["cls_token"], expected_cls.astype(np.float32), atol=1e-6
    )
    assert params["pos_embed"].shape == (1, 256, 32)


def test_patch_embed_conv_transpose_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    W = rng.normal(size=(8, 3, 4, 4)).astype(np.float32)
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    torch_out = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(W), stride=4
    ).numpy()  # (1, 8, 2, 2)
    import jax.numpy as jnp

    kernel = jnp.asarray(W.transpose(2, 3, 1, 0))  # (4,4,3,8)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), kernel, (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        torch_out.transpose(0, 2, 3, 1), np.asarray(out), atol=1e-4
    )
