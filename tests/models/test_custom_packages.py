"""Custom-model package, ShuffleNetV2, and pattern-driven timm names."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

import lightly_train_tpu as lt
from lightly_train_tpu.models.package_registry import get_wrapped_model


class UserCNN(nn.Module):
    """A user-defined module returning a bare (B, H, W, D) feature map."""

    width: int = 16

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = nn.Conv(self.width, (3, 3), strides=(2, 2))(images)
        x = nn.relu(x)
        x = nn.Conv(self.width * 2, (3, 3), strides=(2, 2))(x)
        return nn.relu(x)


class UserDictModel(nn.Module):
    @nn.compact
    def __call__(self, images):
        x = nn.Conv(8, (4, 4), strides=(4, 4))(images)
        return {"features": x}


def test_custom_module_wraps_and_runs():
    wrapped = get_wrapped_model(UserCNN())
    assert wrapped.feature_dim == 32
    x = jnp.zeros((2, 32, 32, 3))
    variables = wrapped.init(jax.random.key(0), x)
    out = wrapped.forward_features(variables, x)
    assert out["features"].shape == (2, 8, 8, 32)
    assert out["cls_token"].shape == (2, 32)
    assert out["patch_tokens"].shape == (2, 64, 32)


def test_custom_module_dict_output():
    wrapped = get_wrapped_model(UserDictModel())
    assert wrapped.feature_dim == 8


def test_custom_module_bad_output_raises():
    from lightly_train_tpu.errors import ConfigError

    class Bad(nn.Module):
        @nn.compact
        def __call__(self, images):
            return jnp.zeros((images.shape[0], 7))  # not (B, H, W, D)

    with pytest.raises(ConfigError, match="features"):
        get_wrapped_model(Bad())


def test_custom_module_pretrains_end_to_end(tmp_path):
    from PIL import Image

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(data / f"{i}.png")

    state = lt.pretrain(
        out=str(tmp_path / "out"),
        data=str(data),
        model=UserCNN(width=8),
        method="simclr",
        method_args={"image_size": 32, "output_dim": 16, "hidden_dim": 16},
        batch_size=8,
        steps=2,
        precision="fp32",
        canonical_size=64,
        num_workers=2,
    )
    assert int(state.step) == 2


def test_shufflenet_forward():
    wrapped = get_wrapped_model("torchvision/shufflenettest")
    x = jnp.zeros((2, 64, 64, 3))
    variables = wrapped.init(jax.random.key(0), x)
    out, _ = wrapped.forward_features(
        variables, x, train=True, mutable=["batch_stats"]
    )
    # conv1 s2 + maxpool s2 + three s2 stages = /32
    assert out["features"].shape == (2, 2, 2, 32)
    assert len(out["stage_features"]) == 3


def test_shufflenet_public_sizes_listed():
    from lightly_train_tpu.models.package_registry import list_models

    names = list_models()
    assert "torchvision/shufflenet_v2_x1_0" in names
    assert "torchvision/shufflenettest" not in names


def test_timm_pattern_names_resolve():
    w = get_wrapped_model("timm/vit_tiny_patch16_224")
    assert w.feature_dim == 192 and w.patch_size == 16
    w = get_wrapped_model("timm/vit_small_patch32_384")
    assert w.feature_dim == 384 and w.patch_size == 32
    w = get_wrapped_model("timm/shufflenet_v2_x0_5")
    assert w.feature_dim == 1024
    from lightly_train_tpu.errors import UnknownModelError

    with pytest.raises(UnknownModelError):
        get_wrapped_model("timm/totally_unknown_model")
