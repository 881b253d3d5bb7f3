import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu.errors import UnknownModelError
from lightly_train_tpu.models import (
    get_wrapped_model,
    list_models,
)


@pytest.fixture(scope="module")
def sample():
    return jnp.zeros((2, 32, 32, 3), dtype=jnp.float32)


def test_list_models_hides_test_models():
    names = list_models()
    assert "dinov2/vitb14" in names
    assert "dinov3/vits16" in names
    assert "dinov3/convnext-tiny" in names
    assert "torchvision/resnet50" in names
    assert not any("test" in n for n in names)


def test_unknown_model_suggests():
    with pytest.raises(UnknownModelError, match="dinov2/vitb14"):
        get_wrapped_model("dinov2/vitb-14")


def test_dinov2_vit_forward(sample):
    m = get_wrapped_model("dinov2/vittest14")
    # 32 not divisible by 14 -> use 28x28 input
    x = jnp.zeros((2, 28, 28, 3))
    variables = m.init(jax.random.key(0), x)
    out = m.forward_features(variables, x)
    assert out["cls_token"].shape == (2, 32)
    assert out["patch_tokens"].shape == (2, 4, 32)
    assert out["features"].shape == (2, 2, 2, 32)
    assert m.forward_pool(out).shape == (2, 32)


def test_dinov3_vit_rope_and_registers(sample):
    m = get_wrapped_model("dinov3/vittest16")
    variables = m.init(jax.random.key(0), sample)
    out = m.forward_features(variables, sample)
    assert out["cls_token"].shape == (2, 32)
    assert out["register_tokens"].shape == (2, 4, 32)
    assert out["features"].shape == (2, 2, 2, 32)


def test_vit_masking_changes_output(sample):
    m = get_wrapped_model("dinov3/vittest16")
    variables = m.init(jax.random.key(0), sample)
    x = jax.random.normal(jax.random.key(1), sample.shape)
    mask = jnp.zeros((2, 4), dtype=bool).at[:, 0].set(True)
    out_nomask = m.forward_features(variables, x)
    out_mask = m.forward_features(variables, x, mask=mask)
    assert not np.allclose(
        np.asarray(out_mask["patch_tokens"]), np.asarray(out_nomask["patch_tokens"])
    )


def test_vit_resolution_change_pos_embed_interpolation():
    m = get_wrapped_model("dinov3/vittest16")
    variables = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = m.forward_features(variables, jnp.zeros((1, 64, 64, 3)))
    assert out["patch_tokens"].shape == (1, 16, 32)


def test_convnext_forward(sample):
    m = get_wrapped_model("dinov3/convnext-test")
    variables = m.init(jax.random.key(0), sample)
    out = m.forward_features(variables, sample)
    assert out["features"].shape == (2, 1, 1, 64)
    assert out["cls_token"].shape == (2, 64)
    assert len(out["stage_features"]) == 4


def test_resnet_forward_and_batchstats(sample):
    m = get_wrapped_model("torchvision/resnettest")
    variables = m.init(jax.random.key(0), sample)
    assert "batch_stats" in variables
    out = m.forward_features(variables, sample)
    assert out["features"].shape == (2, 1, 1, 64)
    # train mode mutates batch stats
    out, new_vars = m.forward_features(
        variables, sample, train=True, mutable=["batch_stats"]
    )
    assert out["features"].shape == (2, 1, 1, 64)


def test_projected_wrapped_model(sample):
    """The embed_dim pathway: every feature output projects to embed_dim,
    the param tree splits into {backbone, embed}, and applying the
    sidecar-format head after pooling equals projecting before pooling
    (linearity — what embed relies on)."""
    import jax.numpy as jnp

    from lightly_train_tpu.models.embedding import _EmbedHead, project_wrapped

    m = get_wrapped_model("dinov3/convnext-test")
    proj = project_wrapped(m, 16, jnp.float32)
    assert proj.feature_dim == 16
    variables = proj.init(jax.random.key(0), sample)
    assert set(variables["params"]) == {"backbone", "embed"}
    out = proj.forward_features(variables, sample)
    assert out["features"].shape[-1] == 16
    assert proj.forward_pool(out).shape == (2, 16)

    # Sidecar application (embed command): pool raw, then apply the head.
    raw = m.forward_features(
        {"params": variables["params"]["backbone"],
         **{k: v["backbone"] for k, v in variables.items() if k != "params"}},
        sample,
    )
    pooled_raw = m.forward_pool(raw)
    head_vars = {"params": {"embed": variables["params"]["embed"]}}
    z = _EmbedHead(16).apply(head_vars, pooled_raw)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(z), np.asarray(proj.forward_pool(out)), rtol=1e-5, atol=1e-5
    )


def test_vit_droppath_rng_train_mode():
    m = get_wrapped_model("dinov2/vittest14", drop_path_rate=0.5)
    x = jnp.ones((4, 28, 28, 3))
    variables = m.init(jax.random.key(0), x)
    out = m.forward_features(
        variables, x, train=True, rngs={"droppath": jax.random.key(1)}
    )
    assert out["cls_token"].shape == (4, 32)


def test_vit_remat_matches_no_remat():
    import jax.numpy as jnp
    from lightly_train_tpu.models.vit import VisionTransformer, vit_config

    x = jnp.ones((1, 32, 32, 3))
    cfg = vit_config("vittest", 16, flavor="dinov3")
    cfg_remat = dataclasses.replace(cfg, remat_every=1)
    m = VisionTransformer(cfg)
    mr = VisionTransformer(cfg_remat)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(v, x, train=False)["cls_token"]
    out_r = mr.apply(v, x, train=False)["cls_token"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)


def test_resnet_vd_forward(sample):
    """rtdetr PResNet: deep stem + avgpool-vd shortcuts, same contract."""
    m = get_wrapped_model("rtdetr/rtdetr_rtestvd")
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.key(0), x)
    out, _ = m.forward_features(variables, x, train=True, mutable=["batch_stats"])
    assert out["features"].shape == (2, 2, 2, 64)
    assert len(out["stage_features"]) == 4
    # deep stem: three conv/bn pairs instead of one 7x7
    assert "stem_conv1" in variables["params"]
    assert "stem_conv3" in variables["params"]
    assert "stem_conv" not in variables["params"]


def test_yolo_nas_forward(sample):
    m = get_wrapped_model("super_gradients/yolo_nas_test")
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.key(0), x)
    out = m.forward_features(variables, x)
    assert out["features"].shape == (2, 2, 2, 32)
    assert [t.shape[1] for t in out["stage_features"]] == [8, 4, 2]
    assert m.forward_pool(out).shape == (2, 32)


def test_rfdetr_aliases_resolve():
    m = get_wrapped_model("rfdetr/rf-detr-nano")
    assert m.feature_dim == 384 and m.patch_size == 14
