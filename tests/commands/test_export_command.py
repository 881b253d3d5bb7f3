"""``export`` command (reference ``_commands/export.py``): re-export a
pretrain artifact as package_default / numpy_state_dict / torch_state_dict,
for the model or the embedding_model part."""

import numpy as np
import pytest

import lightly_train_tpu as lt
from lightly_train_tpu.errors import ConfigError


@pytest.fixture(scope="module")
def pretrain_run(tmp_path_factory):
    """ResNet (BatchNorm stats in the artifact) pretrained with an
    embedding head (embed_head sidecar in the artifact)."""
    from PIL import Image

    tmp = tmp_path_factory.mktemp("prerun")
    rng = np.random.default_rng(0)
    (tmp / "imgs").mkdir()
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(tmp / "imgs" / f"{i}.png")
    lt.pretrain(
        out=str(tmp / "out"), data=str(tmp / "imgs"),
        model="torchvision/resnettest", method="simclr",
        method_args={"image_size": 32}, embed_dim=24,
        batch_size=8, steps=1, precision="fp32", canonical_size=64,
        num_workers=2, log_every=1,
    )
    return tmp / "out" / "exported_models" / "exported_last"


def test_export_package_default_roundtrip(tmp_path, pretrain_run):
    """Regression: metadata (not tensors) goes to JSON, and BatchNorm
    stats survive the re-export."""
    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    out = lt.export(
        out=str(tmp_path / "re"), checkpoint=str(pretrain_run),
        format="package_default",
    )
    re = load_exported_model(out)
    src = load_exported_model(pretrain_run)
    assert re["model_name"] == src["model_name"]
    assert re["method"] == src["method"]
    assert "batch_stats" in re["variables"]  # BN stats preserved
    assert "embed_head" not in re  # part="model" drops the head

    # Compare one deterministic leaf path exactly.
    def first_leaf(tree):
        while isinstance(tree, dict):
            tree = tree[sorted(tree)[0]]
        return np.asarray(tree)

    np.testing.assert_array_equal(first_leaf(re["params"]),
                                  first_leaf(src["params"]))


def test_export_package_default_embedding_model(tmp_path, pretrain_run):
    from lightly_train_tpu._checkpoint.checkpoint import load_exported_model

    out = lt.export(
        out=str(tmp_path / "re"), checkpoint=str(pretrain_run),
        format="package_default", part="embedding_model",
    )
    re = load_exported_model(out)
    assert re["embed_dim"] == 24
    assert re["embed_head"]["params"]["embed"]["kernel"].shape[-1] == 24


def test_export_numpy_state_dict_parts(tmp_path, pretrain_run):
    out_m = lt.export(
        out=str(tmp_path / "m.npz"), checkpoint=str(pretrain_run),
        format="numpy_state_dict",
    )
    out_e = lt.export(
        out=str(tmp_path / "e.npz"), checkpoint=str(pretrain_run),
        format="numpy_state_dict", part="embedding_model",
    )
    m = np.load(out_m)
    e = np.load(out_e)
    assert not any(k.startswith("embed_head/") for k in m.files)
    head_keys = [k for k in e.files if k.startswith("embed_head/")]
    assert sorted(head_keys) == ["embed_head/bias", "embed_head/kernel"]
    assert head_keys and set(e.files) - set(head_keys) == set(m.files)


def test_export_torch_state_dict(tmp_path, pretrain_run):
    import torch

    out = lt.export(
        out=str(tmp_path / "sd.pt"), checkpoint=str(pretrain_run),
        format="torch_state_dict", part="embedding_model",
    )
    sd = torch.load(out, weights_only=True)
    assert sd["embed_head.weight"].shape[0] == 24  # (out, in) torch layout
    assert sd["embed_head.bias"].shape == (24,)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())


def test_export_embedding_part_requires_head(tmp_path, pretrain_run):
    """An artifact without an embed head refuses part='embedding_model'."""
    # Re-export as model-only first: that artifact has no head.
    bare = lt.export(
        out=str(tmp_path / "bare"), checkpoint=str(pretrain_run),
        format="package_default",
    )
    with pytest.raises(ConfigError, match="embed_dim"):
        lt.export(
            out=str(tmp_path / "x.npz"), checkpoint=str(bare),
            format="numpy_state_dict", part="embedding_model",
        )
