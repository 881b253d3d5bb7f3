"""LT-DETR component golden tests vs the ACTUAL torch reference.

Each test instantiates the reference module
(``object_detection_components/{hybrid_encoder,dfine_decoder}.py``,
``ltdetr_object_detection/dino_vit_wrapper.py``) with random weights,
converts them with ``tasks/detection/convert.py``, and checks the flax
forward matches the torch forward to fp32 noise. Together these pin the
full ``LTDETRObjectDetection._forward_train`` pipeline
(``task_model.py:383-387``: backbone -> encoder -> decoder)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp


def _mount():
    from ref_mount import mount_reference_tasks

    mount_reference_tasks()


def _nchw(x):
    import torch

    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _randomize(module, scale=0.05, seed=0):
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            # requires_grad=False params are structural constants
            # (D-FINE ``up`` / ``reg_scale``) — leave them exact.
            if p.ndim >= 1 and p.requires_grad:
                p.add_(torch.randn_like(p) * scale)
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.add_(torch.rand_like(b) * 0.5)
            elif name.endswith("running_mean"):
                b.add_(torch.randn_like(b) * 0.1)


D = 16
CSP = 3
LEVELS = [(8, 8), (4, 4), (2, 2)]


def test_hybrid_encoder_golden():
    _mount()
    import torch
    from lightly_train._task_models.object_detection_components.hybrid_encoder import (  # noqa: E501
        HybridEncoder as TorchHybridEncoder,
    )

    from lightly_train_tpu.tasks.detection.components import (
        DetrConfig,
        HybridEncoder,
    )

    in_ch = [12, 24, 48]
    ref = TorchHybridEncoder(
        upsample=True,
        in_channels=in_ch,
        feat_strides=[8, 16, 32],
        hidden_dim=D,
        nhead=2,
        dim_feedforward=32,
        dropout=0.0,
        enc_act="gelu",
        use_encoder_idx=[2],
        num_encoder_layers=1,
        expansion=1.0,
        depth_mult=1.0,
        act="silu",
    )
    _randomize(ref)
    ref.eval()

    rng = np.random.default_rng(0)
    feats = [
        rng.standard_normal((2, h, w, c)).astype(np.float32)
        for (h, w), c in zip(LEVELS, in_ch)
    ]
    with torch.no_grad():
        ref_out = ref([_nchw(f) for f in feats])

    from lightly_train_tpu.tasks.detection.convert import (
        convert_torch_hybrid_encoder_state_dict,
    )

    sd = ref.state_dict()
    p, s = convert_torch_hybrid_encoder_state_dict(
        sd, prefix="", num_levels=3, csp_blocks=CSP
    )
    cfg = DetrConfig(
        d_model=D, num_heads=2, enc_dim_feedforward=32, csp_blocks=CSP
    )
    mod = HybridEncoder(cfg)
    out = mod.apply(
        {"params": p, "batch_stats": s},
        [jnp.asarray(f) for f in feats],
        train=False,
    )
    for lvl, (ours, theirs) in enumerate(zip(out, ref_out)):
        np.testing.assert_allclose(
            np.asarray(ours),
            _to_nhwc(theirs),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"level {lvl}",
        )


def _torch_dfine(num_classes=5, num_layers=2, reg_max=8):
    from lightly_train._task_models.object_detection_components.dfine_decoder import (  # noqa: E501
        DFINETransformer,
    )

    return DFINETransformer(
        num_classes=num_classes,
        hidden_dim=D,
        num_queries=10,
        feat_channels=[D, D, D],
        feat_strides=[8, 16, 32],
        num_levels=3,
        num_points=[3, 6, 3],
        nhead=2,
        num_layers=num_layers,
        dim_feedforward=32,
        num_denoising=0,
        eval_idx=-1,
        reg_max=reg_max,
        reg_scale=4.0,
        layer_scale=1,
    )


def _flax_dfine_cfg(num_classes=5, num_layers=2, reg_max=8):
    from lightly_train_tpu.tasks.detection.components import DetrConfig

    return DetrConfig(
        d_model=D,
        num_heads=2,
        num_points=(3, 6, 3),
        num_queries=10,
        num_decoder_layers=num_layers,
        dim_feedforward=32,
        num_classes=num_classes,
        use_dfine=True,
        dfine_bins=reg_max + 1,
    )


def test_dfine_transformer_golden_train_mode():
    _mount()
    import torch

    from lightly_train_tpu.tasks.detection.components import DETRDecoder
    from lightly_train_tpu.tasks.detection.convert import (
        convert_torch_dfine_decoder_state_dict,
    )

    ref = _torch_dfine()
    _randomize(ref)
    ref.train()

    rng = np.random.default_rng(1)
    feats = [
        rng.standard_normal((2, h, w, D)).astype(np.float32)
        for (h, w) in LEVELS
    ]
    with torch.no_grad():
        ref_out = ref([_nchw(f) for f in feats], targets=None)

    p, _s = convert_torch_dfine_decoder_state_dict(
        ref.state_dict(), prefix=""
    )
    mod = DETRDecoder(_flax_dfine_cfg())
    outputs, aux = mod.apply(
        {"params": p},
        [jnp.asarray(f) for f in feats],
        train=True,
        mutable=["intermediates"],
    )
    # outputs: [enc, pre, layer0, layer1]; torch training dict:
    #   enc_aux_outputs[0], pre_outputs, aux_outputs[0], (final)
    pairs = [
        (outputs[0], ref_out["enc_aux_outputs"][0], "enc"),
        (outputs[1], ref_out["pre_outputs"], "pre"),
        (outputs[2], ref_out["aux_outputs"][0], "layer0"),
        (
            outputs[3],
            {
                "pred_logits": ref_out["pred_logits"],
                "pred_boxes": ref_out["pred_boxes"],
            },
            "final",
        ),
    ]
    for (lg, bx), refd, tag in pairs:
        np.testing.assert_allclose(
            np.asarray(lg),
            refd["pred_logits"].detach().numpy(),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"{tag} logits",
        )
        np.testing.assert_allclose(
            np.asarray(bx),
            refd["pred_boxes"].detach().numpy(),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"{tag} boxes",
        )
    # FDR internals: final-layer corner logits + the fixed anchor.
    dists = jax.tree.leaves(
        aux["intermediates"], is_leaf=lambda x: isinstance(x, tuple)
    )
    # sown as a tuple-of-tuples under decoder scope
    found = []

    def walk(node):
        if isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            if (
                len(node) == 2
                and hasattr(node[0], "shape")
                and node[0].ndim == 4
            ):
                found.append(node)
            else:
                for v in node:
                    walk(v)

    walk(aux["intermediates"])
    assert len(found) == 2
    corners_last, anchor = found[-1]
    np.testing.assert_allclose(
        np.asarray(corners_last).reshape(2, 10, -1),
        ref_out["pred_corners"].detach().numpy(),
        rtol=2e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(anchor),
        ref_out["ref_points"].detach().numpy(),
        rtol=2e-4,
        atol=2e-4,
    )


def test_dfine_transformer_golden_eval_mode():
    _mount()
    import torch

    from lightly_train_tpu.tasks.detection.components import DETRDecoder
    from lightly_train_tpu.tasks.detection.convert import (
        convert_torch_dfine_decoder_state_dict,
    )

    ref = _torch_dfine()
    _randomize(ref, seed=3)
    ref.eval()

    rng = np.random.default_rng(2)
    feats = [
        rng.standard_normal((2, h, w, D)).astype(np.float32)
        for (h, w) in LEVELS
    ]
    with torch.no_grad():
        ref_out = ref([_nchw(f) for f in feats], targets=None)

    p, _s = convert_torch_dfine_decoder_state_dict(
        ref.state_dict(), prefix=""
    )
    mod = DETRDecoder(_flax_dfine_cfg())
    outputs = mod.apply(
        {"params": p}, [jnp.asarray(f) for f in feats], train=False
    )
    lg, bx = outputs[-1]
    np.testing.assert_allclose(
        np.asarray(lg),
        ref_out["pred_logits"].detach().numpy(),
        rtol=2e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(bx),
        ref_out["pred_boxes"].detach().numpy(),
        rtol=2e-4,
        atol=2e-4,
    )


def test_dinostas_golden():
    _mount()
    import importlib

    import torch

    vt = importlib.import_module(
        "lightly_train._models.dinov2_vit.dinov2_vit_src.models."
        "vision_transformer"
    )
    wrap_mod = importlib.import_module(
        "lightly_train._models.dinov2_vit.dinov2_vit"
    )
    sta_mod = importlib.import_module(
        "lightly_train._task_models.ltdetr_object_detection."
        "dino_vit_wrapper"
    )

    torch.manual_seed(0)
    backbone = vt._vit_test(patch_size=14, init_values=1e-5, img_size=224)
    with torch.no_grad():
        for p in backbone.parameters():
            if p.ndim >= 1:
                p.add_(torch.randn_like(p) * 0.02)
    ref = sta_mod.DINOSTAs(
        model_wrapper=wrap_mod.DINOv2ViTModelWrapper(backbone),
        interaction_indexes=[0, 1, 2],
        finetune=True,
        use_sta=True,
        conv_inplane=4,
        hidden_dim=D,
        project_features=True,
    )
    _randomize(ref, seed=5)
    ref.eval()

    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_nchw(img))

    from lightly_train_tpu.models.vit import ViTConfig, VisionTransformer
    from lightly_train_tpu.tasks.detection.backbone_adapter import DINOSTAs
    from lightly_train_tpu.tasks.detection.convert import (
        convert_torch_dinostas_state_dict,
    )

    trunk_p, sta_p, sta_s = convert_torch_dinostas_state_dict(
        ref.state_dict(), prefix=""
    )
    cfg = ViTConfig(
        patch_size=14,
        embed_dim=8,
        depth=3,
        num_heads=2,
        mlp_ratio=1.0,
        layerscale_init=1e-5,
        norm_eps=1e-6,
        pos_embed_size=16,
    )
    trunk = VisionTransformer(cfg)
    tout = trunk.apply(
        {"params": trunk_p}, jnp.asarray(img), train=False,
        tap_indices=(0, 1, 2),
    )
    adapter = DINOSTAs(hidden_dim=D, use_sta=True, conv_inplane=4)
    out = adapter.apply(
        {"params": sta_p, "batch_stats": sta_s},
        jnp.asarray(img),
        tout["taps"],
        train=False,
    )
    for lvl, (ours, theirs) in enumerate(zip(out, ref_out)):
        np.testing.assert_allclose(
            np.asarray(ours),
            _to_nhwc(theirs),
            rtol=3e-4,
            atol=3e-4,
            err_msg=f"level {lvl}",
        )
