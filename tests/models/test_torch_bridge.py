"""torch.export -> JAX bridge parity vs live torch.

The bridge is the rebuild's answer to the reference's "wrap any torch
model" packages (timm ``features_only``: ``_models/timm/timm.py``;
ultralytics: ``_models/ultralytics/ultralytics.py:57-235``). Every test
runs the SAME torch module through torch (oracle) and through the bridge
(JAX on the virtual mesh host platform) and compares numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from lightly_train_tpu.models.torch_bridge import (
    TorchBridged,
    TorchGraphSource,
    bridge_torch_module,
    wrap_torch_module,
)


def _np(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


def _assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b, atol=atol, rtol=rtol)


class SmallCNN(nn.Module):
    """conv/bn/silu/maxpool/avgpool/groups/depthwise/adaptive/fc."""

    def __init__(self) -> None:
        super().__init__()
        torch.manual_seed(0)
        self.stem = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.bn1 = nn.BatchNorm2d(16)
        self.dw = nn.Conv2d(16, 16, 3, padding=1, groups=16)
        self.bn2 = nn.BatchNorm2d(16)
        self.pw = nn.Conv2d(16, 24, 1)
        self.gn = nn.GroupNorm(4, 24)
        self.pool = nn.MaxPool2d(3, stride=2, padding=1)
        self.head = nn.Linear(24, 10)

    def forward(self, x):
        x = F.silu(self.bn1(self.stem(x)))
        x = F.hardswish(self.bn2(self.dw(x)))
        x = self.gn(self.pw(x))
        x = self.pool(x)
        feats = x
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.head(x), feats


class TinyViT(nn.Module):
    """patchify/cls/pos/sdpa/layernorm/gelu/chunk/permute."""

    def __init__(self, d=32, h=4, depth=2) -> None:
        super().__init__()
        torch.manual_seed(1)
        self.patch = nn.Conv2d(3, d, 4, 4)
        self.cls = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos = nn.Parameter(torch.randn(1, 17, d) * 0.02)
        self.norms1 = nn.ModuleList([nn.LayerNorm(d) for _ in range(depth)])
        self.norms2 = nn.ModuleList([nn.LayerNorm(d) for _ in range(depth)])
        self.qkvs = nn.ModuleList([nn.Linear(d, 3 * d) for _ in range(depth)])
        self.projs = nn.ModuleList([nn.Linear(d, d) for _ in range(depth)])
        self.fc1s = nn.ModuleList([nn.Linear(d, 4 * d) for _ in range(depth)])
        self.fc2s = nn.ModuleList([nn.Linear(4 * d, d) for _ in range(depth)])
        self.norm = nn.LayerNorm(d)
        self.h = h

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(x.shape[0], -1, -1), x], 1) + self.pos
        for n1, n2, qkv, proj, fc1, fc2 in zip(
            self.norms1, self.norms2, self.qkvs, self.projs, self.fc1s,
            self.fc2s,
        ):
            b, n, d = x.shape
            q, k, v = qkv(n1(x)).chunk(3, dim=-1)
            q = q.view(b, n, self.h, d // self.h).transpose(1, 2)
            k = k.view(b, n, self.h, d // self.h).transpose(1, 2)
            v = v.view(b, n, self.h, d // self.h).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, k, v)
            x = x + proj(o.transpose(1, 2).reshape(b, n, d))
            x = x + fc2(F.gelu(fc1(n2(x))))
        return self.norm(x)


def _bridge_eval(module, x_nchw, **kw):
    bridged = bridge_torch_module(module, **kw)
    x = jnp.asarray(_np(x_nchw))
    variables = bridged.init(
        {"params": jax.random.key(0)}, x, train=False
    )
    return bridged, variables, bridged.apply(variables, x, train=False)


class TestEvalParity:
    def test_cnn_forward(self):
        m = SmallCNN().eval()
        x = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            ref_logits, ref_feats = m(x)
        _, _, (logits, feats) = _bridge_eval(m, x, input_layout="NCHW")
        _assert_close(logits, _np(ref_logits), atol=2e-5)
        _assert_close(feats, _np(ref_feats), atol=2e-5)

    def test_vit_forward(self):
        m = TinyViT().eval()
        x = torch.randn(2, 3, 16, 16)
        with torch.no_grad():
            ref = m(x)
        _, _, out = _bridge_eval(m, x, input_layout="NCHW")
        _assert_close(out, _np(ref), atol=3e-5)

    def test_swin_flavored_ops(self):
        class SwinOps(nn.Module):
            def __init__(self):
                super().__init__()
                torch.manual_seed(2)
                self.bias_table = nn.Parameter(torch.randn(9, 4))
                idx = torch.randint(0, 9, (16, 16))
                self.register_buffer("bias_idx", idx)
                self.proj = nn.Linear(8, 8)

            def forward(self, x):  # (B, 8, 8, 8) NHWC-ish tokens
                x = torch.roll(x, shifts=(-1, -2), dims=(1, 2))
                b = x.shape[0]
                win = x.view(b, 2, 4, 2, 4, 8)
                win = win.permute(0, 1, 3, 2, 4, 5).reshape(-1, 16, 8)
                bias = self.bias_table[self.bias_idx.view(-1)].view(
                    16, 16, 4
                ).mean(-1)
                attn = torch.einsum("wnd,wmd->wnm", win, win)
                attn = attn + bias.unsqueeze(0)
                attn = attn.masked_fill(attn < -1.0, float("-inf"))
                attn = attn.softmax(dim=-1)
                out = torch.einsum("wnm,wmd->wnd", attn, win)
                return self.proj(out)

        m = SwinOps().eval()
        x = torch.randn(2, 8, 8, 8)
        with torch.no_grad():
            ref = m(x)
        bridged = bridge_torch_module(m, input_layout="raw")
        xj = jnp.asarray(_np(x))
        variables = bridged.init({"params": jax.random.key(0)}, xj)
        out = bridged.apply(variables, xj, train=False)
        _assert_close(out, _np(ref), atol=2e-5)

    @pytest.mark.parametrize("align_corners", [False, True])
    def test_interpolate_bilinear(self, align_corners):
        class Up(nn.Module):
            def forward(self, x):
                return F.interpolate(
                    x, size=(13, 9), mode="bilinear",
                    align_corners=align_corners,
                )

        m = Up().eval()
        x = torch.randn(2, 4, 7, 5)
        with torch.no_grad():
            ref = m(x)
        _, _, out = _bridge_eval(m, x, input_layout="NCHW")
        _assert_close(out, _np(ref), atol=2e-5)

    def test_interpolate_nearest_and_pads(self):
        class M(nn.Module):
            def forward(self, x):
                a = F.interpolate(x, scale_factor=2.0, mode="nearest")
                b = F.pad(x, (1, 2, 3, 0), mode="reflect")
                c = F.pad(x, (2, 2, 2, 2), mode="replicate")
                d = F.pad(x, (1, 1), value=0.5)
                return a, b, c, d

        m = M().eval()
        x = torch.randn(2, 3, 6, 6)
        with torch.no_grad():
            refs = m(x)
        _, _, outs = _bridge_eval(m, x, input_layout="NCHW")
        for o, r in zip(outs, refs):
            _assert_close(o, _np(r), atol=1e-6)

    def test_pool_edge_semantics(self):
        class M(nn.Module):
            def forward(self, x):
                a = F.max_pool2d(x, 3, stride=2, padding=1, ceil_mode=True)
                b = F.avg_pool2d(x, 3, stride=2, padding=1,
                                 count_include_pad=True)
                c = F.avg_pool2d(x, 3, stride=2, padding=1,
                                 count_include_pad=False)
                d = F.avg_pool2d(x, 2, stride=2, ceil_mode=True)
                e = F.adaptive_avg_pool2d(x, (3, 5))
                return a, b, c, d, e

        m = M().eval()
        x = torch.randn(2, 4, 11, 13)
        with torch.no_grad():
            refs = m(x)
        _, _, outs = _bridge_eval(m, x, input_layout="NCHW")
        for o, r in zip(outs, refs):
            _assert_close(o, _np(r), atol=2e-5)

    def test_conv_transpose_and_dilation(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                torch.manual_seed(3)
                self.up = nn.ConvTranspose2d(
                    8, 6, 4, stride=2, padding=1, output_padding=0
                )
                self.upg = nn.ConvTranspose2d(
                    8, 8, 3, stride=2, padding=1, output_padding=1, groups=2
                )
                self.dil = nn.Conv2d(8, 8, 3, padding=2, dilation=2)

            def forward(self, x):
                return self.up(x), self.upg(x), self.dil(x)

        m = M().eval()
        x = torch.randn(2, 8, 9, 9)
        with torch.no_grad():
            refs = m(x)
        _, _, outs = _bridge_eval(m, x, input_layout="NCHW")
        for o, r in zip(outs, refs):
            _assert_close(o, _np(r), atol=2e-5)


class TestTrainMode:
    def test_bn_train_updates_running_stats(self):
        m = SmallCNN()
        x = torch.randn(4, 3, 32, 32)
        bridged = bridge_torch_module(m, input_layout="NCHW")
        xj = jnp.asarray(_np(x))
        variables = bridged.init({"params": jax.random.key(0)}, xj)

        m.train()
        ref_logits, _ = m(x)  # mutates torch running stats in place

        (logits, _), updated = bridged.apply(
            variables, xj, train=True, mutable=["batch_stats"]
        )
        _assert_close(logits, _np(ref_logits), atol=2e-5)
        stats = updated["batch_stats"]
        _assert_close(
            stats["bn1.running_mean"], _np(m.bn1.running_mean), atol=1e-5
        )
        _assert_close(
            stats["bn1.running_var"], _np(m.bn1.running_var), atol=1e-5
        )
        assert int(stats["bn1.num_batches_tracked"]) == 1

    def test_dropout_uses_jax_prng(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc = nn.Linear(8, 8)
                self.drop = nn.Dropout(0.5)

            def forward(self, x):
                return self.drop(self.fc(x))

        m = M()
        bridged = bridge_torch_module(m, input_layout="raw")
        x = jnp.ones((4, 8))
        variables = bridged.init({"params": jax.random.key(0)}, x)
        out1 = bridged.apply(
            variables, x, train=True, rngs={"dropout": jax.random.key(1)}
        )
        out2 = bridged.apply(
            variables, x, train=True, rngs={"dropout": jax.random.key(2)}
        )
        out_eval = bridged.apply(variables, x, train=False)
        assert np.mean(np.asarray(out1) == 0) > 0.2  # some units dropped
        assert not np.allclose(np.asarray(out1), np.asarray(out2))
        assert np.all(np.isfinite(np.asarray(out_eval)))


class TestGradients:
    def test_grad_parity_vs_torch_autograd(self):
        m = TinyViT(depth=1).eval()
        x = torch.randn(2, 3, 16, 16, requires_grad=False)
        loss_t = m(x).square().mean()
        loss_t.backward()

        bridged = bridge_torch_module(m, input_layout="NCHW")
        xj = jnp.asarray(_np(x))
        variables = bridged.init({"params": jax.random.key(0)}, xj)

        def loss_fn(params):
            out = bridged.apply({"params": params}, xj, train=False)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
        _assert_close(loss_j, _np(loss_t), atol=1e-6)
        named = dict(m.named_parameters())
        for fqn in ["patch.weight", "qkvs.0.weight", "norm.weight", "cls"]:
            _assert_close(
                grads[fqn], _np(named[fqn].grad), atol=3e-5, rtol=1e-4
            )

    def test_grads_flow_through_bn_train(self):
        m = SmallCNN()
        bridged = bridge_torch_module(m, input_layout="NCHW")
        xj = jnp.asarray(np.random.RandomState(0).randn(4, 3, 32, 32)
                         .astype(np.float32))
        variables = bridged.init({"params": jax.random.key(0)}, xj)

        def loss_fn(params):
            (logits, _), _ = bridged.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xj, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(logits**2)

        grads = jax.grad(loss_fn)(variables["params"])
        g = np.asarray(grads["stem.weight"])
        assert np.isfinite(g).all() and np.abs(g).max() > 0


class TestWrappedModel:
    def test_wrap_torch_module_contract(self):
        class FeatureNet(nn.Module):
            def __init__(self):
                super().__init__()
                torch.manual_seed(4)
                self.c1 = nn.Conv2d(3, 8, 3, 2, 1)
                self.b1 = nn.BatchNorm2d(8)
                self.c2 = nn.Conv2d(8, 12, 3, 2, 1)

            def forward(self, x):
                return [self.b1(self.c1(x)).relu(), self.c2(
                    self.b1(self.c1(x)).relu()
                )]

        wrapped = wrap_torch_module(FeatureNet(), name="torch/featurenet")
        assert wrapped.feature_dim == 12
        sample = jnp.ones((2, 32, 32, 3))
        variables = wrapped.init(jax.random.key(0), sample)
        out = wrapped.forward_features(variables, sample)
        assert out["features"].shape == (2, 8, 8, 12)
        assert out["cls_token"].shape == (2, 12)
        pooled = wrapped.forward_pool(out)
        assert pooled.shape == (2, 12)

    def test_registry_accepts_torch_module(self):
        from lightly_train_tpu.models.package_registry import (
            get_wrapped_model,
        )

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(3, 6, 3, 2, 1)

            def forward(self, x):
                return self.c(x)

        wrapped = get_wrapped_model(Net())
        assert wrapped.feature_dim == 6
        assert wrapped.name.startswith("torch/")

    def test_shape_recompile_cache(self):
        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(3, 4, 3, 2, 1)

            def forward(self, x):
                return self.c(x)

        src = TorchGraphSource(Net())
        bridged = TorchBridged(source=src, feature_adapter=False,
                               input_layout="NCHW")
        x32 = jnp.ones((1, 3, 32, 32))
        x64 = jnp.ones((1, 3, 64, 64))
        variables = bridged.init({"params": jax.random.key(0)}, x32)
        o1 = bridged.apply(variables, x32, train=False)
        o2 = bridged.apply(variables, x64, train=False)
        assert o1.shape == (1, 4, 16, 16)
        assert o2.shape == (1, 4, 32, 32)
        assert len(src._cache) == 2
        bridged.apply(variables, x32, train=False)
        assert len(src._cache) == 2  # cache hit, no re-export


class TestRealReferenceModel:
    """Bridge the ACTUAL reference torch DINOv2 ViT (not a toy): proves the
    op registry covers a production ViT (LayerScale, register tokens,
    droppath, fused qkv attention) end to end."""

    def test_reference_dinov2_vit_bridges_and_matches(self):
        from tests.models.test_torch_golden import _load_reference_vit

        vt = _load_reference_vit()
        m = vt.DinoVisionTransformer(
            img_size=56,
            patch_size=14,
            embed_dim=64,
            depth=2,
            num_heads=2,
            num_register_tokens=4,
            init_values=1e-5,
        )
        m.eval()
        torch.manual_seed(5)
        for p in m.parameters():
            if p.ndim > 1:
                nn.init.normal_(p, std=0.02)
        x = torch.randn(2, 3, 56, 56)
        with torch.no_grad():
            ref = m.forward_features(x)

        class FeatureHead(nn.Module):
            """Export wrapper: forward_features returns a dict; expose the
            tensors torch.export can trace as outputs."""

            def __init__(self, inner):
                super().__init__()
                self.inner = inner

            def forward(self, img):
                out = self.inner.forward_features(img)
                return out["x_norm_clstoken"], out["x_norm_patchtokens"]

        bridged = bridge_torch_module(FeatureHead(m), input_layout="NCHW")
        xj = jnp.asarray(_np(x))
        variables = bridged.init({"params": jax.random.key(0)}, xj)
        cls_j, patch_j = bridged.apply(variables, xj, train=False)
        _assert_close(cls_j, _np(ref["x_norm_clstoken"]), atol=5e-5,
                      rtol=1e-4)
        _assert_close(patch_j, _np(ref["x_norm_patchtokens"]), atol=5e-5,
                      rtol=1e-4)
