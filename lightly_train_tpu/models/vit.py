"""DINOv2/DINOv3-style Vision Transformer in Flax.

TPU-native rebuild of the vendored Meta backbones
(``src/lightly_train/_models/dinov2_vit/dinov2_vit_src/models/vision_transformer.py:83-585``
and ``_models/dinov3/dinov3_src/models/vision_transformer.py``): CLS + register
tokens, learnable mask token for iBOT masking, interpolatable position
embeddings, LayerScale, per-sample stochastic depth, optional 2-D axial RoPE
(DINOv3) and SwiGLU FFN, and ``get_intermediate_layers`` for multi-scale
feature taps.

Design differences from the torch source (TPU-first, not a translation):
- channels-last (B, H, W, C) inputs; patchify is a strided conv XLA maps to
  the MXU.
- masking takes a fixed-shape (B, N) bool mask (no ragged index_select).
- attention runs in a VMEM-resident Pallas kernel on single-chip TPU for
  short sequences (``ops/pallas/attention.py``: flat (B, N, D) layout, zero
  copies) and falls back to ``jax.nn.dot_product_attention`` elsewhere
  (CPU, multi-chip GSPMD, masked attention, long sequences).
- no FSDP block chunking: parameter sharding is a GSPMD decision outside the
  module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Architecture hyperparameters. Factory presets in ``vit_presets``."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    layerscale_init: Optional[float] = 1e-5
    drop_path_rate: float = 0.0
    use_rope: bool = False
    rope_base: float = 100.0
    use_swiglu: bool = False
    # SwiGLU hidden = int(mlp_ratio*D*2/3) padded up to this multiple
    # (DINOv3 ffn_layer "swiglu"=8, "swiglu64"=64; ``ffn_layers.py:71-72``).
    swiglu_align: int = 8
    qkv_bias: bool = True
    # DINOv3 masks the k-projection bias to zero (``attention.py:37-53``
    # LinearKMaskedBias); here k simply has no bias parameter.
    mask_k_bias: bool = False
    proj_bias: bool = True
    ffn_bias: bool = True
    # DINOv3 has no learned position embedding (RoPE only).
    use_pos_embed: bool = True
    # LayerNorm epsilon: DINOv2 "layernorm" 1e-6; DINOv3 "layernormbf16" 1e-5
    # (``dinov3_src/models/vision_transformer.py:43-46``).
    norm_eps: float = 1e-6
    # Base grid the learned pos-embed is stored at (DINOv2: 518/14=37;
    # we store at 224/patch and interpolate).
    pos_embed_size: int = 16
    # Rematerialize every Nth block (0 = off) — jax.checkpoint analog of the
    # reference's every-N-blocks activation checkpointing
    # (``_activation_checkpointing.py:20-43``).
    remat_every: int = 0
    # jax.checkpoint_policies name for remat blocks (None = save nothing).
    # "dots_saveable" keeps matmul outputs and recomputes elementwise
    # (GELU/LN) in backward — halves MLP activation HBM traffic for ~0 extra
    # MXU work.
    remat_policy: Optional[str] = None
    # MLP activation: "gelu" (DINOv2/v3) or "silu" (ECViT blocks,
    # ``ecvit.py`` Block act_layer=nn.SiLU).
    mlp_act: str = "gelu"
    dtype: Any = jnp.float32  # compute dtype (bf16 for training)


def _torch_bicubic_matrix(
    out_size: int, in_size: int, offset: float = 0.1
) -> jax.Array:
    """(out, in) resampling matrix matching torch ``F.interpolate`` bicubic.

    Reproduces the reference's pos-embed resampling EXACTLY
    (``vision_transformer.py:265-300``): cubic convolution with A = -0.75
    (torch's kernel; jax.image.resize uses Keys A = -0.5), NO antialiasing,
    align_corners=False, and the historical ``interpolate_offset=0.1``
    kludge — torch receives ``scale_factor=(g+0.1)/G`` and computes source
    coords with that scale rather than out/in. Static per (out, in) pair, so
    the resample is one small matmul.
    """
    scale = in_size / (out_size + offset)
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    t = (x - x0)[:, None]  # fractional offset per output pixel

    def cubic(d: np.ndarray, a: float = -0.75) -> np.ndarray:
        d = np.abs(d)
        return np.where(
            d <= 1.0,
            ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0,
            np.where(
                d < 2.0,
                (((d - 5.0) * d + 8.0) * d - 4.0) * a,
                0.0,
            ),
        )

    # 4 taps at x0-1..x0+2, edge-clamped like torch's upsample_bicubic2d.
    mat = np.zeros((out_size, in_size), np.float32)
    for k in range(-1, 3):
        w = cubic(t[:, 0] - k)
        idx = np.clip(x0 + k, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), idx), w.astype(np.float32))
    return jnp.asarray(mat)


def interpolate_pos_embed(
    pos_embed: jax.Array, grid_hw: Tuple[int, int]
) -> jax.Array:
    """Resample a (1, gh0*gw0, D) pos-embed grid to ``grid_hw``.

    Rebuild of ``interpolate_pos_encoding`` (``vision_transformer.py:265``)
    with static target shapes (one compiled program per input resolution)
    and torch-exact bicubic weights (see :func:`_torch_bicubic_matrix`) —
    multi-crop training resamples the pos embed on EVERY forward, so kernel
    parity here is trajectory parity.
    """
    n = pos_embed.shape[1]
    g0 = int(round(n**0.5))
    gh, gw = grid_hw
    if (g0, g0) == (gh, gw):
        return pos_embed
    p = pos_embed.astype(jnp.float32).reshape(1, g0, g0, -1)
    ry = _torch_bicubic_matrix(gh, g0)
    rx = _torch_bicubic_matrix(gw, g0)
    # Tiny matmuls on a parity-critical table: force full f32 (the default
    # precision runs f32 contractions in bf16 passes, ~1e-2 error).
    p = jnp.einsum("oh,bhwd->bowd", ry, p, precision="highest")
    p = jnp.einsum("xw,bowd->boxd", rx, p, precision="highest")
    return p.reshape(1, gh * gw, -1).astype(pos_embed.dtype)


def _rope_angles(
    grid_hw: Tuple[int, int], head_dim: int, base: float
) -> Tuple[jax.Array, jax.Array]:
    """2-D axial RoPE cos/sin tables for a (gh, gw) patch grid.

    Rebuild of DINOv3 RoPE (``dinov3_src/.../rope_position_encoding.py:62-117``
    with ``normalize_coords="separate"``): half the head dim rotates with the
    y coordinate, half with x; coordinates normalized to [-1, 1]; angle =
    2*pi*coord/period with periods base**(i/(D/4)). Train-time coordinate
    shift/jitter/rescale augmentations are eval-irrelevant and omitted.
    """
    import math

    import numpy as np

    gh, gw = grid_hw
    dim_quarter = head_dim // 4
    # Tables are static per (grid, head_dim, base): build them on the host
    # in numpy float32 replicating the torch op sequence bit-for-bit
    # (``rope_position_encoding.py:62-131``: periods = base**(2i/(D/2)),
    # angles = 2*pi*coords / periods — the former jnp formulation computed
    # base**(-i/q) and multiplied, which lands ~12 ulp away; at realistic
    # q/k magnitudes that table error amplifies to ~1e-3 on the attention
    # output vs the torch reference).
    periods = np.float32(base) ** (
        np.float32(2)
        * np.arange(dim_quarter, dtype=np.float32)
        / np.float32(dim_quarter * 2)
    )
    ys = (
        np.arange(0.5, gh, dtype=np.float32) / np.float32(gh)
    ) * np.float32(2) - np.float32(1)
    xs = (
        np.arange(0.5, gw, dtype=np.float32) / np.float32(gw)
    ) * np.float32(2) - np.float32(1)
    two_pi = np.float32(2 * math.pi)
    ang_y = (two_pi * ys)[:, None] / periods[None, :]  # (gh, dq)
    ang_x = (two_pi * xs)[:, None] / periods[None, :]  # (gw, dq)
    ang = np.concatenate(
        [
            np.broadcast_to(ang_y[:, None, :], (gh, gw, dim_quarter)),
            np.broadcast_to(ang_x[None, :, :], (gh, gw, dim_quarter)),
        ],
        axis=-1,
    ).reshape(gh * gw, head_dim // 2)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs: x (..., N, H, D) with tables (N, D/2)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos_b = cos[None, :, None, :]
    sin_b = sin[None, :, None, :]
    return jnp.concatenate(
        [x1 * cos_b - x2 * sin_b, x1 * sin_b + x2 * cos_b], axis=-1
    )


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerScale(nn.Module):
    init_value: float
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class Attention(nn.Module):
    cfg: ViTConfig
    num_prefix_tokens: int  # cls + registers — excluded from RoPE

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rope: Optional[Tuple[jax.Array, jax.Array]],
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        B, N, D = x.shape
        H = cfg.num_heads
        head_dim = D // H
        # Separate q/k/v projections: the fused (B,N,3,H,hd) layout costs a
        # strided axis-2 split (~5% of the step in data-formatting copies on
        # v5e); three D->D matmuls followed by free contiguous reshapes keep
        # the MXU busy with zero copies. Converter splits torch's fused qkv
        # weight rows accordingly (models/convert.py).
        q = nn.Dense(D, use_bias=cfg.qkv_bias, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(
            D,
            use_bias=cfg.qkv_bias and not cfg.mask_k_bias,
            dtype=cfg.dtype,
            name="k",
        )(x)
        v = nn.Dense(D, use_bias=cfg.qkv_bias, dtype=cfg.dtype, name="v")(x)
        if rope is not None:
            # (B,N,D) <-> (B,N,H,hd) reshapes are free (no transpose); RoPE
            # itself is elementwise + an in-head half-swap (lane shuffle).
            cos, sin = rope
            p = self.num_prefix_tokens
            q = q.reshape(B, N, H, head_dim)
            k = k.reshape(B, N, H, head_dim)
            q = jnp.concatenate(
                [q[:, :p], _apply_rope(q[:, p:], cos, sin)], axis=1
            ).reshape(B, N, D)
            k = jnp.concatenate(
                [k[:, :p], _apply_rope(k[:, p:], cos, sin)], axis=1
            ).reshape(B, N, D)
        # attn_mask: bool, broadcastable to (B, num_heads, Tq, Tk).
        # Unmasked backbone attention runs in the flat-layout VMEM-resident
        # Pallas kernel on TPU (ops/pallas/attention.py): it consumes the
        # (B, N, D) Dense outputs directly, so there are ZERO layout copies
        # between the projections, the kernel, and the output projection
        # (proj+attn+proj fwd 0.925 ms vs 1.440 ms for transpose+(B,H,N,hd)
        # kernel at ViT-B global shapes on v5e). Masked attention (EoMT
        # annealing) keeps the XLA path.
        from lightly_train_tpu.ops.pallas.attention import (
            fits_vmem,
            flat_attention,
            use_vmem_attention,
        )

        if attn_mask is None and use_vmem_attention() and fits_vmem(N):
            out = flat_attention(q, k, v, H)
        else:
            out = jax.nn.dot_product_attention(
                q.reshape(B, N, H, head_dim),
                k.reshape(B, N, H, head_dim),
                v.reshape(B, N, H, head_dim),
                mask=attn_mask,
            ).reshape(B, N, D)
        return nn.Dense(D, use_bias=cfg.proj_bias, dtype=cfg.dtype, name="proj")(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        D = x.shape[-1]
        hidden = int(D * cfg.mlp_ratio)
        if cfg.use_swiglu:
            # DINOv3 SwiGLU FFN sizing (``ffn_layers.py:71-72``): 2/3 of the
            # MLP hidden, padded up to swiglu_align. Separate w1/w2 matmuls
            # (not a fused w12 + strided split — same copy-avoidance as the
            # q/k/v projections); converter splits DINOv2's fused w12.
            d = int(2 * hidden / 3)
            hidden = d + (-d % cfg.swiglu_align)
            x1 = nn.Dense(
                hidden, use_bias=cfg.ffn_bias, dtype=cfg.dtype, name="w1"
            )(x)
            x2 = nn.Dense(
                hidden, use_bias=cfg.ffn_bias, dtype=cfg.dtype, name="w2"
            )(x)
            x = nn.silu(x1) * x2
            return nn.Dense(D, use_bias=cfg.ffn_bias, dtype=cfg.dtype, name="w3")(x)
        x = nn.Dense(hidden, use_bias=cfg.ffn_bias, dtype=cfg.dtype, name="fc1")(x)
        x = nn.silu(x) if cfg.mlp_act == "silu" else nn.gelu(x, approximate=False)
        return nn.Dense(D, use_bias=cfg.ffn_bias, dtype=cfg.dtype, name="fc2")(x)


class Block(nn.Module):
    cfg: ViTConfig
    drop_path: float
    num_prefix_tokens: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rope: Optional[Tuple[jax.Array, jax.Array]],
        deterministic: bool,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        D = x.shape[-1]
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="norm1")(x)
        h = Attention(cfg, self.num_prefix_tokens, name="attn")(h, rope, attn_mask)
        if cfg.layerscale_init is not None:
            h = LayerScale(cfg.layerscale_init, D, name="ls1")(h)
        x = x + DropPath(self.drop_path, name="dp1")(h, deterministic)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="norm2")(x)
        h = Mlp(cfg, name="mlp")(h)
        if cfg.layerscale_init is not None:
            h = LayerScale(cfg.layerscale_init, D, name="ls2")(h)
        x = x + DropPath(self.drop_path, name="dp2")(h, deterministic)
        return x


class VisionTransformer(nn.Module):
    """ViT trunk returning cls token, patch tokens, and the feature map.

    ``__call__(images, mask=None, train=False)`` where images is
    (B, H, W, 3) and mask an optional (B, N) bool of patches to replace with
    the learned mask token (iBOT student path, ``vision_transformer.py:201``).
    """

    cfg: ViTConfig

    @property
    def num_prefix_tokens(self) -> int:
        return 1 + self.cfg.num_register_tokens

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        tap_indices: Optional[Tuple[int, ...]] = None,
    ) -> dict[str, jax.Array]:
        """``tap_indices`` requests ``get_intermediate_layers``-equivalent
        multi-scale features (reference ``vision_transformer.py:351-385``,
        ``norm=True``): the returned ``out["taps"]`` holds one
        (B, gh, gw, D) final-norm-applied patch-token map per index."""
        cfg = self.cfg
        B, H, W, _ = images.shape
        gh, gw = H // cfg.patch_size, W // cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            name="patch_embed",
        )(images.astype(cfg.dtype))
        x = x.reshape(B, gh * gw, cfg.embed_dim)  # (B, N, D)

        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (cfg.embed_dim,)
        )
        if mask is not None:
            x = jnp.where(
                mask[:, :, None], mask_token.astype(x.dtype)[None, None, :], x
            )

        if cfg.use_pos_embed:
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=0.02),
                (1, cfg.pos_embed_size * cfg.pos_embed_size, cfg.embed_dim),
            )
            x = x + interpolate_pos_embed(pos_embed, (gh, gw)).astype(x.dtype)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, cfg.embed_dim)
        )
        tokens = [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(x.dtype)]
        if cfg.num_register_tokens > 0:
            registers = self.param(
                "register_tokens",
                nn.initializers.normal(stddev=0.02),
                (1, cfg.num_register_tokens, cfg.embed_dim),
            )
            tokens.append(
                jnp.broadcast_to(
                    registers, (B, cfg.num_register_tokens, cfg.embed_dim)
                ).astype(x.dtype)
            )
        x = jnp.concatenate(tokens + [x], axis=1)

        rope = None
        if cfg.use_rope:
            head_dim = cfg.embed_dim // cfg.num_heads
            cos, sin = _rope_angles((gh, gw), head_dim, cfg.rope_base)
            rope = (cos.astype(cfg.dtype), sin.astype(cfg.dtype))

        dp_rates = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        intermediates = []
        remat_kwargs = {}
        if cfg.remat_policy is not None:
            remat_kwargs["policy"] = getattr(
                jax.checkpoint_policies, cfg.remat_policy
            )
        for i in range(cfg.depth):
            block_cls = Block
            if cfg.remat_every and i % cfg.remat_every == 0:
                # Trade FLOPs for activation memory on this block.
                block_cls = nn.remat(Block, static_argnums=(2,), **remat_kwargs)
            x = block_cls(
                cfg,
                drop_path=dp_rates[i],
                num_prefix_tokens=self.num_prefix_tokens,
                name=f"block{i}",
            )(x, rope, not train)
            intermediates.append(x)
        self.sow("intermediates", "blocks", intermediates)

        final_norm = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, name="norm"
        )
        x = final_norm(x)
        p = self.num_prefix_tokens
        cls_out = x[:, 0]
        patch_tokens = x[:, p:]
        out = {
            "cls_token": cls_out,
            "patch_tokens": patch_tokens,
            "features": patch_tokens.reshape(B, gh, gw, cfg.embed_dim),
            "register_tokens": x[:, 1:p],
        }
        if tap_indices is not None:
            out["taps"] = [
                final_norm(intermediates[i])[:, p:].reshape(
                    B, gh, gw, cfg.embed_dim
                )
                for i in tap_indices
            ]
        return out


# ---------------------------------------------------------------------------
# Presets matching the reference model zoo names
# (``dinov2_vit_package.py:46-131``, ``dinov3_package.py:240-428``).
# ---------------------------------------------------------------------------

_SIZES = {
    # name: (embed_dim, depth, num_heads)  — DINOv2 family
    "vitt": (192, 12, 3),
    "vits": (384, 12, 6),
    "vitb": (768, 12, 12),
    "vitl": (1024, 24, 16),
    "vitg": (1536, 40, 24),
    "vit7b": (4096, 40, 32),
    # tiny test model (reference _vit_test, ``vision_transformer.py:574``)
    "vittest": (32, 2, 2),
}

# DINOv3 hub presets (``dinov3_src/hub/backbones.py:262-646``):
# size: (embed_dim, depth, num_heads, ffn_ratio, use_swiglu, swiglu_align,
#        qkv_bias). All use 4 storage tokens, masked k bias, LayerNorm
# eps 1e-5 ("layernormbf16"), LayerScale 1e-5, RoPE base 100.
_DINOV3_SIZES = {
    "vitt": (192, 12, 3, 4.0, False, 8, True),
    "vittplus": (192, 12, 3, 6.0, False, 8, True),
    "vits": (384, 12, 6, 4.0, False, 8, True),
    "vitsplus": (384, 12, 6, 6.0, True, 8, True),
    "vitb": (768, 12, 12, 4.0, False, 8, True),
    "vitl": (1024, 24, 16, 4.0, False, 8, True),
    "vitlplus": (1024, 24, 16, 6.0, True, 8, True),
    "vithplus": (1280, 32, 20, 6.0, True, 8, True),
    "vit7b": (4096, 40, 32, 3.0, True, 64, False),
    "vittest": (32, 2, 2, 4.0, False, 8, True),
}


def vit_config(
    size: str,
    patch_size: int,
    *,
    flavor: str = "dinov2",
    dtype: Any = jnp.float32,
    drop_path_rate: float = 0.0,
    remat_every: int = 0,
    remat_policy: Optional[str] = None,
) -> ViTConfig:
    """Build a ViTConfig for a reference-parity model name.

    flavor "dinov2": learned pos-embed, no registers, MLP FFN, LN eps 1e-6.
    flavor "dinov3": 4 storage/register tokens, axial RoPE (no learned
    pos-embed), masked k bias, LN eps 1e-5, SwiGLU on the "plus"/7b sizes —
    exactly the hub presets (``dinov3_src/hub/backbones.py``).
    """
    if flavor == "dinov3":
        if size not in _DINOV3_SIZES:
            raise ValueError(
                f"Unknown DINOv3 size '{size}'. Options: {sorted(_DINOV3_SIZES)}"
            )
        embed_dim, depth, num_heads, ratio, swiglu, align, qkv_bias = (
            _DINOV3_SIZES[size]
        )
        return ViTConfig(
            patch_size=patch_size,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            mlp_ratio=ratio,
            num_register_tokens=4,
            use_rope=True,
            use_swiglu=swiglu,
            swiglu_align=align,
            qkv_bias=qkv_bias,
            mask_k_bias=True,
            use_pos_embed=False,
            norm_eps=1e-5,
            pos_embed_size=224 // patch_size,
            drop_path_rate=drop_path_rate,
            remat_every=remat_every,
            remat_policy=remat_policy,
            dtype=dtype,
        )
    if size not in _SIZES:
        raise ValueError(f"Unknown ViT size '{size}'. Options: {sorted(_SIZES)}")
    embed_dim, depth, num_heads = _SIZES[size]
    return ViTConfig(
        patch_size=patch_size,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        use_swiglu=size == "vitg",  # DINOv2 giant2 uses SwiGLUFFNFused (align 8)
        pos_embed_size=224 // patch_size,
        drop_path_rate=drop_path_rate,
        remat_every=remat_every,
        remat_policy=remat_policy,
        dtype=dtype,
    )
