"""VMEM-resident multi-head self-attention kernel for short sequences.

Vision transformers at LightlyTrain's scales run attention over a few hundred
tokens (224^2/14^2 + cls = 257 for ViT-B globals, 50 for 98^2 locals —
SURVEY.md §5.7: max ~4.1k). At these lengths XLA's attention materializes the
(B, H, N, N) score tensor in HBM — ~101 MB per ViT-B global layer, re-read by
softmax and the A@V matmul, which makes attention HBM-bound (measured 0.95 ms
vs a ~0.2 ms roofline on v5e).

FlashAttention-style streaming kernels do not help here: the stock Pallas TPU
flash kernel is 2.4-3.7x SLOWER at N=257 (block padding to 384/512 + per-grid
overhead over 768 tiny steps). The right TPU design for short N is simpler:
the ENTIRE (N, N) score matrix for one (batch, head) fits in VMEM, so the
kernel grids over batch blocks, keeps scores resident, and never writes them
to HBM. Softmax normalization (1/l) is folded into the small (N, hd) output
instead of the (N, N) probability matrix, and probabilities are cast to bf16
for the MXU A@V matmul.

Every in-kernel contraction pins ``precision=DEFAULT``: the operands are
already bf16 by design, and a global ``jax_default_matmul_precision=
"highest"`` (set e.g. by the test conftest for torch-parity numerics) would
otherwise reach Mosaic as an fp32-contraction-of-bf16 request, which fails
to compile ("Bad lhs type" on tpu.matmul).

Measured on TPU v5e (ViT-B/14 DINOv2 shapes, bf16):
  globals (64, 12, 257, 64): 0.21 ms vs 0.95 ms XLA  (4.6x)
  locals (256, 12, 50, 64):  0.24 ms vs 0.63 ms XLA  (2.7x)

The backward pass is the same idea (one VMEM pass recomputing scores from the
forward log-sum-exp, all five matmuls per head in-core).

Reference parity: this replaces the torch SDPA/xformers attention inside the
vendored DINOv2/v3 ViTs (``dinov2_vit_src/models/vision_transformer.py``,
``dinov3_src/models/vision_transformer.py``) on the TPU compute path.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lightly_train_tpu._env import Env

# Conservative VMEM budget for picking the batch block size (v5e has ~64 MB
# usable; leave room for double-buffered DMA and the compiler's scratch).
# Measured r3: 14 MB OOMs the backward kernel's scoped-vmem (18.9M > 16M
# limit at ViT-B bwd bb=2) — larger batch blocks need a restructured
# kernel, not a bigger budget.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _pick_block(B: int, H: int, N: int, hd: int, n_arrays: int) -> int:
    """Largest divisor of B whose I/O blocks (double-buffered) fit VMEM."""
    for bb in (8, 4, 2, 1):
        if B % bb:
            continue
        io = bb * H * N * hd * 2 * n_arrays * 2  # bf16, double-buffered
        scratch = 3 * (N * ((N + 383) // 384) * 384) * 4  # padded f32 scores
        if io + scratch <= _VMEM_BUDGET_BYTES:
            return bb
    return 1


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale, bb, H):
    for b in range(bb):
        for h in range(H):
            q = q_ref[b, h]
            k = k_ref[b, h]
            v = v_ref[b, h]
            s = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
                * sm_scale
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(jnp.bfloat16)
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot(p, v, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            o_ref[b, h] = (o / l).astype(o_ref.dtype)
            lse_ref[b, h] = (m + jnp.log(l))[:, 0]


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, sm_scale, bb, H,
):
    for b in range(bb):
        for h in range(H):
            q = q_ref[b, h]
            k = k_ref[b, h]
            v = v_ref[b, h]
            o = o_ref[b, h].astype(jnp.float32)
            do = do_ref[b, h].astype(jnp.float32)
            lse = lse_ref[b, h][:, None]
            s = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
                * sm_scale
            )
            p = jnp.exp(s - lse)  # (N, N) probabilities
            p16 = p.astype(jnp.bfloat16)
            do16 = do.astype(jnp.bfloat16)
            # dv = P^T @ do
            dv = jax.lax.dot_general(
                p16, do16, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            # dP = do @ v^T ; dS = P * (dP - rowsum(do * o)) * scale
            dp = jax.lax.dot_general(
                do16, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            delta = jnp.sum(do * o, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * sm_scale).astype(jnp.bfloat16)
            dq = jax.lax.dot(ds, k, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            dq_ref[b, h] = dq.astype(dq_ref.dtype)
            dk_ref[b, h] = dk.astype(dk_ref.dtype)
            dv_ref[b, h] = dv.astype(dv_ref.dtype)


def _attn_fwd_impl(q, k, v, sm_scale, interpret):
    B, H, N, hd = q.shape
    bb = _pick_block(B, H, N, hd, n_arrays=4)
    kern = functools.partial(_fwd_kernel, sm_scale=sm_scale, bb=bb, H=H)
    blk = lambda b: (b, 0, 0, 0)  # noqa: E731
    out, lse = pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, H, N, hd), blk)] * 3,
        out_specs=[
            pl.BlockSpec((bb, H, N, hd), blk),
            pl.BlockSpec((bb, H, N), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, hd), q.dtype),
            jax.ShapeDtypeStruct((B, H, N), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _attn_bwd_impl(q, k, v, o, do, lse, sm_scale, interpret):
    B, H, N, hd = q.shape
    bb = _pick_block(B, H, N, hd, n_arrays=8)
    kern = functools.partial(_bwd_kernel, sm_scale=sm_scale, bb=bb, H=H)
    blk = lambda b: (b, 0, 0, 0)  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, H, N, hd), blk)] * 5
        + [pl.BlockSpec((bb, H, N), lambda b: (b, 0, 0))],
        out_specs=[pl.BlockSpec((bb, H, N, hd), blk)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, H, N, hd), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, o, do, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _vmem_attention_bhnd(q, k, v, sm_scale, interpret):
    out, _ = _attn_fwd_impl(q, k, v, sm_scale, interpret)
    return out


def _vjp_fwd(q, k, v, sm_scale, interpret):
    out, lse = _attn_fwd_impl(q, k, v, sm_scale, interpret)
    return out, (q, k, v, out, lse)


def _vjp_bwd(sm_scale, interpret, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _attn_bwd_impl(q, k, v, out, do, lse, sm_scale, interpret)
    return dq, dk, dv


_vmem_attention_bhnd.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Flat-layout kernel: q/k/v as (B, N, D) with D = H*hd — the exact layout the
# q/k/v Dense projections produce. Heads are addressed with lane-axis blocks
# (hpb heads = hpb*hd lanes per block, contiguous in memory) plus in-kernel
# static lane slices, so NO transpose or data-formatting copy exists anywhere
# between the projections, the kernel, and the output projection. Although
# the in-kernel lane slicing makes the kernel itself ~2x slower than the
# (B,H,N,hd) variant above (0.44 ms vs 0.21 ms at ViT-B global shapes), the
# module-level win is decisive: proj+attn+proj fwd 0.925 ms flat vs 1.440 ms
# transpose+bhnd on v5e — layout churn dominated.
# ---------------------------------------------------------------------------


def _pick_flat_blocks(B: int, N: int, H: int, hd: int, n_arrays: int) -> tuple:
    """(bb, hpb): batch block and heads-per-block for the flat kernel.

    Prefer whole-H lane blocks (fully contiguous DMA); shrink the batch
    block until I/O + f32 score scratch fit the VMEM budget. ``n_arrays``
    is the number of (bb, N, lanes) blocks live at once (4 fwd, 8 bwd) —
    the backward pass OOMed the 16 MB scoped-vmem limit when sized with
    the forward's array count.
    """
    # hpb must be the FULL head count or a multiple of 8: the (bb, hpb, N)
    # lse block's second-minor dim hits Mosaic's sublane-tiling rule
    # (div-by-8 unless spanning the whole dim) — hpb=6 fails to lower.
    hpb_opts = [h for h in (H, 8, 16) if h <= H and H % h == 0]
    if not hpb_opts:
        hpb_opts = [H]
    for hpb in hpb_opts:
        lanes = hpb * hd
        for bb in (8, 4, 2, 1):
            if B % bb:
                continue
            io = bb * N * lanes * 2 * n_arrays * 2  # double-buffered bf16
            lse = bb * hpb * N * 4 * 2
            scratch = 3 * N * ((N + 383) // 384) * 384 * 4
            if io + lse + scratch <= _VMEM_BUDGET_BYTES:
                return bb, hpb
    return 1, 1


def _flat_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale, bb, hpb, hd):
    for b in range(bb):
        for hh in range(hpb):
            sl = slice(hh * hd, (hh + 1) * hd)
            q = q_ref[b, :, sl]
            k = k_ref[b, :, sl]
            v = v_ref[b, :, sl]
            s = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
                * sm_scale
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(jnp.bfloat16)
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot(p, v, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            o_ref[b, :, sl] = (o / l).astype(o_ref.dtype)
            lse_ref[b, hh] = (m + jnp.log(l))[:, 0]


def _flat_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, sm_scale, bb, hpb, hd,
):
    for b in range(bb):
        for hh in range(hpb):
            sl = slice(hh * hd, (hh + 1) * hd)
            q = q_ref[b, :, sl]
            k = k_ref[b, :, sl]
            v = v_ref[b, :, sl]
            o = o_ref[b, :, sl].astype(jnp.float32)
            do = do_ref[b, :, sl].astype(jnp.float32)
            lse = lse_ref[b, hh][:, None]
            s = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
                * sm_scale
            )
            p = jnp.exp(s - lse)
            p16 = p.astype(jnp.bfloat16)
            do16 = do.astype(jnp.bfloat16)
            dv = jax.lax.dot_general(
                p16, do16, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            dp = jax.lax.dot_general(
                do16, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            delta = jnp.sum(do * o, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * sm_scale).astype(jnp.bfloat16)
            dq = jax.lax.dot(ds, k, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            dq_ref[b, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, sl] = dv.astype(dv_ref.dtype)


def _flat_fwd_impl(q, k, v, num_heads, sm_scale, interpret):
    B, N, D = q.shape
    hd = D // num_heads
    bb, hpb = _pick_flat_blocks(B, N, num_heads, hd, n_arrays=4)
    kern = functools.partial(
        _flat_fwd_kernel, sm_scale=sm_scale, bb=bb, hpb=hpb, hd=hd
    )
    blk = lambda b, h: (b, 0, h)  # noqa: E731
    out, lse = pl.pallas_call(
        kern,
        grid=(B // bb, num_heads // hpb),
        in_specs=[pl.BlockSpec((bb, N, hpb * hd), blk)] * 3,
        out_specs=[
            pl.BlockSpec((bb, N, hpb * hd), blk),
            pl.BlockSpec((bb, hpb, N), lambda b, h: (b, h, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, num_heads, N), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _flat_bwd_impl(q, k, v, o, do, lse, num_heads, sm_scale, interpret):
    B, N, D = q.shape
    hd = D // num_heads
    bb, hpb = _pick_flat_blocks(B, N, num_heads, hd, n_arrays=8)
    kern = functools.partial(
        _flat_bwd_kernel, sm_scale=sm_scale, bb=bb, hpb=hpb, hd=hd
    )
    blk = lambda b, h: (b, 0, h)  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B // bb, num_heads // hpb),
        in_specs=[pl.BlockSpec((bb, N, hpb * hd), blk)] * 5
        + [pl.BlockSpec((bb, hpb, N), lambda b, h: (b, h, 0))],
        out_specs=[pl.BlockSpec((bb, N, hpb * hd), blk)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, N, D), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, o, do, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flat_attention_p(q, k, v, num_heads, sm_scale, interpret):
    out, _ = _flat_fwd_impl(q, k, v, num_heads, sm_scale, interpret)
    return out


def _flat_vjp_fwd(q, k, v, num_heads, sm_scale, interpret):
    out, lse = _flat_fwd_impl(q, k, v, num_heads, sm_scale, interpret)
    return out, (q, k, v, out, lse)


def _flat_vjp_bwd(num_heads, sm_scale, interpret, res, do):
    q, k, v, out, lse = res
    return _flat_bwd_impl(q, k, v, out, do, lse, num_heads, sm_scale, interpret)


_flat_attention_p.defvjp(_flat_vjp_fwd, _flat_vjp_bwd)


def fits_vmem(N: int) -> bool:
    """Whole-sequence (N, N) f32 scores must fit the scoped-VMEM budget.

    High-resolution EoMT runs (1024^2 -> N ~ 4.3k tokens) exceed it; those
    shapes fall back to XLA attention (streaming kernels win there, not
    VMEM residency)."""
    scratch = 3 * N * ((N + 383) // 384) * 384 * 4
    return scratch <= _VMEM_BUDGET_BYTES


def flat_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention over flat (B, N, D) projections, D = num_heads * hd.

    Zero layout copies: consumes the Dense outputs directly and returns the
    same layout for the output projection. Unmasked, dropout-free. Callers
    must check ``fits_vmem(N)`` (the ViT path falls back to XLA attention
    beyond it).
    """
    B, N, D = q.shape
    hd = D // num_heads
    if scale is None:
        scale = hd ** -0.5
    mesh = _multichip_mesh()
    n_shards = int(mesh.shape[mesh.axis_names[0]]) if mesh is not None else 1
    # The shard_map path needs the batch to split evenly over the data axis
    # (always true for training batches, not for arbitrary callers/tests).
    if mesh is not None and mesh.devices.size > 1 and B % n_shards == 0:
        shard_map = jax.shard_map
        from jax.sharding import PartitionSpec

        spec = PartitionSpec(mesh.axis_names[0])

        def per_shard(qs, ks, vs):
            return _flat_attention_p(
                qs, ks, vs, num_heads, float(scale), interpret
            )

        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            # pallas_call outputs carry no varying-mesh-axes metadata.
            check_vma=False,
        )(q, k, v)
    return _flat_attention_p(q, k, v, num_heads, float(scale), interpret)


# Mesh registered by the training runtimes (train_loop / train_task): on a
# multi-chip mesh the kernel wraps itself in shard_map over the batch axis
# (a bare pallas_call under GSPMD is not auto-partitioned — XLA would
# all-gather the sharded batch around it).
_ACTIVE_MESH = None


def set_active_mesh(mesh) -> None:
    """Register the training mesh so kernels shard_map over its data axis."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def _multichip_mesh():
    """The registered mesh, if it covers all devices of a multi-chip run."""
    if _ACTIVE_MESH is None:
        return None
    if _ACTIVE_MESH.devices.size != jax.device_count():
        return None
    return _ACTIVE_MESH


@contextlib.contextmanager
def portable_attention():
    """Force the portable lax attention path inside the block.

    Export/benchmark paths trace graphs that must run off-TPU (ONNX,
    interchange formats) — a pallas_call has no lowering there. Shared by
    export_onnx and the onnx benchmark backend."""
    import os

    prior = os.environ.get("LIGHTLY_TRAIN_VMEM_ATTENTION")
    os.environ["LIGHTLY_TRAIN_VMEM_ATTENTION"] = "0"
    try:
        yield
    finally:
        if prior is None:
            os.environ.pop("LIGHTLY_TRAIN_VMEM_ATTENTION", None)
        else:
            os.environ["LIGHTLY_TRAIN_VMEM_ATTENTION"] = prior


def use_vmem_attention() -> bool:
    """Kernel gate: on TPU unless LIGHTLY_TRAIN_VMEM_ATTENTION=0.

    Multi-chip runs need the training mesh registered via
    ``set_active_mesh`` (the runtimes do this); the kernel then runs
    per-shard under shard_map. Without a mesh, multi-chip falls back to
    XLA attention, which partitions trivially. Set
    LIGHTLY_TRAIN_VMEM_ATTENTION=force to skip the mesh check."""
    value = Env.LIGHTLY_TRAIN_VMEM_ATTENTION.value
    if value in ("0", "false", "False"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if value == "force" or jax.device_count() == 1:
        return True
    return _multichip_mesh() is not None


def vmem_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention over (B, N, H, hd) inputs (dot_product_attention API).

    Unmasked, dropout-free — exactly the ViT backbone case. Scores for each
    (batch, head) stay VMEM-resident; see module docstring for measurements.
    """
    B, N, H, hd = q.shape
    if scale is None:
        scale = hd ** -0.5
    qt = q.transpose(0, 2, 1, 3)  # folds into the kernel's input DMA
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _vmem_attention_bhnd(qt, kt, vt, float(scale), interpret)
    return out.transpose(0, 2, 1, 3)
