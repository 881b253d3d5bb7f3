"""Fused AdamW + EMA-teacher parameter update in one HBM pass per leaf.

This is the BASELINE.json "fused EMA update" requirement (SURVEY.md §2.8).
The reference applies the optimizer (torch AdamW) and then walks the
student->teacher EMA in a separate pass
(``src/lightly_train/_methods/dinov2/dinov2.py:641-660``); as separate optax
transforms + a tree_map the rebuild's XLA program makes ~13 HBM passes over
the ~90M-param state per step (read g twice, materialize the update tree,
re-read p' for the EMA).  This module folds the whole post-gradient update —

    g'  = g * clip_scale                       (optax.clip_by_global_norm)
    mu' = b1*mu + (1-b1)*g'                    (optax.scale_by_adam)
    nu' = b2*nu + (1-b2)*g'^2
    u   = mu_hat / (sqrt(nu_hat) + eps) + wd*p (optax.add_decayed_weights)
    p'  = p - lr*s_leaf*live_leaf * u          (lr scales + freeze masking)
    t'  = m*t + (1-m)*p'                       (EMA teacher)

— into ONE read-modify-write over (g, p, mu, nu, t) per leaf: 5 reads +
4 writes (plus the unavoidable grad-norm read), executed as a Pallas kernel
that streams 2-D (rows, lanes) blocks through VMEM.  Semantics match the
optax chain built by ``build_optimizer`` bit-for-bit up to fp32 rounding of
reassociated scalar factors (verified by ``tests/optim/test_fused_update.py``).

Mode selection: on a single TPU chip the Pallas kernel runs; on CPU or under
a multi-device GSPMD mesh the same fused math runs as one jnp expression per
leaf (elementwise ops shard trivially; pallas_call is not auto-partitioned).
Override with ``LIGHTLY_TRAIN_FUSED_UPDATE=pallas|jnp|off``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl

from lightly_train_tpu._env import Env
from lightly_train_tpu._optim.optimizers import (
    AdamWArgs,
    no_weight_decay_mask,
)

# Per-block byte budget; 9 live buffers (5 in + 4 out) double-buffered must
# fit well under the ~16 MB Mosaic scoped-VMEM limit.
_BLOCK_BYTES = 256 * 1024
# Leaves smaller than this skip the kernel (launch overhead > HBM savings).
_MIN_PALLAS_ELEMS = 64 * 1024


def _block_dim(extent: int, cap: int, quantum: int) -> Optional[int]:
    """Largest divisor of ``extent`` that is <= cap and a multiple of
    ``quantum`` — or ``extent`` itself when it fits the cap (Mosaic allows
    full-extent blocks of any size)."""
    if extent <= cap:
        return extent
    best = 0
    d = 1
    while d * d <= extent:
        if extent % d == 0:
            for c in (d, extent // d):
                if c <= cap and c % quantum == 0:
                    best = max(best, c)
        d += 1
    return best or None


def _leaf_plan(shape: Tuple[int, ...]) -> Optional[Tuple[int, int]]:
    """(block_rows, block_lanes) over the leaf's NATURAL last two dims.

    The kernel grids over (leading..., rows, lanes) blocks of the leaf's own
    shape — reshaping to a flat layout would force a tiled-layout relayout
    copy per operand per step (measured ~9 ms/step on ViT-B, the entire
    kernel win), so blocks must follow the array's native (8, 128) tiling.
    """
    n = 1
    for s in shape:
        n *= s
    if n < _MIN_PALLAS_ELEMS or len(shape) < 2:
        return None
    rows, lanes = shape[-2], shape[-1]
    # Lane-dim block: prefer full lanes; cap at 2048 to bound VMEM.
    bl = _block_dim(lanes, 2048, 128)
    if bl is None:
        return None
    row_cap = max(_BLOCK_BYTES // (4 * bl), 8)
    br = _block_dim(rows, row_cap, 8)
    if br is None:
        return None
    return br, bl


def _kernel(s_ref, g_ref, p_ref, mu_ref, nu_ref, t_ref,
            p_out, mu_out, nu_out, t_out, *, b1, b2, eps):
    cs = s_ref[0, 0]       # global-norm clip scale
    bc1 = s_ref[0, 1]      # 1 / (1 - b1**count_inc)
    bc2 = s_ref[0, 2]      # 1 / (1 - b2**count_inc)
    a = s_ref[0, 3]        # lr * leaf_lr_scale * leaf_live
    wd = s_ref[0, 4]       # weight_decay (0 where wd-masked)
    m = s_ref[0, 5]        # EMA momentum
    g = g_ref[...] * cs
    p = p_ref[...]
    mu = b1 * mu_ref[...] + (1.0 - b1) * g
    nu = b2 * nu_ref[...] + (1.0 - b2) * (g * g)
    u = (mu * bc1) / (jnp.sqrt(nu * bc2) + eps) + wd * p
    p_new = p - a * u
    mu_out[...] = mu
    nu_out[...] = nu
    p_out[...] = p_new
    t_out[...] = m * t_ref[...] + (1.0 - m) * p_new


def fused_adamw_ema_leaf(
    g: jax.Array,
    p: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    t: jax.Array,
    scalars: jax.Array,
    *,
    b1: float,
    b2: float,
    eps: float,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One-pass update for one leaf. scalars: (1, 8) f32, see ``_kernel``.

    Returns (p', mu', nu', t'). Falls back to the jnp expression when no
    TPU-friendly (rows, lanes) view of the leaf exists.
    """
    plan = _leaf_plan(g.shape)
    if plan is None:
        return _jnp_leaf(g, p, mu, nu, t, scalars, b1=b1, b2=b2, eps=eps)
    br, bl = plan
    shape = g.shape
    lead = shape[:-2]
    rows, lanes = shape[-2], shape[-1]
    grid = tuple(lead) + (rows // br, lanes // bl)
    nlead = len(lead)
    block = (1,) * nlead + (br, bl)

    def index_map(*idx):
        return idx[:nlead] + (idx[nlead], idx[nlead + 1])

    spec = pl.BlockSpec(block, index_map)
    sspec = pl.BlockSpec((1, 8), lambda *idx: (0, 0))
    out4 = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 4
    p2, mu2, nu2, t2 = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[sspec, spec, spec, spec, spec, spec],
        out_specs=[spec, spec, spec, spec],
        out_shape=out4,
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )(scalars.astype(jnp.float32), g, p, mu, nu, t)
    return p2, mu2, nu2, t2


def _jnp_leaf(g, p, mu, nu, t, scalars, *, b1, b2, eps):
    """Same fused math as one jnp expression (CPU / GSPMD-sharded path)."""
    s = scalars.reshape(-1)
    cs, bc1, bc2, a, wd, m = s[0], s[1], s[2], s[3], s[4], s[5]
    g = g.astype(jnp.float32) * cs
    mu_n = b1 * mu + (1.0 - b1) * g
    nu_n = b2 * nu + (1.0 - b2) * (g * g)
    u = (mu_n * bc1) / (jnp.sqrt(nu_n * bc2) + eps) + wd * p
    p_n = p - a * u
    t_n = m * t + (1.0 - m) * p_n
    return p_n, mu_n, nu_n, t_n


def _resolve_mode(mode: str) -> str:
    env = Env.LIGHTLY_TRAIN_FUSED_UPDATE.value
    if env in ("pallas", "jnp", "off"):
        return env
    if mode != "auto":
        return mode
    try:
        devs = jax.devices()
    except Exception:
        return "jnp"
    if devs and devs[0].platform == "tpu" and len(devs) == 1:
        return "pallas"
    return "jnp"


class FusedAdamWEMA:
    """Drop-in replacement for optimizer.update + apply_updates + EMA.

    Built from the SAME ingredients as ``build_optimizer`` (AdamWArgs, lr
    schedule, optional clip norm / per-leaf lr scales / wd schedule) plus the
    method's EMA momentum schedule and per-leaf update scales (the fused
    analog of ``Method.mask_updates``). Reads and writes the optax chain's
    ``opt_state`` in place (ScaleByAdamState moments + every ``count``
    field), so checkpoints stay interchangeable with the unfused path.
    """

    def __init__(
        self,
        args: AdamWArgs,
        learning_rate: Any,
        params: Any,
        *,
        grad_clip_norm: Optional[float] = None,
        lr_scales: Optional[Any] = None,
        weight_decay_schedule: Optional[Callable] = None,
        momentum_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        update_scales_fn: Optional[Callable[[jax.Array], Any]] = None,
        wd_mask: Optional[Any] = None,
        mode: str = "auto",
    ) -> None:
        self.args = args
        self.learning_rate = learning_rate
        self.grad_clip_norm = grad_clip_norm
        self.lr_scales = lr_scales
        self.weight_decay_schedule = weight_decay_schedule
        self.momentum_fn = momentum_fn
        self.update_scales_fn = update_scales_fn
        self.wd_mask = (
            wd_mask if wd_mask is not None else no_weight_decay_mask(params)
        )
        self.mode = _resolve_mode(mode)

    @property
    def enabled(self) -> bool:
        return self.mode != "off"

    def update_and_apply(
        self,
        grads: Any,
        opt_state: Any,
        params: Any,
        teacher: Any,
        step: jax.Array,
    ) -> Tuple[Any, Any, Any, jax.Array]:
        """Returns (params', teacher', opt_state', grad_norm)."""
        a = self.args
        b1, b2, eps = float(a.betas[0]), float(a.betas[1]), float(a.eps)

        adam_state = None
        for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        ):
            if isinstance(s, optax.ScaleByAdamState):
                adam_state = s
                break
        if adam_state is None:
            raise ValueError("opt_state has no ScaleByAdamState")
        count = adam_state.count
        count_inc = optax.safe_increment(count)

        grad_norm = optax.global_norm(grads)
        if self.grad_clip_norm is not None:
            cn = jnp.asarray(self.grad_clip_norm, jnp.float32)
            cs = jnp.where(grad_norm < cn, 1.0, cn / grad_norm)
        else:
            cs = jnp.ones((), jnp.float32)
        lr = (
            self.learning_rate(count)
            if callable(self.learning_rate)
            else jnp.asarray(self.learning_rate, jnp.float32)
        )
        wd = (
            self.weight_decay_schedule(count)
            if self.weight_decay_schedule is not None
            else jnp.asarray(a.weight_decay, jnp.float32)
        )
        m = (
            self.momentum_fn(step)
            if self.momentum_fn is not None
            else jnp.ones((), jnp.float32)
        )
        cif = count_inc.astype(jnp.float32)
        bc1 = 1.0 / (1.0 - jnp.power(b1, cif))
        bc2 = 1.0 / (1.0 - jnp.power(b2, cif))
        us_tree = (
            self.update_scales_fn(step)
            if self.update_scales_fn is not None
            else None
        )

        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_mu = treedef.flatten_up_to(adam_state.mu)
        leaves_nu = treedef.flatten_up_to(adam_state.nu)
        leaves_t = treedef.flatten_up_to(teacher)
        leaves_wdm = treedef.flatten_up_to(self.wd_mask)
        leaves_s = (
            treedef.flatten_up_to(self.lr_scales)
            if self.lr_scales is not None
            else [1.0] * len(leaves_p)
        )
        leaves_us = (
            treedef.flatten_up_to(us_tree)
            if us_tree is not None
            else [1.0] * len(leaves_p)
        )

        new_p, new_mu, new_nu, new_t = [], [], [], []
        use_pallas = self.mode == "pallas"
        for p, g, mu, nu, t, wdm, s, us in zip(
            leaves_p, leaves_g, leaves_mu, leaves_nu, leaves_t,
            leaves_wdm, leaves_s, leaves_us,
        ):
            a_eff = lr * jnp.asarray(s, jnp.float32) * jnp.asarray(
                us, jnp.float32
            )
            wd_eff = wd if wdm else jnp.zeros((), jnp.float32)
            scalars = jnp.stack(
                [cs, bc1, bc2, a_eff, wd_eff,
                 jnp.asarray(m, jnp.float32),
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)]
            ).reshape(1, 8)
            fn = fused_adamw_ema_leaf if use_pallas else _jnp_leaf
            p_n, mu_n, nu_n, t_n = fn(
                g, p, mu, nu, t, scalars, b1=b1, b2=b2, eps=eps
            )
            new_p.append(p_n)
            new_mu.append(mu_n)
            new_nu.append(nu_n)
            new_t.append(t_n)

        params_n = jax.tree_util.tree_unflatten(treedef, new_p)
        teacher_n = jax.tree_util.tree_unflatten(treedef, new_t)
        mu_n = jax.tree_util.tree_unflatten(treedef, new_mu)
        nu_n = jax.tree_util.tree_unflatten(treedef, new_nu)
        opt_state_n = self._bump_state(opt_state, count_inc, mu_n, nu_n, wd)
        return params_n, teacher_n, opt_state_n, grad_norm

    def _bump_state(self, opt_state, count_inc, mu, nu, wd):
        """Rewrite chain state exactly as the optax transforms would."""

        def _one(s):
            if isinstance(s, optax.ScaleByAdamState):
                return s._replace(count=count_inc, mu=mu, nu=nu)
            if isinstance(s, tuple) and hasattr(s, "_fields"):
                kw = {}
                if "count" in s._fields:
                    kw["count"] = count_inc
                if "hyperparams" in s._fields:
                    kw["hyperparams"] = {
                        k: (wd if k == "wd" else v)
                        for k, v in s.hyperparams.items()
                    }
                if kw:
                    return s._replace(**kw)
            return s

        if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
            return tuple(_one(s) for s in opt_state)
        return _one(opt_state)


def build_fused_updater(
    method: Any,
    optim_args: Any,
    learning_rate: Any,
    params: Any,
    total_steps: int,
    mode: str = "auto",
) -> Optional[FusedAdamWEMA]:
    """FusedAdamWEMA for an (AdamW, EMA-method) pair, else None.

    Eligibility: plain AdamW (not 8-bit) AND the method declares its
    ``post_update`` to be exactly the teacher EMA via ``fused_ema_momentum``.
    """
    if type(optim_args) is not AdamWArgs:
        return None
    if method.fused_ema_momentum(jnp.zeros((), jnp.int32), total_steps) is None:
        return None
    updater = FusedAdamWEMA(
        optim_args,
        learning_rate,
        params,
        grad_clip_norm=method.grad_clip_norm(),
        lr_scales=method.lr_scales(params),
        weight_decay_schedule=method.weight_decay_schedule(total_steps),
        momentum_fn=lambda step: method.fused_ema_momentum(step, total_steps),
        update_scales_fn=(
            (lambda step: method.update_scales(params, step))
            if method.update_scales(params, 0) is not None
            else None
        ),
        wd_mask=method.wd_mask(params),
        mode=mode,
    )
    return updater if updater.enabled else None
