"""jaxpr -> ONNX graph compiler.

TPU-native analog of the reference's ``torch.onnx`` export pipeline
(``src/lightly_train/_export/export_onnx.py:85-214``). The reference traces
the torch module and serializes the traced graph as ONNX; here the traced
artifact is a jaxpr (the same functional graph XLA compiles), and each lax
primitive is lowered to standard ONNX-opset-17 ops via the table below.

Design notes:
- **Constant folding at export time.** Any equation whose inputs are all
  known constants (params, iota tables, RoPE sin/cos caches, pos-embed
  resampling — everything that depends only on weights and static shapes)
  is evaluated eagerly on CPU and embedded as an initializer. This both
  shrinks the graph and removes primitives that have no ONNX equivalent
  but never touch runtime data.
- **Explicit-shape semantics.** lax elementwise ops require equal shapes,
  so ONNX's numpy-style broadcasting is trivially compatible;
  ``broadcast_in_dim`` lowers to Reshape(+Expand).
- **dot_general -> Einsum.** Every batch/contract layout is expressible as
  one Einsum equation; no special-casing of matmul flavors.
- **Dynamic batch via two-trace dim inference.** Mirrors the reference's
  ``dynamic_batch_size=True`` default. "Is this dim the batch?" is decided
  by evidence, not by comparing sizes against the traced batch (which
  misfires whenever an unrelated axis happens to equal it — e.g. a RoPE
  coordinate axis of size 2 at traced batch 2): the function is traced a
  second time at batch+1 and the two jaxprs are walked in lockstep; any
  dim whose size differs between the traces is batch-derived. Handlers
  consult that map to emit runtime-shape tensors (Shape(input) -> Expand /
  Reshape) exactly where needed and static constants everywhere else.
  Verification runs the exported graph at different batch sizes (see
  onnx_eval) to prove the rewrite.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend import core as jax_core

from lightly_train_tpu._export import onnx_proto as op
from lightly_train_tpu._logging import get_logger

logger = get_logger("onnx_export")


class UnsupportedPrimitiveError(NotImplementedError):
    pass


def _np(x: Any) -> np.ndarray:
    return np.asarray(x)


class _LockstepMismatchError(Exception):
    """The two traces (batch B vs B+1) are not structurally identical."""


def _lockstep_batch_axes(
    closed_a: jax_core.ClosedJaxpr,
    closed_b: jax_core.ClosedJaxpr,
    batch: int,
) -> Dict[int, frozenset]:
    """id(var in trace A) -> axes whose size differs between the traces.

    The two jaxprs come from tracing the same function at batch B and B+1;
    structural identity (same eqn sequence) is required — a shape-dependent
    Python branch in the model breaks it, in which case the caller falls
    back to the static-batch heuristics with a warning. A differing dim
    must be exactly k*B -> k*(B+1): the compiler encodes batch-derived
    dims as multiples of the runtime batch, so an affine B+c dim would
    silently mis-shape at other batch sizes — mismatch instead.
    """
    axes: Dict[int, frozenset] = {}

    def record(va, vb) -> None:
        sa = tuple(int(s) for s in getattr(va.aval, "shape", ()))
        sb = tuple(int(s) for s in getattr(vb.aval, "shape", ()))
        if len(sa) != len(sb):
            raise _LockstepMismatchError(f"rank mismatch {sa} vs {sb}")
        diff = []
        for i, (x, y) in enumerate(zip(sa, sb)):
            if x == y:
                continue
            k, r = divmod(x, batch)
            if r != 0 or y != k * (batch + 1):
                raise _LockstepMismatchError(
                    f"dim {i}: {x}->{y} is not a pure multiple of the batch"
                )
            diff.append(i)
        axes[id(va)] = frozenset(diff)

    def rec(ja, jb) -> None:
        if len(ja.eqns) != len(jb.eqns):
            raise _LockstepMismatchError(
                f"eqn count {len(ja.eqns)} vs {len(jb.eqns)}"
            )
        if len(ja.constvars) != len(jb.constvars) or len(ja.invars) != len(
            jb.invars
        ):
            raise _LockstepMismatchError(
                "constvar/invar count mismatch between traces"
            )
        for va, vb in zip(
            list(ja.constvars) + list(ja.invars),
            list(jb.constvars) + list(jb.invars),
        ):
            record(va, vb)
        for ea, eb in zip(ja.eqns, jb.eqns):
            if ea.primitive.name != eb.primitive.name:
                raise _LockstepMismatchError(
                    f"{ea.primitive.name} vs {eb.primitive.name}"
                )
            sub_a, sub_b = _call_jaxpr(ea), _call_jaxpr(eb)
            if (sub_a is None) != (sub_b is None):
                raise _LockstepMismatchError("call structure mismatch")
            if sub_a is not None:
                rec(sub_a.jaxpr, sub_b.jaxpr)
            for va, vb in zip(ea.outvars, eb.outvars):
                record(va, vb)

    rec(closed_a.jaxpr, closed_b.jaxpr)
    return axes


class _Ctx:
    """Mutable build state for one graph."""

    def __init__(self, *, batch_size: Optional[int] = None):
        self.nodes: List[op.Node] = []
        self.initializers: List[Tuple[str, np.ndarray]] = []
        self._counter = 0
        # Traced batch size to rewrite for dynamic batch (None = static).
        self.dynamic_batch_of: Optional[int] = batch_size
        self._init_cache: Dict[Tuple[bytes, str, Tuple[int, ...]], str] = {}
        # First graph input; source of the runtime batch dim for dynamic
        # Expand shapes (set by build_graph).
        self.main_input: Optional[str] = None
        self._batch_1d: Optional[str] = None
        # id(jax var) -> batch-derived axes, from the two-trace lockstep
        # walk (None when unavailable: static export or lockstep fallback).
        self.batch_axes: Optional[Dict[int, frozenset]] = None

    def runtime_batch_1d(self) -> str:
        """1-D int64 tensor holding the runtime batch size (lazy)."""
        if self._batch_1d is None:
            assert self.main_input is not None
            shape_t = self.node("Shape", [self.main_input])
            self._batch_1d = self.node(
                "Slice",
                [
                    shape_t[0],
                    self.const(np.asarray([0], np.int64), "starts"),
                    self.const(np.asarray([1], np.int64), "ends"),
                    self.const(np.asarray([0], np.int64), "axes"),
                ],
            )[0]
        return self._batch_1d

    def fresh(self, hint: str = "t") -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def const(self, array: np.ndarray, hint: str = "const") -> str:
        array = _np(array)
        key = None
        if array.nbytes <= 1024:  # dedupe small constants (shapes, axes)
            key = (array.tobytes(), str(array.dtype), array.shape)
            cached = self._init_cache.get(key)
            if cached is not None:
                return cached
        name = self.fresh(hint)
        self.initializers.append((name, array))
        if key is not None:
            self._init_cache[key] = name
        return name

    def node(
        self,
        op_type: str,
        inputs: Sequence[str],
        n_outputs: int = 1,
        **attrs: Any,
    ) -> List[str]:
        outputs = [self.fresh(op_type.lower()) for _ in range(n_outputs)]
        attributes = []
        for k, v in attrs.items():
            if v is None:
                continue
            if isinstance(v, (bool, np.bool_)):
                attributes.append(op.Attribute(k, i=int(v)))
            elif isinstance(v, (int, np.integer)):
                attributes.append(op.Attribute(k, i=int(v)))
            elif isinstance(v, (float, np.floating)):
                attributes.append(op.Attribute(k, f=float(v)))
            elif isinstance(v, str):
                attributes.append(op.Attribute(k, s=v.encode()))
            elif isinstance(v, np.ndarray):
                attributes.append(op.Attribute(k, t=v))
            elif isinstance(v, (list, tuple)) and all(
                isinstance(e, (int, np.integer)) for e in v
            ):
                # np.int64 is not an int: without the Integral check a
                # perm/pads list from jaxpr params would silently encode
                # as a floats attribute that real runtimes reject.
                attributes.append(op.Attribute(k, ints=[int(e) for e in v]))
            elif isinstance(v, (list, tuple)) and all(
                isinstance(e, (float, np.floating)) for e in v
            ):
                attributes.append(op.Attribute(k, floats=[float(e) for e in v]))
            else:  # pragma: no cover - builder misuse
                raise TypeError(f"attr {k}={v!r}")
        self.nodes.append(
            op.Node(op_type, list(inputs), outputs, attributes=attributes)
        )
        return outputs

    def dyn_shape_tensor(
        self, sizes: Sequence[int], batch_axes: frozenset
    ) -> str:
        """1-D int64 shape tensor with batch-derived entries runtime-built.

        Static entries are embedded; an entry on a batch axis becomes
        ``runtime_batch`` (or ``runtime_batch * k`` for merged dims like
        B*N, where k is the traced size divided by the traced batch).
        """
        sizes = [int(s) for s in sizes]
        assert self.dynamic_batch_of is not None
        pieces: List[str] = []
        run: List[int] = []

        def flush() -> None:
            if run:
                pieces.append(self.const(np.asarray(run, np.int64), "shape_seg"))
                run.clear()

        for i, size in enumerate(sizes):
            if i not in batch_axes:
                run.append(size)
                continue
            flush()
            if size == self.dynamic_batch_of:
                pieces.append(self.runtime_batch_1d())
            elif size % self.dynamic_batch_of == 0:
                k = self.const(
                    np.asarray([size // self.dynamic_batch_of], np.int64), "k"
                )
                pieces.append(self.node("Mul", [self.runtime_batch_1d(), k])[0])
            else:
                raise UnsupportedPrimitiveError(
                    f"batch-derived dim {size} is not a multiple of the "
                    f"traced batch {self.dynamic_batch_of}"
                )
        flush()
        if len(pieces) == 1:
            return pieces[0]
        return self.node("Concat", pieces, axis=0)[0]

    def shape_const(self, shape: Sequence[int], *, batch_axis0: bool) -> str:
        """1-D int64 shape constant; rewrites axis-0 batch for dynamic export.

        ONNX Reshape interprets 0 as "copy this dim from the input", which
        is exactly the dynamic-batch encoding when the traced batch sits at
        axis 0 of both the input and the target.
        """
        shape = [int(s) for s in shape]
        if (
            batch_axis0
            and self.dynamic_batch_of is not None
            and shape
            and shape[0] == self.dynamic_batch_of
        ):
            shape = [0] + shape[1:]
        return self.const(np.asarray(shape, np.int64), "shape")


# --------------------------------------------------------------------------
# Primitive handlers. Signature: (ctx, eqn, in_names) -> out_names.
# in_names entries are graph tensor names; constant inputs have already
# been materialized as initializers by the driver.
# --------------------------------------------------------------------------


def _batch_axes(ctx: _Ctx, var) -> Optional[frozenset]:
    """Batch-derived axes of a traced value, or None when unknown."""
    if ctx.batch_axes is None:
        return None
    if isinstance(var, jax_core.Literal):
        return frozenset()
    return ctx.batch_axes.get(id(var), frozenset())

_ELEMENTWISE = {
    "add": "Add",
    "sub": "Sub",
    "mul": "Mul",
    "div": "Div",
    "max": "Max",
    "min": "Min",
    "pow": "Pow",
    "and": "And",
    "or": "Or",
    "xor": "Xor",
    "neg": "Neg",
    "exp": "Exp",
    "log": "Log",
    "tanh": "Tanh",
    "sqrt": "Sqrt",
    "abs": "Abs",
    "sin": "Sin",
    "cos": "Cos",
    "floor": "Floor",
    "ceil": "Ceil",
    "round": "Round",
    "sign": "Sign",
    "erf": "Erf",
    "logistic": "Sigmoid",
    "not": "Not",
    "is_finite": None,  # special-cased below
}

def _h_rem(ctx: _Ctx, eqn, ins):
    # lax.rem is truncated (C-style) remainder == ONNX Mod with fmod=1.
    return ctx.node("Mod", ins, fmod=1)


_COMPARE = {
    "gt": "Greater",
    "lt": "Less",
    "ge": "GreaterOrEqual",
    "le": "LessOrEqual",
    "eq": "Equal",
}


def _h_elementwise(ctx: _Ctx, eqn, ins):
    return ctx.node(_ELEMENTWISE[eqn.primitive.name], ins)


def _h_compare(ctx: _Ctx, eqn, ins):
    return ctx.node(_COMPARE[eqn.primitive.name], ins)


def _h_ne(ctx: _Ctx, eqn, ins):
    eq = ctx.node("Equal", ins)
    return ctx.node("Not", eq)


def _h_square(ctx: _Ctx, eqn, ins):
    return ctx.node("Mul", [ins[0], ins[0]])


def _h_rsqrt(ctx: _Ctx, eqn, ins):
    s = ctx.node("Sqrt", ins)
    return ctx.node("Reciprocal", s)


def _h_erfc(ctx: _Ctx, eqn, ins):
    dt = np.dtype(eqn.invars[0].aval.dtype)
    one = ctx.const(np.ones((), dt), "one")
    e = ctx.node("Erf", ins)
    return ctx.node("Sub", [one, e[0]])


def _h_integer_pow(ctx: _Ctx, eqn, ins):
    dt = np.dtype(eqn.invars[0].aval.dtype)
    y = ctx.const(np.asarray(eqn.params["y"], dt), "exponent")
    return ctx.node("Pow", [ins[0], y])


def _h_identity(ctx: _Ctx, eqn, ins):
    return ctx.node("Identity", ins)


def _h_convert(ctx: _Ctx, eqn, ins):
    to = op.np_dtype_to_onnx(np.dtype(eqn.params["new_dtype"]))
    return ctx.node("Cast", ins, to=to)


def _reshape_target(ctx: _Ctx, eqn, new_sizes: Tuple[int, ...]) -> str:
    """Shape tensor for a Reshape, batch-aware when dim info exists."""
    ba_out = _batch_axes(ctx, eqn.outvars[0])
    if ba_out is not None:
        if ba_out:
            return ctx.dyn_shape_tensor(new_sizes, ba_out)
        return ctx.shape_const(new_sizes, batch_axis0=False)
    # No dim info (static export / lockstep fallback): the legacy axis-0
    # copy-dim heuristic, sound only when the input also carries the batch
    # at axis 0 (sizes match).
    in_shape = tuple(eqn.invars[0].aval.shape)
    batch_axis0 = (
        bool(in_shape) and bool(new_sizes) and in_shape[0] == new_sizes[0]
    )
    return ctx.shape_const(new_sizes, batch_axis0=batch_axis0)


def _h_reshape(ctx: _Ctx, eqn, ins):
    if eqn.params.get("dimensions") is not None:
        perm = list(eqn.params["dimensions"])
        ins = ctx.node("Transpose", ins, perm=perm)
    new_sizes = tuple(int(s) for s in eqn.params["new_sizes"])
    shape = _reshape_target(ctx, eqn, new_sizes)
    return ctx.node("Reshape", [ins[0], shape])


def _h_squeeze(ctx: _Ctx, eqn, ins):
    out_shape = tuple(int(s) for s in eqn.outvars[0].aval.shape)
    ba_out = _batch_axes(ctx, eqn.outvars[0])
    if ba_out is not None:
        if ba_out:
            shape = ctx.dyn_shape_tensor(out_shape, ba_out)
        else:
            shape = ctx.shape_const(out_shape, batch_axis0=False)
        return ctx.node("Reshape", [ins[0], shape])
    in_shape = tuple(eqn.invars[0].aval.shape)
    batch_axis0 = (
        bool(in_shape)
        and bool(out_shape)
        and 0 not in eqn.params["dimensions"]
        and in_shape[0] == out_shape[0]
    )
    shape = ctx.shape_const(out_shape, batch_axis0=batch_axis0)
    return ctx.node("Reshape", [ins[0], shape])


def _h_transpose(ctx: _Ctx, eqn, ins):
    return ctx.node("Transpose", ins, perm=list(eqn.params["permutation"]))


def _h_broadcast_in_dim(ctx: _Ctx, eqn, ins):
    shape = tuple(int(s) for s in eqn.params["shape"])
    bdims = tuple(eqn.params["broadcast_dimensions"])
    in_shape = tuple(eqn.invars[0].aval.shape)
    ba_out = _batch_axes(ctx, eqn.outvars[0])
    ba_in = _batch_axes(ctx, eqn.invars[0])
    # Interim shape: operand dims placed at bdims, 1 elsewhere.
    interim = [1] * len(shape)
    for src_axis, dst_axis in enumerate(bdims):
        interim[dst_axis] = int(in_shape[src_axis])
    cur = ins[0]
    if tuple(interim) != in_shape:
        if ba_in is not None:
            interim_ba = frozenset(bdims[src] for src in ba_in)
            if interim_ba:
                ishape = ctx.dyn_shape_tensor(interim, interim_ba)
            else:
                ishape = ctx.shape_const(interim, batch_axis0=False)
        else:
            # Legacy heuristic: the interim reshape carries the operand's
            # axis-0 dim through when bdims maps source axis 0 to target
            # axis 0, so the copy-dim rewrite applies there too.
            ishape = ctx.shape_const(
                interim, batch_axis0=bool(bdims) and bdims[0] == 0
            )
        cur = ctx.node("Reshape", [cur, ishape])[0]
    if tuple(interim) == shape:
        if cur is ins[0]:
            return ctx.node("Identity", [cur])
        return [cur]
    # Expand follows numpy broadcast rules: a target entry of 1 keeps the
    # input dim — the right encoding for every axis the operand already
    # carries (batch included). Axes actually being broadcast are static
    # constants unless batch-derived, which become runtime entries.
    target = [
        1 if interim[axis] == shape[axis] else shape[axis]
        for axis in range(len(shape))
    ]
    if ba_out is not None:
        expand_ba = frozenset(
            a for a in ba_out if interim[a] != shape[a]
        )
        if expand_ba:
            expand_shape = ctx.dyn_shape_tensor(target, expand_ba)
        else:
            expand_shape = ctx.const(np.asarray(target, np.int64), "shape")
        return ctx.node("Expand", [cur, expand_shape])
    # Legacy heuristic path.
    batch = ctx.dynamic_batch_of
    if batch is not None and target and target[0] == batch and interim[0] == 1:
        # Genuine broadcast over the batch axis: track the RUNTIME batch.
        tail = ctx.const(np.asarray(target[1:], np.int64), "shape_tail")
        expand_shape = ctx.node(
            "Concat", [ctx.runtime_batch_1d(), tail], axis=0
        )[0]
        return ctx.node("Expand", [cur, expand_shape])
    expand_shape = ctx.const(np.asarray(target, np.int64), "shape")
    return ctx.node("Expand", [cur, expand_shape])


def _h_concatenate(ctx: _Ctx, eqn, ins):
    return ctx.node("Concat", ins, axis=int(eqn.params["dimension"]))


def _h_slice(ctx: _Ctx, eqn, ins):
    starts = list(eqn.params["start_indices"])
    ends = list(eqn.params["limit_indices"])
    strides = eqn.params["strides"]
    steps = list(strides) if strides is not None else [1] * len(starts)
    in_shape = tuple(int(s) for s in eqn.invars[0].aval.shape)
    # Emit constraints ONLY for axes actually sliced. A full pass-through
    # axis must not appear at all: baking ends=dim would pin the traced
    # batch (cropping larger runtime batches) and is redundant elsewhere.
    keep = [
        a
        for a in range(len(starts))
        if not (starts[a] == 0 and ends[a] == in_shape[a] and steps[a] == 1)
    ]
    if not keep:
        return ctx.node("Identity", ins)
    ba_in = _batch_axes(ctx, eqn.invars[0])
    if ba_in and any(a in ba_in for a in keep):
        raise UnsupportedPrimitiveError(
            "slice with static bounds on a batch-derived axis"
        )
    return ctx.node(
        "Slice",
        [
            ins[0],
            ctx.const(np.asarray([starts[a] for a in keep], np.int64), "starts"),
            ctx.const(np.asarray([ends[a] for a in keep], np.int64), "ends"),
            ctx.const(np.asarray(keep, np.int64), "axes"),
            ctx.const(np.asarray([steps[a] for a in keep], np.int64), "steps"),
        ],
    )


def _h_rev(ctx: _Ctx, eqn, ins):
    axes = sorted(int(a) for a in eqn.params["dimensions"])
    int64_min = np.iinfo(np.int64).min
    starts = [np.iinfo(np.int64).max] * len(axes)
    ends = [int64_min] * len(axes)
    steps = [-1] * len(axes)
    return ctx.node(
        "Slice",
        [
            ins[0],
            ctx.const(np.asarray(starts, np.int64), "starts"),
            ctx.const(np.asarray(ends, np.int64), "ends"),
            ctx.const(np.asarray(axes, np.int64), "axes"),
            ctx.const(np.asarray(steps, np.int64), "steps"),
        ],
    )


def _h_pad(ctx: _Ctx, eqn, ins):
    config = eqn.params["padding_config"]
    if any(interior != 0 for _, _, interior in config):
        raise UnsupportedPrimitiveError("pad with interior padding")
    los = [lo for lo, _, _ in config]
    his = [hi for _, hi, _ in config]
    if all(v >= 0 for v in los + his):
        pads = ctx.const(np.asarray(los + his, np.int64), "pads")
        return ctx.node("Pad", [ins[0], pads, ins[1]], mode="constant")
    # Negative padding = crop: pad the positive part, then slice.
    pads = ctx.const(
        np.asarray([max(v, 0) for v in los] + [max(v, 0) for v in his], np.int64),
        "pads",
    )
    padded = ctx.node("Pad", [ins[0], pads, ins[1]], mode="constant")
    out_shape = tuple(int(s) for s in eqn.outvars[0].aval.shape)
    # Slice only the cropped axes (negative lo/hi) — pass-through axes must
    # not carry baked bounds (see _h_slice).
    crop_axes = [a for a in range(len(los)) if los[a] < 0 or his[a] < 0]
    ba_out = _batch_axes(ctx, eqn.outvars[0])
    if ba_out and any(a in ba_out for a in crop_axes):
        raise UnsupportedPrimitiveError("crop-pad on a batch-derived axis")
    starts = [max(-los[a], 0) for a in crop_axes]
    ends = [s + out_shape[a] for s, a in zip(starts, crop_axes)]
    return ctx.node(
        "Slice",
        [
            padded[0],
            ctx.const(np.asarray(starts, np.int64), "starts"),
            ctx.const(np.asarray(ends, np.int64), "ends"),
            ctx.const(np.asarray(crop_axes, np.int64), "axes"),
        ],
    )


def _h_reduce(ctx: _Ctx, eqn, ins):
    name = eqn.primitive.name
    axes = [int(a) for a in eqn.params["axes"]]
    if name == "reduce_sum":
        # Opset 13+: ReduceSum takes axes as an input.
        axes_t = ctx.const(np.asarray(axes, np.int64), "axes")
        return ctx.node("ReduceSum", [ins[0], axes_t], keepdims=0)
    onnx_op = {
        "reduce_max": "ReduceMax",
        "reduce_min": "ReduceMin",
        "reduce_prod": "ReduceProd",
    }[name]
    return ctx.node(onnx_op, ins, axes=axes, keepdims=0)


def _h_reduce_bool(ctx: _Ctx, eqn, ins):
    axes = [int(a) for a in eqn.params["axes"]]
    as_int = ctx.node("Cast", ins, to=op.INT32)
    red = (
        ctx.node("ReduceMin", as_int, axes=axes, keepdims=0)
        if eqn.primitive.name == "reduce_and"
        else ctx.node("ReduceMax", as_int, axes=axes, keepdims=0)
    )
    return ctx.node("Cast", red, to=op.BOOL)


def _h_argminmax(ctx: _Ctx, eqn, ins):
    onnx_op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    (axis,) = eqn.params["axes"]
    out = ctx.node(onnx_op, ins, axis=int(axis), keepdims=0)
    index_dtype = np.dtype(eqn.params["index_dtype"])
    if index_dtype != np.int64:
        out = ctx.node("Cast", out, to=op.np_dtype_to_onnx(index_dtype))
    return out


_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _h_dot_general(ctx: _Ctx, eqn, ins):
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs_rank = len(eqn.invars[0].aval.shape)
    rhs_rank = len(eqn.invars[1].aval.shape)
    letters = iter(_LETTERS)
    lhs_sub = [""] * lhs_rank
    rhs_sub = [""] * rhs_rank
    for la, ra in zip(lhs_b, rhs_b):
        ch = next(letters)
        lhs_sub[la] = ch
        rhs_sub[ra] = ch
    for la, ra in zip(lhs_c, rhs_c):
        ch = next(letters)
        lhs_sub[la] = ch
        rhs_sub[ra] = ch
    for i in range(lhs_rank):
        if not lhs_sub[i]:
            lhs_sub[i] = next(letters)
    for i in range(rhs_rank):
        if not rhs_sub[i]:
            rhs_sub[i] = next(letters)
    out_sub = (
        [lhs_sub[a] for a in lhs_b]
        + [lhs_sub[i] for i in range(lhs_rank) if i not in lhs_b and i not in lhs_c]
        + [rhs_sub[i] for i in range(rhs_rank) if i not in rhs_b and i not in rhs_c]
    )
    equation = f"{''.join(lhs_sub)},{''.join(rhs_sub)}->{''.join(out_sub)}"
    out = ctx.node("Einsum", ins, equation=equation)
    out_dtype = np.dtype(eqn.outvars[0].aval.dtype)
    if out_dtype != np.dtype(eqn.invars[0].aval.dtype):
        out = ctx.node("Cast", out, to=op.np_dtype_to_onnx(out_dtype))
    return out


def _inv_perm(perm: Sequence[int]) -> List[int]:
    out = [0] * len(perm)
    for i, p in enumerate(perm):
        out[p] = i
    return out


def _h_conv(ctx: _Ctx, eqn, ins):
    params = eqn.params
    dn = params["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    if params.get("batch_group_count", 1) != 1:
        raise UnsupportedPrimitiveError("batch_group_count != 1")
    # lhs_spec = (batch_axis, feature_axis, *spatial_axes) as positions in
    # the operand; transposing by the spec itself yields NCHW order.
    x = ctx.node("Transpose", [ins[0]], perm=list(lhs_spec))[0]
    w = ctx.node("Transpose", [ins[1]], perm=list(rhs_spec))[0]
    # Transposed convolution (flax ConvTranspose lowers to lhs_dilation>1):
    # materialize the zero-dilated input, then run a regular Conv. Zero
    # insertion per spatial axis: unsqueeze, concat d-1 zero copies on the
    # new axis, merge (n, d) -> n*d, trim the trailing d-1 zeros. All
    # shapes static except batch, which rides the Reshape copy-dim trick.
    lhs_shape = tuple(int(s) for s in eqn.invars[0].aval.shape)
    nchw_shape = [lhs_shape[i] for i in lhs_spec]
    ba_lhs = _batch_axes(ctx, eqn.invars[0])
    nchw_ba = (
        frozenset(j for j, src in enumerate(lhs_spec) if src in ba_lhs)
        if ba_lhs is not None
        else None
    )
    np_dtype = np.dtype(eqn.invars[0].aval.dtype)
    for j, dil in enumerate(params["lhs_dilation"]):
        dil = int(dil)
        if dil == 1:
            continue
        axis = 2 + j
        n = nchw_shape[axis]
        axes_c = ctx.const(np.asarray([axis + 1], np.int64), "axes")
        u = ctx.node("Unsqueeze", [x, axes_c])[0]
        # Structural zeros (NOT Mul(x, 0): inf/NaN activations would
        # poison the interleaved positions where lax inserts exact zeros).
        ushape = ctx.node("Shape", [u])[0]
        z = ctx.node(
            "Expand", [ctx.const(np.zeros((1,), np_dtype), "zeros"), ushape]
        )[0]
        cat = ctx.node("Concat", [u] + [z] * (dil - 1), axis=axis + 1)[0]
        merged = list(nchw_shape)
        merged[axis] = n * dil
        if nchw_ba is not None:
            mshape = (
                ctx.dyn_shape_tensor(merged, nchw_ba)
                if nchw_ba
                else ctx.shape_const(merged, batch_axis0=False)
            )
        else:
            mshape = ctx.shape_const(merged, batch_axis0=True)
        x = ctx.node("Reshape", [cat, mshape])[0]
        new_n = n * dil - (dil - 1)
        x = ctx.node(
            "Slice",
            [
                x,
                ctx.const(np.asarray([0], np.int64), "starts"),
                ctx.const(np.asarray([new_n], np.int64), "ends"),
                ctx.const(np.asarray([axis], np.int64), "axes"),
            ],
        )[0]
        nchw_shape[axis] = new_n
    pads_cfg = params["padding"]
    if any(lo < 0 or hi < 0 for lo, hi in pads_cfg):
        raise UnsupportedPrimitiveError("conv with negative padding")
    pads = [lo for lo, _ in pads_cfg] + [hi for _, hi in pads_cfg]
    conv = ctx.node(
        "Conv",
        [x, w],
        strides=list(params["window_strides"]),
        pads=pads,
        dilations=list(params["rhs_dilation"]),
        group=int(params["feature_group_count"]),
    )
    return ctx.node("Transpose", conv, perm=_inv_perm(out_spec))


def _h_reduce_window(ctx: _Ctx, eqn, ins):
    params = eqn.params
    dims = list(params["window_dimensions"])
    strides = list(params["window_strides"])
    dilation = list(params.get("window_dilation", [1] * len(dims)))
    base_dilation = list(params.get("base_dilation", [1] * len(dims)))
    padding = list(params["padding"])
    if any(d != 1 for d in base_dilation):
        raise UnsupportedPrimitiveError("reduce_window base_dilation")
    rank = len(dims)
    # Pooling windows must cover only spatial dims; find them (window > 1 or
    # padded). Conventional NHWC pooling: dims = (1, k, k, 1).
    spatial = [
        i
        for i in range(rank)
        if dims[i] != 1 or strides[i] != 1 or padding[i] != (0, 0)
    ]
    if not spatial:
        return ctx.node("Identity", ins)
    non_spatial = [i for i in range(rank) if i not in spatial]
    if len(non_spatial) != 2:
        raise UnsupportedPrimitiveError(
            f"reduce_window layout {dims} (need 2 non-window dims)"
        )
    perm = non_spatial + spatial  # -> NC + spatial
    x = ctx.node("Transpose", ins, perm=perm)[0]
    kernel = [dims[i] for i in spatial]
    pool_args = dict(
        kernel_shape=kernel,
        strides=[strides[i] for i in spatial],
        pads=[padding[i][0] for i in spatial] + [padding[i][1] for i in spatial],
        dilations=[dilation[i] for i in spatial],
    )
    if eqn.primitive.name == "reduce_window_max":
        pooled = ctx.node("MaxPool", [x], **pool_args)
    elif eqn.primitive.name == "reduce_window_sum":
        if any(d != 1 for d in pool_args["dilations"]):
            raise UnsupportedPrimitiveError("sum-pool with window dilation")
        pool_args.pop("dilations")
        pooled = ctx.node(
            "AveragePool", [x], count_include_pad=1, **pool_args
        )
        scale = ctx.const(
            np.asarray(
                float(np.prod(kernel)), np.dtype(eqn.outvars[0].aval.dtype)
            ),
            "window_count",
        )
        pooled = ctx.node("Mul", [pooled[0], scale])
    else:
        raise UnsupportedPrimitiveError(eqn.primitive.name)
    return ctx.node("Transpose", pooled, perm=_inv_perm(perm))


def _h_split(ctx: _Ctx, eqn, ins):
    sizes = [int(s) for s in eqn.params["sizes"]]
    axis = int(eqn.params["axis"])
    split_c = ctx.const(np.asarray(sizes, np.int64), "split")
    return ctx.node(
        "Split", [ins[0], split_c], n_outputs=len(sizes), axis=axis
    )


def _h_select_n(ctx: _Ctx, eqn, ins):
    which, *cases = ins
    pred_dtype = np.dtype(eqn.invars[0].aval.dtype)
    if len(cases) == 2 and pred_dtype == np.bool_:
        # select_n(pred, on_false, on_true): Where picks X when cond holds.
        return ctx.node("Where", [which, cases[1], cases[0]])
    # Integer selector: fold cases with Equal + Where.
    idx_dtype = op.np_dtype_to_onnx(pred_dtype)
    result = cases[0]
    for i in range(1, len(cases)):
        iv = ctx.const(np.asarray(i).astype(pred_dtype), "case_idx")
        cond = ctx.node("Equal", [which, iv])
        result = ctx.node("Where", [cond[0], cases[i], result])[0]
    del idx_dtype
    return [result]


def _h_clamp(ctx: _Ctx, eqn, ins):
    lo, x, hi = ins
    m = ctx.node("Max", [x, lo])
    return ctx.node("Min", [m[0], hi])


def _h_is_finite(ctx: _Ctx, eqn, ins):
    dt = np.dtype(eqn.invars[0].aval.dtype)
    big = ctx.const(np.asarray(np.finfo(dt).max, dt), "fmax")
    a = ctx.node("Abs", ins)
    le = ctx.node("LessOrEqual", [a[0], big])
    return le


def _h_sort(ctx: _Ctx, eqn, ins):
    raise UnsupportedPrimitiveError("sort")


def _clamped_gather_indices(ctx: _Ctx, idx: str, eqn, upper) -> str:
    """Honor lax gather OOB modes: ONNX Gather/GatherND is undefined out of
    bounds, so CLIP (and jnp's default clamp-on-read indexing) lowers to
    Max/Min on the indices. FILL_OR_DROP degrades to clamping with a
    warning — the two differ only when an index is actually out of range.
    PROMISE_IN_BOUNDS needs nothing."""
    from jax.lax import GatherScatterMode

    mode = eqn.params.get("mode")
    if mode == GatherScatterMode.PROMISE_IN_BOUNDS:
        return idx
    if mode == GatherScatterMode.FILL_OR_DROP:
        logger.warning(
            "gather with FILL_OR_DROP mode exports with CLIP semantics "
            "(ONNX has no fill); outputs differ only for out-of-bounds "
            "indices"
        )
    lo = ctx.const(np.asarray(0, np.int64), "zero")
    hi = ctx.const(np.asarray(upper, np.int64), "idx_max")
    clamped = ctx.node("Max", [idx, lo])[0]
    return ctx.node("Min", [clamped, hi])[0]


def _h_gather(ctx: _Ctx, eqn, ins):
    """lax.gather -> GatherND / Gather for the patterns jnp emits.

    Three shapes cover every gather our models trace (deformable-attention
    point sampling, jnp.take with scalar / vector indices); anything else
    raises rather than risking a silent mislowering.
    """
    dnums = eqn.params["dimension_numbers"]
    operand_aval = eqn.invars[0].aval
    indices_aval = eqn.invars[1].aval
    out_aval = eqn.outvars[0].aval
    slice_sizes = tuple(int(s) for s in eqn.params["slice_sizes"])
    op_shape = tuple(int(s) for s in operand_aval.shape)
    batch = tuple(int(d) for d in dnums.operand_batching_dims)
    start_map = tuple(int(d) for d in dnums.start_index_map)
    collapsed = tuple(int(d) for d in dnums.collapsed_slice_dims)
    offsets = tuple(int(d) for d in dnums.offset_dims)
    out_rank = len(out_aval.shape)

    # Pattern A — batched multi-dim point lookup (GatherND with batch_dims):
    # operand (B..., i1..ik, f...), indices (B..., n, k); batch dims are the
    # leading operand dims, indexed dims follow, trailing dims are fetched
    # whole. E.g. deformable-attention sampling (H, W) -> feature vectors.
    n_batch = len(batch)
    n_idx = len(start_map)
    if (
        batch == tuple(range(n_batch))
        and tuple(int(d) for d in dnums.start_indices_batching_dims)
        == tuple(range(n_batch))
        and start_map == tuple(range(n_batch, n_batch + n_idx))
        and collapsed == start_map
        and all(slice_sizes[d] == 1 for d in batch + start_map)
        and all(
            slice_sizes[d] == op_shape[d]
            for d in range(n_batch + n_idx, len(op_shape))
        )
        and offsets == tuple(range(out_rank - (len(op_shape) - n_batch - n_idx), out_rank))
    ):
        idx = ctx.node("Cast", [ins[1]], to=op.INT64)[0]
        upper = np.asarray(
            [op_shape[d] - 1 for d in start_map], np.int64
        )  # broadcasts over the trailing index-vector dim
        idx = _clamped_gather_indices(ctx, idx, eqn, upper)
        return ctx.node("GatherND", [ins[0], idx], batch_dims=n_batch)

    # Patterns B/C — single-axis take (ONNX Gather): no batching, one
    # indexed axis a, full slices elsewhere.
    if (
        not batch
        and len(start_map) == 1
        and collapsed == start_map
        and all(
            slice_sizes[d] == (1 if d == start_map[0] else op_shape[d])
            for d in range(len(op_shape))
        )
    ):
        axis = start_map[0]
        idx_shape = tuple(int(s) for s in indices_aval.shape)
        idx = ctx.node("Cast", [ins[1]], to=op.INT64)[0]
        idx = _clamped_gather_indices(
            ctx, idx, eqn, np.asarray(op_shape[axis] - 1, np.int64)
        )
        if idx_shape in ((1,), ()):
            # Scalar take: drop the trailing index-vector dim -> 0-D index.
            if idx_shape == (1,):
                idx = ctx.node(
                    "Reshape",
                    [idx, ctx.const(np.asarray([], np.int64), "scalar_shape")],
                )[0]
            return ctx.node("Gather", [ins[0], idx], axis=axis)
        if (
            len(idx_shape) == 2
            and idx_shape[1] == 1
            and offsets == tuple(i for i in range(out_rank) if i != axis)
        ):
            # Vector take along axis `axis`, index dim lands in place.
            idx = ctx.node(
                "Reshape",
                [idx, ctx.const(np.asarray([idx_shape[0]], np.int64), "shape")],
            )[0]
            return ctx.node("Gather", [ins[0], idx], axis=axis)
    raise UnsupportedPrimitiveError(
        f"gather pattern {dnums} slice_sizes={slice_sizes}"
    )


def _h_top_k(ctx: _Ctx, eqn, ins):
    k = int(eqn.params["k"])
    k_c = ctx.const(np.asarray([k], np.int64), "k")
    values, indices = ctx.node(
        "TopK", [ins[0], k_c], n_outputs=2, axis=-1, largest=1, sorted=1
    )
    idx_dtype = np.dtype(eqn.outvars[1].aval.dtype)
    if idx_dtype != np.int64:
        indices = ctx.node(
            "Cast", [indices], to=op.np_dtype_to_onnx(idx_dtype)
        )[0]
    return [values, indices]


_HANDLERS: Dict[str, Callable] = {}
for _name in _ELEMENTWISE:
    if _ELEMENTWISE[_name] is not None:
        _HANDLERS[_name] = _h_elementwise
for _name in _COMPARE:
    _HANDLERS[_name] = _h_compare
_HANDLERS.update(
    {
        "ne": _h_ne,
        "rem": _h_rem,
        "square": _h_square,
        "rsqrt": _h_rsqrt,
        "erfc": _h_erfc,
        "integer_pow": _h_integer_pow,
        "stop_gradient": _h_identity,
        "copy": _h_identity,
        "reduce_precision": _h_identity,
        "convert_element_type": _h_convert,
        "reshape": _h_reshape,
        "squeeze": _h_squeeze,
        "transpose": _h_transpose,
        "broadcast_in_dim": _h_broadcast_in_dim,
        "concatenate": _h_concatenate,
        "slice": _h_slice,
        "rev": _h_rev,
        "pad": _h_pad,
        "reduce_sum": _h_reduce,
        "reduce_max": _h_reduce,
        "reduce_min": _h_reduce,
        "reduce_prod": _h_reduce,
        "reduce_and": _h_reduce_bool,
        "reduce_or": _h_reduce_bool,
        "argmax": _h_argminmax,
        "argmin": _h_argminmax,
        "dot_general": _h_dot_general,
        "conv_general_dilated": _h_conv,
        "reduce_window_max": _h_reduce_window,
        "reduce_window_sum": _h_reduce_window,
        "split": _h_split,
        "select_n": _h_select_n,
        "clamp": _h_clamp,
        "is_finite": _h_is_finite,
        "sort": _h_sort,
        "gather": _h_gather,
        "top_k": _h_top_k,
    }
)

_CALL_PRIMITIVES = ("pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call", "remat", "checkpoint")


def _call_jaxpr(eqn) -> Optional[jax_core.ClosedJaxpr]:
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        sub = eqn.params.get(key)
        if sub is not None:
            if isinstance(sub, jax_core.ClosedJaxpr):
                return sub
            return jax_core.ClosedJaxpr(sub, ())
    return None


class _Builder:
    def __init__(self, ctx: _Ctx):
        self.ctx = ctx
        # jax Var id -> ("const", np.ndarray) | ("tensor", name)
        self.env: Dict[int, Tuple[str, Any]] = {}

    # -- env helpers ------------------------------------------------------
    def read(self, var) -> Tuple[str, Any]:
        if isinstance(var, jax_core.Literal):
            return ("const", _np(var.val))
        return self.env[id(var)]

    def write(self, var, entry: Tuple[str, Any]) -> None:
        self.env[id(var)] = entry

    def tensor_name(self, var) -> str:
        """Graph name for a value, materializing constants as initializers.

        Goes through the batch-aware materialization so a batch-derived
        constant (e.g. a broadcast query embedding that constant-folded)
        becomes a runtime-batch Expand instead of a baked initializer.
        """
        kind, value = self.read(var)
        if kind == "tensor":
            return value
        entry = self._materialize_const(value, _batch_axes(self.ctx, var))
        if entry[0] == "tensor":
            name = entry[1]
        else:
            name = self.ctx.const(entry[1], "w")
            entry = ("tensor", name)
        # Cache the materialized name so the same const isn't re-added.
        if not isinstance(var, jax_core.Literal):
            self.write(var, entry)
        return name

    # -- main walk --------------------------------------------------------
    def process(self, closed: jax_core.ClosedJaxpr, in_entries: List[Tuple[str, Any]]):
        jaxpr = closed.jaxpr
        for var, const in zip(jaxpr.constvars, closed.consts):
            self.write(var, ("const", _np(const)))
        assert len(jaxpr.invars) == len(in_entries)
        for var, entry in zip(jaxpr.invars, in_entries):
            self.write(var, entry)
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def eqn(self, eqn) -> None:
        name = eqn.primitive.name
        sub = _call_jaxpr(eqn)
        in_entries = [self.read(v) for v in eqn.invars]
        all_const = all(k == "const" for k, _ in in_entries)
        if sub is not None and name in _CALL_PRIMITIVES or (
            sub is not None and name.startswith("custom_")
        ):
            if name == "custom_vjp_call":
                # invars = (*fwd_consts?, *args); call_jaxpr covers all invars
                pass
            outs = self.process_subjaxpr(sub, in_entries, eqn)
            for var, entry in zip(eqn.outvars, outs):
                self.write(var, entry)
            return
        if all_const:
            outs = self.fold(eqn, [v for _, v in in_entries])
            for var, value in zip(eqn.outvars, outs):
                # Keep folding as const; tensor_name materializes (batch-
                # aware) only when a non-foldable consumer needs the value.
                self.write(var, ("const", _np(value)))
            return
        handler = _HANDLERS.get(name)
        if handler is None:
            raise UnsupportedPrimitiveError(
                f"No ONNX lowering for primitive '{name}' "
                f"(shapes {[tuple(v.aval.shape) for v in eqn.invars]})"
            )
        in_names = [self.tensor_name(v) for v in eqn.invars]
        out_names = handler(self.ctx, eqn, in_names)
        for var, out in zip(eqn.outvars, out_names):
            self.write(var, ("tensor", out))

    def process_subjaxpr(self, sub, in_entries, eqn):
        # custom_jvp/vjp call_jaxprs take exactly the primal args; pjit
        # jaxprs take all invars. Trim leading non-primal inputs if needed.
        n_expected = len(sub.jaxpr.invars)
        entries = in_entries[-n_expected:] if n_expected <= len(in_entries) else in_entries
        inner = _Builder(self.ctx)
        inner.env = self.env  # share — var objects are unique across scopes
        outs = inner.process(sub, entries)
        return outs[: len(eqn.outvars)]

    def _materialize_const(
        self, value: Any, batch_axes: Optional[frozenset]
    ) -> Tuple[str, Any]:
        """Env entry for a folded constant, batch-aware.

        Under dynamic batch, a folded constant with a batch-derived dim
        cannot be embedded as-is (e.g. query embeddings that were broadcast
        across the batch — the initializer would pin batch at its traced
        size). When the value is uniform along the batch axis, embed one
        row and Expand it to the RUNTIME batch via Shape(input). A
        genuinely batch-indexed constant (rows differ, e.g. iota over
        batch) has no dynamic encoding — bake it and let the export's
        multi-batch verification surface the limitation.
        """
        arr = _np(value)
        batch = self.ctx.dynamic_batch_of
        if batch is None:
            return ("const", arr)
        if batch_axes is not None:
            if not batch_axes:
                return ("const", arr)
            if batch_axes != frozenset({0}):
                logger.warning(
                    "Folded constant with batch-derived axes %s (shape %s) "
                    "baked at the traced batch — dynamic batch may not hold",
                    sorted(batch_axes),
                    arr.shape,
                )
                return ("const", arr)
        elif arr.ndim == 0 or arr.shape[0] != batch:
            # Legacy heuristic (no dim info): leading dim == traced batch.
            return ("const", arr)
        row = arr[:1]
        uniform = (
            np.array_equal(arr, np.broadcast_to(row, arr.shape), equal_nan=True)
            if arr.dtype.kind == "f"
            else bool((arr == row).all())
        )
        if not uniform:
            if batch_axes is not None:
                logger.warning(
                    "Batch-indexed folded constant (shape %s, rows differ) "
                    "baked at the traced batch — dynamic batch may not hold",
                    arr.shape,
                )
            return ("const", arr)
        cname = self.ctx.const(row, "bcast")
        tail = self.ctx.const(np.asarray(arr.shape[1:], np.int64), "shape_tail")
        lead = self.ctx.runtime_batch_1d()
        k = arr.shape[0] // batch
        if k > 1:
            # Merged k*B leading dim (e.g. views concatenated over batch):
            # the runtime target is k * batch, not batch.
            lead = self.ctx.node(
                "Mul", [lead, self.ctx.const(np.asarray([k], np.int64), "k")]
            )[0]
        expand_shape = self.ctx.node("Concat", [lead, tail], axis=0)[0]
        out = self.ctx.node("Expand", [cname, expand_shape])
        return ("tensor", out[0])

    def fold(self, eqn, values: List[np.ndarray]) -> List[Any]:
        jax_vals = [jnp.asarray(v) for v in values]
        out = eqn.primitive.bind(*jax_vals, **eqn.params)
        if not eqn.primitive.multiple_results:
            out = [out]
        return [np.asarray(o) for o in out]


def build_graph(
    closed: jax_core.ClosedJaxpr,
    *,
    input_names: List[str],
    output_names: List[str],
    graph_name: str = "lightly_train_tpu",
    dynamic_batch_size: Optional[int] = None,
    batch_axes: Optional[Dict[int, frozenset]] = None,
) -> op.Graph:
    """Compile a closed jaxpr into an ONNX Graph.

    ``dynamic_batch_size``: the traced batch size to treat as dynamic
    (axis 0 of every graph input), or None for a fully static graph.
    ``batch_axes``: id(var) -> batch-derived axes from the two-trace
    lockstep walk (see ``_lockstep_batch_axes``); None falls back to the
    size-comparison heuristics.
    """
    ctx = _Ctx(batch_size=dynamic_batch_size)
    ctx.batch_axes = batch_axes
    ctx.main_input = input_names[0] if input_names else None
    builder = _Builder(ctx)
    in_entries: List[Tuple[str, Any]] = [
        ("tensor", name) for name in input_names
    ]
    out_entries = builder.process(closed, in_entries)

    inputs = []
    for name, var in zip(input_names, closed.jaxpr.invars):
        shape: List[Any] = [int(s) for s in var.aval.shape]
        ba_in = _batch_axes(ctx, var)
        if ba_in is not None:
            # Lockstep evidence: only dims that actually scaled with the
            # batch get the symbol (a second input with a coincidental
            # leading dim stays static).
            for axis in ba_in:
                size = int(var.aval.shape[axis])
                shape[axis] = (
                    "batch"
                    if size == dynamic_batch_size
                    else f"{size // dynamic_batch_size}*batch"
                )
        elif dynamic_batch_size is not None and shape:
            shape[0] = "batch"
        inputs.append(
            op.encode_value_info(
                name, op.np_dtype_to_onnx(np.dtype(var.aval.dtype)), shape
            )
        )
    outputs = []
    for name, (kind, value), var in zip(
        output_names, out_entries, closed.jaxpr.outvars
    ):
        if kind == "const":
            # An output that constant-folded completely (no data dependence).
            cname = ctx.const(_np(value), "const_out")
            ctx.nodes.append(op.Node("Identity", [cname], [name]))
        else:
            ctx.nodes.append(op.Node("Identity", [value], [name]))
        aval = var.aval
        shape = [int(s) for s in aval.shape]
        ba = _batch_axes(ctx, var)
        if ba is not None:
            for axis in ba:
                size = shape[axis]
                shape[axis] = (  # type: ignore[call-overload]
                    "batch"
                    if size == dynamic_batch_size
                    else f"{size // dynamic_batch_size}*batch"
                )
        elif (
            dynamic_batch_size is not None
            and shape
            and shape[0] == dynamic_batch_size
        ):
            shape[0] = "batch"  # type: ignore[call-overload]
        outputs.append(
            op.encode_value_info(
                name, op.np_dtype_to_onnx(np.dtype(aval.dtype)), shape
            )
        )
    return op.Graph(
        name=graph_name,
        nodes=ctx.nodes,
        inputs=inputs,
        outputs=outputs,
        initializers=ctx.initializers,
    )


def convert_graph_to_fp16(
    graph: op.Graph,
    input_dtypes: Dict[str, np.dtype],
    output_dtypes: Dict[str, np.dtype],
) -> None:
    """In-place fp32 -> fp16 conversion of a built graph.

    The reference converts the traced fp32 ONNX graph to fp16 after export
    (``export_onnx.py:190-214`` via onnxconverter) rather than tracing in
    fp16; this mirrors that: initializers are cast to float16, internal
    Cast targets retargeted, and float graph I/O stays float32 behind
    boundary Casts (the TensorRT-facing convention).
    """
    def _to_fp16(arr: np.ndarray) -> np.ndarray:
        # Saturate finite values to the fp16 range (the reference's
        # onnxconverter pipeline clamps): a finite fp32 threshold like
        # finfo(float32).max must not overflow to inf, which would break
        # comparisons such as the is_finite lowering. Infinities stay.
        fmax = np.float32(np.finfo(np.float16).max)
        clipped = np.where(
            np.isfinite(arr), np.clip(arr, -fmax, fmax), arr
        )
        return clipped.astype(np.float16)

    graph.initializers = [
        (name, _to_fp16(arr) if arr.dtype == np.float32 else arr)
        for name, arr in graph.initializers
    ]
    for node in graph.nodes:
        if node.op_type == "Cast":
            for attr in node.attributes:
                if attr.name == "to" and attr.i == op.FLOAT:
                    attr.i = op.FLOAT16
    # Float inputs: cast to fp16 right after entry; rewrite consumers.
    renames: Dict[str, str] = {}
    casts: List[op.Node] = []
    for name, dtype in input_dtypes.items():
        if dtype == np.float32:
            renames[name] = f"{name}_fp16"
            casts.append(
                op.Node(
                    "Cast",
                    [name],
                    [renames[name]],
                    attributes=[op.Attribute("to", i=op.FLOAT16)],
                )
            )
    for node in graph.nodes:
        node.inputs = [renames.get(i, i) for i in node.inputs]
    graph.nodes[:0] = casts
    # Float outputs: the builder terminates each output with an Identity;
    # turn it into a Cast back to fp32.
    for node in graph.nodes:
        if node.op_type == "Identity" and node.outputs and (
            output_dtypes.get(node.outputs[0]) == np.float32
        ):
            node.op_type = "Cast"
            node.attributes = [op.Attribute("to", i=op.FLOAT)]


def export_fn_to_onnx(
    fn: Callable,
    example_args: Sequence[Any],
    *,
    input_names: Optional[List[str]] = None,
    output_tree_prefix: str = "output",
    dynamic_batch: bool = False,
    fp16: bool = False,
    metadata_props: Optional[Dict[str, str]] = None,
    producer_version: str = "0.0.0",
) -> Tuple[bytes, List[str], Any]:
    """Trace ``fn`` and serialize it as an ONNX model.

    Returns (model_bytes, output_names, output_treedef). The function is
    traced on CPU so platform-gated code paths (e.g. Pallas kernels) take
    their portable lax branches.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        closed = jax.make_jaxpr(fn)(*example_args)
        out_shape = jax.eval_shape(fn, *example_args)
    leaves, treedef = jax.tree_util.tree_flatten(out_shape)
    output_names = [f"{output_tree_prefix}_{i}" for i in range(len(leaves))]
    if input_names is None:
        input_names = [f"input_{i}" for i in range(len(closed.jaxpr.invars))]
    batch = None
    batch_axes: Optional[Dict[int, frozenset]] = None
    if dynamic_batch:
        shapes = [tuple(v.aval.shape) for v in closed.jaxpr.invars]
        batch = int(shapes[0][0])
        if batch < 2:
            raise ValueError(
                "dynamic_batch export must be traced with batch_size >= 2 "
                "(batch 1 is indistinguishable from broadcast dims)"
            )
        # Second trace at batch+1: dims whose size differs between the two
        # jaxprs are batch-derived — evidence, not size-matching (which
        # misfires when an unrelated axis happens to equal the batch).
        def _bump(leaf):
            shape = tuple(getattr(leaf, "shape", ()))
            dtype = np.dtype(getattr(leaf, "dtype", np.float32))
            if shape and int(shape[0]) == batch:
                shape = (batch + 1,) + shape[1:]
            return jax.ShapeDtypeStruct(shape, dtype)

        try:
            bumped = jax.tree_util.tree_map(_bump, tuple(example_args))
            with jax.default_device(cpu):
                closed_b = jax.make_jaxpr(fn)(*bumped)
            batch_axes = _lockstep_batch_axes(closed, closed_b, batch)
        except Exception as e:
            # Any second-trace failure (shape-dependent Python branch,
            # hardcoded-batch reshape, structural mismatch) falls back —
            # not only the structured mismatch error.
            logger.warning(
                "Two-trace batch inference unavailable (%s: %s); falling "
                "back to size-comparison heuristics for dynamic batch",
                type(e).__name__, e,
            )
    with jax.default_device(cpu):
        graph = build_graph(
            closed,
            input_names=input_names,
            output_names=output_names,
            dynamic_batch_size=batch,
            batch_axes=batch_axes,
        )
    if fp16:
        convert_graph_to_fp16(
            graph,
            {
                name: np.dtype(var.aval.dtype)
                for name, var in zip(input_names, closed.jaxpr.invars)
            },
            {
                name: np.dtype(leaf.dtype)
                for name, leaf in zip(output_names, leaves)
            },
        )
    model = op.encode_model(
        graph,
        metadata_props=metadata_props,
        producer_version=producer_version,
    )
    return model, output_names, treedef
