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
- **Dynamic batch.** Mirrors the reference's ``dynamic_batch_size=True``
  default: the graph is traced at batch >= 2, the batch dim is exported as
  a ``dim_param`` and Reshape targets carrying the traced batch at axis 0
  use ONNX's copy-dim (0) encoding. Verification runs the exported graph
  at different batch sizes (see onnx_eval) to prove the rewrite.
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


class _Ctx:
    """Mutable build state for one graph."""

    def __init__(self, *, batch_size: Optional[int] = None):
        self.nodes: List[op.Node] = []
        self.initializers: List[Tuple[str, np.ndarray]] = []
        self._counter = 0
        # Traced batch size to rewrite for dynamic batch (None = static).
        self.dynamic_batch_of: Optional[int] = batch_size
        self._init_cache: Dict[Tuple[bytes, str, Tuple[int, ...]], str] = {}

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
            if isinstance(v, bool):
                attributes.append(op.Attribute(k, i=int(v)))
            elif isinstance(v, int):
                attributes.append(op.Attribute(k, i=v))
            elif isinstance(v, float):
                attributes.append(op.Attribute(k, f=v))
            elif isinstance(v, str):
                attributes.append(op.Attribute(k, s=v.encode()))
            elif isinstance(v, np.ndarray):
                attributes.append(op.Attribute(k, t=v))
            elif isinstance(v, (list, tuple)) and all(
                isinstance(e, int) for e in v
            ):
                attributes.append(op.Attribute(k, ints=list(v)))
            elif isinstance(v, (list, tuple)):
                attributes.append(op.Attribute(k, floats=[float(e) for e in v]))
            else:  # pragma: no cover - builder misuse
                raise TypeError(f"attr {k}={v!r}")
        self.nodes.append(
            op.Node(op_type, list(inputs), outputs, attributes=attributes)
        )
        return outputs

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


def _h_reshape(ctx: _Ctx, eqn, ins):
    if eqn.params.get("dimensions") is not None:
        perm = list(eqn.params["dimensions"])
        ins = ctx.node("Transpose", ins, perm=perm)
    in_shape = tuple(eqn.invars[0].aval.shape)
    new_sizes = tuple(int(s) for s in eqn.params["new_sizes"])
    # The axis-0 copy-dim rewrite is only sound when the input also carries
    # the batch at axis 0 (sizes match).
    batch_axis0 = bool(in_shape) and bool(new_sizes) and in_shape[0] == new_sizes[0]
    shape = ctx.shape_const(new_sizes, batch_axis0=batch_axis0)
    return ctx.node("Reshape", [ins[0], shape])


def _h_squeeze(ctx: _Ctx, eqn, ins):
    out_shape = tuple(int(s) for s in eqn.outvars[0].aval.shape)
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
    # Interim shape: operand dims placed at bdims, 1 elsewhere.
    interim = [1] * len(shape)
    for src_axis, dst_axis in enumerate(bdims):
        interim[dst_axis] = int(in_shape[src_axis])
    cur = ins[0]
    if tuple(interim) != in_shape:
        # The interim reshape carries the operand's axis-0 dim through when
        # broadcast_dimensions maps source axis 0 to target axis 0, so the
        # dynamic-batch copy-dim rewrite applies there too.
        cur = ctx.node(
            "Reshape",
            [cur, ctx.shape_const(interim, batch_axis0=bool(bdims) and bdims[0] == 0)],
        )[0]
    if tuple(interim) == shape:
        if cur is ins[0]:
            return ctx.node("Identity", [cur])
        return [cur]
    # Expand follows numpy broadcast rules: a target entry of 1 keeps the
    # input dim, which is the dynamic-batch encoding when the batch axis is
    # already materialized in the operand.
    target = list(shape)
    if ctx.dynamic_batch_of is not None:
        for axis in range(len(target)):
            if target[axis] == ctx.dynamic_batch_of and interim[axis] == target[axis]:
                target[axis] = 1
    expand_shape = ctx.const(np.asarray(target, np.int64), "shape")
    return ctx.node("Expand", [cur, expand_shape])


def _h_concatenate(ctx: _Ctx, eqn, ins):
    return ctx.node("Concat", ins, axis=int(eqn.params["dimension"]))


def _h_slice(ctx: _Ctx, eqn, ins):
    starts = list(eqn.params["start_indices"])
    ends = list(eqn.params["limit_indices"])
    strides = eqn.params["strides"]
    steps = list(strides) if strides is not None else [1] * len(starts)
    axes = list(range(len(starts)))
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
    out_shape = eqn.outvars[0].aval.shape
    starts = [max(-lo, 0) for lo in los]
    ends = [s + e for s, e in zip(starts, out_shape)]
    return ctx.node(
        "Slice",
        [
            padded[0],
            ctx.const(np.asarray(starts, np.int64), "starts"),
            ctx.const(np.asarray(ends, np.int64), "ends"),
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
    if any(d != 1 for d in params["lhs_dilation"]):
        raise UnsupportedPrimitiveError("transposed convolution (lhs_dilation)")
    if params.get("batch_group_count", 1) != 1:
        raise UnsupportedPrimitiveError("batch_group_count != 1")
    # lhs_spec = (batch_axis, feature_axis, *spatial_axes) as positions in
    # the operand; transposing by the spec itself yields NCHW order.
    x = ctx.node("Transpose", [ins[0]], perm=list(lhs_spec))[0]
    w = ctx.node("Transpose", [ins[1]], perm=list(rhs_spec))[0]
    pads_cfg = params["padding"]
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


def _h_gather(ctx: _Ctx, eqn, ins):
    # Only the jnp.take_along_axis / jnp.take patterns produced by our task
    # models are supported; generic lax.gather is intentionally out of scope.
    raise UnsupportedPrimitiveError("gather (generic)")


_HANDLERS: Dict[str, Callable] = {}
for _name in _ELEMENTWISE:
    if _ELEMENTWISE[_name] is not None:
        _HANDLERS[_name] = _h_elementwise
for _name in _COMPARE:
    _HANDLERS[_name] = _h_compare
_HANDLERS.update(
    {
        "ne": _h_ne,
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
        "select_n": _h_select_n,
        "clamp": _h_clamp,
        "is_finite": _h_is_finite,
        "sort": _h_sort,
        "gather": _h_gather,
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
        """Graph name for a value, materializing constants as initializers."""
        kind, value = self.read(var)
        if kind == "tensor":
            return value
        arr = _np(value)
        if arr.ndim == 0:
            # ONNX elementwise ops broadcast scalars fine; keep 0-D.
            pass
        name = self.ctx.const(arr, "w")
        # Cache the materialized name so the same const isn't re-added.
        if not isinstance(var, jax_core.Literal):
            self.write(var, ("tensor", name))
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
) -> op.Graph:
    """Compile a closed jaxpr into an ONNX Graph.

    ``dynamic_batch_size``: the traced batch size to treat as dynamic
    (axis 0 of every graph input), or None for a fully static graph.
    """
    ctx = _Ctx(batch_size=dynamic_batch_size)
    builder = _Builder(ctx)
    in_entries: List[Tuple[str, Any]] = [
        ("tensor", name) for name in input_names
    ]
    out_entries = builder.process(closed, in_entries)

    inputs = []
    for name, var in zip(input_names, closed.jaxpr.invars):
        shape: List[Any] = [int(s) for s in var.aval.shape]
        if dynamic_batch_size is not None and shape:
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
        if dynamic_batch_size is not None and shape and shape[0] == dynamic_batch_size:
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
    graph.initializers = [
        (name, arr.astype(np.float16) if arr.dtype == np.float32 else arr)
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
    if dynamic_batch:
        shapes = [tuple(v.aval.shape) for v in closed.jaxpr.invars]
        batch = int(shapes[0][0])
        if batch < 2:
            raise ValueError(
                "dynamic_batch export must be traced with batch_size >= 2 "
                "(batch 1 is indistinguishable from broadcast dims)"
            )
    with jax.default_device(cpu):
        graph = build_graph(
            closed,
            input_names=input_names,
            output_names=output_names,
            dynamic_batch_size=batch,
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
