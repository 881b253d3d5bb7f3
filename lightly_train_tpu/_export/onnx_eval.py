"""Numpy reference evaluator for exported ONNX graphs.

Plays the role the reference gives ONNX Runtime in its export verification
(``src/lightly_train/_export/export_onnx.py:216-246``: run the exported
model, compare against the eager torch outputs). No ONNX runtime exists in
this image, so verification interprets the serialized ModelProto directly:
parse with the wire codec (onnx_proto), topologically execute each node
with numpy semantics, and compare against the jax forward.

Covers exactly the op set ``jaxpr_to_onnx`` emits, plus the handful of ops
``torch.onnx`` uses for the cross-producer codec test (Gemm, MatMul, Relu,
Constant, Conv). Opset-13..17 semantics.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from lightly_train_tpu._export import onnx_proto as op


def _attr_map(node: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for attr in node.get("attribute", []):
        name = attr["name"]
        atype = attr.get("type")
        if atype == 1:
            out[name] = attr.get("f", 0.0)
        elif atype == 2:
            out[name] = attr.get("i", 0)
        elif atype == 3:
            out[name] = attr.get("s", b"").decode()
        elif atype == 4:
            out[name] = op.tensor_to_numpy(attr["t"])
        elif atype == 6:
            out[name] = list(attr.get("floats", []))
        elif atype == 7:
            out[name] = list(attr.get("ints", []))
        else:
            # Producers may omit the type field; infer from populated slots.
            for key in ("i", "f"):
                if key in attr:
                    out[name] = attr[key]
            if "ints" in attr:
                out[name] = list(attr["ints"])
            if "s" in attr:
                out[name] = attr["s"].decode()
            if "t" in attr:
                out[name] = op.tensor_to_numpy(attr["t"])
    return out


def _pool_views(x: np.ndarray, kernel: List[int], strides: List[int], dilations: List[int]):
    """Sliding-window views over the trailing spatial dims of NC+spatial."""
    spatial = x.shape[2:]
    out_dims = [
        (spatial[i] - (kernel[i] - 1) * dilations[i] - 1) // strides[i] + 1
        for i in range(len(spatial))
    ]
    windows = np.lib.stride_tricks.sliding_window_view(
        x, tuple((k - 1) * d + 1 for k, d in zip(kernel, dilations)), axis=tuple(range(2, x.ndim))
    )
    # windows shape: N, C, *out_full, *win_full; apply stride + dilation.
    slicer: List[Any] = [slice(None), slice(None)]
    for s in strides:
        slicer.append(slice(None, None, s))
    for d in dilations:
        slicer.append(slice(None, None, d))
    w = windows[tuple(slicer)]
    assert list(w.shape[2 : 2 + len(out_dims)]) == out_dims, (w.shape, out_dims)
    return w  # N, C, *out, *kernel


def _conv(x, w, attrs):
    group = int(attrs.get("group", 1))
    rank = x.ndim - 2
    strides = list(attrs.get("strides", [1] * rank))
    dilations = list(attrs.get("dilations", [1] * rank))
    pads = list(attrs.get("pads", [0] * (2 * rank)))
    pad_width = [(0, 0), (0, 0)] + [
        (pads[i], pads[rank + i]) for i in range(rank)
    ]
    xp = np.pad(x, pad_width)
    n = x.shape[0]
    oc = w.shape[0]
    ic_per_g = w.shape[1]
    oc_per_g = oc // group
    kernel = list(w.shape[2:])
    outs = []
    for g in range(group):
        xg = xp[:, g * ic_per_g : (g + 1) * ic_per_g]
        wg = w[g * oc_per_g : (g + 1) * oc_per_g]
        views = _pool_views(xg, kernel, strides, dilations)
        # views: N, C, *out, *k ; wg: O, C, *k
        out = np.einsum(
            views,
            [0, 1] + list(range(2, 2 + rank)) + list(range(2 + rank, 2 + 2 * rank)),
            wg,
            [2 + 2 * rank, 1] + list(range(2 + rank, 2 + 2 * rank)),
            [0, 2 + 2 * rank] + list(range(2, 2 + rank)),
        )
        outs.append(out)
    result = np.concatenate(outs, axis=1) if group > 1 else outs[0]
    del n, oc
    return result.astype(x.dtype)


def _slice_op(data, starts, ends, axes=None, steps=None):
    rank = data.ndim
    if axes is None:
        axes = list(range(len(starts)))
    axes = [int(a) % rank for a in np.asarray(axes).tolist()]
    if steps is None:
        steps = [1] * len(starts)
    slicer = [slice(None)] * rank
    for start, end, axis, step in zip(
        np.asarray(starts).tolist(), np.asarray(ends).tolist(), axes, np.asarray(steps).tolist()
    ):
        dim = data.shape[axis]
        step = int(step)
        if step > 0:
            start = min(max(start, -dim), dim)
            end = min(max(end, -(dim + 1)), dim)
            slicer[axis] = slice(start, end, step)
        else:
            start = min(max(start, -dim), dim - 1)
            end_v: Any = min(max(end, -(dim + 1)), dim)
            if end_v <= -(dim + 1) or end_v == -(dim + 1):
                end_v = None
            elif end_v < 0:
                pass
            slicer[axis] = slice(start, end_v, step)
    return data[tuple(slicer)]


def evaluate_model(
    model: Dict[str, Any] | bytes,
    inputs: Dict[str, np.ndarray],
) -> List[np.ndarray]:
    """Execute a decoded (or serialized) ModelProto on numpy inputs."""
    if isinstance(model, (bytes, bytearray)):
        model = op.decode_model(bytes(model))
    graph = model["graph"]
    env: Dict[str, np.ndarray] = {}
    for tensor in graph.get("initializer", []):
        env[tensor["name"]] = op.tensor_to_numpy(tensor)
    for name, value in inputs.items():
        env[name] = np.asarray(value)

    for node in graph.get("node", []):
        op_type = node["op_type"]
        ins = [env[n] if n else None for n in node.get("input", [])]
        attrs = _attr_map(node)
        out = _eval_node(op_type, ins, attrs)
        if not isinstance(out, (list, tuple)):
            out = [out]
        for name, value in zip(node.get("output", []), out):
            env[name] = np.asarray(value)

    return [env[vi["name"]] for vi in graph.get("output", [])]


def _eval_node(op_type: str, ins: Sequence[Any], attrs: Dict[str, Any]):
    x = ins[0] if ins else None
    if op_type == "Add":
        return ins[0] + ins[1]
    if op_type == "Sub":
        return ins[0] - ins[1]
    if op_type == "Mul":
        return ins[0] * ins[1]
    if op_type == "Div":
        if np.issubdtype(ins[0].dtype, np.integer):
            return (ins[0] // ins[1]) + (
                ((ins[0] % ins[1]) != 0) & ((ins[0] < 0) != (ins[1] < 0))
            ).astype(ins[0].dtype)  # trunc toward zero
        return ins[0] / ins[1]
    if op_type == "Max":
        import functools

        return functools.reduce(np.maximum, [np.asarray(i) for i in ins])
    if op_type == "Min":
        import functools

        return functools.reduce(np.minimum, [np.asarray(i) for i in ins])
    if op_type == "Pow":
        return np.power(ins[0], ins[1]).astype(ins[0].dtype)
    if op_type == "Mod":
        if attrs.get("fmod"):
            return np.fmod(ins[0], ins[1])
        return np.mod(ins[0], ins[1])
    if op_type == "And":
        return ins[0] & ins[1]
    if op_type == "Or":
        return ins[0] | ins[1]
    if op_type == "Xor":
        return ins[0] ^ ins[1]
    if op_type == "Not":
        return ~x
    if op_type == "Greater":
        return ins[0] > ins[1]
    if op_type == "Less":
        return ins[0] < ins[1]
    if op_type == "GreaterOrEqual":
        return ins[0] >= ins[1]
    if op_type == "LessOrEqual":
        return ins[0] <= ins[1]
    if op_type == "Equal":
        return ins[0] == ins[1]
    if op_type == "Neg":
        return -x
    if op_type in ("Exp", "Log", "Tanh", "Sqrt", "Abs", "Sin", "Cos", "Floor", "Ceil", "Sign"):
        fn = {
            "Exp": np.exp, "Log": np.log, "Tanh": np.tanh, "Sqrt": np.sqrt,
            "Abs": np.abs, "Sin": np.sin, "Cos": np.cos, "Floor": np.floor,
            "Ceil": np.ceil, "Sign": np.sign,
        }[op_type]
        return fn(x.astype(np.float64)).astype(x.dtype) if x.dtype != np.float64 else fn(x)
    if op_type == "Round":
        return np.round(x)  # numpy rounds half to even, matching ONNX
    if op_type == "Erf":
        import math

        return np.vectorize(math.erf, otypes=[np.float64])(
            x.astype(np.float64)
        ).astype(x.dtype)
    if op_type == "Sigmoid":
        xf = x.astype(np.float64)
        return (1.0 / (1.0 + np.exp(-xf))).astype(x.dtype)
    if op_type == "Reciprocal":
        return (1.0 / x.astype(np.float64)).astype(x.dtype)
    if op_type == "Relu":
        return np.maximum(x, 0)
    if op_type == "Identity":
        return x
    if op_type == "Cast":
        return x.astype(op.onnx_dtype_to_np(int(attrs["to"])))
    if op_type == "Reshape":
        shape = [int(s) for s in np.asarray(ins[1]).tolist()]
        shape = [
            x.shape[i] if s == 0 and not attrs.get("allowzero") else s
            for i, s in enumerate(shape)
        ]
        return x.reshape(shape)
    if op_type == "Transpose":
        return np.transpose(x, attrs.get("perm"))
    if op_type == "Unsqueeze":
        axes = (
            [int(a) for a in np.asarray(ins[1]).tolist()]
            if len(ins) > 1 and ins[1] is not None
            else [int(a) for a in attrs["axes"]]
        )
        out = x
        for a in sorted(axes):
            out = np.expand_dims(out, a)
        return out
    if op_type == "Squeeze":
        axes = (
            tuple(int(a) for a in np.asarray(ins[1]).tolist())
            if len(ins) > 1 and ins[1] is not None
            else tuple(attrs["axes"]) if "axes" in attrs else None
        )
        return np.squeeze(x, axis=axes)
    if op_type == "Expand":
        target = [int(s) for s in np.asarray(ins[1]).tolist()]
        return np.broadcast_to(
            x, np.broadcast_shapes(tuple(x.shape), tuple(target))
        ).copy()
    if op_type == "Concat":
        return np.concatenate([np.asarray(i) for i in ins], axis=int(attrs["axis"]))
    if op_type == "Slice":
        return _slice_op(
            ins[0],
            ins[1],
            ins[2],
            ins[3] if len(ins) > 3 else None,
            ins[4] if len(ins) > 4 else None,
        )
    if op_type == "Pad":
        pads = [int(p) for p in np.asarray(ins[1]).tolist()]
        rank = x.ndim
        value = ins[2] if len(ins) > 2 and ins[2] is not None else 0
        width = [(pads[i], pads[rank + i]) for i in range(rank)]
        return np.pad(x, width, constant_values=np.asarray(value).item())
    if op_type in ("ReduceSum", "ReduceMax", "ReduceMin", "ReduceProd"):
        keepdims = bool(attrs.get("keepdims", 1))
        if op_type == "ReduceSum":
            axes = (
                tuple(int(a) for a in np.asarray(ins[1]).tolist())
                if len(ins) > 1 and ins[1] is not None
                else None
            )
        else:
            axes = tuple(attrs["axes"]) if "axes" in attrs else None
        fn = {
            "ReduceSum": np.sum, "ReduceMax": np.max,
            "ReduceMin": np.min, "ReduceProd": np.prod,
        }[op_type]
        out = fn(x, axis=axes, keepdims=keepdims)
        return np.asarray(out, dtype=x.dtype)
    if op_type in ("ArgMax", "ArgMin"):
        axis = int(attrs.get("axis", 0))
        keepdims = bool(attrs.get("keepdims", 1))
        fn = np.argmax if op_type == "ArgMax" else np.argmin
        out = fn(x, axis=axis).astype(np.int64)
        if keepdims:
            out = np.expand_dims(out, axis)
        return out
    if op_type == "Einsum":
        return np.einsum(attrs["equation"], *[np.asarray(i) for i in ins])
    if op_type == "MatMul":
        return np.matmul(ins[0], ins[1])
    if op_type == "Gemm":
        a, b = np.asarray(ins[0]), np.asarray(ins[1])
        if attrs.get("transA"):
            a = a.T
        if attrs.get("transB"):
            b = b.T
        out = attrs.get("alpha", 1.0) * (a @ b)
        if len(ins) > 2 and ins[2] is not None:
            out = out + attrs.get("beta", 1.0) * ins[2]
        return out.astype(ins[0].dtype)
    if op_type == "Conv":
        out = _conv(np.asarray(ins[0]), np.asarray(ins[1]), attrs)
        if len(ins) > 2 and ins[2] is not None:
            bias = np.asarray(ins[2]).reshape((1, -1) + (1,) * (out.ndim - 2))
            out = out + bias
        return out
    if op_type == "MaxPool":
        kernel = [int(k) for k in attrs["kernel_shape"]]
        rank = len(kernel)
        strides = [int(s) for s in attrs.get("strides", [1] * rank)]
        dilations = [int(d) for d in attrs.get("dilations", [1] * rank)]
        pads = [int(p) for p in attrs.get("pads", [0] * 2 * rank)]
        width = [(0, 0), (0, 0)] + [(pads[i], pads[rank + i]) for i in range(rank)]
        lowest = (
            np.finfo(x.dtype).min
            if np.issubdtype(x.dtype, np.floating)
            else np.iinfo(x.dtype).min
        )
        xp = np.pad(x, width, constant_values=lowest)
        views = _pool_views(xp, kernel, strides, dilations)
        return views.max(axis=tuple(range(views.ndim - rank, views.ndim)))
    if op_type == "AveragePool":
        kernel = [int(k) for k in attrs["kernel_shape"]]
        rank = len(kernel)
        strides = [int(s) for s in attrs.get("strides", [1] * rank)]
        pads = [int(p) for p in attrs.get("pads", [0] * 2 * rank)]
        width = [(0, 0), (0, 0)] + [(pads[i], pads[rank + i]) for i in range(rank)]
        xp = np.pad(x, width)
        views = _pool_views(xp, kernel, strides, [1] * rank)
        mean = views.mean(axis=tuple(range(views.ndim - rank, views.ndim)))
        if not attrs.get("count_include_pad"):
            ones = np.pad(np.ones_like(x), width)
            counts = _pool_views(ones, kernel, strides, [1] * rank).sum(
                axis=tuple(range(views.ndim - rank, views.ndim))
            )
            mean = mean * np.prod(kernel) / counts
        return mean.astype(x.dtype)
    if op_type == "Split":
        axis = int(attrs.get("axis", 0))
        if len(ins) > 1 and ins[1] is not None:
            sizes = [int(s) for s in np.asarray(ins[1]).tolist()]
        else:
            count = int(attrs["num_outputs"])
            sizes = [x.shape[axis] // count] * count
        return list(np.split(x, np.cumsum(sizes)[:-1], axis=axis))
    if op_type == "Where":
        return np.where(ins[0], ins[1], ins[2])
    if op_type == "Gather":
        axis = int(attrs.get("axis", 0))
        return np.take(x, np.asarray(ins[1]).astype(np.int64), axis=axis)
    if op_type == "GatherND":
        batch_dims = int(attrs.get("batch_dims", 0))
        data, indices = np.asarray(ins[0]), np.asarray(ins[1]).astype(np.int64)
        if batch_dims == 0:
            k = indices.shape[-1]
            flat_idx = indices.reshape(-1, k)
            out = np.stack([data[tuple(row)] for row in flat_idx])
            return out.reshape(indices.shape[:-1] + data.shape[k:])
        # Batched: iterate the flattened batch prefix.
        bshape = data.shape[:batch_dims]
        k = indices.shape[-1]
        data_flat = data.reshape((-1,) + data.shape[batch_dims:])
        idx_flat = indices.reshape((len(data_flat), -1, k))
        outs = []
        for b in range(len(data_flat)):
            rows = [data_flat[b][tuple(row)] for row in idx_flat[b]]
            outs.append(np.stack(rows))
        out = np.stack(outs)
        return out.reshape(
            bshape
            + indices.shape[batch_dims:-1]
            + data.shape[batch_dims + k :]
        )
    if op_type == "TopK":
        k = int(np.asarray(ins[1]).ravel()[0])
        axis = int(attrs.get("axis", -1))
        largest = int(attrs.get("largest", 1))
        data = np.asarray(x)
        order = np.argsort(-data if largest else data, axis=axis, kind="stable")
        idx = np.take(order, np.arange(k), axis=axis)
        values = np.take_along_axis(data, idx, axis=axis)
        return [values, idx.astype(np.int64)]
    if op_type == "Constant":
        if "value" in attrs:
            return attrs["value"]
        for key in ("value_float", "value_int"):
            if key in attrs:
                return np.asarray(attrs[key])
        raise ValueError("Constant node without value")
    if op_type == "Shape":
        return np.asarray(x.shape, np.int64)
    if op_type == "Flatten":
        axis = int(attrs.get("axis", 1))
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return x.reshape(lead, -1)
    raise NotImplementedError(f"Evaluator has no implementation for {op_type}")
