"""Minimal ONNX protobuf wire codec (writer + reader), no deps.

The reference serializes deployment models as ONNX via ``torch.onnx``
(``src/lightly_train/_export/export_onnx.py:85-160``); the ``onnx`` python
package is not available in this image, so the TPU rebuild carries its own
codec for the small subset of the ONNX schema the jaxpr compiler emits:
ModelProto / GraphProto / NodeProto / TensorProto / ValueInfoProto /
AttributeProto / OperatorSetIdProto / StringStringEntryProto.

Field numbers follow the public ``onnx/onnx.proto`` schema (Apache-2.0);
this module implements the generic protobuf wire format (varints +
length-delimited submessages), not any onnx code.

The reader is schema-driven and symmetric with the writer: it decodes both
files produced here and files produced by independent exporters (validated
against ``torch.onnx`` output in ``tests/export/test_onnx_export.py``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# --------------------------------------------------------------------------
# TensorProto.DataType enum (public onnx schema values).
# --------------------------------------------------------------------------
FLOAT = 1
UINT8 = 2
INT8 = 3
UINT16 = 4
INT16 = 5
INT32 = 6
INT64 = 7
STRING = 8
BOOL = 9
FLOAT16 = 10
DOUBLE = 11
UINT32 = 12
UINT64 = 13
BFLOAT16 = 16

_NP_TO_ONNX = {
    np.dtype(np.float32): FLOAT,
    np.dtype(np.float64): DOUBLE,
    np.dtype(np.float16): FLOAT16,
    np.dtype(np.int64): INT64,
    np.dtype(np.int32): INT32,
    np.dtype(np.int16): INT16,
    np.dtype(np.int8): INT8,
    np.dtype(np.uint8): UINT8,
    np.dtype(np.uint16): UINT16,
    np.dtype(np.uint32): UINT32,
    np.dtype(np.uint64): UINT64,
    np.dtype(np.bool_): BOOL,
}


def np_dtype_to_onnx(dtype: np.dtype) -> int:
    if dtype.name == "bfloat16":  # ml_dtypes.bfloat16
        return BFLOAT16
    try:
        return _NP_TO_ONNX[np.dtype(dtype)]
    except KeyError:  # pragma: no cover - guarded upstream
        raise ValueError(f"No ONNX data type for numpy dtype {dtype}")


def onnx_dtype_to_np(elem_type: int) -> np.dtype:
    if elem_type == BFLOAT16:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    for np_dt, ot in _NP_TO_ONNX.items():
        if ot == elem_type:
            return np_dt
    raise ValueError(f"No numpy dtype for ONNX elem_type {elem_type}")


# --------------------------------------------------------------------------
# Wire-format writer primitives.
# --------------------------------------------------------------------------


def _varint(value: int) -> bytes:
    if value < 0:
        # Negative int64 fields are encoded as 10-byte two's-complement varints.
        value += 1 << 64
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _tag(field_number: int, wire_type: int) -> bytes:
    return _varint((field_number << 3) | wire_type)


def w_varint(field_number: int, value: int) -> bytes:
    return _tag(field_number, 0) + _varint(value)


def w_bytes(field_number: int, value: bytes) -> bytes:
    return _tag(field_number, 2) + _varint(len(value)) + value


def w_string(field_number: int, value: str) -> bytes:
    return w_bytes(field_number, value.encode("utf-8"))


def w_float(field_number: int, value: float) -> bytes:
    return _tag(field_number, 5) + struct.pack("<f", value)


def w_packed_varints(field_number: int, values: Sequence[int]) -> bytes:
    if not values:
        return b""
    payload = b"".join(_varint(v) for v in values)
    return w_bytes(field_number, payload)


def w_packed_floats(field_number: int, values: Sequence[float]) -> bytes:
    if not values:
        return b""
    return w_bytes(field_number, struct.pack(f"<{len(values)}f", *values))


# --------------------------------------------------------------------------
# Message builders (write side). Only fields the exporter needs.
# --------------------------------------------------------------------------


@dataclass
class Attribute:
    name: str
    # Exactly one of these is set.
    i: Optional[int] = None
    f: Optional[float] = None
    s: Optional[bytes] = None
    ints: Optional[Sequence[int]] = None
    floats: Optional[Sequence[float]] = None
    t: Optional[np.ndarray] = None  # TENSOR attribute

    # AttributeProto.AttributeType enum values.
    _FLOAT, _INT, _STRING, _TENSOR = 1, 2, 3, 4
    _FLOATS, _INTS = 6, 7

    def encode(self) -> bytes:
        out = w_string(1, self.name)
        if self.f is not None:
            out += _tag(2, 5) + struct.pack("<f", self.f)
            out += w_varint(20, self._FLOAT)
        elif self.i is not None:
            out += w_varint(3, self.i)
            out += w_varint(20, self._INT)
        elif self.s is not None:
            out += w_bytes(4, self.s)
            out += w_varint(20, self._STRING)
        elif self.t is not None:
            out += w_bytes(5, encode_tensor(self.t, name=""))
            out += w_varint(20, self._TENSOR)
        elif self.floats is not None:
            for v in self.floats:
                out += _tag(7, 5) + struct.pack("<f", v)
            out += w_varint(20, self._FLOATS)
        elif self.ints is not None:
            for v in self.ints:
                out += w_varint(8, v)
            out += w_varint(20, self._INTS)
        else:  # pragma: no cover - builder misuse
            raise ValueError(f"Attribute {self.name} has no value")
        return out


@dataclass
class Node:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    attributes: List[Attribute] = field(default_factory=list)
    domain: str = ""

    def encode(self) -> bytes:
        out = b""
        for i in self.inputs:
            out += w_string(1, i)
        for o in self.outputs:
            out += w_string(2, o)
        if self.name:
            out += w_string(3, self.name)
        out += w_string(4, self.op_type)
        for a in self.attributes:
            out += w_bytes(5, a.encode())
        if self.domain:
            out += w_string(7, self.domain)
        return out


def encode_tensor(array: np.ndarray, name: str) -> bytes:
    """TensorProto with raw_data payload (little-endian, C order)."""
    array = np.ascontiguousarray(array)
    out = b""
    out += w_packed_varints(1, [int(d) for d in array.shape])
    out += w_varint(2, np_dtype_to_onnx(array.dtype))
    if name:
        out += w_string(8, name)
    data = array.tobytes()
    if array.dtype == np.bool_:
        data = array.astype(np.uint8).tobytes()
    out += w_bytes(9, data)
    return out


def encode_value_info(
    name: str, elem_type: int, shape: Sequence[Any]
) -> bytes:
    """ValueInfoProto; shape entries are ints (dim_value) or str (dim_param)."""
    shape_proto = b""
    for dim in shape:
        if isinstance(dim, str):
            dim_proto = w_string(3, dim)
        else:
            dim_proto = w_varint(1, int(dim))
        shape_proto += w_bytes(1, dim_proto)
    tensor_type = w_varint(1, elem_type) + w_bytes(2, shape_proto)
    type_proto = w_bytes(1, tensor_type)
    return w_string(1, name) + w_bytes(2, type_proto)


@dataclass
class Graph:
    name: str
    nodes: List[Node]
    inputs: List[bytes]  # encoded ValueInfoProto
    outputs: List[bytes]
    initializers: List[Tuple[str, np.ndarray]]
    value_infos: List[bytes] = field(default_factory=list)

    def encode(self) -> bytes:
        out = b""
        for n in self.nodes:
            out += w_bytes(1, n.encode())
        out += w_string(2, self.name)
        for iname, arr in self.initializers:
            out += w_bytes(5, encode_tensor(arr, iname))
        for vi in self.inputs:
            out += w_bytes(11, vi)
        for vi in self.outputs:
            out += w_bytes(12, vi)
        for vi in self.value_infos:
            out += w_bytes(13, vi)
        return out


def encode_model(
    graph: Graph,
    *,
    opset_version: int = 17,
    ir_version: int = 8,
    producer_name: str = "lightly-train-tpu",
    producer_version: str = "0.0.0",
    metadata_props: Optional[Dict[str, str]] = None,
) -> bytes:
    out = w_varint(1, ir_version)
    # opset_import: default domain.
    out += w_bytes(8, w_string(1, "") + w_varint(2, opset_version))
    out += w_string(2, producer_name)
    out += w_string(3, producer_version)
    out += w_bytes(7, graph.encode())
    for key, value in (metadata_props or {}).items():
        out += w_bytes(14, w_string(1, key) + w_string(2, value))
    return out


# --------------------------------------------------------------------------
# Schema-driven reader. Decodes into plain dicts; repeated fields -> lists.
# --------------------------------------------------------------------------

# Schema entry: field_number -> (name, kind) where kind is one of
# "varint", "float", "bytes", "string", "packed_varint", or a nested schema
# dict for length-delimited submessages. "repeated" fields accumulate lists.

_TENSOR_SCHEMA: Dict[int, Tuple[str, Any, bool]] = {
    1: ("dims", "packed_varint", False),
    2: ("data_type", "varint", False),
    4: ("float_data", "packed_float", False),
    5: ("int32_data", "packed_varint", False),
    7: ("int64_data", "packed_varint", False),
    8: ("name", "string", False),
    9: ("raw_data", "bytes", False),
    10: ("double_data", "packed_double", False),
    13: ("external_data", "bytes", True),
    14: ("data_location", "varint", False),
}

_DIM_SCHEMA: Dict[int, Tuple[str, Any, bool]] = {
    1: ("dim_value", "varint", False),
    3: ("dim_param", "string", False),
}
_SHAPE_SCHEMA = {1: ("dim", _DIM_SCHEMA, True)}
_TENSOR_TYPE_SCHEMA = {
    1: ("elem_type", "varint", False),
    2: ("shape", _SHAPE_SCHEMA, False),
}
_TYPE_SCHEMA = {1: ("tensor_type", _TENSOR_TYPE_SCHEMA, False)}
_VALUE_INFO_SCHEMA = {
    1: ("name", "string", False),
    2: ("type", _TYPE_SCHEMA, False),
}

_ATTR_SCHEMA: Dict[int, Tuple[str, Any, bool]] = {
    1: ("name", "string", False),
    2: ("f", "float", False),
    3: ("i", "varint", False),
    4: ("s", "bytes", False),
    5: ("t", _TENSOR_SCHEMA, False),
    7: ("floats", "float", True),
    8: ("ints", "varint", True),
    20: ("type", "varint", False),
}
# graphs (field 6/11) handled lazily to avoid schema recursion; see below.

_NODE_SCHEMA = {
    1: ("input", "string", True),
    2: ("output", "string", True),
    3: ("name", "string", False),
    4: ("op_type", "string", False),
    5: ("attribute", _ATTR_SCHEMA, True),
    6: ("doc_string", "string", False),
    7: ("domain", "string", False),
}

_GRAPH_SCHEMA: Dict[int, Tuple[str, Any, bool]] = {
    1: ("node", _NODE_SCHEMA, True),
    2: ("name", "string", False),
    5: ("initializer", _TENSOR_SCHEMA, True),
    11: ("input", _VALUE_INFO_SCHEMA, True),
    12: ("output", _VALUE_INFO_SCHEMA, True),
    13: ("value_info", _VALUE_INFO_SCHEMA, True),
}
# Subgraph attributes (AttributeProto.g / .graphs).
_ATTR_SCHEMA[6] = ("g", _GRAPH_SCHEMA, False)
_ATTR_SCHEMA[11] = ("graphs", _GRAPH_SCHEMA, True)

_OPSET_SCHEMA = {
    1: ("domain", "string", False),
    2: ("version", "varint", False),
}
_SSE_SCHEMA = {1: ("key", "string", False), 2: ("value", "string", False)}

MODEL_SCHEMA: Dict[int, Tuple[str, Any, bool]] = {
    1: ("ir_version", "varint", False),
    2: ("producer_name", "string", False),
    3: ("producer_version", "string", False),
    4: ("domain", "string", False),
    5: ("model_version", "varint", False),
    6: ("doc_string", "string", False),
    7: ("graph", _GRAPH_SCHEMA, False),
    8: ("opset_import", _OPSET_SCHEMA, True),
    14: ("metadata_props", _SSE_SCHEMA, True),
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def _signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def decode_message(buf: bytes, schema: Dict[int, Tuple[str, Any, bool]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field_number, wire_type = tag >> 3, tag & 0x7
        entry = schema.get(field_number)
        # Read the payload per wire type first so unknown fields skip cleanly.
        if wire_type == 0:
            raw, pos = _read_varint(buf, pos)
            payload: Any = _signed64(raw)
        elif wire_type == 5:
            payload = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif wire_type == 1:
            payload = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire_type == 2:
            length, pos = _read_varint(buf, pos)
            payload = buf[pos : pos + length]
            pos += length
        else:  # pragma: no cover - groups unused by onnx
            raise ValueError(f"Unsupported wire type {wire_type}")
        if entry is None:
            continue
        name, kind, repeated = entry
        if kind == "varint":
            value: Any = payload
        elif kind == "float":
            # Packed repeated floats also arrive as wire type 2.
            if wire_type == 2:
                count = len(payload) // 4
                floats = list(struct.unpack(f"<{count}f", payload))
                if repeated:
                    out.setdefault(name, []).extend(floats)
                    continue
                value = floats[0] if floats else 0.0
            else:
                value = payload
        elif kind == "bytes":
            value = payload
        elif kind == "string":
            value = payload.decode("utf-8")
        elif kind == "packed_varint":
            values = []
            if wire_type == 2:
                p = 0
                while p < len(payload):
                    v, p = _read_varint(payload, p)
                    values.append(_signed64(v))
            else:
                values.append(payload)
            out.setdefault(name, []).extend(values)
            continue
        elif kind == "packed_float":
            count = len(payload) // 4
            out.setdefault(name, []).extend(struct.unpack(f"<{count}f", payload))
            continue
        elif kind == "packed_double":
            if wire_type == 2:
                count = len(payload) // 8
                out.setdefault(name, []).extend(
                    struct.unpack(f"<{count}d", payload)
                )
            else:  # wire type 1 already decoded to a python float above
                out.setdefault(name, []).append(float(payload))
            continue
        elif isinstance(kind, dict):
            value = decode_message(payload, kind)
        else:  # pragma: no cover
            raise ValueError(f"Unknown schema kind {kind}")
        if repeated:
            out.setdefault(name, []).append(value)
        else:
            out[name] = value
    return out


def decode_model(data: bytes) -> Dict[str, Any]:
    return decode_message(data, MODEL_SCHEMA)


def tensor_to_numpy(tensor: Dict[str, Any]) -> np.ndarray:
    """Materialize a decoded TensorProto dict as a numpy array."""
    dims = [int(d) for d in tensor.get("dims", [])]
    elem_type = int(tensor.get("data_type", FLOAT))
    dtype = onnx_dtype_to_np(elem_type)
    raw = tensor.get("raw_data")
    if raw:
        if elem_type == BOOL:
            arr = np.frombuffer(raw, dtype=np.uint8).astype(np.bool_)
        else:
            arr = np.frombuffer(raw, dtype=dtype)
        return arr.reshape(dims).copy()
    if tensor.get("float_data"):
        return np.asarray(tensor["float_data"], dtype=np.float32).reshape(dims)
    if tensor.get("double_data"):
        return np.asarray(tensor["double_data"], dtype=np.float64).reshape(dims)
    if tensor.get("int64_data"):
        return np.asarray(tensor["int64_data"], dtype=np.int64).reshape(dims)
    if tensor.get("int32_data"):
        ints = tensor["int32_data"]
        if elem_type in (FLOAT16, BFLOAT16):
            # The spec stores (b)float16 payloads as raw BIT PATTERNS in
            # int32_data; value-converting would turn fp16 1.0 into 15360.0.
            bits = np.asarray(ints, dtype=np.uint32).astype(np.uint16)
            return bits.view(dtype).reshape(dims).copy()
        return np.asarray(ints, dtype=dtype).reshape(dims)
    return np.zeros(dims, dtype=dtype)


def value_info_shape(value_info: Dict[str, Any]) -> List[Any]:
    dims = (
        value_info.get("type", {})
        .get("tensor_type", {})
        .get("shape", {})
        .get("dim", [])
    )
    out: List[Any] = []
    for d in dims:
        if "dim_param" in d:
            out.append(d["dim_param"])
        else:
            out.append(int(d.get("dim_value", 0)))
    return out
