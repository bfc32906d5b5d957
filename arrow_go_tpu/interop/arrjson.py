"""Arrow integration-test JSON format (reference
arrow/internal/arrjson/arrjson.go — the cross-implementation golden data
interchange driven by archery). Full file shape:
{"schema": ..., "dictionaries": [...], "batches": [...]}.
"""
from __future__ import annotations

import json as _json
from typing import Any, Dict, List, Optional

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid, ArrowNotImplemented
from ..memory import bitutil
from ..memory.buffer import Buffer


# -- type <-> json ----------------------------------------------------------

def _type_to_json(t: dt.DataType) -> Dict[str, Any]:
    tid = t.id
    if tid == dt.TypeId.NULL:
        return {"name": "null"}
    if tid == dt.TypeId.BOOL:
        return {"name": "bool"}
    if t.is_integer:
        return {"name": "int", "bitWidth": t.bit_width,
                "isSigned": t.is_signed_integer}
    if t.is_floating:
        prec = {16: "HALF", 32: "SINGLE", 64: "DOUBLE"}[t.bit_width]
        return {"name": "floatingpoint", "precision": prec}
    if tid == dt.TypeId.STRING:
        return {"name": "utf8"}
    if tid == dt.TypeId.BINARY:
        return {"name": "binary"}
    if tid == dt.TypeId.LARGE_STRING:
        return {"name": "largeutf8"}
    if tid == dt.TypeId.LARGE_BINARY:
        return {"name": "largebinary"}
    if t.is_decimal:
        return {"name": "decimal", "precision": t.precision,
                "scale": t.scale, "bitWidth": t.bit_width}
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        return {"name": "fixedsizebinary", "byteWidth": t.byte_width}
    if tid == dt.TypeId.DATE32:
        return {"name": "date", "unit": "DAY"}
    if tid == dt.TypeId.DATE64:
        return {"name": "date", "unit": "MILLISECOND"}
    if tid in (dt.TypeId.TIME32, dt.TypeId.TIME64):
        unit = {0: "SECOND", 1: "MILLISECOND", 2: "MICROSECOND",
                3: "NANOSECOND"}[int(t.unit)]
        return {"name": "time", "unit": unit, "bitWidth": t.bit_width}
    if tid == dt.TypeId.TIMESTAMP:
        unit = {0: "SECOND", 1: "MILLISECOND", 2: "MICROSECOND",
                3: "NANOSECOND"}[int(t.unit)]
        out = {"name": "timestamp", "unit": unit}
        if t.tz:
            out["timezone"] = t.tz
        return out
    if tid == dt.TypeId.DURATION:
        unit = {0: "SECOND", 1: "MILLISECOND", 2: "MICROSECOND",
                3: "NANOSECOND"}[int(t.unit)]
        return {"name": "duration", "unit": unit}
    if tid == dt.TypeId.LIST:
        return {"name": "list"}
    if tid == dt.TypeId.LARGE_LIST:
        return {"name": "largelist"}
    if tid == dt.TypeId.FIXED_SIZE_LIST:
        return {"name": "fixedsizelist", "listSize": t.list_size}
    if tid == dt.TypeId.STRUCT:
        return {"name": "struct"}
    if tid == dt.TypeId.MAP:
        return {"name": "map", "keysSorted": t.keys_sorted}
    raise ArrowNotImplemented(f"arrjson type {t}")


def _type_from_json(j: Dict[str, Any], children: List[dt.Field]) -> dt.DataType:
    n = j["name"]
    if n == "null":
        return dt.null
    if n == "bool":
        return dt.bool_
    if n == "int":
        key = (j["bitWidth"], j.get("isSigned", False))
        return {(8, True): dt.int8, (16, True): dt.int16, (32, True): dt.int32,
                (64, True): dt.int64, (8, False): dt.uint8,
                (16, False): dt.uint16, (32, False): dt.uint32,
                (64, False): dt.uint64}[key]
    if n == "floatingpoint":
        return {"HALF": dt.float16, "SINGLE": dt.float32,
                "DOUBLE": dt.float64}[j["precision"]]
    if n == "utf8":
        return dt.string
    if n == "binary":
        return dt.binary
    if n == "largeutf8":
        return dt.large_string
    if n == "largebinary":
        return dt.large_binary
    if n == "decimal":
        bw = j.get("bitWidth", 128)
        ctor = {32: dt.decimal32, 64: dt.decimal64, 128: dt.decimal128,
                256: dt.decimal256}[bw]
        return ctor(j["precision"], j["scale"])
    if n == "fixedsizebinary":
        return dt.fixed_size_binary(j["byteWidth"])
    if n == "date":
        return dt.date32 if j["unit"] == "DAY" else dt.date64
    if n == "time":
        unit = {"SECOND": "s", "MILLISECOND": "ms", "MICROSECOND": "us",
                "NANOSECOND": "ns"}[j["unit"]]
        return dt.time32(unit) if j["bitWidth"] == 32 else dt.time64(unit)
    if n == "timestamp":
        unit = {"SECOND": "s", "MILLISECOND": "ms", "MICROSECOND": "us",
                "NANOSECOND": "ns"}[j["unit"]]
        return dt.timestamp(unit, j.get("timezone"))
    if n == "duration":
        unit = {"SECOND": "s", "MILLISECOND": "ms", "MICROSECOND": "us",
                "NANOSECOND": "ns"}[j["unit"]]
        return dt.duration(unit)
    if n == "list":
        return dt.list_(children[0])
    if n == "largelist":
        return dt.large_list(children[0])
    if n == "fixedsizelist":
        return dt.fixed_size_list(children[0], j["listSize"])
    if n == "struct":
        return dt.struct(children)
    if n == "map":
        entries = children[0].type
        return dt.map_(entries.field(0).type, entries.field(1).type,
                       j.get("keysSorted", False))
    raise ArrowNotImplemented(f"arrjson type {n!r}")


def _field_to_json(f: dt.Field) -> Dict[str, Any]:
    return {"name": f.name, "type": _type_to_json(f.type),
            "nullable": f.nullable,
            "children": [_field_to_json(c) for c in f.type.fields()]}


def _field_from_json(j: Dict[str, Any]) -> dt.Field:
    children = [_field_from_json(c) for c in j.get("children", [])]
    t = _type_from_json(j["type"], children)
    return dt.Field(j["name"], t, j.get("nullable", True))


# -- column <-> json --------------------------------------------------------

def _column_to_json(name: str, data: ArrayData) -> Dict[str, Any]:
    from ..ipc.core import compact
    data = compact(data) if (data.offset or any(
        c.offset for c in data.children)) else data
    arr = make_array(data)
    t = data.type
    out: Dict[str, Any] = {"name": name, "count": data.length}
    tid = t.id
    if tid == dt.TypeId.NULL:
        return out
    validity = [1 if arr.is_valid(i) else 0 for i in range(data.length)]
    out["VALIDITY"] = validity
    if tid == dt.TypeId.BOOL:
        out["DATA"] = [1 if v else 0 for v in arr.to_numpy()]
        return out
    if t.is_integer or t.is_temporal and t.np_dtype is not None \
            and t.np_dtype.names is None:
        vals = arr.values
        if t.bit_width == 64:
            out["DATA"] = [str(int(v)) for v in vals]
        else:
            out["DATA"] = [int(v) for v in vals]
        return out
    if t.is_floating:
        out["DATA"] = [float(v) for v in arr.values]
        return out
    if t.is_decimal:
        out["DATA"] = [str(arr.unscaled(i)) for i in range(data.length)]
        return out
    if tid in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING):
        out["OFFSET"] = [int(o) for o in arr.offsets]
        out["DATA"] = [arr.value_bytes(i).decode("utf-8")
                       for i in range(data.length)]
        return out
    if tid in (dt.TypeId.BINARY, dt.TypeId.LARGE_BINARY):
        out["OFFSET"] = [int(o) for o in arr.offsets]
        out["DATA"] = [arr.value_bytes(i).hex().upper()
                       for i in range(data.length)]
        return out
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        out["DATA"] = [arr.value(i).hex().upper() for i in range(data.length)]
        return out
    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        out["OFFSET"] = [int(o) for o in arr.offsets]
        out["children"] = [_column_to_json(t.fields()[0].name,
                                           data.children[0])]
        return out
    if tid in (dt.TypeId.STRUCT, dt.TypeId.FIXED_SIZE_LIST):
        out["children"] = [_column_to_json(f.name, c)
                           for f, c in zip(t.fields(), data.children)]
        return out
    raise ArrowNotImplemented(f"arrjson column {t}")


def _column_from_json(j: Dict[str, Any], f: dt.Field) -> ArrayData:
    t = f.type
    n = j["count"]
    tid = t.id
    if tid == dt.TypeId.NULL:
        return ArrayData(t, n, [], null_count=n)
    validity = np.array(j.get("VALIDITY", [1] * n), dtype=np.bool_)
    nc = int(n - validity.sum())
    vb = Buffer(bitutil.pack_bits(validity)) if nc else None
    if tid == dt.TypeId.BOOL:
        db = Buffer(bitutil.pack_bits(np.array(j["DATA"], dtype=np.bool_)))
        return ArrayData(t, n, [vb, db], null_count=nc)
    if t.np_dtype is not None and (t.is_numeric or t.is_temporal) and \
            t.np_dtype.names is None and tid != dt.TypeId.DICTIONARY:
        vals = np.array([int(v) if isinstance(v, str) else v
                         for v in j["DATA"]], dtype=t.np_dtype)
        return ArrayData(t, n, [vb, Buffer.wrap(vals)], null_count=nc)
    if t.is_decimal:
        bw = t.bit_width // 8
        raw = b"".join(int(v).to_bytes(bw, "little", signed=True)
                       for v in j["DATA"])
        return ArrayData(t, n, [vb, Buffer.from_bytes(raw)], null_count=nc)
    if tid in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING):
        off = np.array(j["OFFSET"], dtype=t.offset_dtype)
        blob = "".join(j["DATA"]).encode("utf-8")
        return ArrayData(t, n, [vb, Buffer.wrap(off), Buffer.from_bytes(blob)],
                         null_count=nc)
    if tid in (dt.TypeId.BINARY, dt.TypeId.LARGE_BINARY):
        off = np.array(j["OFFSET"], dtype=t.offset_dtype)
        blob = b"".join(bytes.fromhex(v) for v in j["DATA"])
        return ArrayData(t, n, [vb, Buffer.wrap(off), Buffer.from_bytes(blob)],
                         null_count=nc)
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        blob = b"".join(bytes.fromhex(v) for v in j["DATA"])
        return ArrayData(t, n, [vb, Buffer.from_bytes(blob)], null_count=nc)
    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        off = np.array(j["OFFSET"], dtype=t.offset_dtype)
        child = _column_from_json(j["children"][0], t.fields()[0])
        return ArrayData(t, n, [vb, Buffer.wrap(off)], [child], null_count=nc)
    if tid in (dt.TypeId.STRUCT, dt.TypeId.FIXED_SIZE_LIST):
        children = [_column_from_json(cj, cf)
                    for cj, cf in zip(j["children"], t.fields())]
        return ArrayData(t, n, [vb], children, null_count=nc)
    raise ArrowNotImplemented(f"arrjson column {t}")


# -- file level -------------------------------------------------------------

def write_arrjson(batches: List[RecordBatch], sink=None) -> str:
    schema = batches[0].schema if batches else dt.Schema([])
    doc = {
        "schema": {"fields": [_field_to_json(f) for f in schema.fields]},
        "batches": [{"count": rb.num_rows,
                     "columns": [_column_to_json(schema.field(i).name,
                                                 rb.column(i).data)
                                 for i in range(rb.num_columns)]}
                    for rb in batches],
    }
    text = _json.dumps(doc, indent=2)
    if sink is not None:
        if isinstance(sink, str):
            with open(sink, "w") as fobj:
                fobj.write(text)
        else:
            sink.write(text)
    return text


def read_arrjson(source) -> List[RecordBatch]:
    if isinstance(source, str) and source.lstrip().startswith("{"):
        doc = _json.loads(source)
    elif isinstance(source, (bytes, bytearray)):
        doc = _json.loads(source)
    elif isinstance(source, str):
        with open(source) as fobj:
            doc = _json.load(fobj)
    else:
        doc = _json.load(source)
    fields = [_field_from_json(fj) for fj in doc["schema"]["fields"]]
    schema = dt.Schema(fields)
    out = []
    for bj in doc.get("batches", []):
        cols = []
        for f, cj in zip(fields, bj["columns"]):
            cols.append(make_array(_column_from_json(cj, f)))
        out.append(RecordBatch(schema, cols, bj["count"]))
    return out
