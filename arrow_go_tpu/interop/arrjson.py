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
    if tid == dt.TypeId.INTERVAL_MONTHS:
        return {"name": "interval", "unit": "YEAR_MONTH"}
    if tid == dt.TypeId.INTERVAL_DAY_TIME:
        return {"name": "interval", "unit": "DAY_TIME"}
    if tid == dt.TypeId.INTERVAL_MONTH_DAY_NANO:
        return {"name": "interval", "unit": "MONTH_DAY_NANO"}
    if tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        mode = "SPARSE" if tid == dt.TypeId.SPARSE_UNION else "DENSE"
        return {"name": "union", "mode": mode,
                "typeIds": list(t.type_codes)}
    if tid == dt.TypeId.STRING_VIEW:
        return {"name": "utf8view"}
    if tid == dt.TypeId.BINARY_VIEW:
        return {"name": "binaryview"}
    if tid == dt.TypeId.LIST_VIEW:
        return {"name": "listview"}
    if tid == dt.TypeId.LARGE_LIST_VIEW:
        return {"name": "largelistview"}
    if tid == dt.TypeId.RUN_END_ENCODED:
        return {"name": "runendencoded"}
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
    if n == "interval":
        return {"YEAR_MONTH": dt.month_interval,
                "DAY_TIME": dt.day_time_interval,
                "MONTH_DAY_NANO": dt.month_day_nano_interval}[j["unit"]]
    if n == "union":
        ctor = dt.sparse_union if j["mode"] == "SPARSE" else dt.dense_union
        return ctor(children, j.get("typeIds"))
    if n == "utf8view":
        return dt.string_view
    if n == "binaryview":
        return dt.binary_view
    if n == "listview":
        return dt.ListViewType(children[0])
    if n == "largelistview":
        return dt.LargeListViewType(children[0])
    if n == "runendencoded":
        return dt.run_end_encoded(children[0].type, children[1].type)
    raise ArrowNotImplemented(f"arrjson type {n!r}")


class _DictMemo:
    """Dictionary-id bookkeeping shared by schema and batch codecs
    (the reference's dictutils.Mapper/Memo, arrjson.go:706-716,781).
    Ids are assigned in schema DFS order on write; on read they come
    from the file."""

    def __init__(self):
        self.value_fields: Dict[int, dt.Field] = {}   # id -> value field
        self.value_jsons: Dict[int, Dict] = {}        # id -> field json
        self.arrays: Dict[int, ArrayData] = {}        # id -> dict values
        self._next = 0

    def new_id(self) -> int:
        i = self._next
        self._next += 1
        return i


def _field_to_json(f: dt.Field, memo: Optional[_DictMemo] = None
                   ) -> Dict[str, Any]:
    t = f.type
    if t.id == dt.TypeId.DICTIONARY:
        vt = t.value_type
        out = {"name": f.name, "type": _type_to_json(vt),
               "nullable": f.nullable}
        if memo is not None:
            # id assigned BEFORE descending — _collect_dictionaries
            # mirrors this pre-order so ids pair with the right arrays
            did = memo.new_id()
            memo.value_fields[did] = dt.Field(f.name, vt, f.nullable)
            out["dictionary"] = {"id": did,
                                 "indexType": _type_to_json(t.index_type),
                                 "isOrdered": bool(t.ordered)}
        out["children"] = [_field_to_json(c, memo) for c in vt.fields()]
        return out
    return {"name": f.name, "type": _type_to_json(t),
            "nullable": f.nullable,
            "children": [_field_to_json(c, memo) for c in t.fields()]}


def _field_from_json(j: Dict[str, Any],
                     memo: Optional[_DictMemo] = None) -> dt.Field:
    children = [_field_from_json(c, memo) for c in j.get("children", [])]
    t = _type_from_json(j["type"], children)
    dj = j.get("dictionary")
    if dj is not None:
        idx_t = _type_from_json(dj["indexType"], [])
        if memo is not None:
            memo.value_fields[dj["id"]] = dt.Field(j["name"], t)
            memo.value_jsons[dj["id"]] = j
        t = dt.dictionary(idx_t, t, dj.get("isOrdered", False))
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
    if tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        # unions carry no validity of their own (arrjson.go:834 TYPE_ID)
        out["TYPE_ID"] = [int(x) for x in arr.type_ids]
        if tid == dt.TypeId.DENSE_UNION:
            out["OFFSET"] = [int(x) for x in
                             data.buffers[1].view(np.int32)[:data.length]]
        out["children"] = [_column_to_json(f.name, c)
                           for f, c in zip(t.fields(), data.children)]
        return out
    if tid == dt.TypeId.RUN_END_ENCODED:
        out["children"] = [
            _column_to_json(t.fields()[0].name, data.children[0]),
            _column_to_json(t.fields()[1].name, data.children[1])]
        return out
    validity = [1 if arr.is_valid(i) else 0 for i in range(data.length)]
    out["VALIDITY"] = validity
    if tid == dt.TypeId.DICTIONARY:
        # indices only; the values array goes to the file-level
        # "dictionaries" section (arrjson.go:776 Dictionary)
        iv = arr.indices.to_numpy()
        out["DATA"] = ([str(int(v)) for v in iv]
                       if t.index_type.bit_width == 64
                       else [int(v) for v in iv])
        return out
    if tid == dt.TypeId.INTERVAL_DAY_TIME:
        out["DATA"] = [{"days": int(x["days"]),
                        "milliseconds": int(x["milliseconds"])}
                       for x in arr.values]
        return out
    if tid == dt.TypeId.INTERVAL_MONTH_DAY_NANO:
        out["DATA"] = [{"months": int(x["months"]), "days": int(x["days"]),
                        "nanoseconds": int(x["nanoseconds"])}
                       for x in arr.values]
        return out
    if tid in (dt.TypeId.STRING_VIEW, dt.TypeId.BINARY_VIEW):
        is_bin = tid == dt.TypeId.BINARY_VIEW
        raw = np.asarray(arr.views)
        vs: List[Dict[str, Any]] = []
        for i in range(data.length):
            base = 16 * i
            ln = int(raw[base:base + 4].view(np.int32)[0])
            if ln <= 12:
                b = raw[base + 4:base + 4 + ln].tobytes()
                vs.append({"SIZE": ln,
                           "INLINED": (b.hex().upper() if is_bin
                                       else b.decode("utf-8"))})
            else:
                vs.append({
                    "SIZE": ln,
                    "PREFIX_HEX": raw[base + 4:base + 8].tobytes()
                    .hex().upper(),
                    "BUFFER_INDEX": int(raw[base + 8:base + 12]
                                        .view(np.int32)[0]),
                    "OFFSET": int(raw[base + 12:base + 16]
                                  .view(np.int32)[0])})
        out["VIEWS"] = vs
        out["VARIADIC_DATA_BUFFERS"] = [
            bytes(np.asarray(b.data)).hex().upper()
            for b in data.buffers[2:]]
        return out
    if tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        out["OFFSET"] = [int(o) for o in arr.offsets]
        out["SIZE"] = [int(s) for s in arr.sizes]
        out["children"] = [_column_to_json(t.fields()[0].name,
                                           data.children[0])]
        return out
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


def _column_from_json(j: Dict[str, Any], f: dt.Field,
                      fj: Optional[Dict[str, Any]] = None,
                      dicts: Optional[Dict[int, ArrayData]] = None
                      ) -> ArrayData:
    """fj: the schema-field json for this column (carries dictionary ids
    and child field jsons); dicts: id -> parsed dictionary values."""
    t = f.type
    n = j["count"]
    tid = t.id
    cjs = (fj or {}).get("children", [])

    def child_fj(i):
        return cjs[i] if i < len(cjs) else None

    if tid == dt.TypeId.NULL:
        return ArrayData(t, n, [], null_count=n)
    if tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        tids = np.array(j["TYPE_ID"], dtype=np.int8)
        bufs: List[Optional[Buffer]] = [Buffer.wrap(tids)]
        if tid == dt.TypeId.DENSE_UNION:
            bufs.append(Buffer.wrap(np.array(j["OFFSET"], dtype=np.int32)))
        children = [_column_from_json(cj, cf, child_fj(i), dicts)
                    for i, (cj, cf) in enumerate(
                        zip(j["children"], t.fields()))]
        return ArrayData(t, n, bufs, children, null_count=0)
    if tid == dt.TypeId.RUN_END_ENCODED:
        children = [_column_from_json(cj, cf, child_fj(i), dicts)
                    for i, (cj, cf) in enumerate(
                        zip(j["children"], t.fields()))]
        return ArrayData(t, n, [], children, null_count=0)
    validity = np.array(j.get("VALIDITY", [1] * n), dtype=np.bool_)
    nc = int(n - validity.sum())
    vb = Buffer(bitutil.pack_bits(validity)) if nc else None
    if tid == dt.TypeId.DICTIONARY:
        vals = np.array([int(v) for v in j["DATA"]],
                        dtype=t.index_type.np_dtype)
        did = (fj or {}).get("dictionary", {}).get("id")
        dic = (dicts or {}).get(did)
        if dic is None:
            raise ArrowInvalid(f"arrjson: no dictionary for id={did}")
        return ArrayData(t, n, [vb, Buffer.wrap(vals)],
                         dictionary=dic, null_count=nc)
    if tid == dt.TypeId.BOOL:
        db = Buffer(bitutil.pack_bits(np.array(j["DATA"], dtype=np.bool_)))
        return ArrayData(t, n, [vb, db], null_count=nc)
    if tid in (dt.TypeId.INTERVAL_DAY_TIME, dt.TypeId.INTERVAL_MONTH_DAY_NANO):
        vals = np.zeros(n, dtype=t.np_dtype)
        keys = t.np_dtype.names
        for i, v in enumerate(j["DATA"]):
            vals[i] = tuple(int(v[k]) for k in keys)
        return ArrayData(t, n, [vb, Buffer.wrap(vals)], null_count=nc)
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
    if tid in (dt.TypeId.STRING_VIEW, dt.TypeId.BINARY_VIEW):
        is_bin = tid == dt.TypeId.BINARY_VIEW
        variadic = [Buffer.from_bytes(bytes.fromhex(h))
                    for h in j.get("VARIADIC_DATA_BUFFERS", [])]
        raw = bytearray(16 * n)
        for i, v in enumerate(j.get("VIEWS", [])):
            base = 16 * i
            sz = int(v["SIZE"])
            raw[base:base + 4] = sz.to_bytes(4, "little", signed=True)
            if "INLINED" in v:
                b = (bytes.fromhex(v["INLINED"]) if is_bin
                     else v["INLINED"].encode("utf-8"))
                raw[base + 4:base + 4 + len(b)] = b
            else:
                raw[base + 4:base + 8] = bytes.fromhex(v["PREFIX_HEX"])
                raw[base + 8:base + 12] = int(v["BUFFER_INDEX"]) \
                    .to_bytes(4, "little")
                raw[base + 12:base + 16] = int(v["OFFSET"]) \
                    .to_bytes(4, "little")
        return ArrayData(t, n, [vb, Buffer.from_bytes(bytes(raw))]
                         + variadic, null_count=nc)
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        blob = b"".join(bytes.fromhex(v) for v in j["DATA"])
        return ArrayData(t, n, [vb, Buffer.from_bytes(blob)], null_count=nc)
    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        off = np.array(j["OFFSET"], dtype=t.offset_dtype)
        child = _column_from_json(j["children"][0], t.fields()[0],
                                  child_fj(0), dicts)
        return ArrayData(t, n, [vb, Buffer.wrap(off)], [child], null_count=nc)
    if tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        off = np.array(j["OFFSET"], dtype=t.offset_dtype)
        szs = np.array(j["SIZE"], dtype=t.offset_dtype)
        child = _column_from_json(j["children"][0], t.fields()[0],
                                  child_fj(0), dicts)
        return ArrayData(t, n, [vb, Buffer.wrap(off), Buffer.wrap(szs)],
                         [child], null_count=nc)
    if tid in (dt.TypeId.STRUCT, dt.TypeId.FIXED_SIZE_LIST):
        children = [_column_from_json(cj, cf, child_fj(i), dicts)
                    for i, (cj, cf) in enumerate(
                        zip(j["children"], t.fields()))]
        return ArrayData(t, n, [vb], children, null_count=nc)
    raise ArrowNotImplemented(f"arrjson column {t}")


# -- file level -------------------------------------------------------------

def _collect_dictionaries(t: dt.DataType, data: ArrayData, memo: _DictMemo,
                          out: Dict[int, ArrayData]) -> None:
    """Pre-order walk matching _field_to_json's id assignment: pair each
    dictionary id with the values array from this batch."""
    if t.id == dt.TypeId.DICTIONARY:
        did = memo.new_id()
        if did not in out and data.dictionary is not None:
            out[did] = data.dictionary
        for cf, cd in zip(t.value_type.fields(),
                          (data.dictionary.children
                           if data.dictionary is not None else [])):
            _collect_dictionaries(cf.type, cd, memo, out)
        return
    for cf, cd in zip(t.fields(), data.children):
        _collect_dictionaries(cf.type, cd, memo, out)


def write_arrjson(batches: List[RecordBatch], sink=None) -> str:
    schema = batches[0].schema if batches else dt.Schema([])
    memo = _DictMemo()
    fields_json = [_field_to_json(f, memo) for f in schema.fields]
    doc: Dict[str, Any] = {
        "schema": {"fields": fields_json},
        "batches": [{"count": rb.num_rows,
                     "columns": [_column_to_json(schema.field(i).name,
                                                 rb.column(i).data)
                                 for i in range(rb.num_columns)]}
                    for rb in batches],
    }
    if memo.value_fields and batches:
        arrays: Dict[int, ArrayData] = {}
        walk_memo = _DictMemo()     # fresh counter, same pre-order
        rb0 = batches[0]
        for i in range(rb0.num_columns):
            _collect_dictionaries(schema.field(i).type, rb0.column(i).data,
                                  walk_memo, arrays)
        doc["dictionaries"] = [
            {"id": did,
             "data": {"count": arrays[did].length,
                      "columns": [_column_to_json(
                          memo.value_fields[did].name, arrays[did])]}}
            for did in sorted(arrays)]
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
    memo = _DictMemo()
    fjs = doc["schema"]["fields"]
    fields = [_field_from_json(fj, memo) for fj in fjs]
    schema = dt.Schema(fields)
    # dictionaries may reference other dictionaries (dict-of-dict
    # values): iterate until every id parses (arrjson.go:781)
    dicts: Dict[int, ArrayData] = {}
    todo = list(doc.get("dictionaries", []))
    for _ in range(len(todo) + 1):
        rest = []
        for dj in todo:
            did = dj["id"]
            vf = memo.value_fields.get(did)
            if vf is None:
                raise ArrowInvalid(f"arrjson: unknown dictionary id {did}")
            try:
                dicts[did] = _column_from_json(
                    dj["data"]["columns"][0], vf,
                    memo.value_jsons.get(did), dicts)
            except ArrowInvalid:
                rest.append(dj)
        if not rest:
            break
        todo = rest
    out = []
    for bj in doc.get("batches", []):
        cols = []
        for f, fj, cj in zip(fields, fjs, bj["columns"]):
            cols.append(make_array(_column_from_json(cj, f, fj, dicts)))
        out.append(RecordBatch(schema, cols, bj["count"]))
    return out
