"""Arrow format metadata: flatbuffers Schema/Field/Type encode+decode.

Spec: arrow format/Schema.fbs (slot ids stable by spec; cross-checked
against reference arrow/internal/flatbuf generated code). Writer uses the
flatbuffers Builder slot API directly.
"""
from __future__ import annotations

import flatbuffers
import flatbuffers.number_types as N

from .. import dtypes as dt
from .fb import Reader, vt

# Type union discriminants (format/Schema.fbs union Type)
T_NULL, T_INT, T_FLOAT, T_BINARY, T_UTF8, T_BOOL, T_DECIMAL, T_DATE, \
    T_TIME, T_TIMESTAMP, T_INTERVAL, T_LIST, T_STRUCT, T_UNION, T_FSB, \
    T_FSL, T_MAP, T_DURATION, T_LARGE_BINARY, T_LARGE_UTF8, T_LARGE_LIST, \
    T_REE, T_BINARY_VIEW, T_UTF8_VIEW, T_LIST_VIEW, T_LARGE_LIST_VIEW = \
    range(1, 27)

MSG_SCHEMA, MSG_DICTIONARY_BATCH, MSG_RECORD_BATCH, MSG_TENSOR = 1, 2, 3, 4
METADATA_V5 = 4

COMPRESS_LZ4 = 0
COMPRESS_ZSTD = 1


# ---------------------------------------------------------------------------
# type encode
# ---------------------------------------------------------------------------

def _start(b, n):
    b.StartObject(n)


def _end(b):
    return b.EndObject()


def write_type(b: flatbuffers.Builder, t: dt.DataType):
    """Returns (union_discriminant, offset)."""
    tid = t.id
    if tid == dt.TypeId.NULL:
        _start(b, 0)
        return T_NULL, _end(b)
    if tid == dt.TypeId.BOOL:
        _start(b, 0)
        return T_BOOL, _end(b)
    if t.is_integer or tid == dt.TypeId.DICTIONARY:
        it = t.index_type if tid == dt.TypeId.DICTIONARY else t
        _start(b, 2)
        b.PrependInt32Slot(0, it.bit_width, 0)
        b.PrependBoolSlot(1, it.is_signed_integer, False)
        return T_INT, _end(b)
    if t.is_floating:
        prec = {dt.TypeId.FLOAT16: 0, dt.TypeId.FLOAT32: 1,
                dt.TypeId.FLOAT64: 2}[tid]
        _start(b, 1)
        b.PrependInt16Slot(0, prec, 0)
        return T_FLOAT, _end(b)
    if tid == dt.TypeId.BINARY:
        _start(b, 0)
        return T_BINARY, _end(b)
    if tid == dt.TypeId.STRING:
        _start(b, 0)
        return T_UTF8, _end(b)
    if tid == dt.TypeId.LARGE_BINARY:
        _start(b, 0)
        return T_LARGE_BINARY, _end(b)
    if tid == dt.TypeId.LARGE_STRING:
        _start(b, 0)
        return T_LARGE_UTF8, _end(b)
    if t.is_decimal:
        _start(b, 3)
        b.PrependInt32Slot(0, t.precision, 0)
        b.PrependInt32Slot(1, t.scale, 0)
        b.PrependInt32Slot(2, t.bit_width, 128)
        return T_DECIMAL, _end(b)
    if tid == dt.TypeId.DATE32:
        _start(b, 1)
        b.PrependInt16Slot(0, 0, -1)  # spec default is MILLISECOND: force
        return T_DATE, _end(b)
    if tid == dt.TypeId.DATE64:
        _start(b, 1)
        b.PrependInt16Slot(0, 1, -1)
        return T_DATE, _end(b)
    if tid in (dt.TypeId.TIME32, dt.TypeId.TIME64):
        _start(b, 2)
        b.PrependInt16Slot(0, int(t.unit), -1)  # default ms: force write
        b.PrependInt32Slot(1, t.bit_width, 32)
        return T_TIME, _end(b)
    if tid == dt.TypeId.TIMESTAMP:
        tz = b.CreateString(t.tz) if t.tz else None
        _start(b, 2)
        b.PrependInt16Slot(0, int(t.unit), 0)
        if tz is not None:
            b.PrependUOffsetTRelativeSlot(1, tz, 0)
        return T_TIMESTAMP, _end(b)
    if tid == dt.TypeId.DURATION:
        _start(b, 1)
        b.PrependInt16Slot(0, int(t.unit), -1)  # default ms: force write
        return T_DURATION, _end(b)
    if tid == dt.TypeId.INTERVAL_MONTHS:
        _start(b, 1)
        b.PrependInt16Slot(0, 0, 0)
        return T_INTERVAL, _end(b)
    if tid == dt.TypeId.INTERVAL_DAY_TIME:
        _start(b, 1)
        b.PrependInt16Slot(0, 1, 0)
        return T_INTERVAL, _end(b)
    if tid == dt.TypeId.INTERVAL_MONTH_DAY_NANO:
        _start(b, 1)
        b.PrependInt16Slot(0, 2, 0)
        return T_INTERVAL, _end(b)
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        _start(b, 1)
        b.PrependInt32Slot(0, t.byte_width, 0)
        return T_FSB, _end(b)
    if tid in (dt.TypeId.LIST,):
        _start(b, 0)
        return T_LIST, _end(b)
    if tid == dt.TypeId.LARGE_LIST:
        _start(b, 0)
        return T_LARGE_LIST, _end(b)
    if tid == dt.TypeId.FIXED_SIZE_LIST:
        _start(b, 1)
        b.PrependInt32Slot(0, t.list_size, 0)
        return T_FSL, _end(b)
    if tid == dt.TypeId.STRUCT:
        _start(b, 0)
        return T_STRUCT, _end(b)
    if tid == dt.TypeId.MAP:
        _start(b, 1)
        b.PrependBoolSlot(0, t.keys_sorted, False)
        return T_MAP, _end(b)
    if tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        b.StartVector(4, len(t.type_codes), 4)
        for c in reversed(t.type_codes):
            b.PrependInt32(c)
        codes = b.EndVector()
        _start(b, 2)
        b.PrependInt16Slot(0, 0 if tid == dt.TypeId.SPARSE_UNION else 1, 0)
        b.PrependUOffsetTRelativeSlot(1, codes, 0)
        return T_UNION, _end(b)
    if tid == dt.TypeId.RUN_END_ENCODED:
        _start(b, 0)
        return T_REE, _end(b)
    if tid == dt.TypeId.BINARY_VIEW:
        _start(b, 0)
        return T_BINARY_VIEW, _end(b)
    if tid == dt.TypeId.STRING_VIEW:
        _start(b, 0)
        return T_UTF8_VIEW, _end(b)
    if tid == dt.TypeId.LIST_VIEW:
        _start(b, 0)
        return T_LIST_VIEW, _end(b)
    if tid == dt.TypeId.LARGE_LIST_VIEW:
        _start(b, 0)
        return T_LARGE_LIST_VIEW, _end(b)
    raise NotImplementedError(f"IPC write of type {t}")


def write_kv_vector(b, md: dt.Metadata):
    if not md:
        return None
    offs = []
    for k, v in zip(md.keys, md.values):
        ko = b.CreateString(k)
        vo = b.CreateString(v)
        _start(b, 2)
        b.PrependUOffsetTRelativeSlot(0, ko, 0)
        b.PrependUOffsetTRelativeSlot(1, vo, 0)
        offs.append(_end(b))
    b.StartVector(4, len(offs), 4)
    for o in reversed(offs):
        b.PrependUOffsetTRelative(o)
    return b.EndVector()


def write_field(b: flatbuffers.Builder, f: dt.Field, dict_ids: dict):
    t = f.type
    field_md = f.metadata
    if t.id == dt.TypeId.EXTENSION:
        # extension types serialize as storage + ARROW:extension:* field
        # metadata (Arrow spec; reference arrow/datatype_extension.go)
        keys = list(field_md.keys) if field_md else []
        vals = list(field_md.values) if field_md else []
        keys += ["ARROW:extension:name"]
        vals += [t.extension_name]
        if t.serialized:
            keys += ["ARROW:extension:metadata"]
            vals += [t.serialized.decode("utf-8", "surrogateescape")]
        field_md = dt.Metadata(keys=keys, values=vals)
        t = t.storage_type
    storage = t
    dict_off = None
    if t.id == dt.TypeId.DICTIONARY:
        # DictionaryEncoding table; children/type describe the VALUE type
        idx_t = t.index_type
        _start(b, 2)
        b.PrependInt32Slot(0, idx_t.bit_width, 0)
        b.PrependBoolSlot(1, idx_t.is_signed_integer, False)
        int_off = _end(b)
        did = dict_ids[id(f)]
        _start(b, 4)
        b.PrependInt64Slot(0, did, 0)
        b.PrependUOffsetTRelativeSlot(1, int_off, 0)
        b.PrependBoolSlot(2, t.ordered, False)
        dict_off = _end(b)
        storage = t.value_type

    children = [write_field(b, cf, dict_ids) for cf in storage.fields()]
    b.StartVector(4, len(children), 4)
    for c in reversed(children):
        b.PrependUOffsetTRelative(c)
    child_vec = b.EndVector()

    disc, type_off = write_type(b, storage)
    name_off = b.CreateString(f.name)
    md_off = write_kv_vector(b, field_md)

    _start(b, 7)
    b.PrependUOffsetTRelativeSlot(0, name_off, 0)
    b.PrependBoolSlot(1, f.nullable, False)
    b.PrependUint8Slot(2, disc, 0)
    b.PrependUOffsetTRelativeSlot(3, type_off, 0)
    if dict_off is not None:
        b.PrependUOffsetTRelativeSlot(4, dict_off, 0)
    b.PrependUOffsetTRelativeSlot(5, child_vec, 0)
    if md_off is not None:
        b.PrependUOffsetTRelativeSlot(6, md_off, 0)
    return _end(b)


def write_schema(b: flatbuffers.Builder, schema: dt.Schema, dict_ids: dict,
                 endianness: int = 0):
    fields = [write_field(b, f, dict_ids) for f in schema.fields]
    b.StartVector(4, len(fields), 4)
    for f in reversed(fields):
        b.PrependUOffsetTRelative(f)
    fvec = b.EndVector()
    md_off = write_kv_vector(b, schema.metadata)
    _start(b, 4)
    b.PrependInt16Slot(0, endianness, 0)  # 0=little, 1=big
    b.PrependUOffsetTRelativeSlot(1, fvec, 0)
    if md_off is not None:
        b.PrependUOffsetTRelativeSlot(2, md_off, 0)
    return _end(b)


# ---------------------------------------------------------------------------
# type decode
# ---------------------------------------------------------------------------

def read_kv_vector(r: Reader, slot: int) -> dt.Metadata:
    n = r.vector_len(slot)
    keys, vals = [], []
    for i in range(n):
        kv = r.vector_table(slot, i)
        keys.append(kv.string(0) or "")
        vals.append(kv.string(1) or "")
    return dt.Metadata(keys=keys, values=vals) if n else dt.EMPTY_METADATA


_INT_TYPES = {(8, True): dt.int8, (16, True): dt.int16, (32, True): dt.int32,
              (64, True): dt.int64, (8, False): dt.uint8,
              (16, False): dt.uint16, (32, False): dt.uint32,
              (64, False): dt.uint64}


def read_type(disc: int, tr: Reader, children: list) -> dt.DataType:
    if disc == T_NULL:
        return dt.null
    if disc == T_BOOL:
        return dt.bool_
    if disc == T_INT:
        return _INT_TYPES[(tr.i32(0), tr.bool_(1))]
    if disc == T_FLOAT:
        return (dt.float16, dt.float32, dt.float64)[tr.i16(0)]
    if disc == T_BINARY:
        return dt.binary
    if disc == T_UTF8:
        return dt.string
    if disc == T_LARGE_BINARY:
        return dt.large_binary
    if disc == T_LARGE_UTF8:
        return dt.large_string
    if disc == T_DECIMAL:
        bw = tr.i32(2, 128)
        ctor = {32: dt.decimal32, 64: dt.decimal64, 128: dt.decimal128,
                256: dt.decimal256}[bw]
        return ctor(tr.i32(0), tr.i32(1))
    if disc == T_DATE:
        return dt.date32 if tr.i16(0, 1) == 0 else dt.date64
    if disc == T_TIME:
        unit = dt.TimeUnit(tr.i16(0, 1))
        return dt.Time32Type(unit) if tr.i32(1, 32) == 32 else dt.Time64Type(unit)
    if disc == T_TIMESTAMP:
        return dt.TimestampType(dt.TimeUnit(tr.i16(0)), tr.string(1))
    if disc == T_DURATION:
        return dt.DurationType(dt.TimeUnit(tr.i16(0, 1)))
    if disc == T_INTERVAL:
        return (dt.month_interval, dt.day_time_interval,
                dt.month_day_nano_interval)[tr.i16(0)]
    if disc == T_FSB:
        return dt.fixed_size_binary(tr.i32(0))
    if disc == T_LIST:
        return dt.ListType(children[0])
    if disc == T_LARGE_LIST:
        return dt.LargeListType(children[0])
    if disc == T_FSL:
        return dt.FixedSizeListType(children[0], tr.i32(0))
    if disc == T_STRUCT:
        return dt.StructType(children)
    if disc == T_MAP:
        entries = children[0].type
        m = dt.MapType(entries.field(0).type, entries.field(1).type,
                       tr.bool_(0), entries.field(1).nullable)
        return m
    if disc == T_UNION:
        n = tr.vector_len(1)
        codes = [tr.vector_i32(1, i) for i in range(n)] or None
        mode = tr.i16(0)
        return (dt.SparseUnionType if mode == 0 else dt.DenseUnionType)(
            children, codes)
    if disc == T_REE:
        return dt.RunEndEncodedType(children[0].type, children[1].type)
    if disc == T_BINARY_VIEW:
        return dt.binary_view
    if disc == T_UTF8_VIEW:
        return dt.string_view
    if disc == T_LIST_VIEW:
        return dt.ListViewType(children[0])
    if disc == T_LARGE_LIST_VIEW:
        return dt.LargeListViewType(children[0])
    raise NotImplementedError(f"IPC read of type discriminant {disc}")


def read_field(r: Reader, dict_memo: dict) -> dt.Field:
    name = r.string(0) or ""
    nullable = r.bool_(1)
    disc = r.u8(2)
    tr = r.table(3)
    children = [read_field(r.vector_table(5, i), dict_memo)
                for i in range(r.vector_len(5))]
    t = read_type(disc, tr, children)
    enc = r.table(4)
    md = read_kv_vector(r, 6)
    did = None
    if enc is not None:
        did = enc.i64(0)
        it = enc.table(1)
        idx_type = _INT_TYPES[(it.i32(0), it.bool_(1))] if it else dt.int32
        t = dt.DictionaryType(idx_type, t, enc.bool_(2))
    ext_name = md.get("ARROW:extension:name") if md else None
    if ext_name:
        serialized = (md.get("ARROW:extension:metadata") or "").encode(
            "utf-8", "surrogateescape")
        t = dt.ExtensionType(t, ext_name, serialized)
        keep = [(k, v) for k, v in zip(md.keys, md.values)
                if not k.startswith("ARROW:extension:")]
        md = dt.Metadata(keys=[k for k, _ in keep],
                         values=[v for _, v in keep]) if keep \
            else dt.EMPTY_METADATA
    f = dt.Field(name, t, nullable, md)
    if did is not None:
        dict_memo[did] = f
    return f


def read_schema(r: Reader, dict_memo: dict) -> dt.Schema:
    fields = [read_field(r.vector_table(1, i), dict_memo)
              for i in range(r.vector_len(1))]
    return dt.Schema(fields, read_kv_vector(r, 2))
