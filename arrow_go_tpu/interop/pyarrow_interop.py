"""Interop with other Arrow implementations via pyarrow.

The TPU-framework counterpart of the reference's C Data Interface
(reference arrow/cdata/cdata.go — zero-copy cross-implementation array
exchange). Here the bridge is buffer-level: our host arrays and pyarrow
arrays exchange the same Arrow-spec physical buffers without copying the
values where possible. Used by the test suite as the cross-implementation
golden oracle (the role archery/arrow-testing plays for the reference).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array
from ..array.record import ChunkedArray, RecordBatch, Table
from ..memory.buffer import Buffer

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None


def _require_pa():
    if pa is None:
        raise ImportError("pyarrow not available")


# -- type mapping -----------------------------------------------------------

def type_to_pyarrow(t: dt.DataType):
    _require_pa()
    tid = t.id
    simple = {
        dt.TypeId.NULL: pa.null(), dt.TypeId.BOOL: pa.bool_(),
        dt.TypeId.INT8: pa.int8(), dt.TypeId.INT16: pa.int16(),
        dt.TypeId.INT32: pa.int32(), dt.TypeId.INT64: pa.int64(),
        dt.TypeId.UINT8: pa.uint8(), dt.TypeId.UINT16: pa.uint16(),
        dt.TypeId.UINT32: pa.uint32(), dt.TypeId.UINT64: pa.uint64(),
        dt.TypeId.FLOAT16: pa.float16(), dt.TypeId.FLOAT32: pa.float32(),
        dt.TypeId.FLOAT64: pa.float64(), dt.TypeId.STRING: pa.string(),
        dt.TypeId.BINARY: pa.binary(),
        dt.TypeId.LARGE_STRING: pa.large_string(),
        dt.TypeId.LARGE_BINARY: pa.large_binary(),
        dt.TypeId.DATE32: pa.date32(), dt.TypeId.DATE64: pa.date64(),
        dt.TypeId.INTERVAL_MONTH_DAY_NANO: pa.month_day_nano_interval(),
        dt.TypeId.STRING_VIEW: pa.string_view(),
        dt.TypeId.BINARY_VIEW: pa.binary_view(),
    }
    if tid in simple:
        return simple[tid]
    if tid == dt.TypeId.TIMESTAMP:
        return pa.timestamp(str(t.unit), t.tz)
    if tid == dt.TypeId.TIME32:
        return pa.time32(str(t.unit))
    if tid == dt.TypeId.TIME64:
        return pa.time64(str(t.unit))
    if tid == dt.TypeId.DURATION:
        return pa.duration(str(t.unit))
    if tid == dt.TypeId.DECIMAL32:
        return pa.decimal32(t.precision, t.scale)
    if tid == dt.TypeId.DECIMAL64:
        return pa.decimal64(t.precision, t.scale)
    if tid == dt.TypeId.DECIMAL128:
        return pa.decimal128(t.precision, t.scale)
    if tid == dt.TypeId.DECIMAL256:
        return pa.decimal256(t.precision, t.scale)
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        return pa.binary(t.byte_width)
    if tid == dt.TypeId.LIST:
        return pa.list_(pa.field(t.value_field.name, type_to_pyarrow(t.value_type),
                                 t.value_field.nullable))
    if tid == dt.TypeId.LARGE_LIST:
        return pa.large_list(type_to_pyarrow(t.value_type))
    if tid == dt.TypeId.LIST_VIEW:
        return pa.list_view(pa.field(t.value_field.name,
                                     type_to_pyarrow(t.value_type),
                                     t.value_field.nullable))
    if tid == dt.TypeId.LARGE_LIST_VIEW:
        return pa.large_list_view(type_to_pyarrow(t.value_type))
    if tid == dt.TypeId.FIXED_SIZE_LIST:
        return pa.list_(type_to_pyarrow(t.value_type), t.list_size)
    if tid == dt.TypeId.STRUCT:
        return pa.struct([pa.field(f.name, type_to_pyarrow(f.type), f.nullable)
                          for f in t.fields()])
    if tid == dt.TypeId.MAP:
        return pa.map_(type_to_pyarrow(t.key_type), type_to_pyarrow(t.item_type),
                       t.keys_sorted)
    if tid == dt.TypeId.DICTIONARY:
        return pa.dictionary(type_to_pyarrow(t.index_type),
                             type_to_pyarrow(t.value_type), t.ordered)
    if tid == dt.TypeId.DENSE_UNION:
        return pa.dense_union([pa.field(f.name, type_to_pyarrow(f.type))
                               for f in t.fields()], t.type_codes)
    if tid == dt.TypeId.SPARSE_UNION:
        return pa.sparse_union([pa.field(f.name, type_to_pyarrow(f.type))
                                for f in t.fields()], t.type_codes)
    if tid == dt.TypeId.RUN_END_ENCODED:
        return pa.run_end_encoded(type_to_pyarrow(t.run_ends_type),
                                  type_to_pyarrow(t.values_type))
    raise NotImplementedError(f"type_to_pyarrow({t})")


def type_from_pyarrow(t) -> dt.DataType:
    _require_pa()
    import pyarrow.types as pt
    if pt.is_null(t):
        return dt.null
    if pt.is_boolean(t):
        return dt.bool_
    simple = {"int8": dt.int8, "int16": dt.int16, "int32": dt.int32,
              "int64": dt.int64, "uint8": dt.uint8, "uint16": dt.uint16,
              "uint32": dt.uint32, "uint64": dt.uint64,
              "halffloat": dt.float16, "float": dt.float32,
              "double": dt.float64, "string": dt.string, "binary": dt.binary,
              "large_string": dt.large_string, "large_binary": dt.large_binary,
              "date32[day]": dt.date32, "date64[ms]": dt.date64,
              "month_day_nano_interval": dt.month_day_nano_interval,
              "string_view": dt.string_view, "binary_view": dt.binary_view}
    s = str(t)
    if s in simple:
        return simple[s]
    if pt.is_timestamp(t):
        return dt.timestamp(t.unit, t.tz)
    if pt.is_time32(t):
        return dt.time32(t.unit)
    if pt.is_time64(t):
        return dt.time64(t.unit)
    if pt.is_duration(t):
        return dt.duration(t.unit)
    if pt.is_decimal(t):
        if t.bit_width == 32:
            return dt.decimal32(t.precision, t.scale)
        if t.bit_width == 64:
            return dt.decimal64(t.precision, t.scale)
        if t.bit_width == 128:
            return dt.decimal128(t.precision, t.scale)
        return dt.decimal256(t.precision, t.scale)
    if pt.is_fixed_size_binary(t):
        return dt.fixed_size_binary(t.byte_width)
    if pt.is_dictionary(t):
        return dt.dictionary(type_from_pyarrow(t.index_type),
                             type_from_pyarrow(t.value_type), t.ordered)
    if pt.is_fixed_size_list(t):
        return dt.fixed_size_list(type_from_pyarrow(t.value_type), t.list_size)
    if pt.is_large_list(t):
        return dt.large_list(dt.Field(t.value_field.name,
                                      type_from_pyarrow(t.value_type),
                                      t.value_field.nullable))
    if pt.is_list_view(t):
        return dt.ListViewType(dt.Field(t.value_field.name,
                                        type_from_pyarrow(t.value_type),
                                        t.value_field.nullable))
    if pt.is_large_list_view(t):
        return dt.LargeListViewType(dt.Field(t.value_field.name,
                                             type_from_pyarrow(t.value_type),
                                             t.value_field.nullable))
    if pt.is_list(t):
        return dt.list_(dt.Field(t.value_field.name,
                                 type_from_pyarrow(t.value_type),
                                 t.value_field.nullable))
    if pt.is_map(t):
        return dt.map_(type_from_pyarrow(t.key_type),
                       type_from_pyarrow(t.item_type), t.keys_sorted)
    if pt.is_struct(t):
        return dt.struct([dt.Field(f.name, type_from_pyarrow(f.type), f.nullable)
                          for f in t])
    if pt.is_union(t):
        fields = [dt.Field(f.name, type_from_pyarrow(f.type)) for f in t]
        codes = list(t.type_codes)
        if t.mode == "dense":
            return dt.dense_union(fields, codes)
        return dt.sparse_union(fields, codes)
    if pt.is_run_end_encoded(t):
        return dt.run_end_encoded(type_from_pyarrow(t.run_end_type),
                                  type_from_pyarrow(t.value_type))
    raise NotImplementedError(f"type_from_pyarrow({t})")


def schema_to_pyarrow(s: dt.Schema):
    _require_pa()
    md = s.metadata.to_dict() if s.metadata else None
    return pa.schema([pa.field(f.name, type_to_pyarrow(f.type), f.nullable,
                               f.metadata.to_dict() if f.metadata else None)
                      for f in s.fields], metadata=md)


def schema_from_pyarrow(s) -> dt.Schema:
    md = dt.Metadata({k.decode() if isinstance(k, bytes) else k:
                      v.decode() if isinstance(v, bytes) else v
                      for k, v in (s.metadata or {}).items()})
    return dt.Schema([dt.Field(f.name, type_from_pyarrow(f.type), f.nullable)
                      for f in s], md)


# -- array conversion -------------------------------------------------------

def _buf_to_pa(buf: Optional[Buffer]):
    if buf is None:
        return None
    return pa.py_buffer(buf.data.tobytes())


def array_to_pyarrow(arr: Array):
    """Our array -> pyarrow array (buffer-level for flat types)."""
    _require_pa()
    t = arr.type
    pt_ = type_to_pyarrow(t)
    d = arr.data
    if t.id == dt.TypeId.DICTIONARY:
        from ..array.arrays import DictionaryArray
        assert isinstance(arr, DictionaryArray)
        return pa.DictionaryArray.from_arrays(array_to_pyarrow(arr.indices),
                                              array_to_pyarrow(arr.dictionary),
                                              ordered=t.ordered)
    flat = (t.is_fixed_width or t.is_binary_like or t.is_decimal
            or t.id in (dt.TypeId.NULL,))
    if flat and t.id not in (dt.TypeId.STRING_VIEW, dt.TypeId.BINARY_VIEW):
        bufs = [_buf_to_pa(b) for b in d.buffers]
        if not bufs:
            bufs = []
        if t.id == dt.TypeId.NULL:
            return pa.Array.from_buffers(pt_, d.length, [], d.null_count)
        return pa.Array.from_buffers(pt_, d.length, bufs, d.null_count,
                                     offset=d.offset)
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        bufs = [_buf_to_pa(b) for b in d.buffers]
        child = array_to_pyarrow(make_array(d.children[0]))
        return pa.Array.from_buffers(pt_, d.length, bufs, d.null_count,
                                     offset=d.offset, children=[child])
    if t.id == dt.TypeId.FIXED_SIZE_LIST:
        child = array_to_pyarrow(make_array(d.children[0]))
        return pa.Array.from_buffers(pt_, d.length, [_buf_to_pa(d.buffers[0])],
                                     d.null_count, offset=d.offset,
                                     children=[child])
    if t.id == dt.TypeId.STRUCT:
        children = [array_to_pyarrow(make_array(c)) for c in d.children]
        return pa.Array.from_buffers(pt_, d.length, [_buf_to_pa(d.buffers[0])],
                                     d.null_count, offset=d.offset,
                                     children=children)
    # fallback (unions, REE, views)
    return pa.array(arr.to_pylist(), type=pt_)


def array_from_pyarrow(parr) -> Array:
    """pyarrow array -> our array (buffer-level for flat types)."""
    _require_pa()
    t = type_from_pyarrow(parr.type)
    return _data_from_pyarrow(parr, t)


def _pa_buf_to_ours(pbuf) -> Optional[Buffer]:
    if pbuf is None:
        return None
    return Buffer(np.frombuffer(pbuf, dtype=np.uint8).copy())


def _data_from_pyarrow(parr, t: dt.DataType) -> Array:
    import pyarrow.types as pt
    if t.id == dt.TypeId.NULL:
        return make_array(ArrayData(t, len(parr), [], null_count=len(parr)))
    if t.id == dt.TypeId.DICTIONARY:
        idx = array_from_pyarrow(parr.indices)
        vals = array_from_pyarrow(parr.dictionary)
        d = idx.data
        return make_array(ArrayData(t, d.length, d.buffers,
                                    dictionary=vals.data,
                                    null_count=d._null_count, offset=d.offset))
    n_own = {dt.TypeId.BOOL: 2, dt.TypeId.STRUCT: 1, dt.TypeId.LIST: 2,
             dt.TypeId.LARGE_LIST: 2, dt.TypeId.MAP: 2,
             dt.TypeId.FIXED_SIZE_LIST: 1}.get(t.id)
    if t.id == dt.TypeId.STRUCT:
        bufs = [_pa_buf_to_ours(parr.buffers()[0])]
        children = [array_from_pyarrow(parr.field(i)).data
                    for i in range(parr.type.num_fields)]
        return make_array(ArrayData(t, len(parr), bufs, children,
                                    null_count=parr.null_count))
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        allb = parr.buffers()
        bufs = [_pa_buf_to_ours(allb[0]), _pa_buf_to_ours(allb[1])]
        child = array_from_pyarrow(parr.values).data
        return make_array(ArrayData(t, len(parr), bufs, [child],
                                    null_count=parr.null_count,
                                    offset=parr.offset))
    if t.id == dt.TypeId.FIXED_SIZE_LIST:
        bufs = [_pa_buf_to_ours(parr.buffers()[0])]
        child = array_from_pyarrow(parr.values).data
        return make_array(ArrayData(t, len(parr), bufs, [child],
                                    null_count=parr.null_count,
                                    offset=parr.offset))
    if t.id in (dt.TypeId.BINARY_VIEW, dt.TypeId.STRING_VIEW):
        # views: validity + views + ALL variadic data buffers
        bufs = [_pa_buf_to_ours(b) for b in parr.buffers()]
        return make_array(ArrayData(t, len(parr), bufs,
                                    null_count=parr.null_count,
                                    offset=parr.offset))
    if t.id in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        tids = np.asarray(parr.type_codes, dtype=np.int8)
        bufs = [Buffer.wrap(np.ascontiguousarray(tids))]
        if t.id == dt.TypeId.DENSE_UNION:
            offs = np.asarray(parr.offsets, dtype=np.int32)
            bufs.append(Buffer.wrap(np.ascontiguousarray(offs)))
        children = [array_from_pyarrow(parr.field(i)).data
                    for i in range(parr.type.num_fields)]
        return make_array(ArrayData(t, len(parr), bufs, children,
                                    null_count=0))
    if t.id == dt.TypeId.RUN_END_ENCODED:
        children = [array_from_pyarrow(parr.run_ends).data,
                    array_from_pyarrow(parr.values).data]
        return make_array(ArrayData(t, len(parr), [], children,
                                    null_count=0, offset=parr.offset))
    flat = (t.is_fixed_width or t.is_binary_like or t.is_decimal)
    if flat:
        nbuf = len(t.buffer_kinds())
        allb = parr.buffers()[:nbuf]
        bufs = [_pa_buf_to_ours(b) for b in allb]
        return make_array(ArrayData(t, len(parr), bufs,
                                    null_count=parr.null_count,
                                    offset=parr.offset))
    # fallback
    from ..array.arrays import array as from_py
    return from_py(parr.to_pylist(), t)


def record_batch_to_pyarrow(rb: RecordBatch):
    _require_pa()
    return pa.RecordBatch.from_arrays([array_to_pyarrow(c) for c in rb.columns],
                                      schema=schema_to_pyarrow(rb.schema))


def record_batch_from_pyarrow(prb) -> RecordBatch:
    s = schema_from_pyarrow(prb.schema)
    return RecordBatch(s, [array_from_pyarrow(prb.column(i))
                           for i in range(prb.num_columns)], prb.num_rows)


def table_to_pyarrow(t: Table):
    _require_pa()
    return pa.Table.from_batches([record_batch_to_pyarrow(b)
                                  for b in t.to_batches()],
                                 schema=schema_to_pyarrow(t.schema))


def table_from_pyarrow(pt_) -> Table:
    batches = [record_batch_from_pyarrow(b) for b in pt_.to_batches()]
    return Table.from_batches(batches, schema_from_pyarrow(pt_.schema))
