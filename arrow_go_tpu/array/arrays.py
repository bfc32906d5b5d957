"""Host columnar arrays.

Counterpart of the reference's arrow/array (ArrayData arrow/array.go:54,
Array arrow/array.go:89, per-type implementations under arrow/array/*).
Host arrays are Arrow-spec physical layouts over numpy-backed Buffers:
validity bitmap (LSB), values / offsets / type-id buffers, children,
dictionary. They are the interop + IPC + Parquet substrate; compute happens
on device blocks (arrow_go_tpu/device) produced from these arrays.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from .. import dtypes as dt
from ..memory import bitutil
from ..memory.buffer import Buffer


class ArrayData:
    """Type + length + buffers + children: the physical array container."""

    __slots__ = ("type", "length", "buffers", "children", "dictionary",
                 "offset", "_null_count")

    def __init__(self, type: dt.DataType, length: int,
                 buffers: Sequence[Optional[Buffer]],
                 children: Sequence["ArrayData"] = (),
                 dictionary: Optional["ArrayData"] = None,
                 null_count: Optional[int] = None,
                 offset: int = 0):
        self.type = type
        self.length = int(length)
        self.buffers = list(buffers)
        self.children = list(children)
        self.dictionary = dictionary
        self.offset = int(offset)
        self._null_count = null_count

    @property
    def null_count(self) -> int:
        if self._null_count is None:
            if self.type.id == dt.TypeId.NULL:
                self._null_count = self.length
            elif not self.buffers or self.buffers[0] is None:
                self._null_count = 0
            else:
                self._null_count = self.length - bitutil.count_set_bits(
                    self.buffers[0].data, self.offset, self.length)
        return self._null_count

    @property
    def validity(self) -> Optional[Buffer]:
        return self.buffers[0] if self.buffers else None

    def slice(self, offset: int, length: int) -> "ArrayData":
        return ArrayData(self.type, length, self.buffers, self.children,
                         self.dictionary, None, self.offset + offset)

    def __repr__(self):
        return f"ArrayData({self.type}, len={self.length}, nulls={self._null_count})"


class Array:
    """Logical array view over ArrayData (reference arrow.Array)."""

    def __init__(self, data: ArrayData):
        self._data = data

    # -- basics ------------------------------------------------------------
    @property
    def data(self) -> ArrayData:
        return self._data

    @property
    def type(self) -> dt.DataType:
        return self._data.type

    def __len__(self) -> int:
        return self._data.length

    @property
    def length(self) -> int:
        return self._data.length

    @property
    def offset(self) -> int:
        return self._data.offset

    @property
    def null_count(self) -> int:
        return self._data.null_count

    def is_valid(self, i: int) -> bool:
        v = self._data.validity
        if v is None:
            return self.type.id != dt.TypeId.NULL
        return bitutil.get_bit(v.data, self._data.offset + i)

    def is_null(self, i: int) -> bool:
        return not self.is_valid(i)

    def validity_bools(self) -> np.ndarray:
        """Validity as a bool ndarray of len(self) (True = valid)."""
        v = self._data.validity
        if v is None:
            valid = self.type.id != dt.TypeId.NULL
            return np.full(self._data.length, valid, dtype=np.bool_)
        return bitutil.unpack_bits(v.data, self._data.length, self._data.offset)

    def slice(self, offset: int, length: Optional[int] = None) -> "Array":
        if length is None:
            length = len(self) - offset
        return make_array(self._data.slice(offset, length))

    # -- value access ------------------------------------------------------
    def value(self, i: int):
        raise NotImplementedError(type(self).__name__)

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(len(self))
            if step != 1:
                raise ValueError("only step-1 slices supported")
            return self.slice(start, stop - start)
        if i < 0:
            i += len(self)
        if self.is_null(i):
            return None
        return self.value(i)

    def to_pylist(self) -> list:
        return [self[i] for i in range(len(self))]

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def equals(self, other: "Array") -> bool:
        if self.type != other.type or len(self) != len(other):
            return False
        return self.to_pylist() == other.to_pylist()

    def __eq__(self, other):
        if isinstance(other, Array):
            return self.equals(other)
        return NotImplemented

    def __repr__(self):
        vals = self.to_pylist() if len(self) <= 20 else self.to_pylist()[:20] + ["..."]
        return f"<{type(self).__name__}({self.type})>{vals}"


class NullArray(Array):
    def value(self, i: int):
        return None

    def to_pylist(self):
        return [None] * len(self)


class BooleanArray(Array):
    def value(self, i: int) -> bool:
        return bool(bitutil.get_bit(self._data.buffers[1].data, self._data.offset + i))

    def to_numpy(self, zero_copy_only: bool = False) -> np.ndarray:
        return bitutil.unpack_bits(self._data.buffers[1].data, len(self), self.offset)

    def to_pylist(self):
        vals = self.to_numpy()
        mask = self.validity_bools()
        return [bool(v) if m else None for v, m in zip(vals, mask)]


class NumericArray(Array):
    """All fixed-width one-buffer value types (ints, floats, temporal)."""

    @property
    def values(self) -> np.ndarray:
        d = self._data
        npdt = d.type.np_dtype
        full = d.buffers[1].view(npdt)
        return full[d.offset: d.offset + d.length]

    def value(self, i: int):
        v = self.values[i]
        if isinstance(v, np.void):  # struct-like interval types
            return tuple(v)
        return v.item()

    def to_numpy(self, zero_copy_only: bool = True) -> np.ndarray:
        return self.values

    def to_pylist(self):
        vals = self.values
        mask = self.validity_bools()
        out = []
        for j in range(len(vals)):
            if mask[j]:
                v = vals[j]
                out.append(tuple(v) if isinstance(v, np.void) else v.item())
            else:
                out.append(None)
        return out


class TimestampArray(NumericArray):
    pass


class Date32Array(NumericArray):
    pass


class Date64Array(NumericArray):
    pass


class Time32Array(NumericArray):
    pass


class Time64Array(NumericArray):
    pass


class DurationArray(NumericArray):
    pass


class IntervalArray(NumericArray):
    pass


class DecimalArray(Array):
    """decimal32/64/128/256 — fixed-width two's-complement little-endian ints
    (reference arrow/decimal128/decimal128.go semantics). Values are exposed
    as python ints scaled by 10**-scale on to_pylist."""

    @property
    def byte_width(self) -> int:
        return self.type.bit_width // 8

    def unscaled(self, i: int) -> int:
        bw = self.byte_width
        d = self._data
        raw = d.buffers[1].data[(d.offset + i) * bw:(d.offset + i + 1) * bw]
        return int.from_bytes(raw.tobytes(), "little", signed=True)

    def value(self, i: int):
        import decimal as pydec
        u = self.unscaled(i)
        # decimal256 overflows the default 28-digit context: scale exactly
        return pydec.Decimal(u).scaleb(-self.type.scale,
                                       pydec.Context(prec=80))

    def unscaled_array(self) -> np.ndarray:
        """All unscaled values as object ints (host path) — device path packs
        into (lo, hi) uint64 columns, see device/block.py."""
        return np.array([self.unscaled(i) for i in range(len(self))], dtype=object)


class FixedSizeBinaryArray(Array):
    def value(self, i: int) -> bytes:
        bw = self.type.byte_width
        d = self._data
        return d.buffers[1].data[(d.offset + i) * bw:(d.offset + i + 1) * bw].tobytes()


class BinaryArray(Array):
    _decode = False

    @property
    def offsets(self) -> np.ndarray:
        d = self._data
        return d.buffers[1].view(d.type.offset_dtype)[d.offset: d.offset + d.length + 1]

    def value_bytes(self, i: int) -> bytes:
        off = self.offsets
        return self._data.buffers[2].data[off[i]:off[i + 1]].tobytes()

    def value(self, i: int):
        b = self.value_bytes(i)
        return b.decode("utf-8") if self._decode else b

    def value_lengths(self) -> np.ndarray:
        off = self.offsets.astype(np.int64)
        return np.diff(off)

    def total_values_bytes(self) -> int:
        off = self.offsets
        return int(off[-1] - off[0])


class StringArray(BinaryArray):
    _decode = True


class LargeBinaryArray(BinaryArray):
    pass


class LargeStringArray(BinaryArray):
    _decode = True


class BinaryViewArray(Array):
    """Variable-length binary with 16-byte view structs + variadic data
    buffers (Arrow spec BinaryView layout; reference
    arrow/array/binary_view.go / arrow/datatype.go BinaryView layout).

    View struct (little-endian): int32 length; if length <= 12 the bytes
    are inline at +4, else 4-byte prefix at +4, int32 buffer index at +8,
    int32 offset into that variadic buffer at +12.
    """
    _decode = False

    @property
    def views(self) -> np.ndarray:
        d = self._data
        return d.buffers[1].data[d.offset * 16:(d.offset + d.length) * 16]

    def value_bytes(self, i: int) -> bytes:
        d = self._data
        base = (d.offset + i) * 16
        raw = d.buffers[1].data
        ln = int(raw[base:base + 4].view(np.int32)[0])
        if ln <= 12:
            return raw[base + 4: base + 4 + ln].tobytes()
        buf_idx = int(raw[base + 8: base + 12].view(np.int32)[0])
        off = int(raw[base + 12: base + 16].view(np.int32)[0])
        return d.buffers[2 + buf_idx].data[off: off + ln].tobytes()

    def value(self, i: int):
        b = self.value_bytes(i)
        return b.decode("utf-8") if self._decode else b

    def value_lengths(self) -> np.ndarray:
        v = self.views
        if len(v) == 0:
            return np.zeros(0, dtype=np.int64)
        return v.view(np.int32).reshape(-1, 4)[:, 0].astype(np.int64)


class StringViewArray(BinaryViewArray):
    _decode = True


class ListViewArray(Array):
    """List with independent (offsets, sizes) buffers (Arrow spec
    ListView; reference arrow/array/list.go ListView/LargeListView)."""

    @property
    def offsets(self) -> np.ndarray:
        d = self._data
        return d.buffers[1].view(d.type.offset_dtype)[d.offset: d.offset + d.length]

    @property
    def sizes(self) -> np.ndarray:
        d = self._data
        return d.buffers[2].view(d.type.offset_dtype)[d.offset: d.offset + d.length]

    @property
    def values(self) -> Array:
        return make_array(self._data.children[0])

    def value(self, i: int):
        off, sz = int(self.offsets[i]), int(self.sizes[i])
        return self.values.slice(off, sz).to_pylist()


class LargeListViewArray(ListViewArray):
    pass


class ListArray(Array):
    @property
    def offsets(self) -> np.ndarray:
        d = self._data
        return d.buffers[1].view(d.type.offset_dtype)[d.offset: d.offset + d.length + 1]

    @property
    def values(self) -> Array:
        return make_array(self._data.children[0])

    def value(self, i: int):
        off = self.offsets
        return self.values.slice(int(off[i]), int(off[i + 1] - off[i])).to_pylist()


class LargeListArray(ListArray):
    pass


class FixedSizeListArray(Array):
    @property
    def values(self) -> Array:
        return make_array(self._data.children[0])

    def value(self, i: int):
        n = self.type.list_size
        s = (self._data.offset + i) * n
        return make_array(self._data.children[0]).slice(s, n).to_pylist()


class StructArray(Array):
    def field(self, i) -> Array:
        if isinstance(i, str):
            i = self.type.field_index(i)
        child = self._data.children[i]
        if self._data.offset or child.length != self._data.length:
            child = child.slice(self._data.offset, self._data.length)
            return make_array(child)
        return make_array(child)

    @property
    def num_fields(self) -> int:
        return len(self._data.children)

    def value(self, i: int):
        return {f.name: self.field(j)[i]
                for j, f in enumerate(self.type.fields())}


class MapArray(ListArray):
    def value(self, i: int):
        off = self.offsets
        entries = make_array(self._data.children[0])
        out = []
        for j in range(int(off[i]), int(off[i + 1])):
            out.append((entries.field(0)[j], entries.field(1)[j]))
        return out


class UnionArray(Array):
    @property
    def type_ids(self) -> np.ndarray:
        d = self._data
        return d.buffers[0].view(np.int8)[d.offset: d.offset + d.length]

    def child(self, i: int) -> Array:
        return make_array(self._data.children[i])

    def is_valid(self, i: int) -> bool:
        code = int(self.type_ids[i])
        ci = self.type.child_id(code)
        if self.type.id == dt.TypeId.DENSE_UNION:
            off = self._data.buffers[1].view(np.int32)[self._data.offset + i]
            return self.child(ci).is_valid(int(off))
        return self.child(ci).is_valid(self._data.offset + i)

    def value(self, i: int):
        code = int(self.type_ids[i])
        ci = self.type.child_id(code)
        if self.type.id == dt.TypeId.DENSE_UNION:
            off = self._data.buffers[1].view(np.int32)[self._data.offset + i]
            return self.child(ci)[int(off)]
        return self.child(ci)[self._data.offset + i]


class DictionaryArray(Array):
    @property
    def indices(self) -> Array:
        idx_data = ArrayData(self.type.index_type, self._data.length,
                             self._data.buffers, (), None,
                             self._data._null_count, self._data.offset)
        return make_array(idx_data)

    @property
    def dictionary(self) -> Array:
        return make_array(self._data.dictionary)

    def value(self, i: int):
        idx = self.indices[i]
        return None if idx is None else self.dictionary[int(idx)]

    def decode(self) -> Array:
        """Materialize dictionary[indices] (cast to value type)."""
        mask = self.validity_bools()
        codes = np.asarray(self.indices.to_numpy(), dtype=np.int64).copy()
        codes[~mask] = 0
        out = take_host(self.dictionary, codes)
        return with_validity(out, mask & out.validity_bools())


class RunEndEncodedArray(Array):
    @property
    def run_ends(self) -> Array:
        return make_array(self._data.children[0])

    @property
    def values(self) -> Array:
        return make_array(self._data.children[1])

    def _physical_index(self, i: int) -> int:
        ends = self.run_ends.to_numpy()
        return int(np.searchsorted(ends, self._data.offset + i, side="right"))

    def is_valid(self, i: int) -> bool:
        return self.values.is_valid(self._physical_index(i))

    def value(self, i: int):
        return self.values[self._physical_index(i)]

    def decode(self) -> Array:
        ends = np.asarray(self.run_ends.to_numpy(), dtype=np.int64)
        starts = np.concatenate(([0], ends[:-1]))
        phys = np.searchsorted(ends, np.arange(self._data.offset,
                                               self._data.offset + self._data.length),
                               side="right")
        return take_host(self.values, phys)


class ExtensionArray(Array):
    @property
    def storage(self) -> Array:
        sd = ArrayData(self.type.storage_type, self._data.length,
                       self._data.buffers, self._data.children,
                       self._data.dictionary, self._data._null_count,
                       self._data.offset)
        return make_array(sd)

    def is_valid(self, i: int) -> bool:
        return self.storage.is_valid(i)

    def value(self, i: int):
        return self.storage.value(i)


_ARRAY_CLASSES = {
    dt.TypeId.NULL: NullArray,
    dt.TypeId.BOOL: BooleanArray,
    dt.TypeId.INT8: NumericArray, dt.TypeId.INT16: NumericArray,
    dt.TypeId.INT32: NumericArray, dt.TypeId.INT64: NumericArray,
    dt.TypeId.UINT8: NumericArray, dt.TypeId.UINT16: NumericArray,
    dt.TypeId.UINT32: NumericArray, dt.TypeId.UINT64: NumericArray,
    dt.TypeId.FLOAT16: NumericArray, dt.TypeId.FLOAT32: NumericArray,
    dt.TypeId.FLOAT64: NumericArray,
    dt.TypeId.DATE32: Date32Array, dt.TypeId.DATE64: Date64Array,
    dt.TypeId.TIME32: Time32Array, dt.TypeId.TIME64: Time64Array,
    dt.TypeId.TIMESTAMP: TimestampArray, dt.TypeId.DURATION: DurationArray,
    dt.TypeId.INTERVAL_MONTHS: IntervalArray,
    dt.TypeId.INTERVAL_DAY_TIME: IntervalArray,
    dt.TypeId.INTERVAL_MONTH_DAY_NANO: IntervalArray,
    dt.TypeId.DECIMAL32: DecimalArray, dt.TypeId.DECIMAL64: DecimalArray,
    dt.TypeId.DECIMAL128: DecimalArray, dt.TypeId.DECIMAL256: DecimalArray,
    dt.TypeId.FIXED_SIZE_BINARY: FixedSizeBinaryArray,
    dt.TypeId.BINARY: BinaryArray, dt.TypeId.STRING: StringArray,
    dt.TypeId.LARGE_BINARY: LargeBinaryArray, dt.TypeId.LARGE_STRING: LargeStringArray,
    dt.TypeId.BINARY_VIEW: BinaryViewArray,
    dt.TypeId.STRING_VIEW: StringViewArray,
    dt.TypeId.LIST: ListArray, dt.TypeId.LARGE_LIST: LargeListArray,
    dt.TypeId.LIST_VIEW: ListViewArray,
    dt.TypeId.LARGE_LIST_VIEW: LargeListViewArray,
    dt.TypeId.FIXED_SIZE_LIST: FixedSizeListArray,
    dt.TypeId.STRUCT: StructArray, dt.TypeId.MAP: MapArray,
    dt.TypeId.SPARSE_UNION: UnionArray, dt.TypeId.DENSE_UNION: UnionArray,
    dt.TypeId.DICTIONARY: DictionaryArray,
    dt.TypeId.RUN_END_ENCODED: RunEndEncodedArray,
    dt.TypeId.EXTENSION: ExtensionArray,
}


def make_array(data: ArrayData) -> Array:
    cls = _ARRAY_CLASSES.get(data.type.id)
    if cls is None:
        raise NotImplementedError(f"array type {data.type}")
    return cls(data)


# ---------------------------------------------------------------------------
# Construction helpers
# ---------------------------------------------------------------------------

def _validity_buffer(mask: Optional[np.ndarray]) -> Optional[Buffer]:
    if mask is None:
        return None
    if mask.all():
        return None
    return Buffer(bitutil.pack_bits(mask))


def from_numpy(values: np.ndarray, mask: Optional[np.ndarray] = None,
               type: Optional[dt.DataType] = None) -> Array:
    """Build a fixed-width array from numpy values (+ optional validity mask,
    True = valid)."""
    values = np.asarray(values)
    if type is None:
        type = dt.from_numpy_dtype(values.dtype)
    if type.id == dt.TypeId.BOOL:
        data_buf = Buffer(bitutil.pack_bits(values.astype(np.bool_)))
    else:
        values = np.ascontiguousarray(values, dtype=type.np_dtype)
        data_buf = Buffer.wrap(values)
    nc = None
    if mask is not None:
        mask = np.asarray(mask, dtype=np.bool_)
        nc = int(len(mask) - mask.sum())
    return make_array(ArrayData(type, len(values),
                                [_validity_buffer(mask), data_buf],
                                null_count=nc))


def nulls(length: int, type: dt.DataType = dt.null) -> Array:
    if type.id == dt.TypeId.NULL:
        return make_array(ArrayData(type, length, [], null_count=length))
    from .builders import make_builder
    b = make_builder(type)
    b.append_nulls(length)
    return b.finish()


def with_validity(arr: Array, mask: np.ndarray) -> Array:
    """Replace arr's validity with mask (True = valid)."""
    d = arr.data
    bufs = list(d.buffers)
    if d.type.id == dt.TypeId.NULL:
        return arr
    if not bufs:
        bufs = [None]
    mask = np.asarray(mask, dtype=np.bool_)
    bufs[0] = None if mask.all() else Buffer(bitutil.pack_bits(mask))
    nc = int(len(mask) - mask.sum())
    return make_array(ArrayData(d.type, d.length, bufs, d.children,
                                d.dictionary, nc, d.offset))


def take_host(arr: Array, indices: np.ndarray) -> Array:
    """Host-side take (gather) used by decode paths; device take lives in
    ops/selection.py. Out-of-range index -> error; negative -> null."""
    from .builders import make_builder
    indices = np.asarray(indices, dtype=np.int64)
    t = arr.type
    if t.is_fixed_width and t.np_dtype is not None and not t.is_decimal \
            and t.id not in (dt.TypeId.BOOL, dt.TypeId.DICTIONARY,
                             dt.TypeId.EXTENSION):
        vals = np.asarray(arr.to_numpy() if hasattr(arr, "to_numpy") else None)
        if len(vals) == 0:
            return from_numpy(np.zeros(len(indices), dtype=t.np_dtype),
                              np.zeros(len(indices), dtype=np.bool_), t)
        mask = arr.validity_bools()
        neg = indices < 0
        safe = np.where(neg, 0, indices)
        out_vals = vals[safe]
        out_mask = mask[safe] & ~neg
        return from_numpy(out_vals, out_mask, t)
    b = make_builder(t)
    for i in indices:
        v = arr[int(i)] if i >= 0 else None
        if v is None:
            b.append_null()
        else:
            b.append(v)
    return b.finish()


def array(values, type: Optional[dt.DataType] = None,
          mask: Optional[np.ndarray] = None) -> Array:
    """Main user-facing factory: python sequence / numpy -> Array."""
    if isinstance(values, Array):
        return values
    if isinstance(values, np.ndarray) and values.dtype != object:
        if mask is None and np.issubdtype(values.dtype, np.floating):
            pass
        return from_numpy(values, mask, type)
    # generic python-list path via builder
    from .builders import infer_type, make_builder
    values = list(values)
    if type is None:
        type = infer_type(values)
    b = make_builder(type)
    for v in values:
        if v is None:
            b.append_null()
        else:
            b.append(v)
    return b.finish()
