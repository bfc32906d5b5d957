"""Array builders (reference arrow/array/builder.go:385 and the generated
per-type builders in numericbuilder.gen.go; dictionary builder keyed by a
memo table, reference arrow/array/dictionary.go:632)."""
from __future__ import annotations

import datetime
import decimal as pydec
from typing import Any, List, Optional

import numpy as np

from .. import dtypes as dt
from ..memory import bitutil
from ..memory.buffer import Buffer
from .arrays import Array, ArrayData, make_array


class Builder:
    """Base builder. Two contract points matching the reference:

    - ``append(None)`` appends a null for every builder (reference
      builders treat nil as AppendNull) — enforced centrally via
      ``__init_subclass__`` so concrete ``append`` impls never see None.
    - ``finish()`` RESETS the builder (reference ``Builder.NewArray``
      semantics: the builder is reusable and a second ``finish`` with no
      intervening appends returns an empty array).
    """

    def __init__(self, type: dt.DataType):
        self.type = type
        self._valid: List[bool] = []

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if "append" in cls.__dict__:
            orig = cls.__dict__["append"]

            def append(self, v, _orig=orig):
                if v is None:
                    return self.append_null()
                return _orig(self, v)

            append.__doc__ = orig.__doc__
            cls.append = append

    def __len__(self):
        return len(self._valid)

    @property
    def null_count(self) -> int:
        return len(self._valid) - sum(self._valid)

    def append(self, v) -> None:
        raise NotImplementedError

    def append_null(self) -> None:
        raise NotImplementedError

    def append_nulls(self, n: int) -> None:
        for _ in range(n):
            self.append_null()

    def append_values(self, values) -> None:
        for v in values:
            if v is None:
                self.append_null()
            else:
                self.append(v)

    def _validity_buffer(self) -> Optional[Buffer]:
        if all(self._valid):
            return None
        return Buffer(bitutil.pack_bits(np.array(self._valid, dtype=np.bool_)))

    def finish(self) -> Array:
        raise NotImplementedError


class NullBuilder(Builder):
    def append(self, v) -> None:
        self._valid.append(False)

    def append_null(self) -> None:
        self._valid.append(False)

    def finish(self) -> Array:
        n = len(self._valid)
        self._valid = []
        return make_array(ArrayData(dt.null, n, [], null_count=n))


class BooleanBuilder(Builder):
    def __init__(self, type: dt.DataType = dt.bool_):
        super().__init__(type)
        self._values: List[bool] = []

    def append(self, v) -> None:
        self._valid.append(True)
        self._values.append(bool(v))

    def append_null(self) -> None:
        self._valid.append(False)
        self._values.append(False)

    def finish(self) -> Array:
        data = Buffer(bitutil.pack_bits(np.array(self._values, dtype=np.bool_)))
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), data],
                        null_count=self.null_count)
        self._valid, self._values = [], []
        return make_array(out)


_EPOCH_DATE = datetime.date(1970, 1, 1)


class NumericBuilder(Builder):
    def __init__(self, type: dt.DataType):
        super().__init__(type)
        self._values: List[Any] = []

    def _coerce(self, v):
        t = self.type
        if t.id == dt.TypeId.DATE32 and isinstance(v, datetime.date):
            return (v - _EPOCH_DATE).days
        if t.id == dt.TypeId.TIMESTAMP and isinstance(v, datetime.datetime):
            epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            return int((v - epoch).total_seconds() * t.unit.multiplier)
        return v

    def append(self, v) -> None:
        self._valid.append(True)
        self._values.append(self._coerce(v))

    def append_null(self) -> None:
        self._valid.append(False)
        self._values.append(0)

    def finish(self) -> Array:
        vals = np.array(self._values, dtype=self.type.np_dtype)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.wrap(vals)],
                        null_count=self.null_count)
        self._valid, self._values = [], []
        return make_array(out)


class IntervalBuilder(Builder):
    def __init__(self, type: dt.DataType):
        super().__init__(type)
        self._values: List[tuple] = []

    def append(self, v) -> None:
        self._valid.append(True)
        self._values.append(tuple(v))

    def append_null(self) -> None:
        self._valid.append(False)
        self._values.append(tuple([0] * len(self.type.np_dtype.names)))

    def finish(self) -> Array:
        vals = np.array(self._values, dtype=self.type.np_dtype)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.wrap(vals)],
                        null_count=self.null_count)
        self._valid, self._values = [], []
        return make_array(out)


class DecimalBuilder(Builder):
    def __init__(self, type: dt.DataType):
        super().__init__(type)
        self._values: List[int] = []

    def append(self, v) -> None:
        if isinstance(v, pydec.Decimal):
            sign, digits, exp = v.as_tuple()
            mag = int("".join(map(str, digits)))
            shift = exp + self.type.scale
            if shift >= 0:
                mag *= 10 ** shift
            else:
                q, r = divmod(mag, 10 ** (-shift))
                if r:
                    raise ValueError(f"{v} does not fit scale {self.type.scale}")
                mag = q
            v = -mag if sign else mag
        elif isinstance(v, float):
            v = int(round(v * 10 ** self.type.scale))
        self._valid.append(True)
        self._values.append(int(v))

    def append_null(self) -> None:
        self._valid.append(False)
        self._values.append(0)

    def finish(self) -> Array:
        bw = self.type.bit_width // 8
        raw = b"".join(v.to_bytes(bw, "little", signed=True) for v in self._values)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.from_bytes(raw)],
                        null_count=self.null_count)
        self._valid, self._values = [], []
        return make_array(out)


class FixedSizeBinaryBuilder(Builder):
    def __init__(self, type: dt.FixedSizeBinaryType):
        super().__init__(type)
        self._chunks: List[bytes] = []

    def append(self, v) -> None:
        v = bytes(v)
        if len(v) != self.type.byte_width:
            raise ValueError(f"fixed_size_binary[{self.type.byte_width}] got {len(v)} bytes")
        self._valid.append(True)
        self._chunks.append(v)

    def append_null(self) -> None:
        self._valid.append(False)
        self._chunks.append(b"\x00" * self.type.byte_width)

    def finish(self) -> Array:
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.from_bytes(b"".join(self._chunks))],
                        null_count=self.null_count)
        self._valid, self._chunks = [], []
        return make_array(out)


class BinaryBuilder(Builder):
    def __init__(self, type: dt.DataType = dt.binary):
        super().__init__(type)
        self._data = bytearray()
        self._offsets: List[int] = [0]

    def append(self, v) -> None:
        if isinstance(v, str):
            v = v.encode("utf-8")
        self._valid.append(True)
        self._data.extend(v)
        self._offsets.append(len(self._data))

    def append_null(self) -> None:
        self._valid.append(False)
        self._offsets.append(len(self._data))

    def finish(self) -> Array:
        off = np.array(self._offsets, dtype=self.type.offset_dtype)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.wrap(off),
                         Buffer.from_bytes(bytes(self._data))],
                        null_count=self.null_count)
        self._valid, self._data, self._offsets = [], bytearray(), [0]
        return make_array(out)


class BinaryViewBuilder(Builder):
    """Builds BinaryView/StringView arrays: 16-byte view structs with
    values <= 12 bytes inlined, longer values in one variadic data buffer
    (buffer index 0). Reference arrow/array/binary_view builder."""

    def __init__(self, type: dt.DataType = dt.binary_view):
        super().__init__(type)
        self._views = bytearray()
        self._data = bytearray()

    def append(self, v) -> None:
        if isinstance(v, str):
            v = v.encode("utf-8")
        v = bytes(v)
        self._valid.append(True)
        ln = len(v)
        if ln <= 12:
            self._views.extend(np.int32(ln).tobytes())
            self._views.extend(v)
            self._views.extend(b"\0" * (12 - ln))
        else:
            off = len(self._data)
            self._data.extend(v)
            self._views.extend(np.array([ln], dtype=np.int32).tobytes())
            self._views.extend(v[:4])
            self._views.extend(np.array([0, off], dtype=np.int32).tobytes())

    def append_null(self) -> None:
        self._valid.append(False)
        self._views.extend(b"\0" * 16)

    def finish(self) -> Array:
        bufs = [self._validity_buffer(),
                Buffer.from_bytes(bytes(self._views))]
        if self._data:
            bufs.append(Buffer.from_bytes(bytes(self._data)))
        out = ArrayData(self.type, len(self._valid), bufs,
                        null_count=self.null_count)
        self._valid, self._views, self._data = [], bytearray(), bytearray()
        return make_array(out)


class ListViewBuilder(Builder):
    """Builds ListView/LargeListView arrays: independent offsets + sizes
    buffers over a child values array."""

    def __init__(self, type: dt.ListViewType):
        super().__init__(type)
        self.value_builder = make_builder(type.value_type)
        self._offsets: List[int] = []
        self._sizes: List[int] = []

    def append(self, v) -> None:
        self._valid.append(True)
        self._offsets.append(len(self.value_builder))
        self.value_builder.append_values(v)
        self._sizes.append(len(self.value_builder) - self._offsets[-1])

    def append_null(self) -> None:
        self._valid.append(False)
        self._offsets.append(len(self.value_builder))
        self._sizes.append(0)

    def finish(self) -> Array:
        values = self.value_builder.finish()
        odt = self.type.offset_dtype
        out = ArrayData(
            self.type, len(self._valid),
            [self._validity_buffer(),
             Buffer.wrap(np.array(self._offsets, dtype=odt)),
             Buffer.wrap(np.array(self._sizes, dtype=odt))],
            children=[values.data], null_count=self.null_count)
        self._valid, self._offsets, self._sizes = [], [], []
        return make_array(out)


class ListBuilder(Builder):
    def __init__(self, type: dt.ListType):
        super().__init__(type)
        self.value_builder = make_builder(type.value_type)
        self._offsets: List[int] = [0]

    def append(self, v) -> None:
        self._valid.append(True)
        self.value_builder.append_values(v)
        self._offsets.append(len(self.value_builder))

    def append_null(self) -> None:
        self._valid.append(False)
        self._offsets.append(len(self.value_builder))

    def finish(self) -> Array:
        values = self.value_builder.finish()
        off = np.array(self._offsets, dtype=self.type.offset_dtype)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.wrap(off)],
                        children=[values.data], null_count=self.null_count)
        self._valid, self._offsets = [], [0]
        return make_array(out)


class MapBuilder(Builder):
    def __init__(self, type: dt.MapType):
        super().__init__(type)
        self.entry_builder = make_builder(type.value_type)
        self._offsets: List[int] = [0]

    def append(self, v) -> None:
        self._valid.append(True)
        items = v.items() if isinstance(v, dict) else v
        for k, val in items:
            self.entry_builder.append({"key": k, "value": val})
        self._offsets.append(len(self.entry_builder))

    def append_null(self) -> None:
        self._valid.append(False)
        self._offsets.append(len(self.entry_builder))

    def finish(self) -> Array:
        entries = self.entry_builder.finish()
        off = np.array(self._offsets, dtype=np.int32)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.wrap(off)],
                        children=[entries.data], null_count=self.null_count)
        self._valid, self._offsets = [], [0]
        return make_array(out)


class FixedSizeListBuilder(Builder):
    def __init__(self, type: dt.FixedSizeListType):
        super().__init__(type)
        self.value_builder = make_builder(type.value_type)

    def append(self, v) -> None:
        v = list(v)
        if len(v) != self.type.list_size:
            raise ValueError("fixed size list length mismatch")
        self._valid.append(True)
        self.value_builder.append_values(v)

    def append_null(self) -> None:
        self._valid.append(False)
        self.value_builder.append_nulls(self.type.list_size)

    def finish(self) -> Array:
        values = self.value_builder.finish()
        out = ArrayData(self.type, len(self._valid), [self._validity_buffer()],
                        children=[values.data], null_count=self.null_count)
        self._valid = []
        return make_array(out)


class StructBuilder(Builder):
    def __init__(self, type: dt.StructType):
        super().__init__(type)
        self.field_builders = [make_builder(f.type) for f in type.fields()]

    def append(self, v) -> None:
        self._valid.append(True)
        fields = self.type.fields()
        if isinstance(v, dict):
            for fb, f in zip(self.field_builders, fields):
                x = v.get(f.name)
                if x is None:
                    fb.append_null()
                else:
                    fb.append(x)
        else:
            for fb, x in zip(self.field_builders, v):
                if x is None:
                    fb.append_null()
                else:
                    fb.append(x)

    def append_null(self) -> None:
        self._valid.append(False)
        for fb in self.field_builders:
            fb.append_null()

    def finish(self) -> Array:
        children = [fb.finish().data for fb in self.field_builders]
        out = ArrayData(self.type, len(self._valid), [self._validity_buffer()],
                        children=children, null_count=self.null_count)
        self._valid = []
        return make_array(out)


class DictionaryBuilder(Builder):
    """Memo-table-backed dictionary builder (reference
    arrow/array/dictionary.go:632 NewDictionaryBuilder + internal/hashing
    MemoTable GetOrInsert semantics: first-occurrence order)."""

    def __init__(self, type: dt.DictionaryType):
        super().__init__(type)
        self._memo: dict = {}
        self._dict_builder = make_builder(type.value_type)
        self._indices: List[int] = []

    def append(self, v) -> None:
        key = v
        if isinstance(v, (bytearray, memoryview)):
            key = bytes(v)
        if key not in self._memo:
            self._memo[key] = len(self._memo)
            self._dict_builder.append(v)
        self._valid.append(True)
        self._indices.append(self._memo[key])

    def append_null(self) -> None:
        self._valid.append(False)
        self._indices.append(0)

    def finish(self) -> Array:
        dictionary = self._dict_builder.finish()
        idx = np.array(self._indices, dtype=self.type.index_type.np_dtype)
        out = ArrayData(self.type, len(self._valid),
                        [self._validity_buffer(), Buffer.wrap(idx)],
                        dictionary=dictionary.data, null_count=self.null_count)
        self._valid, self._indices, self._memo = [], [], {}
        return make_array(out)


class RunEndEncodedBuilder(Builder):
    def __init__(self, type: dt.RunEndEncodedType):
        super().__init__(type)
        self._values_builder = make_builder(type.values_type)
        self._run_ends: List[int] = []
        self._sentinel = object()
        self._last: Any = self._sentinel
        self._n = 0

    def append(self, v) -> None:
        self._push(v)

    def append_null(self) -> None:
        self._push(None)

    def _push(self, v) -> None:
        self._n += 1
        if self._run_ends and v == self._last and v is not self._sentinel:
            self._run_ends[-1] = self._n
        else:
            if v is None:
                self._values_builder.append_null()
            else:
                self._values_builder.append(v)
            self._run_ends.append(self._n)
            self._last = v

    def finish(self) -> Array:
        re_b = NumericBuilder(self.type.run_ends_type)
        for e in self._run_ends:
            re_b.append(e)
        run_ends = re_b.finish()
        values = self._values_builder.finish()
        out = ArrayData(self.type, self._n, [],
                        children=[run_ends.data, values.data], null_count=0)
        self._run_ends, self._n = [], 0
        return make_array(out)


def make_builder(type: dt.DataType) -> Builder:
    tid = type.id
    if tid == dt.TypeId.NULL:
        return NullBuilder(type)
    if tid == dt.TypeId.BOOL:
        return BooleanBuilder(type)
    if type.is_numeric or tid in (dt.TypeId.DATE32, dt.TypeId.DATE64,
                                  dt.TypeId.TIME32, dt.TypeId.TIME64,
                                  dt.TypeId.TIMESTAMP, dt.TypeId.DURATION,
                                  dt.TypeId.INTERVAL_MONTHS):
        return NumericBuilder(type)
    if tid in (dt.TypeId.INTERVAL_DAY_TIME, dt.TypeId.INTERVAL_MONTH_DAY_NANO):
        return IntervalBuilder(type)
    if type.is_decimal:
        return DecimalBuilder(type)
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        return FixedSizeBinaryBuilder(type)
    if tid in (dt.TypeId.BINARY, dt.TypeId.STRING,
               dt.TypeId.LARGE_BINARY, dt.TypeId.LARGE_STRING):
        return BinaryBuilder(type)
    if tid in (dt.TypeId.BINARY_VIEW, dt.TypeId.STRING_VIEW):
        return BinaryViewBuilder(type)
    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
        return ListBuilder(type)
    if tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        return ListViewBuilder(type)
    if tid == dt.TypeId.MAP:
        return MapBuilder(type)
    if tid == dt.TypeId.FIXED_SIZE_LIST:
        return FixedSizeListBuilder(type)
    if tid == dt.TypeId.STRUCT:
        return StructBuilder(type)
    if tid == dt.TypeId.DICTIONARY:
        return DictionaryBuilder(type)
    if tid == dt.TypeId.RUN_END_ENCODED:
        return RunEndEncodedBuilder(type)
    raise NotImplementedError(f"builder for {type}")


def infer_type(values: list) -> dt.DataType:
    """Infer an arrow type from a python list (None-aware)."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return dt.null
    v = non_null[0]
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return dt.bool_
    if isinstance(v, (int, np.integer)):
        return dt.int64
    if isinstance(v, (float, np.floating)):
        return dt.float64
    if isinstance(v, str):
        return dt.string
    if isinstance(v, (bytes, bytearray)):
        return dt.binary
    if isinstance(v, pydec.Decimal):
        scale = max(-v.as_tuple().exponent for v in non_null if isinstance(v, pydec.Decimal))
        return dt.decimal128(38, max(scale, 0))
    if isinstance(v, datetime.datetime):
        return dt.timestamp("us")
    if isinstance(v, datetime.date):
        return dt.date32
    if isinstance(v, dict):
        keys = {}
        for item in non_null:
            for k, val in item.items():
                if k not in keys or keys[k].id == dt.TypeId.NULL:
                    keys[k] = infer_type([val])
        return dt.struct(keys)
    if isinstance(v, (list, tuple, np.ndarray)):
        flat = [x for item in non_null for x in item]
        return dt.list_(infer_type(flat))
    raise ValueError(f"cannot infer arrow type for {type(v)}")
