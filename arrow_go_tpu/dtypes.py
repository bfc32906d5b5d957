"""Arrow logical type system, TPU-native framework.

Covers the 43-value logical type enum of the reference
(/root/reference/arrow/datatype.go:34-177) with Arrow-spec physical
layouts (/root/reference/arrow/datatype.go:272-294 DataTypeLayout).

Design notes (TPU-first): every fixed-width logical type maps to a device
dtype (`DataType.device_dtype`); variable-width types (string/binary) are
dictionary-encoded or carried as (offsets, bytes) pairs and only their
codes/offsets live on device. Decimal128/256 map to multi-word integer
columns. See arrow_go_tpu/device/block.py.
"""
from __future__ import annotations

import enum
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


class TypeId(enum.IntEnum):
    """Logical type ids, mirroring arrow.Type (reference arrow/datatype.go:34-177)."""

    NULL = 0
    BOOL = 1
    UINT8 = 2
    INT8 = 3
    UINT16 = 4
    INT16 = 5
    UINT32 = 6
    INT32 = 7
    UINT64 = 8
    INT64 = 9
    FLOAT16 = 10
    FLOAT32 = 11
    FLOAT64 = 12
    STRING = 13
    BINARY = 14
    FIXED_SIZE_BINARY = 15
    DATE32 = 16
    DATE64 = 17
    TIMESTAMP = 18
    TIME32 = 19
    TIME64 = 20
    INTERVAL_MONTHS = 21
    INTERVAL_DAY_TIME = 22
    DECIMAL128 = 23
    DECIMAL256 = 24
    LIST = 25
    STRUCT = 26
    SPARSE_UNION = 27
    DENSE_UNION = 28
    DICTIONARY = 29
    MAP = 30
    EXTENSION = 31
    FIXED_SIZE_LIST = 32
    DURATION = 33
    LARGE_STRING = 34
    LARGE_BINARY = 35
    LARGE_LIST = 36
    INTERVAL_MONTH_DAY_NANO = 37
    RUN_END_ENCODED = 38
    STRING_VIEW = 39
    BINARY_VIEW = 40
    LIST_VIEW = 41
    LARGE_LIST_VIEW = 42
    DECIMAL32 = 43
    DECIMAL64 = 44


class TimeUnit(enum.IntEnum):
    SECOND = 0
    MILLISECOND = 1
    MICROSECOND = 2
    NANOSECOND = 3

    @property
    def multiplier(self) -> int:
        return (1, 10**3, 10**6, 10**9)[int(self)]

    def __str__(self) -> str:
        return ("s", "ms", "us", "ns")[int(self)]


_TIMEUNIT_FROM_STR = {"s": TimeUnit.SECOND, "ms": TimeUnit.MILLISECOND,
                      "us": TimeUnit.MICROSECOND, "ns": TimeUnit.NANOSECOND}


def timeunit_from_str(s: str) -> TimeUnit:
    return _TIMEUNIT_FROM_STR[s]


class BufferKind(enum.IntEnum):
    """Physical buffer role in an array layout (reference DataTypeLayout)."""

    VALIDITY = 0
    DATA = 1
    OFFSETS = 2
    TYPE_IDS = 3
    SIZES = 4
    VIEWS = 5
    ALWAYS_NULL = 6


class Metadata:
    """Ordered string->string key/value metadata (reference arrow/schema.go)."""

    __slots__ = ("_keys", "_values")

    def __init__(self, pairs: Optional[Dict[str, str]] = None,
                 keys: Optional[Sequence[str]] = None,
                 values: Optional[Sequence[str]] = None):
        if pairs is not None:
            self._keys = list(pairs.keys())
            self._values = [pairs[k] for k in self._keys]
        else:
            self._keys = list(keys or [])
            self._values = list(values or [])
        if len(self._keys) != len(self._values):
            raise ValueError("metadata keys/values length mismatch")

    @property
    def keys(self) -> List[str]:
        return list(self._keys)

    @property
    def values(self) -> List[str]:
        return list(self._values)

    def __len__(self) -> int:
        return len(self._keys)

    def __bool__(self) -> bool:
        return len(self._keys) > 0

    def get(self, key: str, default: Optional[str] = None) -> Optional[str]:
        try:
            return self._values[self._keys.index(key)]
        except ValueError:
            return default

    def with_pair(self, key: str, value: str) -> "Metadata":
        m = Metadata(keys=self._keys + [key], values=self._values + [value])
        return m

    def to_dict(self) -> Dict[str, str]:
        return dict(zip(self._keys, self._values))

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Metadata):
            return NotImplemented
        return self._keys == other._keys and self._values == other._values

    def __repr__(self) -> str:
        return f"Metadata({self.to_dict()!r})"


EMPTY_METADATA = Metadata()


class DataType:
    """Base logical data type."""

    id: TypeId = TypeId.NULL
    name: str = "null"

    #: numpy dtype of the values buffer for fixed-width types, else None
    np_dtype: Optional[np.dtype] = None
    #: bit width of one value for fixed-width types (1 for bool), else 0
    bit_width: int = 0

    def __init__(self) -> None:
        pass

    # -- structure ---------------------------------------------------------
    @property
    def num_fields(self) -> int:
        return len(self.fields())

    def fields(self) -> List["Field"]:
        return []

    def buffer_kinds(self) -> List[BufferKind]:
        """Physical buffer layout (validity always first where present)."""
        return [BufferKind.VALIDITY, BufferKind.DATA]

    # -- predicates --------------------------------------------------------
    @property
    def is_fixed_width(self) -> bool:
        return self.np_dtype is not None or self.id == TypeId.BOOL

    @property
    def is_integer(self) -> bool:
        return TypeId.UINT8 <= self.id <= TypeId.INT64

    @property
    def is_signed_integer(self) -> bool:
        return self.id in (TypeId.INT8, TypeId.INT16, TypeId.INT32, TypeId.INT64)

    @property
    def is_unsigned_integer(self) -> bool:
        return self.id in (TypeId.UINT8, TypeId.UINT16, TypeId.UINT32, TypeId.UINT64)

    @property
    def is_floating(self) -> bool:
        return self.id in (TypeId.FLOAT16, TypeId.FLOAT32, TypeId.FLOAT64)

    @property
    def is_numeric(self) -> bool:
        return self.is_integer or self.is_floating

    @property
    def is_decimal(self) -> bool:
        return self.id in (TypeId.DECIMAL32, TypeId.DECIMAL64,
                           TypeId.DECIMAL128, TypeId.DECIMAL256)

    @property
    def is_temporal(self) -> bool:
        return self.id in (TypeId.DATE32, TypeId.DATE64, TypeId.TIME32,
                           TypeId.TIME64, TypeId.TIMESTAMP, TypeId.DURATION,
                           TypeId.INTERVAL_MONTHS, TypeId.INTERVAL_DAY_TIME,
                           TypeId.INTERVAL_MONTH_DAY_NANO)

    @property
    def is_binary_like(self) -> bool:
        return self.id in (TypeId.STRING, TypeId.BINARY,
                           TypeId.LARGE_STRING, TypeId.LARGE_BINARY,
                           TypeId.STRING_VIEW, TypeId.BINARY_VIEW)

    @property
    def is_nested(self) -> bool:
        return self.id in (TypeId.LIST, TypeId.LARGE_LIST, TypeId.FIXED_SIZE_LIST,
                           TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW, TypeId.STRUCT,
                           TypeId.MAP, TypeId.SPARSE_UNION, TypeId.DENSE_UNION,
                           TypeId.RUN_END_ENCODED)

    @property
    def is_primitive(self) -> bool:
        return self.is_numeric or self.id in (TypeId.BOOL,) or self.is_temporal

    # -- equality / hashing ------------------------------------------------
    def _eq_extra(self) -> Tuple:
        return ()

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, DataType):
            return NotImplemented
        return self.id == other.id and self._eq_extra() == other._eq_extra()

    def __hash__(self) -> int:
        return hash((int(self.id), self._eq_extra()))

    def __repr__(self) -> str:
        return str(self)

    def __str__(self) -> str:
        return self.name

    # -- device mapping (TPU-first) ---------------------------------------
    @property
    def device_dtype(self):
        """numpy dtype used for this column's device representation, or None."""
        return self.np_dtype

    @property
    def byte_width(self) -> int:
        if self.bit_width % 8:
            raise ValueError(f"{self} has no byte width")
        return self.bit_width // 8


class NullType(DataType):
    id = TypeId.NULL
    name = "null"

    def buffer_kinds(self) -> List[BufferKind]:
        return []


class BooleanType(DataType):
    id = TypeId.BOOL
    name = "bool"
    bit_width = 1

    @property
    def device_dtype(self):
        return np.dtype(np.bool_)


def _make_numeric(type_id: TypeId, nm: str, npdt, bits: int):
    class _T(DataType):
        id = type_id
        name = nm
        np_dtype = np.dtype(npdt)
        bit_width = bits
    _T.__name__ = nm.capitalize() + "Type"
    return _T


Int8Type = _make_numeric(TypeId.INT8, "int8", np.int8, 8)
Int16Type = _make_numeric(TypeId.INT16, "int16", np.int16, 16)
Int32Type = _make_numeric(TypeId.INT32, "int32", np.int32, 32)
Int64Type = _make_numeric(TypeId.INT64, "int64", np.int64, 64)
UInt8Type = _make_numeric(TypeId.UINT8, "uint8", np.uint8, 8)
UInt16Type = _make_numeric(TypeId.UINT16, "uint16", np.uint16, 16)
UInt32Type = _make_numeric(TypeId.UINT32, "uint32", np.uint32, 32)
UInt64Type = _make_numeric(TypeId.UINT64, "uint64", np.uint64, 64)
Float16Type = _make_numeric(TypeId.FLOAT16, "halffloat", np.float16, 16)
Float32Type = _make_numeric(TypeId.FLOAT32, "float", np.float32, 32)
Float64Type = _make_numeric(TypeId.FLOAT64, "double", np.float64, 64)


class Date32Type(DataType):
    id = TypeId.DATE32
    name = "date32"
    np_dtype = np.dtype(np.int32)
    bit_width = 32


class Date64Type(DataType):
    id = TypeId.DATE64
    name = "date64"
    np_dtype = np.dtype(np.int64)
    bit_width = 64


class _ParamTemporal(DataType):
    def __init__(self, unit: TimeUnit = TimeUnit.MICROSECOND):
        self.unit = TimeUnit(unit)

    def _eq_extra(self):
        return (self.unit,)

    def __str__(self):
        return f"{self.name}[{self.unit}]"


class TimestampType(_ParamTemporal):
    id = TypeId.TIMESTAMP
    name = "timestamp"
    np_dtype = np.dtype(np.int64)
    bit_width = 64

    def __init__(self, unit: TimeUnit = TimeUnit.MICROSECOND, tz: Optional[str] = None):
        super().__init__(unit)
        self.tz = tz

    def _eq_extra(self):
        return (self.unit, self.tz)

    def __str__(self):
        if self.tz:
            return f"timestamp[{self.unit}, tz={self.tz}]"
        return f"timestamp[{self.unit}]"


class Time32Type(_ParamTemporal):
    id = TypeId.TIME32
    name = "time32"
    np_dtype = np.dtype(np.int32)
    bit_width = 32

    def __init__(self, unit: TimeUnit = TimeUnit.MILLISECOND):
        if unit not in (TimeUnit.SECOND, TimeUnit.MILLISECOND):
            raise ValueError("time32 requires s or ms unit")
        super().__init__(unit)


class Time64Type(_ParamTemporal):
    id = TypeId.TIME64
    name = "time64"
    np_dtype = np.dtype(np.int64)
    bit_width = 64

    def __init__(self, unit: TimeUnit = TimeUnit.MICROSECOND):
        if unit not in (TimeUnit.MICROSECOND, TimeUnit.NANOSECOND):
            raise ValueError("time64 requires us or ns unit")
        super().__init__(unit)


class DurationType(_ParamTemporal):
    id = TypeId.DURATION
    name = "duration"
    np_dtype = np.dtype(np.int64)
    bit_width = 64


class MonthIntervalType(DataType):
    id = TypeId.INTERVAL_MONTHS
    name = "month_interval"
    np_dtype = np.dtype(np.int32)
    bit_width = 32


class DayTimeIntervalType(DataType):
    id = TypeId.INTERVAL_DAY_TIME
    name = "day_time_interval"
    # stored as (days:int32, millis:int32) pairs
    np_dtype = np.dtype([("days", np.int32), ("milliseconds", np.int32)])
    bit_width = 64


class MonthDayNanoIntervalType(DataType):
    id = TypeId.INTERVAL_MONTH_DAY_NANO
    name = "month_day_nano_interval"
    np_dtype = np.dtype([("months", np.int32), ("days", np.int32),
                         ("nanoseconds", np.int64)])
    bit_width = 128


class _DecimalType(DataType):
    def __init__(self, precision: int, scale: int):
        if not (1 <= precision <= self._max_precision):
            raise ValueError(
                f"{self.name} precision out of range [1, {self._max_precision}]: {precision}")
        self.precision = int(precision)
        self.scale = int(scale)

    def _eq_extra(self):
        return (self.precision, self.scale)

    def __str__(self):
        return f"{self.name}({self.precision}, {self.scale})"


class Decimal32Type(_DecimalType):
    id = TypeId.DECIMAL32
    name = "decimal32"
    bit_width = 32
    np_dtype = np.dtype(np.int32)
    _max_precision = 9


class Decimal64Type(_DecimalType):
    id = TypeId.DECIMAL64
    name = "decimal64"
    bit_width = 64
    np_dtype = np.dtype(np.int64)
    _max_precision = 18


class Decimal128Type(_DecimalType):
    id = TypeId.DECIMAL128
    name = "decimal128"
    bit_width = 128
    np_dtype = None  # two-word little-endian (lo: u64, hi: i64)
    _max_precision = 38


class Decimal256Type(_DecimalType):
    id = TypeId.DECIMAL256
    name = "decimal256"
    bit_width = 256
    np_dtype = None
    _max_precision = 76


class FixedSizeBinaryType(DataType):
    id = TypeId.FIXED_SIZE_BINARY
    name = "fixed_size_binary"

    def __init__(self, byte_width: int):
        self._byte_width = int(byte_width)
        self.bit_width = self._byte_width * 8

    @property
    def byte_width(self) -> int:
        return self._byte_width

    def _eq_extra(self):
        return (self._byte_width,)

    def __str__(self):
        return f"fixed_size_binary[{self._byte_width}]"

    @property
    def is_fixed_width(self) -> bool:
        return True


class _BinaryLike(DataType):
    offset_dtype = np.dtype(np.int32)

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY, BufferKind.OFFSETS, BufferKind.DATA]


class BinaryType(_BinaryLike):
    id = TypeId.BINARY
    name = "binary"


class StringType(_BinaryLike):
    id = TypeId.STRING
    name = "utf8"


class LargeBinaryType(_BinaryLike):
    id = TypeId.LARGE_BINARY
    name = "large_binary"
    offset_dtype = np.dtype(np.int64)


class LargeStringType(_BinaryLike):
    id = TypeId.LARGE_STRING
    name = "large_utf8"
    offset_dtype = np.dtype(np.int64)


class BinaryViewType(DataType):
    id = TypeId.BINARY_VIEW
    name = "binary_view"

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY, BufferKind.VIEWS]


class StringViewType(BinaryViewType):
    id = TypeId.STRING_VIEW
    name = "string_view"


class Field:
    """Named, nullable-annotated slot in a schema or nested type."""

    __slots__ = ("name", "type", "nullable", "metadata")

    def __init__(self, name: str, type: DataType, nullable: bool = True,
                 metadata: Metadata = EMPTY_METADATA):
        self.name = name
        self.type = type
        self.nullable = bool(nullable)
        self.metadata = metadata

    def with_type(self, dt: DataType) -> "Field":
        return Field(self.name, dt, self.nullable, self.metadata)

    def with_name(self, name: str) -> "Field":
        return Field(name, self.type, self.nullable, self.metadata)

    def equals(self, other: "Field", check_metadata: bool = False) -> bool:
        ok = (self.name == other.name and self.type == other.type
              and self.nullable == other.nullable)
        if check_metadata:
            ok = ok and self.metadata == other.metadata
        return ok

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Field):
            return NotImplemented
        return self.equals(other)

    def __hash__(self):
        return hash((self.name, self.type, self.nullable))

    def __repr__(self):
        n = "" if self.nullable else " not null"
        return f"Field({self.name}: {self.type}{n})"


class ListType(DataType):
    id = TypeId.LIST
    name = "list"
    offset_dtype = np.dtype(np.int32)

    def __init__(self, value: Any, nullable: bool = True):
        if isinstance(value, Field):
            self.value_field = value
        else:
            self.value_field = Field("item", value, nullable)

    @property
    def value_type(self) -> DataType:
        return self.value_field.type

    def fields(self) -> List[Field]:
        return [self.value_field]

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY, BufferKind.OFFSETS]

    def _eq_extra(self):
        return (self.value_field.type, self.value_field.nullable)

    def __str__(self):
        return f"{self.name}<{self.value_field.name}: {self.value_type}>"


class LargeListType(ListType):
    id = TypeId.LARGE_LIST
    name = "large_list"
    offset_dtype = np.dtype(np.int64)


class ListViewType(ListType):
    id = TypeId.LIST_VIEW
    name = "list_view"

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY, BufferKind.OFFSETS, BufferKind.SIZES]


class LargeListViewType(ListViewType):
    id = TypeId.LARGE_LIST_VIEW
    name = "large_list_view"
    offset_dtype = np.dtype(np.int64)


class FixedSizeListType(DataType):
    id = TypeId.FIXED_SIZE_LIST
    name = "fixed_size_list"

    def __init__(self, value: Any, list_size: int, nullable: bool = True):
        if isinstance(value, Field):
            self.value_field = value
        else:
            self.value_field = Field("item", value, nullable)
        self.list_size = int(list_size)

    @property
    def value_type(self) -> DataType:
        return self.value_field.type

    def fields(self) -> List[Field]:
        return [self.value_field]

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY]

    def _eq_extra(self):
        return (self.value_field.type, self.list_size)

    def __str__(self):
        return f"fixed_size_list<{self.value_field.name}: {self.value_type}>[{self.list_size}]"


class StructType(DataType):
    id = TypeId.STRUCT
    name = "struct"

    def __init__(self, fields: Sequence[Field]):
        self._fields = list(fields)

    def fields(self) -> List[Field]:
        return list(self._fields)

    def field(self, i: int) -> Field:
        return self._fields[i]

    def field_by_name(self, name: str) -> Optional[Field]:
        for f in self._fields:
            if f.name == name:
                return f
        return None

    def field_index(self, name: str) -> int:
        for i, f in enumerate(self._fields):
            if f.name == name:
                return i
        return -1

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY]

    def _eq_extra(self):
        return tuple((f.name, f.type, f.nullable) for f in self._fields)

    def __str__(self):
        inner = ", ".join(f"{f.name}: {f.type}" for f in self._fields)
        return f"struct<{inner}>"


class MapType(DataType):
    id = TypeId.MAP
    name = "map"
    offset_dtype = np.dtype(np.int32)

    def __init__(self, key: DataType, item: DataType, keys_sorted: bool = False,
                 item_nullable: bool = True):
        self.key_field = Field("key", key, nullable=False)
        self.item_field = Field("value", item, nullable=item_nullable)
        self.keys_sorted = keys_sorted
        entries = StructType([self.key_field, self.item_field])
        self.value_field = Field("entries", entries, nullable=False)

    @property
    def key_type(self) -> DataType:
        return self.key_field.type

    @property
    def item_type(self) -> DataType:
        return self.item_field.type

    @property
    def value_type(self) -> DataType:
        return self.value_field.type

    def fields(self) -> List[Field]:
        return [self.value_field]

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.VALIDITY, BufferKind.OFFSETS]

    def _eq_extra(self):
        return (self.key_type, self.item_type, self.keys_sorted)

    def __str__(self):
        return f"map<{self.key_type}, {self.item_type}>"


class UnionType(DataType):
    def __init__(self, fields: Sequence[Field], type_codes: Optional[Sequence[int]] = None):
        self._fields = list(fields)
        self.type_codes = list(type_codes) if type_codes is not None else list(range(len(fields)))

    def fields(self) -> List[Field]:
        return list(self._fields)

    def child_id(self, type_code: int) -> int:
        return self.type_codes.index(type_code)

    def _eq_extra(self):
        return (tuple((f.name, f.type) for f in self._fields), tuple(self.type_codes))

    def __str__(self):
        inner = ", ".join(f"{f.name}: {f.type}" for f in self._fields)
        return f"{self.name}<{inner}>"


class SparseUnionType(UnionType):
    id = TypeId.SPARSE_UNION
    name = "sparse_union"

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.TYPE_IDS]


class DenseUnionType(UnionType):
    id = TypeId.DENSE_UNION
    name = "dense_union"

    def buffer_kinds(self) -> List[BufferKind]:
        return [BufferKind.TYPE_IDS, BufferKind.OFFSETS]


class DictionaryType(DataType):
    id = TypeId.DICTIONARY
    name = "dictionary"

    def __init__(self, index_type: DataType, value_type: DataType, ordered: bool = False):
        if not index_type.is_integer:
            raise ValueError("dictionary index type must be integer")
        self.index_type = index_type
        self.value_type = value_type
        self.ordered = ordered

    @property
    def np_dtype(self):  # type: ignore[override]
        return self.index_type.np_dtype

    @property
    def bit_width(self):  # type: ignore[override]
        return self.index_type.bit_width

    def _eq_extra(self):
        return (self.index_type, self.value_type, self.ordered)

    def __str__(self):
        return f"dictionary<values={self.value_type}, indices={self.index_type}, ordered={self.ordered}>"


class RunEndEncodedType(DataType):
    id = TypeId.RUN_END_ENCODED
    name = "run_end_encoded"

    def __init__(self, run_ends: DataType, values: DataType):
        if run_ends.id not in (TypeId.INT16, TypeId.INT32, TypeId.INT64):
            raise ValueError("run-ends must be int16/int32/int64")
        self.run_ends_field = Field("run_ends", run_ends, nullable=False)
        self.values_field = Field("values", values, nullable=True)

    @property
    def run_ends_type(self) -> DataType:
        return self.run_ends_field.type

    @property
    def values_type(self) -> DataType:
        return self.values_field.type

    def fields(self) -> List[Field]:
        return [self.run_ends_field, self.values_field]

    def buffer_kinds(self) -> List[BufferKind]:
        return []

    def _eq_extra(self):
        return (self.run_ends_type, self.values_type)

    def __str__(self):
        return f"run_end_encoded<run_ends: {self.run_ends_type}, values: {self.values_type}>"


class ExtensionType(DataType):
    id = TypeId.EXTENSION
    name = "extension"

    def __init__(self, storage_type: DataType, extension_name: str,
                 serialized: bytes = b""):
        self.storage_type = storage_type
        self.extension_name = extension_name
        self.serialized = serialized

    def fields(self) -> List[Field]:
        return self.storage_type.fields()

    def buffer_kinds(self) -> List[BufferKind]:
        return self.storage_type.buffer_kinds()

    @property
    def np_dtype(self):  # type: ignore[override]
        return self.storage_type.np_dtype

    def _eq_extra(self):
        return (self.extension_name, self.storage_type, self.serialized)

    def __str__(self):
        return f"extension<{self.extension_name}, storage={self.storage_type}>"


# ---------------------------------------------------------------------------
# Singletons / factory helpers (public constructor API)
# ---------------------------------------------------------------------------

null = NullType()
bool_ = BooleanType()
int8 = Int8Type()
int16 = Int16Type()
int32 = Int32Type()
int64 = Int64Type()
uint8 = UInt8Type()
uint16 = UInt16Type()
uint32 = UInt32Type()
uint64 = UInt64Type()
float16 = Float16Type()
float32 = Float32Type()
float64 = Float64Type()
string = StringType()
binary = BinaryType()
large_string = LargeStringType()
large_binary = LargeBinaryType()
string_view = StringViewType()
binary_view = BinaryViewType()
date32 = Date32Type()
date64 = Date64Type()
month_interval = MonthIntervalType()
day_time_interval = DayTimeIntervalType()
month_day_nano_interval = MonthDayNanoIntervalType()


def timestamp(unit="us", tz=None) -> TimestampType:
    return TimestampType(timeunit_from_str(unit) if isinstance(unit, str) else unit, tz)


def time32(unit="ms") -> Time32Type:
    return Time32Type(timeunit_from_str(unit) if isinstance(unit, str) else unit)


def time64(unit="us") -> Time64Type:
    return Time64Type(timeunit_from_str(unit) if isinstance(unit, str) else unit)


def duration(unit="us") -> DurationType:
    return DurationType(timeunit_from_str(unit) if isinstance(unit, str) else unit)


def decimal32(precision, scale=0) -> Decimal32Type:
    return Decimal32Type(precision, scale)


def decimal64(precision, scale=0) -> Decimal64Type:
    return Decimal64Type(precision, scale)


def decimal128(precision, scale=0) -> Decimal128Type:
    return Decimal128Type(precision, scale)


def decimal256(precision, scale=0) -> Decimal256Type:
    return Decimal256Type(precision, scale)


def fixed_size_binary(byte_width: int) -> FixedSizeBinaryType:
    return FixedSizeBinaryType(byte_width)


def list_(value, nullable: bool = True) -> ListType:
    return ListType(value, nullable)


def large_list(value, nullable: bool = True) -> LargeListType:
    return LargeListType(value, nullable)


def fixed_size_list(value, list_size: int) -> FixedSizeListType:
    return FixedSizeListType(value, list_size)


def struct(fields) -> StructType:
    if isinstance(fields, dict):
        fields = [Field(k, v) for k, v in fields.items()]
    return StructType(fields)


def map_(key, item, keys_sorted: bool = False) -> MapType:
    return MapType(key, item, keys_sorted)


def dense_union(fields, type_codes=None) -> DenseUnionType:
    return DenseUnionType(fields, type_codes)


def sparse_union(fields, type_codes=None) -> SparseUnionType:
    return SparseUnionType(fields, type_codes)


def dictionary(index_type, value_type, ordered=False) -> DictionaryType:
    return DictionaryType(index_type, value_type, ordered)


def run_end_encoded(run_ends, values) -> RunEndEncodedType:
    return RunEndEncodedType(run_ends, values)


def field(name, type, nullable=True, metadata=EMPTY_METADATA) -> Field:
    return Field(name, type, nullable, metadata)


_FROM_NUMPY = {
    np.dtype(np.bool_): bool_,
    np.dtype(np.int8): int8,
    np.dtype(np.int16): int16,
    np.dtype(np.int32): int32,
    np.dtype(np.int64): int64,
    np.dtype(np.uint8): uint8,
    np.dtype(np.uint16): uint16,
    np.dtype(np.uint32): uint32,
    np.dtype(np.uint64): uint64,
    np.dtype(np.float16): float16,
    np.dtype(np.float32): float32,
    np.dtype(np.float64): float64,
}


def from_numpy_dtype(dt) -> DataType:
    dt = np.dtype(dt)
    try:
        return _FROM_NUMPY[dt]
    except KeyError:
        pass
    if dt.kind == "M":  # datetime64[unit] -> timestamp/date
        unit = np.datetime_data(dt)[0]
        if unit == "D":
            return date32
        if unit in ("s", "ms", "us", "ns"):
            return timestamp(unit)
    if dt.kind == "m":  # timedelta64[unit] -> duration
        unit = np.datetime_data(dt)[0]
        if unit in ("s", "ms", "us", "ns"):
            return duration(unit)
    if dt.kind in ("U", "S"):
        return string if dt.kind == "U" else binary
    raise ValueError(f"no arrow type for numpy dtype {dt}")


class Schema:
    """Ordered field collection + metadata (reference arrow/schema.go:157)."""

    __slots__ = ("_fields", "metadata", "_index")

    def __init__(self, fields: Sequence[Field], metadata: Metadata = EMPTY_METADATA):
        self._fields = list(fields)
        self.metadata = metadata
        self._index: Dict[str, int] = {}
        for i, f in enumerate(self._fields):
            self._index.setdefault(f.name, i)

    @property
    def fields(self) -> List[Field]:
        return list(self._fields)

    @property
    def names(self) -> List[str]:
        return [f.name for f in self._fields]

    @property
    def types(self) -> List[DataType]:
        return [f.type for f in self._fields]

    def __len__(self) -> int:
        return len(self._fields)

    @property
    def num_fields(self) -> int:
        return len(self._fields)

    def field(self, i: int) -> Field:
        return self._fields[i]

    def field_by_name(self, name: str) -> Optional[Field]:
        i = self._index.get(name, -1)
        return self._fields[i] if i >= 0 else None

    def field_index(self, name: str) -> int:
        return self._index.get(name, -1)

    def has_field(self, name: str) -> bool:
        return name in self._index

    def add_field(self, i: int, f: Field) -> "Schema":
        fields = list(self._fields)
        fields.insert(i, f)
        return Schema(fields, self.metadata)

    def remove_field(self, i: int) -> "Schema":
        fields = list(self._fields)
        fields.pop(i)
        return Schema(fields, self.metadata)

    def set_field(self, i: int, f: Field) -> "Schema":
        fields = list(self._fields)
        fields[i] = f
        return Schema(fields, self.metadata)

    def with_metadata(self, md: Metadata) -> "Schema":
        return Schema(self._fields, md)

    def equals(self, other: "Schema", check_metadata: bool = False) -> bool:
        if len(self) != len(other):
            return False
        if not all(a.equals(b, check_metadata) for a, b in zip(self._fields, other._fields)):
            return False
        if check_metadata and self.metadata != other.metadata:
            return False
        return True

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Schema):
            return NotImplemented
        return self.equals(other)

    def __repr__(self):
        lines = [f"{f.name}: {f.type}" + ("" if f.nullable else " not null")
                 for f in self._fields]
        return "schema<" + ", ".join(lines) + ">"


def schema(fields, metadata: Metadata = EMPTY_METADATA) -> Schema:
    if isinstance(fields, dict):
        fields = [Field(k, v) for k, v in fields.items()]
    fields = [f if isinstance(f, Field) else Field(f[0], f[1]) for f in fields]
    return Schema(fields, metadata)
