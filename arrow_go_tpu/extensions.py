"""Canonical extension types (reference arrow/extensions: Bool8, JSON,
UUID, Opaque) + the extension type registry (reference
arrow/datatype_extension.go RegisterExtensionType)."""
from __future__ import annotations

import threading
import uuid as _uuid
from typing import Dict, Optional

from . import dtypes as dt
from .compute.errors import ArrowInvalid, ArrowKeyError

_registry: Dict[str, dt.ExtensionType] = {}
_lock = threading.Lock()


def register_extension_type(ext: dt.ExtensionType) -> None:
    with _lock:
        if ext.extension_name in _registry:
            raise ArrowKeyError(
                f"extension {ext.extension_name!r} already registered")
        _registry[ext.extension_name] = ext


def unregister_extension_type(name: str) -> None:
    with _lock:
        _registry.pop(name, None)


def get_extension_type(name: str) -> Optional[dt.ExtensionType]:
    return _registry.get(name)


class UuidType(dt.ExtensionType):
    """arrow.uuid — fixed_size_binary(16) storage."""

    def __init__(self):
        super().__init__(dt.fixed_size_binary(16), "arrow.uuid")

    @staticmethod
    def to_uuid(b: bytes) -> _uuid.UUID:
        return _uuid.UUID(bytes=b)


class JsonType(dt.ExtensionType):
    """arrow.json — utf8 storage holding JSON documents."""

    def __init__(self, storage: dt.DataType = dt.string):
        if not storage.is_binary_like:
            raise ArrowInvalid("arrow.json requires string storage")
        super().__init__(storage, "arrow.json")


class Bool8Type(dt.ExtensionType):
    """arrow.bool8 — int8 storage, 1 byte per boolean (device friendly)."""

    def __init__(self):
        super().__init__(dt.int8, "arrow.bool8")


class OpaqueType(dt.ExtensionType):
    """arrow.opaque — unknown producer type passthrough."""

    def __init__(self, storage: dt.DataType, type_name: str,
                 vendor_name: str):
        import json
        super().__init__(storage, "arrow.opaque",
                         json.dumps({"type_name": type_name,
                                     "vendor_name": vendor_name}).encode())
        self.type_name = type_name
        self.vendor_name = vendor_name


class TimestampWithOffsetType(dt.ExtensionType):
    """arrow.timestamp_with_offset — a timestamp column carrying a per-row
    timezone offset (reference arrow/extensions/timestamp_with_offset.go:36).

    Storage: struct<timestamp: timestamp[unit, tz=UTC] not null,
    offset_minutes: int16 | dictionary(int16) | ree(int16) not null>.
    """

    def __init__(self, unit: str = "s",
                 offset_type: Optional[dt.DataType] = None):
        if offset_type is None:
            offset_type = dt.int16
        if not self._offset_type_ok(offset_type):
            raise ArrowInvalid(
                f"invalid offset type {offset_type} for "
                "arrow.timestamp_with_offset")
        storage = dt.struct([
            dt.field("timestamp", dt.timestamp(unit, "UTC"), False),
            dt.field("offset_minutes", offset_type, False),
        ])
        super().__init__(storage, "arrow.timestamp_with_offset")
        self.unit = unit
        self.offset_type = offset_type

    @staticmethod
    def _offset_type_ok(t: dt.DataType) -> bool:
        # int16, dictionary with int16 values, or run-end-encoded int16
        # (reference timestamp_with_offset.go:40 isOffsetTypeOk)
        if t.id == dt.TypeId.INT16:
            return True
        if t.id == dt.TypeId.DICTIONARY:
            return t.value_type.id == dt.TypeId.INT16
        if t.id == dt.TypeId.RUN_END_ENCODED:
            return t.values_type.id == dt.TypeId.INT16
        return False

    @classmethod
    def from_storage(cls, storage: dt.DataType) -> "TimestampWithOffsetType":
        """Validate + wrap a storage type (isDataTypeCompatible analog)."""
        if storage.id != dt.TypeId.STRUCT or len(storage.fields()) != 2:
            raise ArrowInvalid("storage must be a 2-field struct")
        ts_f, off_f = storage.fields()
        if (ts_f.name != "timestamp" or ts_f.nullable
                or ts_f.type.id != dt.TypeId.TIMESTAMP
                or ts_f.type.tz != "UTC"):
            raise ArrowInvalid(
                "field 0 must be non-null timestamp[*, tz=UTC]")
        if (off_f.name != "offset_minutes" or off_f.nullable
                or not cls._offset_type_ok(off_f.type)):
            raise ArrowInvalid(
                "field 1 must be non-null offset_minutes int16")
        return cls(ts_f.type.unit, off_f.type)


class VariantType(dt.ExtensionType):
    """parquet.variant — struct<metadata: binary, value: binary
    [, typed_value: ...]> storage (reference
    arrow/extensions/variant.go:159 NewVariantType rules; shredded
    typed_value schemas per variant.go:66 createShreddedField /
    :127 NewShreddedVariantType)."""

    def __init__(self, storage: Optional[dt.DataType] = None):
        if storage is None:
            storage = dt.struct([dt.field("metadata", dt.binary, False),
                                 dt.field("value", dt.binary, False)])
        if storage.id != dt.TypeId.STRUCT:
            raise ArrowInvalid("parquet.variant storage must be a struct")
        names = [f.name for f in storage.fields()]
        if "metadata" not in names:
            raise ArrowInvalid(
                "parquet.variant storage needs a metadata field")
        if "value" not in names and "typed_value" not in names:
            raise ArrowInvalid(
                "parquet.variant storage needs value or typed_value")
        if len(names) > 3:
            raise ArrowInvalid("parquet.variant storage has too many fields")
        md = storage.fields()[names.index("metadata")]
        if md.nullable:
            raise ArrowInvalid("variant metadata field must be non-null")
        self.shred_type: Optional[dt.DataType] = None
        if "typed_value" in names:
            tv = storage.fields()[names.index("typed_value")]
            if not tv.nullable:
                raise ArrowInvalid("variant typed_value must be nullable")
            self.shred_type = _unshredded_field_type(tv.type)
        super().__init__(storage, "parquet.variant")

    @property
    def shredded(self) -> bool:
        return self.shred_type is not None


# -- variant shredding (reference arrow/extensions/variant.go:66,99,127;
# Parquet Variant Shredding spec: each shredded value group is
# struct<value: binary?, typed_value: T?> — value holds the residual
# variant-encoded part, typed_value the natively-typed part) -----------

_LISTY = (dt.TypeId.LIST, dt.TypeId.LARGE_LIST)


def _value_group(typed: dt.DataType) -> dt.DataType:
    return dt.struct([dt.field("value", dt.binary, True),
                      dt.field("typed_value", typed, True)])


def _shredded_field_type(t: dt.DataType) -> dt.DataType:
    """createShreddedField (variant.go:66): lists/structs recurse into
    value groups; primitives shred as themselves."""
    if t.id in _LISTY:
        elem = _value_group(_shredded_field_type(t.fields()[0].type))
        return dt.list_(dt.field("element", elem, False))
    if t.id == dt.TypeId.STRUCT:
        return dt.struct([
            dt.field(f.name, _value_group(_shredded_field_type(f.type)),
                     False)
            for f in t.fields()])
    return t


def _unshredded_field_type(t: dt.DataType) -> dt.DataType:
    """Inverse of _shredded_field_type (for shred_type recovery)."""
    if t.id in _LISTY:
        elem = t.fields()[0].type            # value group struct
        return dt.list_(_unshredded_field_type(elem.fields()[1].type))
    if t.id == dt.TypeId.STRUCT and t.fields() and all(
            f.type.id == dt.TypeId.STRUCT
            and [c.name for c in f.type.fields()] == ["value", "typed_value"]
            for f in t.fields()):
        return dt.struct([
            dt.field(f.name, _unshredded_field_type(f.type.fields()[1].type))
            for f in t.fields()])
    return t


def shredded_variant_type(t: Optional[dt.DataType] = None) -> VariantType:
    """NewShreddedVariantType (variant.go:127): build a variant extension
    type whose typed_value shreds values of `t`."""
    if t is None:
        return VariantType()
    storage = dt.struct([
        dt.field("metadata", dt.binary, False),
        dt.field("value", dt.binary, True),
        dt.field("typed_value", _shredded_field_type(t), True)])
    return VariantType(storage)


_MISSING = object()


def _prim_match(obj, t: dt.DataType):
    """Python value -> typed_value scalar for primitive shred type t, or
    _MISSING when the value must stay in the residual."""
    import datetime as _d
    tid = t.id
    if obj is None:
        return _MISSING                     # variant null stays in value
    if tid == dt.TypeId.BOOL:
        return obj if isinstance(obj, bool) else _MISSING
    if t.is_integer:
        return obj if isinstance(obj, int) and not isinstance(obj, bool) \
            else _MISSING
    if t.is_floating:
        return obj if isinstance(obj, float) else _MISSING
    if tid in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING):
        return obj if isinstance(obj, str) else _MISSING
    if tid in (dt.TypeId.BINARY, dt.TypeId.LARGE_BINARY):
        return obj if isinstance(obj, bytes) else _MISSING
    if tid == dt.TypeId.DATE32:
        return obj if (isinstance(obj, _d.date)
                       and not isinstance(obj, _d.datetime)) else _MISSING
    if tid == dt.TypeId.TIMESTAMP:
        return obj if isinstance(obj, _d.datetime) else _MISSING
    return _MISSING


def _shred_one(obj, t: dt.DataType, b) -> dict:
    """One decoded python value -> its value-group dict for shred type t."""
    if t.id == dt.TypeId.STRUCT:
        if isinstance(obj, dict):
            shredded_names = [f.name for f in t.fields()]
            typed = {}
            for f in t.fields():
                if f.name in obj:
                    typed[f.name] = _shred_one(obj[f.name], f.type, b)
                else:
                    typed[f.name] = {"value": None, "typed_value": None}
            residual = {k: v for k, v in obj.items()
                        if k not in shredded_names}
            val = b.encode_value(residual) if residual else None
            return {"value": val, "typed_value": typed}
        return {"value": b.encode_value(obj), "typed_value": None}
    if t.id in _LISTY:
        if isinstance(obj, list):
            elem_t = t.fields()[0].type
            return {"value": None,
                    "typed_value": [_shred_one(x, elem_t, b) for x in obj]}
        return {"value": b.encode_value(obj), "typed_value": None}
    v = _prim_match(obj, t)
    if v is _MISSING:
        return {"value": b.encode_value(obj), "typed_value": None}
    return {"value": None, "typed_value": v}


def shred_variant(arr, shred_t: dt.DataType):
    """Non-shredded variant column -> shredded column for `shred_t`
    (the writer-side half of the Parquet Variant Shredding spec;
    reference variant.go:99). Values that don't match the shredded
    schema stay in the residual `value` field — lossless."""
    from .array.arrays import Array, ArrayData, make_array
    from .array.builders import make_builder
    from .parquet import variant as pv
    st = shredded_variant_type(shred_t)
    storage = arr.storage if isinstance(arr.type, dt.ExtensionType) else arr
    b_out = make_builder(st.storage_type)
    for i in range(len(storage)):
        row = storage[i]
        if row is None:
            b_out.append_null()
            continue
        obj = pv.decode(row["metadata"], row["value"])
        bb = pv.Builder()
        group = _shred_one(obj, shred_t, bb)
        b_out.append({"metadata": bb.metadata().data, **group})
    out = b_out.finish()
    d = out.data
    return make_array(ArrayData(st, d.length, d.buffers, d.children,
                                d.dictionary, d._null_count, d.offset))


def _unshred_one(group, t: dt.DataType, meta: bytes):
    from .parquet import variant as pv
    val = group.get("value")
    tv = group.get("typed_value")
    if t.id == dt.TypeId.STRUCT and isinstance(tv, dict):
        obj = {}
        for f in t.fields():
            r = _unshred_one(tv[f.name], f.type, meta)
            if r is not _MISSING:
                obj[f.name] = r
        if val is not None:
            residual = pv.decode(meta, val)
            if isinstance(residual, dict):
                obj.update(residual)
        return obj
    if t.id in _LISTY and isinstance(tv, list):
        elem_t = t.fields()[0].type
        return [_unshred_one(g, elem_t, meta) for g in tv]
    if tv is not None:
        return _from_typed_scalar(tv, t)
    if val is not None:
        return pv.decode(meta, val)
    return _MISSING


def _from_typed_scalar(v, t: dt.DataType):
    import datetime as _d
    if t.id == dt.TypeId.DATE32 and isinstance(v, int):
        return _d.date(1970, 1, 1) + _d.timedelta(days=v)
    if t.id == dt.TypeId.TIMESTAMP and isinstance(v, int):
        base = _d.datetime(1970, 1, 1,
                           tzinfo=_d.timezone.utc if t.tz else None)
        scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[t.unit]
        return base + _d.timedelta(microseconds=v * 10**6 // scale)
    return v


def unshred_variant(arr):
    """Shredded variant column -> non-shredded struct<metadata, value>
    variant column (reader-side reconstruction; merges typed_value with
    the residual value per the shredding spec)."""
    from .array.arrays import ArrayData, make_array
    from .array.builders import make_builder
    from .parquet import variant as pv
    t = arr.type
    shred_t = t.shred_type if isinstance(t, VariantType) else None
    storage = arr.storage if isinstance(t, dt.ExtensionType) else arr
    if shred_t is None:
        raise ArrowInvalid("unshred_variant needs a shredded variant")
    out_t = VariantType()
    b = make_builder(out_t.storage_type)
    rows = storage.to_pylist()
    for row in rows:
        if row is None:
            b.append_null()
            continue
        obj = _unshred_one(row, shred_t, row["metadata"])
        if obj is _MISSING:
            obj = None
        meta, val = pv.encode(obj)
        b.append({"metadata": meta, "value": val})
    out = b.finish()
    d = out.data
    return make_array(ArrayData(out_t, d.length, d.buffers, d.children,
                                d.dictionary, d._null_count, d.offset))


uuid = UuidType()
json_ = JsonType()
bool8 = Bool8Type()
variant = VariantType()
timestamp_with_offset = TimestampWithOffsetType()

for _e in (uuid, json_, bool8, variant, timestamp_with_offset):
    register_extension_type(_e)
