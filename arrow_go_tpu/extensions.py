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


class VariantType(dt.ExtensionType):
    """parquet.variant — struct<metadata: binary, value: binary> storage
    (reference arrow/extensions/variant.go:57 NewDefaultVariantType;
    shredded typed_value fields are future work)."""

    def __init__(self, storage: Optional[dt.DataType] = None):
        if storage is None:
            storage = dt.struct([dt.field("metadata", dt.binary, False),
                                 dt.field("value", dt.binary, False)])
        if storage.id != dt.TypeId.STRUCT:
            raise ArrowInvalid("parquet.variant storage must be a struct")
        names = [f.name for f in storage.fields()]
        if "metadata" not in names or "value" not in names:
            raise ArrowInvalid(
                "parquet.variant storage needs metadata+value fields")
        super().__init__(storage, "parquet.variant")


uuid = UuidType()
json_ = JsonType()
bool8 = Bool8Type()
variant = VariantType()

for _e in (uuid, json_, bool8, variant):
    register_extension_type(_e)
