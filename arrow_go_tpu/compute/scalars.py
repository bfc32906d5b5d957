"""Scalar values (reference arrow/scalar — Scalar at scalar.go:48,
MakeArrayFromScalar :794, parse.go / compare.go)."""
from __future__ import annotations

from typing import Any, Optional

from .. import dtypes as dt
from ..array.arrays import Array
from ..array.builders import infer_type, make_builder
from .errors import ArrowInvalid


class Scalar:
    """A single typed value (possibly null)."""

    __slots__ = ("type", "_value", "is_valid")

    def __init__(self, value: Any, type: Optional[dt.DataType] = None):
        if type is None:
            type = infer_type([value]) if value is not None else dt.null
        self.type = type
        self._value = value
        self.is_valid = value is not None

    @property
    def value(self):
        return self._value

    def as_py(self):
        return self._value

    def cast(self, to: dt.DataType) -> "Scalar":
        if self._value is None:
            return Scalar(None, to)
        from . import cast as cast_fn
        arr = make_array_from_scalar(self, 1)
        out = cast_fn(arr, to)
        return Scalar(out[0], to)

    def equals(self, other: "Scalar") -> bool:
        return self.type == other.type and self._value == other._value

    def __eq__(self, other):
        if isinstance(other, Scalar):
            return self.equals(other)
        return self._value == other

    def __hash__(self):
        return hash((self.type, self._value))

    def __repr__(self):
        return f"Scalar({self._value!r}: {self.type})"


def scalar(value, type: Optional[dt.DataType] = None) -> Scalar:
    return Scalar(value, type)


def make_array_from_scalar(s: Scalar, length: int) -> Array:
    """Broadcast a scalar to an array (reference MakeArrayFromScalar)."""
    b = make_builder(s.type if s.type.id != dt.TypeId.NULL else dt.null)
    for _ in range(length):
        if s.is_valid:
            b.append(s.value)
        else:
            b.append_null()
    return b.finish()


def parse_scalar(t: dt.DataType, text: str) -> Scalar:
    """String -> typed scalar (reference scalar/parse.go)."""
    import datetime
    import decimal
    if t.id == dt.TypeId.BOOL:
        low = text.lower()
        if low in ("true", "1"):
            return Scalar(True, t)
        if low in ("false", "0"):
            return Scalar(False, t)
        raise ArrowInvalid(f"cannot parse {text!r} as bool")
    if t.is_integer:
        return Scalar(int(text), t)
    if t.is_floating:
        return Scalar(float(text), t)
    if t.is_decimal:
        return Scalar(decimal.Decimal(text), t)
    if t.id == dt.TypeId.DATE32:
        return Scalar(datetime.date.fromisoformat(text), t)
    if t.id == dt.TypeId.TIMESTAMP:
        return Scalar(datetime.datetime.fromisoformat(text), t)
    if t.is_binary_like:
        return Scalar(text, t)
    raise ArrowInvalid(f"cannot parse scalar of type {t}")
