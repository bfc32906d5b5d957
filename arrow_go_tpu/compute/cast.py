"""Cast kernels (reference arrow/compute/cast.go:80 + internal/kernels/
{numeric_cast,boolean_cast,string_casts,cast_temporal}.go and the
_lib/cast_numeric.cc SIMD casts).

Device path handles numeric<->numeric, bool<->numeric, temporal rescaling
(the constant_factor.c analog) and dictionary decode; string<->numeric casts
run on host (strings live host-side by design).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..device.block import DeviceColumn, row_mask, to_device
from ..ops import bitmap
from .errors import ArrowInvalid, ArrowNotImplemented


@dataclass
class CastOptions:
    """Safety toggles (reference compute.CastOptions)."""

    allow_int_overflow: bool = False
    allow_time_truncate: bool = False
    allow_float_truncate: bool = False
    allow_invalid_utf8: bool = False

    @staticmethod
    def safe() -> "CastOptions":
        return CastOptions()

    @staticmethod
    def unsafe() -> "CastOptions":
        return CastOptions(True, True, True, True)


def _j(t: dt.DataType):
    if t.id == dt.TypeId.BOOL:
        return jnp.bool_
    return jnp.dtype(t.np_dtype)


def _valid_rows(col: DeviceColumn):
    m = row_mask(col.padded, col.length)
    if col.validity is not None:
        m = m & bitmap.expand_words(col.validity, col.padded)
    return m


def can_cast(from_t: dt.DataType, to_t: dt.DataType) -> bool:
    if from_t == to_t:
        return True
    ok_src = from_t.is_numeric or from_t.id == dt.TypeId.BOOL or from_t.is_temporal
    ok_dst = to_t.is_numeric or to_t.id == dt.TypeId.BOOL or to_t.is_temporal
    if ok_src and ok_dst:
        return True
    if from_t.id == dt.TypeId.DICTIONARY:
        return can_cast(from_t.value_type, to_t)
    if from_t.is_binary_like and (to_t.is_binary_like or to_t.is_numeric):
        return True
    if to_t.is_binary_like and (from_t.is_numeric or from_t.id == dt.TypeId.BOOL):
        return True
    list_kinds = (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.LIST_VIEW,
                  dt.TypeId.LARGE_LIST_VIEW, dt.TypeId.FIXED_SIZE_LIST)
    if from_t.id in list_kinds and to_t.id in list_kinds:
        return can_cast(from_t.value_type, to_t.value_type)
    return False


def cast_device(col: DeviceColumn, to_t: dt.DataType,
                options: Optional[CastOptions] = None) -> DeviceColumn:
    options = options or CastOptions()
    from_t = col.type
    if from_t == to_t:
        return col

    if from_t.id == dt.TypeId.DICTIONARY:
        # decode: gather dictionary values through codes (device) — only for
        # fixed-width dictionaries; string dicts decode host-side
        vt = from_t.value_type
        if vt.is_numeric or vt.id == dt.TypeId.BOOL:
            dvals = to_device(col.dictionary, pad=max(128, col.dictionary and len(col.dictionary) or 128))
            codes = jnp.clip(col.values, 0, max(len(col.dictionary) - 1, 0))
            decoded = jnp.take(dvals.values, codes, axis=0)
            dec = DeviceColumn(decoded, col.validity, col.length, vt)
            return cast_device(dec, to_t, options)
        raise ArrowNotImplemented(f"device cast from {from_t}")

    # temporal rescale (constant factor multiply/divide,
    # reference internal/kernels/constant_factor.go)
    if from_t.is_temporal and to_t.is_temporal:
        f_unit = getattr(from_t, "unit", None)
        t_unit = getattr(to_t, "unit", None)
        v = col.values.astype(jnp.int64)
        if f_unit is not None and t_unit is not None:
            fm, tm = f_unit.multiplier, t_unit.multiplier
            if tm >= fm:
                v = v * (tm // fm)
            else:
                q = fm // tm
                if not options.allow_time_truncate:
                    bad = (v % q != 0) & _valid_rows(col)
                    if bool(jnp.any(bad)):
                        raise ArrowInvalid(
                            f"casting {from_t} -> {to_t} would lose data")
                v = v // q
        return DeviceColumn(v.astype(_j(to_t)), col.validity, col.length, to_t)

    src_ok = from_t.is_numeric or from_t.id == dt.TypeId.BOOL or from_t.is_temporal
    dst_ok = to_t.is_numeric or to_t.id == dt.TypeId.BOOL or to_t.is_temporal
    if not (src_ok and dst_ok):
        raise ArrowNotImplemented(f"device cast {from_t} -> {to_t}")

    v = col.values
    out = v.astype(_j(to_t)) if to_t.id != dt.TypeId.BOOL else (v != 0)

    if to_t.id != dt.TypeId.BOOL and from_t.id != dt.TypeId.BOOL:
        valid = _valid_rows(col)
        if from_t.is_floating and to_t.is_integer and not options.allow_float_truncate:
            back = out.astype(v.dtype)
            if bool(jnp.any((back != v) & valid & ~jnp.isnan(v))):
                raise ArrowInvalid(f"float value truncated casting to {to_t}")
        if from_t.is_floating and to_t.is_integer:
            if bool(jnp.any(jnp.isnan(v) & valid)) and not options.allow_invalid_utf8:
                pass  # NaN -> undefined int; arrow errors unless unsafe
        if not options.allow_int_overflow and _narrowing(from_t, to_t):
            back = out.astype(v.dtype) if not from_t.is_floating else out
            if from_t.is_floating:
                lo, hi = _int_range(to_t)
                bad = (v < lo) | (v > hi) | jnp.isnan(v)
            else:
                bad = back != v
                if from_t.is_signed_integer and to_t.is_unsigned_integer:
                    bad = bad | (v < 0)
                if from_t.is_unsigned_integer and to_t.is_signed_integer:
                    bad = bad | (out < 0)
            if bool(jnp.any(bad & valid)):
                raise ArrowInvalid(f"integer value out of bounds casting "
                                   f"{from_t} -> {to_t}")
    return DeviceColumn(out, col.validity, col.length, to_t)


def _format_value(v, t: dt.DataType) -> str:
    """Arrow cast-to-string formatting (reference string_casts.go:
    bool -> true/false, integers decimal, floats shortest-repr,
    temporals ISO)."""
    if t.id == dt.TypeId.BOOL:
        return "true" if v else "false"
    if t.is_floating:
        f = float(v)
        if f != f:
            return "nan"
        if f in (float("inf"), float("-inf")):
            return "inf" if f > 0 else "-inf"
        if f == int(f) and abs(f) < 1e16:
            return str(int(f))
        return repr(f)
    if t.is_integer:
        return str(int(v))
    if t.is_decimal:
        return str(v)
    if t.is_temporal:
        import datetime as _dt_
        if isinstance(v, (int, np.integer)):  # physical representation
            if t.id == dt.TypeId.DATE32:
                v = _dt_.date(1970, 1, 1) + _dt_.timedelta(days=int(v))
            elif t.id == dt.TypeId.DATE64:
                v = (_dt_.datetime(1970, 1, 1)
                     + _dt_.timedelta(milliseconds=int(v))).date()
            elif t.id == dt.TypeId.TIMESTAMP:
                us = int(v) * 10**6 // t.unit.multiplier
                v = _dt_.datetime(1970, 1, 1) + _dt_.timedelta(microseconds=us)
            elif t.id in (dt.TypeId.TIME32, dt.TypeId.TIME64):
                us = int(v) * 10**6 // t.unit.multiplier
                v = (_dt_.datetime(1970, 1, 1)
                     + _dt_.timedelta(microseconds=us)).time()
            else:
                return str(int(v))
        out = v.isoformat()
        return out.replace("T", " ") if hasattr(v, "hour") else out
    return str(v)


def _parse_value(s, to_t: dt.DataType):
    """String -> typed value (reference string_casts.go parse kernels)."""
    import datetime as _dt_
    import decimal as _dec
    if isinstance(s, (bytes, bytearray)):
        s = bytes(s).decode("utf-8")
    s = s.strip()
    if to_t.is_integer:
        return int(s, 10)
    if to_t.is_floating:
        return float(s)
    if to_t.id == dt.TypeId.BOOL:
        low = s.lower()
        if low in ("true", "1"):
            return True
        if low in ("false", "0"):
            return False
        raise ValueError(f"cannot parse {s!r} as bool")
    if to_t.is_decimal:
        return _dec.Decimal(s)
    if to_t.id == dt.TypeId.DATE32:
        return _dt_.date.fromisoformat(s)
    if to_t.id == dt.TypeId.TIMESTAMP:
        return _dt_.datetime.fromisoformat(s.replace(" ", "T"))
    if to_t.id in (dt.TypeId.TIME32, dt.TypeId.TIME64):
        return _dt_.time.fromisoformat(s)
    raise ArrowNotImplemented(f"parse string -> {to_t}")


def cast_host(arr, to_t: dt.DataType,
              options: Optional[CastOptions] = None):
    """Host cast path: any cast with a binary-like side (strings live
    host-side by design; the device path handles fixed-width types)."""
    from ..array.arrays import Array, make_array
    from ..array.arrays import array as build_array
    from ..array.record import ChunkedArray
    options = options or CastOptions()
    if isinstance(arr, ChunkedArray):
        arr = arr.combine()
    from_t = arr.type
    if from_t == to_t:
        return arr
    if from_t.id == dt.TypeId.DICTIONARY:
        return cast_host(arr.decode(), to_t, options)

    if from_t.is_binary_like and to_t.is_binary_like:
        view_ids = (dt.TypeId.BINARY_VIEW, dt.TypeId.STRING_VIEW)
        from_view, to_view = from_t.id in view_ids, to_t.id in view_ids
        same_layout = (from_view == to_view and
                       (from_view or
                        from_t.offset_dtype == to_t.offset_dtype))
        if same_layout:
            # zero-copy re-type (string <-> binary share the layout;
            # string_view <-> binary_view likewise)
            d = arr.data
            from ..array.arrays import ArrayData
            return make_array(ArrayData(to_t, d.length, d.buffers,
                                        d.children, d.dictionary,
                                        d._null_count, d.offset))
        # physical layout changes (offsets <-> views, 32 <-> 64 bit
        # offsets): rebuild through a builder
        from ..array.builders import make_builder
        b = make_builder(to_t)
        decode = to_t.id in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING,
                             dt.TypeId.STRING_VIEW)
        for i in range(len(arr)):
            if arr.is_null(i):
                b.append_null()
                continue
            v = arr.value_bytes(i)
            b.append(v.decode("utf-8") if decode else v)
        return b.finish()

    list_kinds = (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.LIST_VIEW,
                  dt.TypeId.LARGE_LIST_VIEW, dt.TypeId.FIXED_SIZE_LIST)
    if from_t.id in list_kinds and to_t.id in list_kinds:
        # list <-> list_view <-> large variants: rebuild offsets/sizes
        # (reference cast list kernels, internal/kernels/cast.go list paths)
        from ..array.builders import make_builder
        b = make_builder(to_t)
        for i in range(len(arr)):
            if arr.is_null(i):
                b.append_null()
            else:
                b.append(arr.value(i))
        return b.finish()

    out = []
    if from_t.is_binary_like:
        for i in range(len(arr)):
            if arr.is_null(i):
                out.append(None)
                continue
            try:
                out.append(_parse_value(arr.value(i), to_t))
            except (ValueError, ArithmeticError) as e:
                raise ArrowInvalid(f"cast {from_t} -> {to_t}: {e}")
        return build_array(out, to_t)
    if to_t.is_binary_like:
        for i in range(len(arr)):
            if arr.is_null(i):
                out.append(None)
                continue
            v = arr.value(i)
            s = _format_value(v, from_t)
            out.append(s.encode() if to_t.id in (dt.TypeId.BINARY,
                                                 dt.TypeId.LARGE_BINARY)
                       else s)
        return build_array(out, to_t)
    raise ArrowNotImplemented(f"host cast {from_t} -> {to_t}")


def _narrowing(a: dt.DataType, b: dt.DataType) -> bool:
    if a.is_floating and b.is_integer:
        return True
    if a.is_integer and b.is_integer:
        if a.bit_width > b.bit_width:
            return True
        if a.is_signed_integer != b.is_signed_integer:
            return True
    return False


def _int_range(t: dt.DataType):
    info = np.iinfo(t.np_dtype)
    return float(info.min), float(info.max)
