"""Scalar (elementwise) kernel families over device columns.

TPU-native counterpart of the reference's scalar kernel set:
  arithmetic  — arrow/compute/arithmetic.go:628 + internal/kernels/
                base_arithmetic.go (+ _lib/base_arithmetic.cc SIMD)
  comparison  — internal/kernels/scalar_comparisons.go (+ _lib asm)
  boolean     — scalar_bool.go (Kleene 3-valued variants)
  rounding    — internal/kernels/rounding.go

Design inversion: instead of per-type assembly kernels dispatched per span,
each op is ONE jnp expression jit-compiled per (op, dtype, shape-bucket) and
fused by XLA over the whole padded block. Null semantics follow the
executor-kernel contract NullHandling=Intersection (exec/kernel.go:457):
output validity = AND of input validity words — computed on packed words,
32 rows per instruction, never expanded unless a kernel needs Kleene logic.

Checked variants ('add' etc.) detect integer overflow / div-by-zero like
the reference's non-_unchecked functions and raise ArrowInvalid; the
detection flag is a device scalar fetched at the host boundary.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..device.block import DeviceColumn, row_mask
from ..ops import bitmap
from .errors import ArrowInvalid, ArrowNotImplemented

# ---------------------------------------------------------------------------
# type promotion (reference DispatchBest implicit casts, compute/exec.go:100)
# ---------------------------------------------------------------------------

_NUMERIC_ORDER = [dt.TypeId.UINT8, dt.TypeId.INT8, dt.TypeId.UINT16,
                  dt.TypeId.INT16, dt.TypeId.UINT32, dt.TypeId.INT32,
                  dt.TypeId.UINT64, dt.TypeId.INT64, dt.TypeId.FLOAT16,
                  dt.TypeId.FLOAT32, dt.TypeId.FLOAT64]


def common_numeric_type(a: dt.DataType, b: dt.DataType) -> dt.DataType:
    if a == b:
        return a
    if not (a.is_numeric and b.is_numeric):
        if a.is_temporal and b.is_temporal and a == b:
            return a
        raise ArrowNotImplemented(f"no common type for {a} and {b}")
    res = np.promote_types(a.np_dtype, b.np_dtype)
    return dt.from_numpy_dtype(res)


def _j(t: dt.DataType):
    if t.id == dt.TypeId.BOOL:
        return jnp.bool_
    return jnp.dtype(t.np_dtype)


# ---------------------------------------------------------------------------
# op table
# ---------------------------------------------------------------------------

def _shift_left(a, b):
    return a << (b & (a.dtype.itemsize * 8 - 1))


def _shift_right(a, b):
    return a >> (b & (a.dtype.itemsize * 8 - 1))


def _logb(a, b):
    return jnp.log(a) / jnp.log(b)


_ARITH_BINARY = {
    "add": jnp.add, "subtract": jnp.subtract, "multiply": jnp.multiply,
    "divide": None,  # special
    "power": jnp.power, "atan2": jnp.arctan2, "logb": _logb,
    "bit_wise_and": jnp.bitwise_and, "bit_wise_or": jnp.bitwise_or,
    "bit_wise_xor": jnp.bitwise_xor,
    "shift_left": _shift_left, "shift_right": _shift_right,
    "max_element_wise": jnp.maximum, "min_element_wise": jnp.minimum,
    "mod": jnp.mod,
}

_ARITH_UNARY = {
    "negate": jnp.negative, "abs": jnp.abs, "sign": jnp.sign,
    "sqrt": jnp.sqrt, "exp": jnp.exp, "expm1": jnp.expm1,
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "ln": jnp.log, "log10": jnp.log10, "log2": jnp.log2, "log1p": jnp.log1p,
    "floor": jnp.floor, "ceil": jnp.ceil, "trunc": jnp.trunc,
    "bit_wise_not": jnp.bitwise_not,
}

_FLOAT_ONLY = {"sqrt", "exp", "expm1", "sin", "cos", "tan", "asin", "acos",
               "atan", "sinh", "cosh", "tanh", "ln", "log10", "log2",
               "log1p", "power", "atan2", "logb"}

_COMPARE = {
    "equal": jnp.equal, "not_equal": jnp.not_equal,
    "less": jnp.less, "less_equal": jnp.less_equal,
    "greater": jnp.greater, "greater_equal": jnp.greater_equal,
}


# ---------------------------------------------------------------------------
# core elementwise executor
# ---------------------------------------------------------------------------

def _broadcast_scalar(v, t: dt.DataType, P: int, n: int) -> DeviceColumn:
    """Python scalar -> DeviceColumn constant (null scalar -> all-null)."""
    if isinstance(v, float) and not t.is_floating:
        t = dt.float64
    if isinstance(v, bool):
        t = dt.bool_
    if v is None:
        vals = jnp.zeros(P, _j(t))
        words = jnp.zeros(P // 32, jnp.uint32)
        return DeviceColumn(vals, words, n, t)
    vals = jnp.full(P, v, _j(t))
    return DeviceColumn(vals, None, n, t)


def _align(a: DeviceColumn, b) -> Tuple[DeviceColumn, DeviceColumn]:
    if not isinstance(b, DeviceColumn):
        b = _broadcast_scalar(b, a.type, a.padded, a.length)
        return a, b
    if not isinstance(a, DeviceColumn):
        a = _broadcast_scalar(a, b.type, b.padded, b.length)
    if a.padded != b.padded:
        raise ArrowInvalid(f"length/padding mismatch {a.padded} vs {b.padded}")
    return a, b




def _max_len(a: DeviceColumn, b: DeviceColumn):
    la, lb = a.length, b.length
    if isinstance(la, int) and isinstance(lb, int):
        return max(la, lb)
    return jnp.maximum(la, lb)  # traced inside compiled expressions

def _out_validity(a: DeviceColumn, b: Optional[DeviceColumn] = None):
    v = a.validity
    if b is not None:
        v = bitmap.words_and(v, b.validity)
    return v


def _cast_operands(a: DeviceColumn, b: DeviceColumn, to: dt.DataType):
    av = a.values.astype(_j(to)) if a.type != to else a.values
    bv = b.values.astype(_j(to)) if b.type != to else b.values
    return av, bv


_WIDE_DECIMALS = (dt.TypeId.DECIMAL128, dt.TypeId.DECIMAL256)


def arithmetic_binary(op: str, a, b, checked: bool = True) -> DeviceColumn:
    if isinstance(a, DeviceColumn) and a.type.id in _WIDE_DECIMALS or \
            isinstance(b, DeviceColumn) and getattr(b, "type", None) is not None \
            and getattr(b.type, "id", None) in _WIDE_DECIMALS:
        return _decimal_binary(op, a, b)
    a, b = _align(a, b)
    to = common_numeric_type(a.type, b.type)
    if op in _FLOAT_ONLY and not to.is_floating:
        to = dt.float64
    if op.startswith("bit_wise") or op.startswith("shift"):
        if not to.is_integer:
            raise ArrowNotImplemented(f"{op} requires integers, got {to}")
    av, bv = _cast_operands(a, b, to)
    validity = _out_validity(a, b)
    n = _max_len(a, b)

    if op == "divide":
        return _divide(a, b, av, bv, to, validity, n, checked)

    fn = _ARITH_BINARY[op]
    out = fn(av, bv).astype(_j(to))
    if checked and to.is_integer and op in ("add", "subtract", "multiply"):
        _check_overflow(op, av, bv, out, validity, n, to)
    return DeviceColumn(out, validity, n, to)


def _valid_rows(validity, P, n):
    m = row_mask(P, n)
    if validity is not None:
        m = m & bitmap.expand_words(validity, P)
    return m


@functools.partial(jax.jit, static_argnames=("op",))
def _overflow_flag(op, av, bv, out, mask):
    if op == "add":
        # signed/unsigned overflow: result sign inconsistency
        if jnp.issubdtype(av.dtype, jnp.unsignedinteger):
            bad = out < av
        else:
            bad = ((av > 0) & (bv > 0) & (out < 0)) | ((av < 0) & (bv < 0) & (out >= 0))
    elif op == "subtract":
        if jnp.issubdtype(av.dtype, jnp.unsignedinteger):
            bad = av < bv
        else:
            bad = ((av >= 0) & (bv < 0) & (out < 0)) | ((av < 0) & (bv > 0) & (out >= 0))
    else:  # multiply: recompute in float64 and compare magnitude
        approx = av.astype(jnp.float64) * bv.astype(jnp.float64)
        bad = jnp.abs(approx - out.astype(jnp.float64)) > 1.0
    return jnp.any(bad & mask)


def _check_overflow(op, av, bv, out, validity, n, to):
    mask = _valid_rows(validity, av.shape[0], n)
    if bool(_overflow_flag(op, av, bv, out, mask)):
        raise ArrowInvalid(f"integer overflow in {op} ({to})")


def _divide(a, b, av, bv, to, validity, n, checked):
    if to.is_integer:
        zero = bv == 0
        mask = _valid_rows(validity, av.shape[0], n)
        if checked and bool(jnp.any(zero & mask)):
            raise ArrowInvalid("divide by zero")
        safe = jnp.where(zero, jnp.ones_like(bv), bv)
        out = (av // safe).astype(_j(to))
        # arrow integer division truncates toward zero (Go semantics), numpy
        # floor-divides: fix negative quotients with nonzero remainder
        rem = av - out * safe
        fix = (rem != 0) & ((av < 0) ^ (bv < 0))
        out = jnp.where(fix, out + 1, out)
        return DeviceColumn(out, validity, n, to)
    out = av / bv
    return DeviceColumn(out, validity, n, to)


def arithmetic_unary(op: str, a: DeviceColumn, checked: bool = True) -> DeviceColumn:
    to = a.type
    if op in _FLOAT_ONLY and not to.is_floating:
        to = dt.float64
    av = a.values.astype(_j(to)) if to != a.type else a.values
    if op == "bit_wise_not" and not to.is_integer:
        raise ArrowNotImplemented("bit_wise_not requires integers")
    if op == "negate" and to.is_unsigned_integer and checked:
        mask = _valid_rows(a.validity, a.padded, a.length)
        if bool(jnp.any((av != 0) & mask)):
            raise ArrowInvalid("negate overflow on unsigned")
    out = _ARITH_UNARY[op](av)
    if op == "sign" and to.is_floating:
        out = out.astype(_j(to))
    return DeviceColumn(out.astype(_j(to)) if op not in _FLOAT_ONLY else out,
                        a.validity, a.length, to)


def compare(op: str, a, b) -> DeviceColumn:
    if (isinstance(a, DeviceColumn) and a.type.id in _WIDE_DECIMALS) or \
            (isinstance(b, DeviceColumn) and b.type.id in _WIDE_DECIMALS):
        return _decimal_binary(op, a, b)
    # string comparisons: dictionary codes vs a host literal resolve to a
    # per-code truth table gathered on device
    if isinstance(a, DeviceColumn) and a.type.id == dt.TypeId.DICTIONARY \
            and isinstance(b, (str, bytes)):
        return _compare_dict_scalar(op, a, b)
    if isinstance(b, DeviceColumn) and b.type.id == dt.TypeId.DICTIONARY \
            and isinstance(a, (str, bytes)):
        flip = {"equal": "equal", "not_equal": "not_equal",
                "less": "greater", "less_equal": "greater_equal",
                "greater": "less", "greater_equal": "less_equal"}
        return _compare_dict_scalar(flip[op], b, a)
    a, b = _align(a, b)
    if a.type.id == dt.TypeId.DICTIONARY or b.type.id == dt.TypeId.DICTIONARY:
        raise ArrowNotImplemented("compare dictionary vs dictionary: decode first")
    to = common_numeric_type(a.type, b.type) if a.type != b.type else a.type
    av, bv = _cast_operands(a, b, to)
    out = _COMPARE[op](av, bv)
    return DeviceColumn(out, _out_validity(a, b), _max_len(a, b),
                        dt.bool_)


def _decimal_binary(op: str, a, b) -> DeviceColumn:
    """decimal128/decimal256 add/subtract/multiply + comparisons on
    little-endian uint64 limb matrices (reference decimal promotion
    rules, arrow/compute arithmetic.go decimal paths;
    arrow/decimal256/decimal256.go 4x64-limb semantics)."""
    from ..ops import decimal as dec
    if not isinstance(a, DeviceColumn):
        a = _decimal_scalar_to_col(a, b)
    if not isinstance(b, DeviceColumn):
        b = _decimal_scalar_to_col(b, a)
    ta, tb = a.type, b.type
    if not (ta.id in _WIDE_DECIMALS and tb.id in _WIDE_DECIMALS):
        raise ArrowNotImplemented(f"decimal binary {op} with {ta} vs {tb}")
    validity = _out_validity(a, b)
    n = _max_len(a, b)
    av, bv = a.values, b.values
    k = max(av.shape[1], bv.shape[1])
    max_p = 76 if k == 4 else 38
    mk = (dt.decimal256 if k == 4 else dt.decimal128)

    def widen(v):
        if v.shape[1] < k:
            # sign-extend extra limbs
            ext = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(v[:, -1], jnp.int64)
                >> jnp.int64(63), jnp.uint64)
            pads = [ext] * (k - v.shape[1])
            return jnp.concatenate(
                [v] + [p[:, None] for p in pads], axis=1)
        return v

    av, bv = widen(av), widen(bv)
    if op in ("add", "subtract") or op in _COMPARE:
        s_out = max(ta.scale, tb.scale)
        if ta.scale < s_out:
            av = dec.scale_by_pow10_n(av, s_out - ta.scale)
        if tb.scale < s_out:
            bv = dec.scale_by_pow10_n(bv, s_out - tb.scale)
        if op in ("add", "subtract"):
            out = dec.addn(av, bv) if op == "add" else dec.subn(av, bv)
            p = min(max_p, max(ta.precision - ta.scale,
                               tb.precision - tb.scale) + s_out + 1)
            return DeviceColumn(out, validity, n, mk(p, s_out))
        c = dec.cmpn(av, bv)
        fn = {"equal": c == 0, "not_equal": c != 0, "less": c < 0,
              "less_equal": c <= 0, "greater": c > 0,
              "greater_equal": c >= 0}[op]
        return DeviceColumn(fn, validity, n, dt.bool_)
    if op == "multiply":
        out = dec.muln(av, bv)
        p = min(max_p, ta.precision + tb.precision + 1)
        return DeviceColumn(out, validity, n,
                            mk(p, ta.scale + tb.scale))
    raise ArrowNotImplemented(f"decimal {op}")


def _decimal_scalar_to_col(v, like: DeviceColumn) -> DeviceColumn:
    import decimal as pydec
    t = like.type
    if isinstance(v, pydec.Decimal):
        unscaled = int(v.scaleb(t.scale))
    elif isinstance(v, int):
        unscaled = v * 10 ** t.scale
    else:
        raise ArrowNotImplemented(f"decimal scalar {type(v)}")
    k = t.bit_width // 64
    limbs = [(unscaled >> (64 * i)) & ((1 << 64) - 1) for i in range(k)]
    vals = jnp.broadcast_to(jnp.asarray([limbs], jnp.uint64),
                            (like.padded, k))
    return DeviceColumn(vals, None, like.length, t)


def _compare_dict_scalar(op: str, a: DeviceColumn, lit) -> DeviceColumn:
    import operator
    opfn = {"equal": operator.eq, "not_equal": operator.ne,
            "less": operator.lt, "less_equal": operator.le,
            "greater": operator.gt, "greater_equal": operator.ge}[op]
    dvals = a.dictionary.to_pylist()
    if isinstance(lit, bytes) and dvals and isinstance(dvals[0], str):
        lit = lit.decode("utf-8")
    table = np.array([bool(opfn(v, lit)) if v is not None else False
                      for v in dvals] or [False], dtype=np.bool_)
    out = jnp.take(jnp.asarray(table),
                   jnp.clip(a.values, 0, len(table) - 1))
    return DeviceColumn(out, a.validity, a.length, dt.bool_)


# ---------------------------------------------------------------------------
# boolean kernels incl. Kleene (reference scalar_bool.go:123-140)
# ---------------------------------------------------------------------------

def boolean_binary(op: str, a, b) -> DeviceColumn:
    a, b = _align(a, b)
    if a.type.id != dt.TypeId.BOOL or b.type.id != dt.TypeId.BOOL:
        raise ArrowNotImplemented(f"{op} requires booleans")
    av, bv = a.values, b.values
    n = _max_len(a, b)
    P = a.padded
    if op in ("and", "or", "xor", "and_not"):
        fn = {"and": jnp.logical_and, "or": jnp.logical_or,
              "xor": jnp.logical_xor,
              "and_not": lambda x, y: x & ~y}[op]
        return DeviceColumn(fn(av, bv), _out_validity(a, b), n, dt.bool_)

    # Kleene: null = unknown
    a_known = (bitmap.expand_words(a.validity, P) if a.validity is not None
               else jnp.ones(P, jnp.bool_))
    b_known = (bitmap.expand_words(b.validity, P) if b.validity is not None
               else jnp.ones(P, jnp.bool_))
    if op == "and_kleene":
        out = av & bv
        known = (a_known & b_known) | (a_known & ~av) | (b_known & ~bv)
    elif op == "or_kleene":
        out = av | bv
        known = (a_known & b_known) | (a_known & av) | (b_known & bv)
    elif op == "and_not_kleene":
        out = av & ~bv
        known = (a_known & b_known) | (a_known & ~av) | (b_known & bv)
    else:
        raise ArrowNotImplemented(op)
    validity = None if bool(jnp.all(known)) else bitmap.pack_mask(known)
    return DeviceColumn(out, validity, n, dt.bool_)


def invert(a: DeviceColumn) -> DeviceColumn:
    if a.type.id != dt.TypeId.BOOL:
        raise ArrowNotImplemented("invert requires boolean")
    return DeviceColumn(~a.values, a.validity, a.length, dt.bool_)


# ---------------------------------------------------------------------------
# validity predicates
# ---------------------------------------------------------------------------

def is_null(a: DeviceColumn) -> DeviceColumn:
    P = a.padded
    if a.validity is None:
        out = jnp.zeros(P, jnp.bool_)
    else:
        out = ~bitmap.expand_words(a.validity, P)
    return DeviceColumn(out, None, a.length, dt.bool_)


def is_valid(a: DeviceColumn) -> DeviceColumn:
    c = is_null(a)
    return DeviceColumn(~c.values & row_mask(a.padded, a.length), None,
                        a.length, dt.bool_)


def is_nan(a: DeviceColumn) -> DeviceColumn:
    if not a.type.is_floating:
        return DeviceColumn(jnp.zeros(a.padded, jnp.bool_), a.validity,
                            a.length, dt.bool_)
    return DeviceColumn(jnp.isnan(a.values), a.validity, a.length, dt.bool_)


def is_finite(a: DeviceColumn) -> DeviceColumn:
    if not a.type.is_floating:
        return DeviceColumn(jnp.ones(a.padded, jnp.bool_), a.validity,
                            a.length, dt.bool_)
    return DeviceColumn(jnp.isfinite(a.values), a.validity, a.length, dt.bool_)


# ---------------------------------------------------------------------------
# rounding (reference internal/kernels/rounding.go)
# ---------------------------------------------------------------------------

def round_(a: DeviceColumn, ndigits: int = 0, mode: str = "half_to_even") -> DeviceColumn:
    if not a.type.is_floating:
        return a
    v = a.values
    scale = 10.0 ** ndigits
    x = v * scale
    if mode == "half_to_even":
        r = jnp.round(x)
    elif mode == "down":
        r = jnp.floor(x)
    elif mode == "up":
        r = jnp.ceil(x)
    elif mode == "towards_zero":
        r = jnp.trunc(x)
    elif mode == "towards_infinity":
        r = jnp.where(x >= 0, jnp.ceil(x), jnp.floor(x))
    elif mode == "half_up":
        r = jnp.floor(x + 0.5)
    elif mode == "half_down":
        r = jnp.ceil(x - 0.5)
    elif mode == "half_towards_zero":
        r = jnp.where(x >= 0, jnp.ceil(x - 0.5), jnp.floor(x + 0.5))
    elif mode == "half_towards_infinity":
        r = jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))
    else:
        raise ArrowNotImplemented(f"round mode {mode}")
    return DeviceColumn(r / scale, a.validity, a.length, a.type)


def round_to_multiple(a: DeviceColumn, multiple: float,
                      mode: str = "half_to_even") -> DeviceColumn:
    if multiple <= 0:
        raise ArrowInvalid("multiple must be positive")
    v = a.values / multiple
    tmp = DeviceColumn(v, a.validity, a.length, a.type)
    r = round_(tmp, 0, mode)
    return DeviceColumn(r.values * multiple, a.validity, a.length, a.type)
