"""Expression trees compiled to fused device programs.

Reference: arrow/compute/expression.go:52 (Literal / Parameter(FieldRef) /
Call trees), fieldref.go dotted-path resolution, exprs/exec.go
ExecuteScalarExpression (the Substrait execution path).

The TPU inversion (SURVEY.md §7 step 8): instead of executing a bound
expression kernel-at-a-time through the executor, `compile_expression`
traces the WHOLE tree into ONE jitted XLA program over a DeviceBatch —
every elementwise op, comparison, boolean combine and null-propagation
fuses into a single HBM pass. This is the part of the design the
reference cannot express.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.record import RecordBatch
from ..device.block import DeviceBatch, DeviceColumn, batch_to_device
from . import kernels
from .cast import CastOptions, cast_device
from .errors import ArrowInvalid, ArrowKeyError


class Expression:
    """Base expression node."""

    # -- operator sugar ----------------------------------------------------
    def _bin(self, op, other, reverse=False):
        other = other if isinstance(other, Expression) else literal(other)
        args = [other, self] if reverse else [self, other]
        return Call(op, args)

    def __add__(self, o):
        return self._bin("add", o)

    def __radd__(self, o):
        return self._bin("add", o, True)

    def __sub__(self, o):
        return self._bin("subtract", o)

    def __rsub__(self, o):
        return self._bin("subtract", o, True)

    def __mul__(self, o):
        return self._bin("multiply", o)

    def __rmul__(self, o):
        return self._bin("multiply", o, True)

    def __truediv__(self, o):
        return self._bin("divide", o)

    def __eq__(self, o):  # type: ignore[override]
        return self._bin("equal", o)

    def __ne__(self, o):  # type: ignore[override]
        return self._bin("not_equal", o)

    def __lt__(self, o):
        return self._bin("less", o)

    def __le__(self, o):
        return self._bin("less_equal", o)

    def __gt__(self, o):
        return self._bin("greater", o)

    def __ge__(self, o):
        return self._bin("greater_equal", o)

    def __and__(self, o):
        return self._bin("and_kleene", o)

    def __or__(self, o):
        return self._bin("or_kleene", o)

    def __invert__(self):
        return Call("invert", [self])

    def __hash__(self):
        return hash(repr(self))

    # -- helpers -----------------------------------------------------------
    def is_null(self):
        return Call("is_null", [self])

    def is_valid(self):
        return Call("is_valid", [self])

    def isin(self, values):
        return Call("is_in", [self], {"value_set": list(values)})

    def cast(self, to_type: dt.DataType, safe: bool = True):
        return Call("cast", [self], {"to_type": to_type, "safe": safe})


@dataclass(frozen=True)
class Literal(Expression):
    value: Any

    def __repr__(self):
        return repr(self.value)

    def __hash__(self):
        return hash(("lit", self.value))


class FieldRef(Expression):
    """Column reference; supports dotted nested paths
    (reference fieldref.go:588)."""

    def __init__(self, *path: Union[str, int]):
        if len(path) == 1 and isinstance(path[0], str) and "." in path[0]:
            path = tuple(path[0].split("."))
        self.path = path

    def __repr__(self):
        return "$" + ".".join(str(p) for p in self.path)

    def __hash__(self):
        return hash(("ref", self.path))


class Call(Expression):
    def __init__(self, function: str, args: Sequence[Expression],
                 options: Any = None):
        self.function = function
        self.args = list(args)
        self.options = options

    def __repr__(self):
        return f"{self.function}({', '.join(map(repr, self.args))})"

    def __hash__(self):
        return hash((self.function, tuple(self.args)))


def field(*path) -> FieldRef:
    return FieldRef(*path)


def literal(v) -> Literal:
    return Literal(v)


def call(function: str, args: Sequence[Expression], options=None) -> Call:
    return Call(function, [a if isinstance(a, Expression) else literal(a)
                           for a in args], options)


def project(values: Sequence[Expression], names: Sequence[str]) -> Call:
    """Shorthand for `make_struct` producing record-batch-shaped output
    (reference expression.go:573-581 Project)."""
    return call("make_struct", list(values), {"field_names": list(names)})


# ---------------------------------------------------------------------------
# evaluation over a DeviceBatch (traceable)
# ---------------------------------------------------------------------------

_EXPR_FUNCS: Dict[str, Callable] = {}


def _resolve_field(db: DeviceBatch, ref: FieldRef) -> DeviceColumn:
    col: Any = None
    for i, p in enumerate(ref.path):
        if i == 0:
            idx = db.schema.field_index(p) if isinstance(p, str) else p
            if idx < 0:
                raise ArrowKeyError(f"no field {p!r}")
            col = db.columns[idx]
        else:
            raise ArrowInvalid("nested field refs require struct flattening "
                               "before device execution")
    return col


def _eval(expr: Expression, db: DeviceBatch):
    if isinstance(expr, Literal):
        return expr.value
    if isinstance(expr, FieldRef):
        return _resolve_field(db, expr)
    if isinstance(expr, Call):
        args = [_eval(a, db) for a in expr.args]
        if expr.function == "make_struct":
            # struct output lives on host (device blocks are flat);
            # only valid in eager execution, not inside compiled programs
            from .functions import make_struct
            return make_struct(*args, options=expr.options)
        return _apply(expr.function, args, expr.options)
    raise ArrowInvalid(f"bad expression node {expr!r}")


def _apply(fname: str, args: List[Any], options):
    # traceable kernel subset: unchecked arithmetic so no host syncs occur
    # inside the fused program
    if fname in kernels._ARITH_BINARY:
        return kernels.arithmetic_binary(fname, args[0], args[1],
                                         checked=False)
    if fname in kernels._ARITH_UNARY:
        return kernels.arithmetic_unary(fname, args[0], checked=False)
    if fname in kernels._COMPARE:
        return kernels.compare(fname, args[0], args[1])
    if fname in ("and", "or", "xor", "and_not", "and_kleene", "or_kleene",
                 "and_not_kleene"):
        return _boolean_traceable(fname, args[0], args[1])
    if fname == "invert":
        return kernels.invert(args[0])
    if fname == "is_null":
        return kernels.is_null(args[0])
    if fname == "is_valid":
        return kernels.is_valid(args[0])
    if fname == "is_nan":
        return kernels.is_nan(args[0])
    if fname == "is_finite":
        return kernels.is_finite(args[0])
    if fname == "cast":
        to_t = options["to_type"] if isinstance(options, dict) else options
        opts = CastOptions.unsafe()  # fused path cannot host-sync for checks
        return cast_device(args[0], to_t, opts)
    if fname == "fill_null":
        from .functions import fill_null
        return fill_null(args[0], args[1])
    if fname == "if_else":
        from .functions import if_else
        return if_else(args[0], args[1], args[2])
    if fname == "is_in":
        from .functions import is_in, SetLookupOptions
        vs = options["value_set"] if isinstance(options, dict) else options
        return is_in(args[0], SetLookupOptions(value_set=vs))
    raise ArrowKeyError(f"expression function {fname!r} not traceable")


def _boolean_traceable(op, a, b):
    """Kleene logic without the host-side all-known shortcut."""
    from ..ops import bitmap
    from ..device.block import row_mask
    a, b = kernels._align(a, b)
    if op in ("and", "or", "xor", "and_not"):
        return kernels.boolean_binary(op, a, b)
    P = a.padded
    av, bv = a.values, b.values
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
    else:
        out = av & ~bv
        known = (a_known & b_known) | (a_known & ~av) | (b_known & bv)
    return DeviceColumn(out, bitmap.pack_mask(known), a.length, dt.bool_)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def execute_scalar_expression(expr: Expression, batch) -> Any:
    """Eager execution against a RecordBatch / DeviceBatch
    (reference exprs/exec.go:440 ExecuteScalarExpression)."""
    host = isinstance(batch, RecordBatch)
    db = batch_to_device(batch) if host else batch
    out = _eval(expr, db)
    if host and isinstance(out, DeviceColumn):
        from ..device.block import from_device
        return from_device(out)
    return out


def compile_expression(expr: Expression, schema: dt.Schema):
    """Compile to one jitted program: fn(DeviceBatch) -> DeviceColumn.

    The returned callable re-traces only per shape bucket; all kernels in
    the tree fuse into a single XLA executable.
    """
    def raw(values: Tuple, validities: Tuple, length):
        cols = [DeviceColumn(v, w, length, f.type)
                for v, w, f in zip(values, validities, schema.fields)]
        db = DeviceBatch(schema, cols, length)
        out = _eval(expr, db)
        return out.values, out.validity

    jitted = jax.jit(raw)

    def run(db: DeviceBatch) -> DeviceColumn:
        values = tuple(c.values for c in db.columns)
        validities = tuple(c.validity for c in db.columns)
        out_v, out_w = jitted(values, validities, db.length)
        out_type = _infer_output_type(expr, schema)
        return DeviceColumn(out_v, out_w, db.length, out_type)

    run.expression = expr
    return run


def _infer_output_type(expr: Expression, schema: dt.Schema) -> dt.DataType:
    """Cheap static type inference for the compiled wrapper."""
    if isinstance(expr, FieldRef):
        idx = schema.field_index(expr.path[0]) if isinstance(expr.path[0], str) \
            else expr.path[0]
        return schema.field(idx).type
    if isinstance(expr, Literal):
        from ..array.builders import infer_type
        return infer_type([expr.value])
    if isinstance(expr, Call):
        f = expr.function
        if f in kernels._COMPARE or f in ("and", "or", "xor", "and_not",
                                          "and_kleene", "or_kleene",
                                          "and_not_kleene", "invert",
                                          "is_null", "is_valid", "is_nan",
                                          "is_finite", "is_in"):
            return dt.bool_
        if f == "cast":
            o = expr.options
            return o["to_type"] if isinstance(o, dict) else o
        if f in kernels._ARITH_BINARY:
            a = _infer_output_type(expr.args[0], schema)
            b = _infer_output_type(expr.args[1], schema)
            to = kernels.common_numeric_type(a, b)
            if f in kernels._FLOAT_ONLY and not to.is_floating:
                to = dt.float64
            if f == "divide" and not to.is_floating:
                return to
            return to
        if f in kernels._ARITH_UNARY:
            a = _infer_output_type(expr.args[0], schema)
            if f in kernels._FLOAT_ONLY and not a.is_floating:
                return dt.float64
            return a
        if f in ("fill_null", "if_else"):
            return _infer_output_type(expr.args[-1] if f == "fill_null"
                                      else expr.args[1], schema)
    raise ArrowInvalid(f"cannot infer output type of {expr!r}")
