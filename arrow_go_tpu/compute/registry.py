"""Function registry + dispatch (reference arrow/compute/registry.go:30,
functions.go Function/Arity/kinds, exec.go:191 CallFunction).

The executor inversion (SURVEY.md §7): the reference's CallFunction walks
registry -> DispatchBest -> goroutine executor -> per-span kernel loop
(exec.go:59-182). Here dispatch resolves a python callable over whole
DeviceColumns and XLA replaces the span loop: one fused jitted program per
(op, dtype, shape-bucket). Host arrays auto-migrate to device and results
migrate back when the caller passed host data.
"""
from __future__ import annotations

import enum
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

from .. import dtypes as dt
from ..array.arrays import Array
from ..array.record import ChunkedArray, RecordBatch, Table
from ..device.block import DeviceColumn, from_device, to_device
from .errors import ArrowKeyError, ArrowNotImplemented


class FunctionKind(enum.Enum):
    SCALAR = "scalar"
    VECTOR = "vector"
    SCALAR_AGGREGATE = "scalar_aggregate"
    HASH_AGGREGATE = "hash_aggregate"
    META = "meta"


@dataclass
class Arity:
    num_args: int
    is_varargs: bool = False

    @staticmethod
    def unary() -> "Arity":
        return Arity(1)

    @staticmethod
    def binary() -> "Arity":
        return Arity(2)

    @staticmethod
    def ternary() -> "Arity":
        return Arity(3)

    @staticmethod
    def varargs(min_args: int = 0) -> "Arity":
        return Arity(min_args, True)


@dataclass
class Function:
    name: str
    kind: FunctionKind
    arity: Arity
    exec: Callable[..., Any]     # (*device_args, options=...) -> result
    doc: str = ""
    #: META functions receive raw Datum-level values (RecordBatch etc.)
    raw_args: bool = False

    def validate_arity(self, n: int) -> None:
        if self.arity.is_varargs:
            if n < self.arity.num_args:
                raise ArrowNotImplemented(
                    f"{self.name} needs >= {self.arity.num_args} args, got {n}")
        elif n != self.arity.num_args:
            raise ArrowNotImplemented(
                f"{self.name} needs {self.arity.num_args} args, got {n}")


class FunctionRegistry:
    """Name -> Function map with aliasing and parent chaining
    (reference registry.go parent-chained child registries)."""

    def __init__(self, parent: Optional["FunctionRegistry"] = None):
        self._parent = parent
        self._fns: Dict[str, Function] = {}
        self._lock = threading.Lock()

    def register(self, fn: Function, allow_overwrite: bool = False) -> None:
        with self._lock:
            if fn.name in self._fns and not allow_overwrite:
                raise ArrowKeyError(f"function {fn.name} already registered")
            self._fns[fn.name] = fn

    def add_alias(self, alias: str, target: str) -> None:
        fn = self.get_function(target)
        with self._lock:
            self._fns[alias] = fn

    def get_function(self, name: str) -> Function:
        fn = self._fns.get(name)
        if fn is None and self._parent is not None:
            return self._parent.get_function(name)
        if fn is None:
            raise ArrowKeyError(f"no function registered named {name!r}")
        return fn

    def function_names(self) -> List[str]:
        names = set(self._fns)
        if self._parent:
            names |= set(self._parent.function_names())
        return sorted(names)

    def __contains__(self, name: str) -> bool:
        try:
            self.get_function(name)
            return True
        except ArrowKeyError:
            return False


_default_registry: Optional[FunctionRegistry] = None
_registry_lock = threading.Lock()


def default_registry() -> FunctionRegistry:
    global _default_registry
    if _default_registry is None:
        with _registry_lock:
            if _default_registry is None:
                reg = FunctionRegistry()
                from . import functions
                functions.register_all(reg)
                _default_registry = reg
    return _default_registry


def new_child_registry() -> FunctionRegistry:
    return FunctionRegistry(default_registry())


# ---------------------------------------------------------------------------
# argument coercion + call
# ---------------------------------------------------------------------------

def _is_scalar(v) -> bool:
    import decimal
    import numpy as np
    return v is None or isinstance(v, (int, float, bool, str, bytes,
                                       decimal.Decimal, np.generic))


def _coerce_to_device(v, pad_hint: Optional[int] = None):
    """Returns (device_value, was_host)."""
    if isinstance(v, DeviceColumn):
        return v, False
    if isinstance(v, Array):
        return to_device(v, pad=pad_hint), True
    if isinstance(v, ChunkedArray):
        return to_device(v.combine(), pad=pad_hint), True
    if _is_scalar(v):
        return v, False
    raise ArrowNotImplemented(f"cannot coerce {type(v)} to device column")


def call_function(name: str, args: Sequence[Any], options: Any = None,
                  registry: Optional[FunctionRegistry] = None):
    """The CallFunction entry point (reference compute/exec.go:191)."""
    reg = registry or default_registry()
    fn = reg.get_function(name)
    fn.validate_arity(len(args))

    from ..utils.metrics import metrics
    if fn.raw_args:
        with metrics.time_op(name):
            return fn.exec(*args, options=options)

    # align paddings: all array args share the max padded length
    pad = None
    for a in args:
        if isinstance(a, DeviceColumn):
            pad = max(pad or 0, a.padded)
        elif isinstance(a, Array):
            from ..device.block import pad_length
            pad = max(pad or 0, pad_length(len(a)))
        elif isinstance(a, ChunkedArray):
            from ..device.block import pad_length
            pad = max(pad or 0, pad_length(len(a)))

    coerced, any_host = [], False
    for a in args:
        c, was_host = _coerce_to_device(a, pad)
        coerced.append(c)
        any_host = any_host or was_host

    rows = max((c.length for c in coerced if isinstance(c, DeviceColumn)),
               default=0)
    with metrics.time_op(name, rows=rows):
        result = fn.exec(*coerced, options=options)

    if any_host:
        return _to_host(result)
    return result


def _to_host(result):
    if isinstance(result, DeviceColumn):
        return from_device(result)
    if isinstance(result, tuple):
        return tuple(_to_host(r) for r in result)
    return result
