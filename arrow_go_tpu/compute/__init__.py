"""Public compute API (reference arrow/compute typed wrappers:
Filter/Take/CastDatum/Unique/SortIndices + CallFunction)."""
from __future__ import annotations

from typing import Any, Optional, Sequence

from .. import dtypes as dt
from .cast import CastOptions
from .errors import (ArrowError, ArrowIndexError, ArrowInvalid, ArrowKeyError,
                     ArrowNotImplemented)
from .functions import (CountOptions, FilterOptions, MakeStructOptions,  # noqa: F401
                        SetLookupOptions,
                        SortKey, SortOptions, TakeOptions, VarianceOptions,
                        dictionary_encode, fill_null, filter_, if_else,
                        index_in, is_in, make_struct, min_max, sort,
                        sort_indices, take, unique, value_counts)
from .expression import (Expression, FieldRef, Literal, call,  # noqa: F401
                         compile_expression, execute_scalar_expression,
                         field, literal, project)
from .groupby import group_by  # noqa: F401
from .run_ends import run_end_decode, run_end_encode  # noqa: F401
from .scalars import Scalar, make_array_from_scalar, parse_scalar, scalar  # noqa: F401
from .join import hash_join  # noqa: F401
from .registry import (FunctionRegistry, call_function, default_registry,
                       new_child_registry)

filter = filter_  # noqa: A001


def cast(values, target_type: dt.DataType,
         options: Optional[CastOptions] = None, safe: bool = True):
    if options is None and not safe:
        options = CastOptions.unsafe()
    return call_function("cast", [values],
                         {"to_type": target_type, "options": options})


def can_cast(from_type: dt.DataType, to_type: dt.DataType) -> bool:
    from .cast import can_cast as _cc
    return _cc(from_type, to_type)


def _wrap1(name):
    def fn(a, options=None):
        return call_function(name, [a], options)
    fn.__name__ = name
    return fn


def _wrap2(name):
    def fn(a, b, options=None):
        return call_function(name, [a, b], options)
    fn.__name__ = name
    return fn


add = _wrap2("add")
subtract = _wrap2("subtract")
multiply = _wrap2("multiply")
divide = _wrap2("divide")
power = _wrap2("power")
mod = _wrap2("mod")
negate = _wrap1("negate")
abs = _wrap1("abs")  # noqa: A001
sign = _wrap1("sign")
sqrt = _wrap1("sqrt")
exp = _wrap1("exp")
ln = _wrap1("ln")
log2 = _wrap1("log2")
log10 = _wrap1("log10")
log1p = _wrap1("log1p")
sin = _wrap1("sin")
cos = _wrap1("cos")
tan = _wrap1("tan")
asin = _wrap1("asin")
acos = _wrap1("acos")
atan = _wrap1("atan")
atan2 = _wrap2("atan2")
floor = _wrap1("floor")
ceil = _wrap1("ceil")
trunc = _wrap1("trunc")
round = _wrap1("round")  # noqa: A001

equal = _wrap2("equal")
not_equal = _wrap2("not_equal")
less = _wrap2("less")
less_equal = _wrap2("less_equal")
greater = _wrap2("greater")
greater_equal = _wrap2("greater_equal")

and_ = _wrap2("and")
or_ = _wrap2("or")
xor = _wrap2("xor")
and_not = _wrap2("and_not")
and_kleene = _wrap2("and_kleene")
or_kleene = _wrap2("or_kleene")
invert = _wrap1("invert")

is_null = _wrap1("is_null")
is_valid = _wrap1("is_valid")
is_nan = _wrap1("is_nan")
is_finite = _wrap1("is_finite")

shift_left = _wrap2("shift_left")
shift_right = _wrap2("shift_right")
bit_wise_and = _wrap2("bit_wise_and")
bit_wise_or = _wrap2("bit_wise_or")
bit_wise_xor = _wrap2("bit_wise_xor")
bit_wise_not = _wrap1("bit_wise_not")

sum = _wrap1("sum")  # noqa: A001
min = _wrap1("min")  # noqa: A001
max = _wrap1("max")  # noqa: A001
mean = _wrap1("mean")
count = _wrap1("count")
count_distinct = _wrap1("count_distinct")
any = _wrap1("any")  # noqa: A001
all = _wrap1("all")  # noqa: A001
product = _wrap1("product")
variance = _wrap1("variance")
stddev = _wrap1("stddev")
