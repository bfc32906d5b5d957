"""Array equality / approximate equality / edit-script diff
(reference arrow/array/compare.go and diff.go — Myers edit script)."""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .. import dtypes as dt
from .arrays import Array


def array_equal(a: Array, b: Array) -> bool:
    if a.type != b.type or len(a) != len(b):
        return False
    return a.to_pylist() == b.to_pylist()


def array_approx_equal(a: Array, b: Array, atol: float = 1e-5,
                       nans_equal: bool = False) -> bool:
    """Elementwise equality with float tolerance
    (reference arrayApproxEqual)."""
    if a.type != b.type or len(a) != len(b):
        return False
    if not a.type.is_floating:
        return array_equal(a, b)
    va, vb = a.to_pylist(), b.to_pylist()
    for x, y in zip(va, vb):
        if x is None or y is None:
            if x is not y:
                return False
            continue
        if math.isnan(x) or math.isnan(y):
            if nans_equal and math.isnan(x) and math.isnan(y):
                continue
            return False
        if abs(x - y) > atol:
            return False
    return True


class DiffEdit:
    """One edit: insert (into target) or delete (from base)."""

    __slots__ = ("op", "index", "value")

    def __init__(self, op: str, index: int, value):
        self.op = op        # '+' insert, '-' delete
        self.index = index
        self.value = value

    def __repr__(self):
        return f"{self.op}[{self.index}]={self.value!r}"

    def __eq__(self, other):
        return (self.op, self.index, self.value) == \
            (other.op, other.index, other.value)


def diff(base: Array, target: Array) -> List[DiffEdit]:
    """Myers-style edit script transforming base into target
    (reference arrow/array/diff.go)."""
    a = base.to_pylist()
    b = target.to_pylist()
    n, m = len(a), len(b)
    # classic O(nm) LCS dynamic program (sizes here are test-scale)
    dp = np.zeros((n + 1, m + 1), dtype=np.int64)
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            if a[i] == b[j]:
                dp[i][j] = dp[i + 1][j + 1] + 1
            else:
                dp[i][j] = max(dp[i + 1][j], dp[i][j + 1])
    out: List[DiffEdit] = []
    i = j = 0
    while i < n and j < m:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif dp[i + 1][j] >= dp[i][j + 1]:
            out.append(DiffEdit("-", i, a[i]))
            i += 1
        else:
            out.append(DiffEdit("+", j, b[j]))
            j += 1
    while i < n:
        out.append(DiffEdit("-", i, a[i]))
        i += 1
    while j < m:
        out.append(DiffEdit("+", j, b[j]))
        j += 1
    return out
