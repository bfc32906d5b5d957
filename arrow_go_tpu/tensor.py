"""Dense n-dimensional tensors over primitive arrays
(reference arrow/tensor/tensor.go:141 tensor.New — shape/strides,
row/column-major checks). TPU-native addition: `to_device()` yields the
jax array view for compute."""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from . import dtypes as dt
from .array.arrays import Array, from_numpy
from .compute.errors import ArrowInvalid


class Tensor:
    def __init__(self, values: Array, shape: Sequence[int],
                 strides: Optional[Sequence[int]] = None,
                 dim_names: Optional[Sequence[str]] = None):
        t = values.type
        if not t.is_numeric:
            raise ArrowInvalid("tensors require a numeric value type")
        if values.null_count:
            raise ArrowInvalid("tensors cannot contain nulls")
        n = 1
        for s in shape:
            n *= s
        if n != len(values):
            raise ArrowInvalid(f"shape {tuple(shape)} does not match "
                               f"{len(values)} values")
        self.values = values
        self.shape = tuple(int(s) for s in shape)
        itemsize = t.np_dtype.itemsize
        if strides is None:
            strides = []
            acc = itemsize
            for s in reversed(self.shape):
                strides.append(acc)
                acc *= s
            strides = tuple(reversed(strides))
        self.strides = tuple(int(s) for s in strides)
        self.dim_names = list(dim_names) if dim_names else None

    @property
    def type(self) -> dt.DataType:
        return self.values.type

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n

    def dim_name(self, i: int) -> str:
        return self.dim_names[i] if self.dim_names else ""

    @property
    def is_row_major(self) -> bool:
        itemsize = self.type.np_dtype.itemsize
        acc = itemsize
        expect = []
        for s in reversed(self.shape):
            expect.append(acc)
            acc *= s
        return self.strides == tuple(reversed(expect))

    @property
    def is_column_major(self) -> bool:
        itemsize = self.type.np_dtype.itemsize
        acc = itemsize
        expect = []
        for s in self.shape:
            expect.append(acc)
            acc *= s
        return self.strides == tuple(expect)

    @property
    def is_contiguous(self) -> bool:
        return self.is_row_major or self.is_column_major

    def to_numpy(self) -> np.ndarray:
        flat = self.values.to_numpy()
        itemsize = self.type.np_dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            flat, self.shape, self.strides, writeable=False)

    def to_device(self):
        """The tensor as a jax array in HBM."""
        from .jaxenv import jnp
        return jnp.asarray(self.to_numpy())

    def value(self, *index) -> object:
        return self.to_numpy()[tuple(index)].item()

    def __repr__(self):
        return f"Tensor({self.type}, shape={self.shape})"


def tensor(data, shape=None, dim_names=None) -> Tensor:
    if isinstance(data, np.ndarray):
        arr = from_numpy(np.ascontiguousarray(data).ravel())
        return Tensor(arr, data.shape, None, dim_names)
    if isinstance(data, Array):
        return Tensor(data, shape if shape is not None else (len(data),),
                      None, dim_names)
    a = np.asarray(data)
    return tensor(a, dim_names=dim_names)
