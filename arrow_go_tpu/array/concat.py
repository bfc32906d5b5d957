"""Array concatenation (reference arrow/array/concat.go:879 — buffer-level
concat with dictionary unification). Fast vectorized paths for fixed-width
and binary types; builder fallback for deep nesting."""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .. import dtypes as dt
from ..memory import bitutil
from ..memory.buffer import Buffer
from .arrays import (Array, ArrayData, BinaryArray, DictionaryArray,
                     make_array)


def _concat_validity(arrays: Sequence[Array]) -> Optional[Buffer]:
    if all(a.null_count == 0 for a in arrays):
        return None
    bools = np.concatenate([a.validity_bools() for a in arrays])
    return Buffer(bitutil.pack_bits(bools))


def concat_arrays(arrays: Sequence[Array], type: Optional[dt.DataType] = None) -> Array:
    arrays = list(arrays)
    if not arrays:
        raise ValueError("concat of zero arrays")
    t = type or arrays[0].type
    for a in arrays:
        if a.type != t:
            raise ValueError(f"concat type mismatch: {a.type} vs {t}")
    if len(arrays) == 1 and arrays[0].data.offset == 0:
        return arrays[0]
    # a single sliced array falls through: concat doubles as "materialize
    # at offset 0" (used by parquet read_rows before leaf merging)
    total = sum(len(a) for a in arrays)
    nc = sum(a.null_count for a in arrays)

    if t.id == dt.TypeId.NULL:
        return make_array(ArrayData(t, total, [], null_count=total))

    if t.id == dt.TypeId.BOOL:
        bools = np.concatenate([a.to_numpy() for a in arrays])
        return make_array(ArrayData(t, total,
                                    [_concat_validity(arrays), Buffer(bitutil.pack_bits(bools))],
                                    null_count=nc))

    if t.np_dtype is not None and not t.is_decimal and t.id not in (
            dt.TypeId.DICTIONARY, dt.TypeId.EXTENSION):
        vals = np.concatenate([a.values for a in arrays])
        return make_array(ArrayData(t, total,
                                    [_concat_validity(arrays), Buffer.wrap(vals)],
                                    null_count=nc))

    if t.is_decimal or t.id == dt.TypeId.FIXED_SIZE_BINARY:
        bw = t.byte_width
        raws = []
        for a in arrays:
            d = a.data
            raws.append(d.buffers[1].data[d.offset * bw:(d.offset + d.length) * bw])
        return make_array(ArrayData(t, total,
                                    [_concat_validity(arrays), Buffer(np.concatenate(raws))],
                                    null_count=nc))

    if t.is_binary_like and t.id not in (dt.TypeId.STRING_VIEW, dt.TypeId.BINARY_VIEW):
        datas, offs = [], [np.zeros(1, dtype=np.int64)]
        acc = 0
        for a in arrays:
            o = a.offsets.astype(np.int64)
            d = a.data.buffers[2].data[o[0]:o[-1]]
            datas.append(d)
            offs.append(o[1:] - o[0] + acc)
            acc += len(d)
        offsets = np.concatenate(offs).astype(t.offset_dtype)
        return make_array(ArrayData(t, total,
                                    [_concat_validity(arrays), Buffer.wrap(offsets),
                                     Buffer(np.concatenate(datas) if datas else np.zeros(0, np.uint8))],
                                    null_count=nc))

    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
        child = concat_arrays(
            [make_array(a.data.children[0]).slice(int(a.offsets[0]),
                                                  int(a.offsets[-1] - a.offsets[0]))
             for a in arrays], t.value_type)
        offs, acc = [np.zeros(1, dtype=np.int64)], 0
        for a in arrays:
            o = a.offsets.astype(np.int64)
            offs.append(o[1:] - o[0] + acc)
            acc += int(o[-1] - o[0])
        offsets = np.concatenate(offs).astype(t.offset_dtype)
        return make_array(ArrayData(t, total,
                                    [_concat_validity(arrays), Buffer.wrap(offsets)],
                                    children=[child.data], null_count=nc))

    if t.id == dt.TypeId.STRUCT:
        children = []
        for i in range(t.num_fields):
            children.append(concat_arrays(
                [a.field(i) for a in arrays], t.fields()[i].type).data)
        return make_array(ArrayData(t, total, [_concat_validity(arrays)],
                                    children=children, null_count=nc))

    if t.id == dt.TypeId.DICTIONARY:
        # dictionary unification via memo + index transpose (reference
        # concat.go dict unify + internal/utils TransposeInts)
        memo: dict = {}
        unified_values = []
        transposed = []
        for a in arrays:
            assert isinstance(a, DictionaryArray)
            dvals = a.dictionary.to_pylist()
            remap = np.empty(len(dvals), dtype=np.int64)
            for j, v in enumerate(dvals):
                key = v if not isinstance(v, (bytearray, memoryview)) else bytes(v)
                if key not in memo:
                    memo[key] = len(memo)
                    unified_values.append(v)
                remap[j] = memo[key]
            idx = np.asarray(a.indices.to_numpy(), dtype=np.int64)
            mask = a.validity_bools()
            idx = np.where(mask, remap[np.where(mask, idx, 0)], 0)
            transposed.append(idx)
        from .arrays import array as from_py, from_numpy
        new_dict = from_py(unified_values, t.value_type)
        codes = np.concatenate(transposed).astype(t.index_type.np_dtype)
        return make_array(ArrayData(t, total,
                                    [_concat_validity(arrays), Buffer.wrap(codes)],
                                    dictionary=new_dict.data, null_count=nc))

    # generic fallback via builder
    from .builders import make_builder
    b = make_builder(t)
    for a in arrays:
        b.append_values(a.to_pylist())
    return b.finish()
