"""Host-side vectorized take for nested and other non-HBM types.

The TPU device block format (device/block.py) carries flat fixed-width
columns; nested types (list/struct/map/union/REE/views) and decimal256
keep their Arrow physical layout on host. Selection on them is an
offsets-rebuild gather over numpy buffer views — the counterpart of the
reference's per-family selection kernels:

  reference arrow/compute/internal/kernels/vector_selection.go:1754 (list),
  :1829 (fixed-size list), :1867 (map), :1944 (dense union), :2044 (struct)
  and the dictionary/extension special cases in
  arrow/compute/selection.go:488-580 (dictionary take = take on indices
  only; extension take = take on storage).

Index vector convention (same as ops/selection.py): int64 numpy array,
idx[i] >= 0 selects source row idx[i]; idx[i] == -1 emits a null row.
Everything here is vectorized numpy — no per-row python in the hot loop
except the union null-append edge case.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array, nulls
from ..memory import bitutil
from ..memory.buffer import Buffer
from .errors import ArrowIndexError, ArrowNotImplemented


def _validity_buf(mask: np.ndarray) -> Tuple[Buffer, int]:
    """bool mask -> (validity buffer or None, null_count)."""
    nc = int(len(mask) - mask.sum())
    if nc == 0:
        return None, 0
    return Buffer(bitutil.pack_bits(mask)), nc


def _out_mask(arr: Array, idx: np.ndarray, safe: np.ndarray) -> np.ndarray:
    if arr.data.validity is None and arr.type.id != dt.TypeId.NULL:
        return idx >= 0
    return arr.validity_bools()[safe] & (idx >= 0)


def _expand_runs(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate ranges [starts[i], starts[i]+lens[i]) — the child-index
    expansion of a list gather (prefix-sum form, no python loop)."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    out_base = np.repeat(ends - lens, lens)
    return np.repeat(starts, lens) + (np.arange(total, dtype=np.int64) - out_base)


def take_host_vec(arr: Array, idx: np.ndarray) -> Array:
    """Vectorized host take over any Arrow type (idx: int64, -1 = null)."""
    idx = np.asarray(idx, dtype=np.int64)
    t = arr.type
    d = arr.data
    n_out = len(idx)
    safe = np.where(idx < 0, 0, idx)
    tid = t.id

    if tid == dt.TypeId.NULL:
        return nulls(n_out, t)

    if len(arr) == 0:
        if (idx >= 0).any():
            raise ArrowIndexError("take index out of bounds (empty source)")
        return nulls(n_out, t)

    if tid == dt.TypeId.BOOL:
        vals = arr.to_numpy()[safe]
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(t, n_out,
                                    [vb, Buffer(bitutil.pack_bits(vals))],
                                    null_count=nc))

    if tid == dt.TypeId.DICTIONARY:
        # dictionary take = take on indices only (selection.go:570-580)
        idx_arr = arr.indices
        codes = np.asarray(idx_arr.to_numpy())[safe]
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(t, n_out,
                                    [vb, Buffer.wrap(np.ascontiguousarray(codes))],
                                    dictionary=d.dictionary, null_count=nc))

    if tid == dt.TypeId.EXTENSION:
        st = take_host_vec(arr.storage, idx)
        sd = st.data
        return make_array(ArrayData(t, n_out, sd.buffers, sd.children,
                                    sd.dictionary, sd._null_count, sd.offset))

    if t.is_decimal or tid == dt.TypeId.FIXED_SIZE_BINARY:
        bw = t.bit_width // 8 if t.is_decimal else t.byte_width
        raw = d.buffers[1].data[d.offset * bw:(d.offset + d.length) * bw]
        mat = np.asarray(raw).reshape(d.length, bw)
        out = np.ascontiguousarray(mat[safe])
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(t, n_out, [vb, Buffer(out.reshape(-1))],
                                    null_count=nc))

    if tid in (dt.TypeId.BINARY, dt.TypeId.STRING,
               dt.TypeId.LARGE_BINARY, dt.TypeId.LARGE_STRING):
        off = arr.offsets.astype(np.int64)
        starts = off[:-1][safe]
        lens = (off[1:] - off[:-1])[safe]
        lens = np.where(idx < 0, 0, lens)
        starts = np.where(idx < 0, 0, starts)
        byte_idx = _expand_runs(starts, lens)
        data = np.asarray(d.buffers[2].data)
        out_data = data[byte_idx] if len(byte_idx) else np.zeros(0, np.uint8)
        new_off = np.zeros(n_out + 1, dtype=t.offset_dtype)
        np.cumsum(lens, out=new_off[1:])
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(
            t, n_out, [vb, Buffer.wrap(np.ascontiguousarray(new_off)),
                       Buffer(np.ascontiguousarray(out_data))],
            null_count=nc))

    if tid in (dt.TypeId.BINARY_VIEW, dt.TypeId.STRING_VIEW):
        raw = np.asarray(d.buffers[1].data[d.offset * 16:
                                           (d.offset + d.length) * 16])
        views = raw.reshape(d.length, 16)
        out_views = views[safe].copy()
        out_views[idx < 0] = 0
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        # variadic data buffers are shared untouched (views point into them)
        return make_array(ArrayData(
            t, n_out,
            [vb, Buffer(np.ascontiguousarray(out_views.reshape(-1)))]
            + list(d.buffers[2:]),
            null_count=nc))

    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        off = arr.offsets.astype(np.int64)
        starts = np.where(idx < 0, 0, off[:-1][safe])
        lens = np.where(idx < 0, 0, (off[1:] - off[:-1])[safe])
        child_idx = _expand_runs(starts, lens)
        child = take_host_vec(arr.values, child_idx)
        new_off = np.zeros(n_out + 1, dtype=t.offset_dtype)
        np.cumsum(lens, out=new_off[1:])
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(
            t, n_out, [vb, Buffer.wrap(np.ascontiguousarray(new_off))],
            children=[child.data], null_count=nc))

    if tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        starts = np.where(idx < 0, 0, arr.offsets.astype(np.int64)[safe])
        lens = np.where(idx < 0, 0, arr.sizes.astype(np.int64)[safe])
        child_idx = _expand_runs(starts, lens)
        child = take_host_vec(arr.values, child_idx)
        new_off = np.zeros(n_out, dtype=t.offset_dtype)
        if n_out > 1:
            np.cumsum(lens[:-1], out=new_off[1:])
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(
            t, n_out,
            [vb, Buffer.wrap(np.ascontiguousarray(new_off)),
             Buffer.wrap(np.ascontiguousarray(lens.astype(t.offset_dtype)))],
            children=[child.data], null_count=nc))

    if tid == dt.TypeId.FIXED_SIZE_LIST:
        ls = t.list_size
        base = (d.offset + safe) * ls
        child_idx = (base[:, None] + np.arange(ls, dtype=np.int64)).reshape(-1)
        child_idx = np.where(np.repeat(idx < 0, ls), -1, child_idx)
        child = take_host_vec(make_array(d.children[0]), child_idx)
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(t, n_out, [vb], children=[child.data],
                                    null_count=nc))

    if tid == dt.TypeId.STRUCT:
        children = [take_host_vec(arr.field(i), idx)
                    for i in range(arr.num_fields)]
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(t, n_out, [vb],
                                    children=[c.data for c in children],
                                    null_count=nc))

    if tid == dt.TypeId.SPARSE_UNION:
        # children take the same row gather; -1 rows go null in EVERY child,
        # so the union row reads as null regardless of its type id
        children = [take_host_vec(
            make_array(c.slice(d.offset, d.length)), idx)
            for c in d.children]
        tids = np.ascontiguousarray(arr.type_ids[safe])
        return make_array(ArrayData(t, n_out, [Buffer.wrap(tids)],
                                    children=[c.data for c in children],
                                    null_count=0))

    if tid == dt.TypeId.DENSE_UNION:
        # gather type_ids + value_offsets; children are shared untouched.
        # -1 rows point at one appended null row in child 0 (reference
        # DenseUnionImpl emits a null via the first child).
        tids = arr.type_ids[safe].copy()
        voff = np.asarray(d.buffers[1].view(np.int32)[
            d.offset: d.offset + d.length])[safe].copy()
        children = list(d.children)
        has_null = bool((idx < 0).any())
        if has_null:
            from ..array.concat import concat_arrays
            c0 = make_array(children[0])
            c0 = concat_arrays([c0, nulls(1, c0.type)])
            tids[idx < 0] = t.type_codes[0]
            voff[idx < 0] = len(c0) - 1
            children[0] = c0.data
        return make_array(ArrayData(
            t, n_out, [Buffer.wrap(np.ascontiguousarray(tids)),
                       Buffer.wrap(np.ascontiguousarray(voff))],
            children=children, null_count=0))

    if tid == dt.TypeId.RUN_END_ENCODED:
        ends = np.asarray(arr.run_ends.to_numpy(), dtype=np.int64)
        phys = np.searchsorted(ends, d.offset + safe, side="right")
        phys = np.where(idx < 0, -1, phys)
        # compress consecutive equal physical runs back into runs
        if n_out == 0:
            keep = np.zeros(0, dtype=np.int64)
        else:
            change = np.empty(n_out, dtype=np.bool_)
            change[0] = True
            np.not_equal(phys[1:], phys[:-1], out=change[1:])
            keep = np.flatnonzero(change)
        run_vals = take_host_vec(arr.values, phys[keep])
        new_ends = np.empty(len(keep), dtype=t.run_ends_type.np_dtype)
        new_ends[:-1] = keep[1:]
        if len(keep):
            new_ends[-1] = n_out
        from ..array.arrays import from_numpy
        re_arr = from_numpy(new_ends, None, t.run_ends_type)
        return make_array(ArrayData(t, n_out, [],
                                    children=[re_arr.data, run_vals.data],
                                    null_count=0))

    # fixed-width numerics / temporals / intervals
    if hasattr(arr, "values"):
        vals = np.asarray(arr.values)
        out = np.ascontiguousarray(vals[safe])
        vb, nc = _validity_buf(_out_mask(arr, idx, safe))
        return make_array(ArrayData(t, n_out, [vb, Buffer.wrap(out)],
                                    null_count=nc))

    raise ArrowNotImplemented(f"host take for {t}")


def filter_indices_host(mask_vals: np.ndarray, mask_valid: np.ndarray,
                        null_selection: str) -> np.ndarray:
    """bool mask (+validity) -> int64 index vector (reference
    getTakeIndices, vector_selection.go:102). drop: null slots select
    nothing; emit_null: null slots emit -1."""
    if null_selection == "emit_null":
        sel = mask_vals | ~mask_valid
        src = np.arange(len(mask_vals), dtype=np.int64)
        return np.where(mask_valid, src, -1)[sel]
    return np.flatnonzero(mask_vals & mask_valid).astype(np.int64)
