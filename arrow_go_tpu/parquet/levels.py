"""Definition/repetition level generation and reconstruction.

Reference: parquet/pqarrow/path_builder.go (arrow -> def/rep multipath
traversal) and parquet/file/level_conversion.go:32,180-262
(DefLevelsToBitmap / DefRepLevelsToListInfo, the BMI2 PEXT path). Here the
level<->structure transforms are numpy-vectorized.

Supported nesting (round 1): primitives, arbitrarily nested structs,
lists of primitives, lists of structs of primitives, structs of lists.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array
from ..compute.errors import ArrowNotImplemented
from ..memory import bitutil
from ..memory.buffer import Buffer


# ---------------------------------------------------------------------------
# write side: arrow column -> (def_levels, rep_levels, leaf array)
# ---------------------------------------------------------------------------

def generate_levels(arr: Array, nullable: bool
                    ) -> Tuple[np.ndarray, np.ndarray, Array]:
    """Flat-column fast path: validity bitmap -> def levels directly
    (the inverse of DefLevelsToBitmap, level_conversion.go:180)."""
    n = len(arr)
    if nullable:
        mask = arr.validity_bools()
        def_levels = mask.astype(np.uint32)
    else:
        def_levels = np.zeros(n, np.uint32)
    rep_levels = np.zeros(n, np.uint32)
    return def_levels, rep_levels, arr


def prune_to_leaf(arr: Array, field: dt.Field, path: Tuple[int, ...]
                  ) -> Tuple[Array, dt.Field]:
    """Project a (possibly struct-bearing) column to the single leaf chain
    selected by `path` (child indexes at each struct level)."""
    t = field.type
    if not path:
        return arr, field
    if t.id == dt.TypeId.STRUCT:
        i = path[0]
        cf = t.fields()[i]
        child_arr = arr.field(i)
        inner_arr, inner_f = prune_to_leaf(child_arr, cf, path[1:])
        pruned_t = dt.StructType([inner_f])
        d = arr.data
        pd = ArrayData(pruned_t, d.length, [d.buffers[0] if d.buffers else None],
                       [inner_arr.data], null_count=d._null_count,
                       offset=0)
        # struct children already sliced by arr.field(i); validity window:
        if d.offset:
            mask = arr.validity_bools()
            vb = Buffer(bitutil.pack_bits(mask)) if not mask.all() else None
            pd = ArrayData(pruned_t, d.length, [vb], [inner_arr.data],
                           null_count=d.null_count)
        return make_array(pd), dt.Field(field.name, pruned_t, field.nullable)
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
        inner_arr, inner_f = prune_to_leaf(make_array(arr.data.children[0]),
                                           t.value_field, path)
        pruned_t = (dt.ListType if t.id == dt.TypeId.LIST else dt.LargeListType)(
            dt.Field(t.value_field.name, inner_f.type, inner_f.nullable))
        d = arr.data
        pd = ArrayData(pruned_t, d.length, d.buffers, [inner_arr.data],
                       null_count=d._null_count, offset=d.offset)
        return make_array(pd), dt.Field(field.name, pruned_t, field.nullable)
    return arr, field


def fsl_storage_field(f: dt.Field) -> dt.Field:
    """Fixed-size-list column viewed as plain list storage (parquet has no
    FSL group encoding; round-trips as list, matching pyarrow)."""
    t = f.type
    lt = dt.ListType(dt.Field(t.value_field.name, t.value_field.type,
                              t.value_field.nullable))
    return dt.Field(f.name, lt, f.nullable)


def fsl_storage_data(data):
    from ..array.arrays import ArrayData
    from ..memory.buffer import Buffer
    t = data.type
    k = t.list_size
    lt = dt.ListType(dt.Field(t.value_field.name, t.value_field.type,
                              t.value_field.nullable))
    offsets = (np.arange(data.length + 1, dtype=np.int64) * k
               + data.offset * k).astype(np.int32)
    bufs = [data.buffers[0] if data.buffers else None, Buffer.wrap(offsets)]
    return ArrayData(lt, data.length, bufs, data.children,
                     null_count=data._null_count, offset=0)


def map_storage_field(f: dt.Field) -> dt.Field:
    """Map column viewed as its list<struct<key,value>> storage."""
    t = f.type
    lt = dt.ListType(dt.Field("key_value", t.value_type, False))
    return dt.Field(f.name, lt, f.nullable)


def map_storage_data(data) -> "ArrayData":
    """Reuse the map's buffers/children as list<struct> storage."""
    from ..array.arrays import ArrayData
    t = data.type
    lt = dt.ListType(dt.Field("key_value", t.value_type, False))
    return ArrayData(lt, data.length, data.buffers, data.children,
                     null_count=data._null_count, offset=data.offset)


def leaf_paths(t: dt.DataType) -> List[Tuple[int, ...]]:
    """Struct-child index chains to every leaf (lists are transparent)."""
    if t.id == dt.TypeId.MAP:
        return leaf_paths(t.value_type)
    if t.id == dt.TypeId.STRUCT:
        out = []
        for i, f in enumerate(t.fields()):
            for sub in leaf_paths(f.type):
                out.append((i,) + sub)
        return out
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST,
                dt.TypeId.FIXED_SIZE_LIST):
        return leaf_paths(t.value_type)
    return [()]


def prune_field(field: dt.Field, path: Tuple[int, ...]) -> dt.Field:
    """Type-level analog of prune_to_leaf."""
    t = field.type
    if t.id == dt.TypeId.STRUCT:
        i = path[0]
        inner = prune_field(t.fields()[i], path[1:])
        return dt.Field(field.name, dt.StructType([inner]), field.nullable)
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
        inner = prune_field(t.value_field, path)
        lt = (dt.ListType if t.id == dt.TypeId.LIST else dt.LargeListType)(
            dt.Field(t.value_field.name, inner.type, inner.nullable))
        return dt.Field(field.name, lt, field.nullable)
    return field


def merge_leaf_datas(field: dt.Field, datas: List[ArrayData]) -> ArrayData:
    """Merge per-leaf single-child reconstructions into the full column."""
    t = field.type
    if len(datas) == 1 and t.id != dt.TypeId.STRUCT:
        d = datas[0]
        if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
            inner = merge_leaf_datas(t.value_field, [d.children[0]])
            return ArrayData(t, d.length, d.buffers, [inner],
                             null_count=d._null_count)
        return d
    if t.id == dt.TypeId.STRUCT:
        # group datas by top-level child
        children: List[ArrayData] = []
        di = 0
        for cf in t.fields():
            k = len(leaf_paths(cf.type))
            sub = [datas[di + j].children[0] for j in range(k)]
            di += k
            children.append(merge_leaf_datas(cf, sub))
        d0 = datas[0]
        return ArrayData(t, d0.length, [d0.buffers[0] if d0.buffers else None],
                         children, null_count=d0._null_count)
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
        d0 = datas[0]
        inner = merge_leaf_datas(t.value_field,
                                 [d.children[0] for d in datas])
        return ArrayData(t, d0.length, d0.buffers, [inner],
                         null_count=d0._null_count)
    raise ArrowNotImplemented(f"merge for {t}")


def generate_levels_nested(arr: Array, field: dt.Field
                           ) -> Tuple[np.ndarray, np.ndarray, Array]:
    """Full recursive level generation for one leaf path. `arr` must be a
    single-leaf column (struct columns are split per leaf by the writer)."""
    defs: List[int] = []
    reps: List[int] = []
    leaf_vals: List = []

    def walk(a: Array, f: dt.Field, cur_def: int, cur_rep: int, idx: int,
             entry_rep: int):
        t = f.type
        nullable = f.nullable
        if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
            if nullable and a.is_null(idx):
                defs.append(cur_def)
                reps.append(entry_rep)
                leaf_vals.append(None)
                return
            this_def = cur_def + (1 if nullable else 0)
            off = a.offsets
            start, end = int(off[idx]), int(off[idx + 1])
            if start == end:
                defs.append(this_def)
                reps.append(entry_rep)
                leaf_vals.append(None)
                return
            child_f = t.value_field
            values = a.values
            for k, j in enumerate(range(start, end)):
                walk(values, dt.Field("element", child_f.type,
                                      child_f.nullable),
                     this_def + 1, cur_rep + 1, j,
                     entry_rep if k == 0 else cur_rep + 1)
            return
        if t.id == dt.TypeId.STRUCT:
            if nullable and a.is_null(idx):
                defs.append(cur_def)
                reps.append(entry_rep)
                leaf_vals.append(None)
                return
            this_def = cur_def + (1 if nullable else 0)
            # single-leaf struct: exactly one child
            cf = t.fields()[0]
            walk(a.field(0), cf, this_def, cur_rep, idx, entry_rep)
            return
        # primitive
        if nullable and a.is_null(idx):
            defs.append(cur_def)
            reps.append(entry_rep)
            leaf_vals.append(None)
            return
        this_def = cur_def + (1 if nullable else 0)
        defs.append(this_def)
        reps.append(entry_rep)
        leaf_vals.append(a[idx])

    for i in range(len(arr)):
        walk(arr, field, 0, 0, i, 0)

    from ..array.arrays import array as from_py
    leaf_type = _leaf_type(field.type)
    present = [v for v in leaf_vals if v is not None]
    leaf_arr = from_py(present, leaf_type)
    return (np.array(defs, dtype=np.uint32), np.array(reps, dtype=np.uint32),
            leaf_arr)


def _leaf_type(t: dt.DataType) -> dt.DataType:
    if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
        return _leaf_type(t.value_type)
    if t.id == dt.TypeId.STRUCT:
        return _leaf_type(t.fields()[0].type)
    return t


# ---------------------------------------------------------------------------
# read side: levels + leaf values -> nested ArrayData
# ---------------------------------------------------------------------------

def rebuild_nested(field: dt.Field, def_levels: np.ndarray,
                   rep_levels: Optional[np.ndarray],
                   leaf_values: Array) -> ArrayData:
    """Reconstruct one top-level column (single leaf path) from its levels."""

    def build(f: dt.Field, cur_def: int, cur_rep: int,
              entries: np.ndarray) -> ArrayData:
        """entries: positions (into the level arrays) of this node's slots."""
        t = f.type
        nullable = f.nullable
        this_def = cur_def + (1 if nullable else 0)
        n = len(entries)
        d = def_levels[entries]
        if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
            valid = d >= this_def if nullable else np.ones(n, np.bool_)
            # expand: each slot's run covers entries until the next entry with
            # rep <= cur_rep. child items are entries in run with
            # def >= this_def + 1 (the repeated level)
            child_rep = cur_rep + 1
            all_idx = entries
            # run boundaries: entries array is sorted; runs extend to next entry
            ends = np.append(all_idx[1:], len(def_levels))
            offsets = np.zeros(n + 1, dtype=np.int64)
            child_positions = []
            for i in range(n):
                lo, hi = int(all_idx[i]), int(ends[i])
                seg = np.arange(lo, hi)
                items = seg[(rep_levels[seg] <= child_rep) &
                            (def_levels[seg] >= this_def + 1)]
                child_positions.append(items)
                offsets[i + 1] = offsets[i] + len(items)
            child_entries = (np.concatenate(child_positions)
                             if child_positions else np.zeros(0, np.int64))
            child = build(dt.Field("element", t.value_field.type,
                                   t.value_field.nullable),
                          this_def + 1, child_rep, child_entries)
            vb = None
            nc = int(n - valid.sum())
            if nc:
                vb = Buffer(bitutil.pack_bits(valid))
            off_buf = Buffer.wrap(offsets.astype(t.offset_dtype))
            return ArrayData(t, n, [vb, off_buf], [child], null_count=nc)
        if t.id == dt.TypeId.STRUCT:
            valid = d >= this_def if nullable else np.ones(n, np.bool_)
            child = build(t.fields()[0], this_def, cur_rep, entries)
            vb = None
            nc = int(n - valid.sum())
            if nc:
                vb = Buffer(bitutil.pack_bits(valid))
            return ArrayData(t, n, [vb], [child], null_count=nc)
        # primitive leaf: values stream has one slot per max-def entry
        max_def = this_def
        present_all = def_levels >= max_def
        value_rank = np.cumsum(present_all) - 1
        valid = d >= max_def
        take_idx = np.where(valid, value_rank[entries], -1)
        from ..array.arrays import take_host
        out = take_host(leaf_values, take_idx)
        return out.data

    if rep_levels is None:
        rep_levels = np.zeros(len(def_levels), dtype=np.uint32)
    top_entries = np.nonzero(rep_levels == 0)[0]
    return build(field, 0, 0, top_entries)
