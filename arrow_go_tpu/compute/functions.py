"""Default function registry contents: all kernel families.

Mirrors the reference's lazily-initialized default registry which registers
its 9 families (registry.go:47-59): scalar arithmetic, comparisons,
boolean, cast, validity, selection (filter/take), vector hash
(unique/value_counts/dictionary_encode), vector sort, and scalar
aggregates.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, from_numpy, make_array, with_validity
from ..array.record import ChunkedArray, RecordBatch, Table
from ..device.block import (DeviceBatch, DeviceColumn, batch_to_device,
                            from_device, pad_length, row_mask, to_device)
from ..ops import bitmap, hashing, reductions, selection, sort as sort_ops
from . import cast as cast_mod
from . import kernels
from . import nested_selection
from .errors import ArrowIndexError, ArrowInvalid, ArrowNotImplemented
from .registry import Arity, Function, FunctionKind, FunctionRegistry


# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------

@dataclass
class FilterOptions:
    null_selection: str = "drop"          # 'drop' | 'emit_null'


@dataclass
class TakeOptions:
    bounds_check: bool = True


@dataclass
class SortKey:
    target: Union[str, int]
    order: str = "ascending"


@dataclass
class SortOptions:
    keys: List[SortKey] = dc_field(default_factory=list)
    null_placement: str = "at_end"        # 'at_end' | 'at_start'


@dataclass
class SetLookupOptions:
    value_set: Any = None
    skip_nulls: bool = False


@dataclass
class VarianceOptions:
    ddof: int = 0


@dataclass
class CountOptions:
    mode: str = "only_valid"              # 'only_valid' | 'only_null' | 'all'


@dataclass
class MakeStructOptions:
    """reference compute.MakeStructOptions (expression.go:573-581
    Project builds on make_struct)."""
    field_names: List[str] = dc_field(default_factory=list)
    field_nullability: Optional[List[bool]] = None
    field_metadata: Optional[List[Optional[dict]]] = None


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _as_device(v, pad=None) -> DeviceColumn:
    if isinstance(v, DeviceColumn):
        return v
    if isinstance(v, ChunkedArray):
        v = v.combine()
    if isinstance(v, Array):
        return to_device(v, pad=pad)
    raise ArrowNotImplemented(f"expected array, got {type(v)}")


def _maybe_host(result, *inputs):
    host = any(isinstance(i, (Array, ChunkedArray, RecordBatch, Table))
               for i in inputs)
    if not host:
        return result
    if isinstance(result, DeviceColumn):
        return from_device(result)
    if isinstance(result, DeviceBatch):
        from ..device.block import batch_from_device
        return batch_from_device(result)
    return result


def _trim(col: DeviceColumn, count: int) -> DeviceColumn:
    """Shrink capacity after a filter when the waste is large."""
    newP = pad_length(max(count, 1))
    if newP < col.padded:
        vals = col.values[:newP]
        val_words = col.validity[: newP // 32] if col.validity is not None else None
        return DeviceColumn(vals, val_words, count, col.type, col.dictionary)
    return DeviceColumn(col.values, col.validity, count, col.type,
                        col.dictionary)


# ---------------------------------------------------------------------------
# selection: filter / take (reference selection.go MetaFunctions)
# ---------------------------------------------------------------------------

_filter_prog = None


def _filter_batch_prog():
    """ONE jitted program: filter indices + gather of every column."""
    global _filter_prog
    if _filter_prog is None:
        import functools

        @functools.partial(jax.jit, static_argnames=("null_selection",))
        def raw(mvals, mvalidity, col_vals, col_valids, length, *,
                null_selection):
            # EVERY column (and its validity, as a bool lane) rides the
            # blocked compaction as a payload — zero random gathers.
            # The per-column `selection.gather(v, idx)` version this
            # replaces measured 910 ms for 4 columns at 4M rows on v5e
            # (random gathers are the expensive primitive, probe4/7);
            # payload lanes through the compaction measure ~25 ms.
            P = mvals.shape[0]
            payloads = []
            plan = []
            for v, w in zip(col_vals, col_valids):
                vi = len(payloads)
                payloads.append(v)
                wi = None
                if w is not None:
                    wi = len(payloads)
                    payloads.append(bitmap.expand_words(w, P))
                plan.append((vi, wi))
            outs_all, out_null, cnt = selection.filter_with_payload(
                mvals, mvalidity, length, tuple(payloads), null_selection)
            in_range = jnp.arange(P, dtype=jnp.int32) < cnt
            emit = null_selection == "emit_null"
            outs, valids = [], []
            for vi, wi in plan:
                outs.append(outs_all[vi])
                if wi is None and not emit:
                    # drop mode introduces no nulls: tail invalidity is
                    # already row_mask(P, count) — no word buffer, so
                    # downstream ops (join output gathers) skip a
                    # validity gather per column
                    valids.append(None)
                    continue
                vb = outs_all[wi] if wi is not None \
                    else jnp.ones(P, jnp.bool_)
                valids.append(bitmap.pack_mask(vb & in_range & ~out_null))
            return cnt, tuple(outs), tuple(valids)

        _filter_prog = raw
    return _filter_prog


def _take_device(col: DeviceColumn, idx, count: int) -> DeviceColumn:
    P_out = idx.shape[0]
    vals = selection.gather(col.values, idx)
    words = selection.take_validity(col.validity, idx, count, P_out)
    return DeviceColumn(vals, words, count, col.type, col.dictionary)


def _device_selectable(t: dt.DataType) -> bool:
    """Types the HBM block format carries; everything else (nested types,
    decimal256, intervals, extensions) selects via the vectorized host
    kernels in nested_selection.py."""
    tid = t.id
    if tid in (dt.TypeId.NULL, dt.TypeId.BOOL, dt.TypeId.DECIMAL32,
               dt.TypeId.DECIMAL64, dt.TypeId.DECIMAL128,
               dt.TypeId.DECIMAL256, dt.TypeId.FIXED_SIZE_BINARY):
        return True
    if tid == dt.TypeId.DICTIONARY:
        return not t.value_type.is_nested
    if t.is_binary_like:
        return True
    return t.np_dtype is not None and t.np_dtype.kind in "iufb"


def _host_mask(mask):
    """Filter mask datum -> (values, validity) bool ndarrays on host."""
    if isinstance(mask, DeviceColumn):
        if mask.type.id != dt.TypeId.BOOL:
            raise ArrowNotImplemented("filter mask must be boolean")
        n = mask.length
        vals = np.asarray(jax.device_get(mask.values))[:n].astype(np.bool_)
        if mask.validity is not None:
            valid = np.asarray(
                jax.device_get(mask.validity_mask()))[:n]
        else:
            valid = np.ones(n, np.bool_)
        return vals, valid
    if isinstance(mask, ChunkedArray):
        mask = mask.combine()
    if not isinstance(mask, Array) or mask.type.id != dt.TypeId.BOOL:
        raise ArrowNotImplemented("filter mask must be boolean")
    return mask.to_numpy(), mask.validity_bools()


def _host_take_indices(indices, n_src: int, options: TakeOptions) -> np.ndarray:
    """Take-indices datum -> int64 ndarray with -1 for null slots."""
    if isinstance(indices, DeviceColumn):
        n = indices.length
        idx = np.asarray(jax.device_get(indices.values))[:n].astype(np.int64)
        if indices.validity is not None:
            valid = np.asarray(jax.device_get(indices.validity_mask()))[:n]
            idx = np.where(valid, idx, -1)
    else:
        if isinstance(indices, ChunkedArray):
            indices = indices.combine()
        if not isinstance(indices, Array) or not indices.type.is_integer:
            raise ArrowNotImplemented("take indices must be integer")
        idx = np.asarray(indices.to_numpy(), dtype=np.int64).copy()
        valid = indices.validity_bools()
        # bounds-check BEFORE null slots become -1: an explicit (valid)
        # -1 index is out of bounds, exactly as on the device path
        if options.bounds_check and len(idx) and (
                (valid & ((idx < 0) | (idx >= n_src))).any()):
            raise ArrowIndexError(
                f"take index out of bounds (source length {n_src})")
        idx[~valid] = -1
    if options.bounds_check and len(idx) and (
            (idx >= n_src).any() or (idx < -1).any()):
        raise ArrowIndexError(f"take index out of bounds (source length {n_src})")
    return idx


def _wrap_table(result, was_table: bool):
    if was_table and isinstance(result, RecordBatch):
        return Table.from_batches([result], result.schema)
    return result


def _combine_table(values: Table) -> RecordBatch:
    return RecordBatch(values.schema,
                       [values.column(i).combine()
                        for i in range(values.num_columns)],
                       values.num_rows)


def filter_(values, mask, options: Optional[FilterOptions] = None):
    options = options or FilterOptions()
    was_table = isinstance(values, Table)
    if was_table:
        values = _combine_table(values)
    from ..device.block import DeviceBatch
    if isinstance(values, DeviceBatch):
        # device-resident pipeline composition: DeviceBatch in ->
        # DeviceBatch out, values never leave HBM (the engine's
        # operator-to-operator contract; SURVEY §7 block format) —
        # selection + every column gather fuse into ONE jitted program
        # (eagerly this is ~5 dispatches per column: dispatch latency
        # dominates on the remote-TPU tunnel)
        db = values
        if not all(isinstance(c, DeviceColumn) for c in db.columns):
            raise ArrowNotImplemented(
                "device-batch filter requires device-resident columns "
                "(nested columns ride host RecordBatches)")
        mcol = _as_device(mask, pad=db.padded)
        if mcol.type.id != dt.TypeId.BOOL:
            raise ArrowNotImplemented("filter mask must be boolean")
        cnt, out_vals, out_valids = _filter_batch_prog()(
            mcol.values, mcol.validity,
            tuple(c.values for c in db.columns),
            tuple(c.validity for c in db.columns),
            db.length, null_selection=options.null_selection)
        count = int(cnt)
        cols = [_trim(DeviceColumn(v, w, count, c.type, c.dictionary),
                      count)
                for v, w, c in zip(out_vals, out_valids, db.columns)]
        return DeviceBatch(db.schema, cols, count)
    if isinstance(values, RecordBatch):
        if all(_device_selectable(f.type) for f in values.schema.fields):
            db = batch_to_device(values)
            mcol = _as_device(mask, pad=db.padded)
            if mcol.type.id != dt.TypeId.BOOL:
                raise ArrowNotImplemented("filter mask must be boolean")
            idx, cnt = selection.filter_indices(
                mcol.values, mcol.validity, mcol.length, options.null_selection)
            count = int(cnt)
            cols = [_trim(_take_device(c, idx, count), count) for c in db.columns]
            out = DeviceBatch(db.schema, cols, count)
            return _wrap_table(_maybe_host(out, values, mask), was_table)
        # batch contains host-resident (nested/...) columns: one host index
        # vector, vectorized take per column (reference fans Record filter
        # out per column the same way, selection.go:674-737)
        mv, mvalid = _host_mask(mask)
        hidx = nested_selection.filter_indices_host(
            mv, mvalid, options.null_selection)
        cols = [nested_selection.take_host_vec(c, hidx)
                for c in values.columns]
        out = RecordBatch(values.schema, cols, len(hidx))
        return _wrap_table(out, was_table)

    if isinstance(values, (Array, ChunkedArray)) and not _device_selectable(
            values.type):
        arr = values.combine() if isinstance(values, ChunkedArray) else values
        mv, mvalid = _host_mask(mask)
        hidx = nested_selection.filter_indices_host(
            mv, mvalid, options.null_selection)
        return nested_selection.take_host_vec(arr, hidx)

    col = _as_device(values)
    mcol = _as_device(mask, pad=col.padded)
    if mcol.type.id != dt.TypeId.BOOL:
        raise ArrowNotImplemented("filter mask must be boolean")
    if col.values.ndim == 1:
        # single column: values (+ validity) ride the compaction sort —
        # one fused kernel, no random re-gather (probe4 cost model)
        payloads = [col.values]
        has_validity = col.validity is not None
        if has_validity:
            payloads.append(col.validity_mask().astype(jnp.int32))
        outs, out_null, cnt = selection.filter_with_payload(
            mcol.values, mcol.validity, mcol.length, tuple(payloads),
            options.null_selection)
        count = int(cnt)
        emit_null = options.null_selection == "emit_null"
        if has_validity or emit_null:
            vmask = (outs[1] == 1) if has_validity else \
                jnp.ones(col.padded, jnp.bool_)
            vmask = vmask & ~out_null & row_mask(col.padded, count)
            words = bitmap.pack_mask(vmask)
        else:
            words = None
        out = _trim(DeviceColumn(outs[0], words, count, col.type,
                                 col.dictionary), count)
        return _maybe_host(out, values, mask)
    idx, cnt = selection.filter_indices(
        mcol.values, mcol.validity, mcol.length, options.null_selection)
    count = int(cnt)
    out = _trim(_take_device(col, idx, count), count)
    return _maybe_host(out, values, mask)


def take(values, indices, options: Optional[TakeOptions] = None):
    options = options or TakeOptions()
    was_table = isinstance(values, Table)
    if was_table:
        values = _combine_table(values)
    if isinstance(values, RecordBatch):
        if all(_device_selectable(f.type) for f in values.schema.fields):
            db = batch_to_device(values)
            icol = _as_device(indices)
            _check_take_bounds(icol, db.length, options)
            idx = _take_index_vector(icol)
            cols = [_take_device(c, idx, icol.length) for c in db.columns]
            out = DeviceBatch(db.schema, cols, icol.length)
            return _wrap_table(_maybe_host(out, values, indices), was_table)
        hidx = _host_take_indices(indices, values.num_rows, options)
        cols = [nested_selection.take_host_vec(c, hidx)
                for c in values.columns]
        out = RecordBatch(values.schema, cols, len(hidx))
        return _wrap_table(out, was_table)

    if isinstance(values, (Array, ChunkedArray)) and not _device_selectable(
            values.type):
        arr = values.combine() if isinstance(values, ChunkedArray) else values
        hidx = _host_take_indices(indices, len(arr), options)
        return nested_selection.take_host_vec(arr, hidx)

    if (isinstance(values, (Array, ChunkedArray))
            and isinstance(indices, (Array, ChunkedArray, list, np.ndarray))
            and len(values) <= _HOST_SMALL):
        # small host-resident take stays on the host: a device round
        # trip costs ~25 ms of tunnel latency per dispatch while the
        # vectorized host kernel is microseconds (group-by result
        # post-processing is the typical caller)
        arr = values.combine() if isinstance(values, ChunkedArray) else values
        hidx = _host_take_indices(indices, len(arr), options)
        return nested_selection.take_host_vec(arr, hidx)

    col = _as_device(values)
    icol = _as_device(indices)
    _check_take_bounds(icol, col.length, options)
    idx = _take_index_vector(icol)
    out = _take_device(col, idx, icol.length)
    return _maybe_host(out, values, indices)


def _take_index_vector(icol: DeviceColumn):
    idx = icol.values.astype(jnp.int32)
    if icol.validity is not None:
        isnull = ~bitmap.expand_words(icol.validity, icol.padded)
        idx = jnp.where(isnull, -1, idx)
    return idx


def _check_take_bounds(icol: DeviceColumn, n_src: int, options: TakeOptions):
    if not options.bounds_check:
        return
    bad = selection.take_indices_checked(icol.values.astype(jnp.int32),
                                         icol.validity, icol.length, n_src)
    if int(bad):
        raise ArrowIndexError(f"take index out of bounds (source length {n_src})")


# ---------------------------------------------------------------------------
# vector hash: unique / value_counts / dictionary_encode
# (reference vector_hash.go)
# ---------------------------------------------------------------------------

def _encode(col: DeviceColumn):
    return hashing.encode_codes(col.values, col.type, col.validity, col.length)


def _unique_host_values(col: DeviceColumn, res) -> Tuple[list, List[bool]]:
    """Unique values (host list) in first-occurrence order + validity list."""
    P = col.padded
    n_unique = int(res.n_unique)
    has_null = bool(res.has_null)
    first = np.asarray(jax.device_get(res.first_index))[:n_unique]
    null_row = int(res.null_first_row)
    vals = np.asarray(jax.device_get(col.values))
    order = np.argsort(first, kind="stable")
    entries = []  # (first_row, value_or_None)
    for code in order:
        entries.append((int(first[code]), vals[first[code]]))
    if has_null:
        entries.append((null_row, None))
    entries.sort(key=lambda e: e[0])
    out_vals = [e[1] for e in entries]
    return out_vals, [v is not None for v in out_vals]


def unique(values, options=None):
    col = _as_device(values)
    if col.type.id == dt.TypeId.DICTIONARY:
        return _unique_dictionary(col, values)
    res = _encode(col)
    out_vals, valid = _unique_host_values(col, res)
    arr = from_numpy(
        np.array([0 if v is None else v for v in out_vals],
                 dtype=col.type.np_dtype if col.type.np_dtype is not None
                 else np.bool_),
        np.array(valid, dtype=np.bool_), col.type)
    return _maybe_host(to_device(arr), values)


def _unique_dictionary(col: DeviceColumn, orig):
    res = _encode(col)
    n_unique = int(res.n_unique)
    first = np.asarray(jax.device_get(res.first_index))[:n_unique]
    codes = np.asarray(jax.device_get(col.values))
    has_null = bool(res.has_null)
    null_row = int(res.null_first_row)
    entries = [(int(first[c]), col.dictionary[int(codes[first[c]])])
               for c in np.argsort(first, kind="stable")]
    if has_null:
        entries.append((null_row, None))
    entries.sort(key=lambda e: e[0])
    from ..array.arrays import array as from_py
    host = from_py([e[1] for e in entries], col.type.value_type)
    if isinstance(orig, DeviceColumn):
        return to_device(host)
    return host


def dictionary_encode(values, options=None):
    col = _as_device(values)
    if col.type.id == dt.TypeId.DICTIONARY:
        return _maybe_host(col, values)
    res = _encode(col)
    # remap codes from rep-rank order to first-occurrence order
    n_unique = int(res.n_unique)
    first = res.first_index[: max(n_unique, 1)]
    order = jnp.argsort(first[:n_unique]) if n_unique else jnp.zeros(0, jnp.int32)
    # order[k] = old code of k-th first-occurrence value; invert it
    remap = jnp.zeros(max(n_unique, 1), jnp.int32).at[order].set(
        jnp.arange(n_unique, dtype=jnp.int32))
    new_codes = jnp.where(res.codes >= 0,
                          jnp.take(remap, jnp.clip(res.codes, 0, None),
                                   mode="clip"), 0)
    out_vals, valid = _unique_host_values(col, res)
    non_null = [v for v in out_vals if v is not None]
    from ..array.arrays import array as from_py
    dict_host = from_numpy(
        np.array(non_null, dtype=col.type.np_dtype) if col.type.np_dtype is not None
        else np.array(non_null, dtype=np.bool_), None, col.type)
    validity = col.validity
    out = DeviceColumn(new_codes.astype(jnp.int32), validity, col.length,
                       dt.dictionary(dt.int32, col.type), dictionary=dict_host)
    return _maybe_host(out, values)


def value_counts(values, options=None):
    col = _as_device(values)
    res = _encode(col)
    counts = hashing.value_counts_from_codes(res, col.padded, col.length)
    n_unique = int(res.n_unique)
    first = np.asarray(jax.device_get(res.first_index))[:n_unique]
    cnts = np.asarray(jax.device_get(counts))
    has_null = bool(res.has_null)
    null_row = int(res.null_first_row)
    null_count = int(cnts[col.padded]) if has_null else 0

    if col.type.id == dt.TypeId.DICTIONARY:
        codes_np = np.asarray(jax.device_get(col.values))
        val_of = lambda code: col.dictionary[int(codes_np[first[code]])]
        vtype = col.type.value_type
    else:
        vals_np = np.asarray(jax.device_get(col.values))
        val_of = lambda code: vals_np[first[code]].item()
        vtype = col.type
    entries = [(int(first[c]), val_of(c), int(cnts[c])) for c in range(n_unique)]
    if has_null:
        entries.append((null_row, None, null_count))
    entries.sort(key=lambda e: e[0])
    from ..array.arrays import array as from_py
    values_arr = from_py([e[1] for e in entries], vtype)
    counts_arr = from_py([e[2] for e in entries], dt.int64)
    st = dt.struct([dt.Field("values", vtype), dt.Field("counts", dt.int64)])
    from ..array.arrays import ArrayData
    data = ArrayData(st, len(entries), [None],
                     children=[values_arr.data, counts_arr.data], null_count=0)
    return make_array(data)


# ---------------------------------------------------------------------------
# vector sort (reference vector_sort.go SortIndices)
# ---------------------------------------------------------------------------

def _column_sort_key(col: DeviceColumn, descending: bool, nulls_first: bool):
    rank = None
    vals = col.values
    if col.type.id == dt.TypeId.DICTIONARY:
        # host-side dictionary ranks give string order on device
        dvals = col.dictionary.to_pylist()
        order = sorted(range(len(dvals)), key=lambda i: dvals[i])
        r = np.zeros(max(len(dvals), 1), dtype=np.int64)
        for rnk, i in enumerate(order):
            r[i] = rnk
        rank = jnp.asarray(r)
    elif col.type.id == dt.TypeId.BOOL:
        vals = col.values
    return sort_ops.sort_key(vals, col.type, col.validity, col.length,
                             descending=descending, nulls_first=nulls_first,
                             rank=rank)


def sort(values, options: Optional[SortOptions] = None, *,
         order: str = "ascending", null_placement: str = "at_end"):
    """Sorted copy of the datum: take(input, sort_indices(input)) — the
    reference's "sort" MetaFunction (compute/vector_sort.go:65-82)."""
    idx = sort_indices(values, options, order=order,
                       null_placement=null_placement)
    return take(values, idx)


def sort_indices(values, options: Optional[SortOptions] = None, *,
                 order: str = "ascending", null_placement: str = "at_end"):
    """Sort indices of an Array / ChunkedArray / RecordBatch / Table."""
    nulls_first = ((options.null_placement if options else null_placement)
                   == "at_start")
    if isinstance(values, (RecordBatch, Table)):
        if isinstance(values, Table):
            values = RecordBatch(values.schema,
                                 [values.column(i).combine()
                                  for i in range(values.num_columns)],
                                 values.num_rows)
        if not options or not options.keys:
            raise ArrowInvalid("record sort requires SortOptions.keys")
        db = batch_to_device(values)
        keys = []
        for k in options.keys:
            col = db.column(k.target)
            keys.append(_column_sort_key(col, k.order == "descending",
                                         nulls_first))
        perm = sort_ops.argsort_multi(keys)
        out = DeviceColumn(perm.astype(jnp.int64), None, values.num_rows,
                           dt.int64)
        return _maybe_host(out, values)

    desc = (options.keys[0].order == "descending") if (options and options.keys) \
        else (order == "descending")
    if (isinstance(values, (Array, ChunkedArray))
            and len(values) <= _HOST_SMALL):
        arr = (values.combine() if isinstance(values, ChunkedArray)
               else values)
        perm = _argsort_host_small(arr, desc, nulls_first)
        if perm is not None:
            return from_numpy(perm)
    col = _as_device(values)
    key = _column_sort_key(col, desc, nulls_first)
    perm = sort_ops.argsort_single(key)
    out = DeviceColumn(perm.astype(jnp.int64), None, col.length, dt.int64)
    return _maybe_host(out, values)


_HOST_SMALL = 4096     # below this a device round trip (~25 ms tunnel
                       # latency) dwarfs the host kernel


def _argsort_host_small(arr, desc: bool, nulls_first: bool):
    """Host argsort for small primitive arrays — bit-identical semantics
    to the device path (orderable-bits total order: NaN greatest,
    stable, null placement). Returns None for types the host fast path
    does not cover (caller falls through to the device path)."""
    vals = getattr(arr, "values", None)
    if not isinstance(vals, np.ndarray) or vals.ndim != 1 \
            or vals.dtype.kind not in "iufb":
        return None
    v = np.ascontiguousarray(vals)
    d = v.dtype
    if d.kind == "b":
        bits = v.astype(np.uint8)
    elif d.kind == "u":
        bits = v
    elif d.kind == "i":
        u = v.view(f"u{d.itemsize}")
        bits = u ^ np.dtype(f"u{d.itemsize}").type(1 << (d.itemsize * 8 - 1))
    else:
        canon = np.where(np.isnan(v), np.array(np.nan, d), v)
        b = canon.view(f"u{d.itemsize}")
        sign = np.dtype(f"u{d.itemsize}").type(1 << (d.itemsize * 8 - 1))
        neg = (b & sign) != 0
        bits = np.where(neg, ~b, b | sign)
    if desc:
        bits = ~bits
    valid = arr.validity_bools()
    if valid is None:
        valid = np.ones(len(v), np.bool_)
    ngroup = valid if nulls_first else ~valid
    # lexsort: last key is primary; stable by position
    return np.lexsort((bits, ngroup.astype(np.uint8))).astype(np.int64)


# ---------------------------------------------------------------------------
# set lookup (reference scalar_set_lookup.go IsIn)
# ---------------------------------------------------------------------------

def is_in(values, options: SetLookupOptions = None, value_set=None):
    if options is None:
        options = SetLookupOptions(value_set=value_set)
    col = _as_device(values)
    vset = options.value_set
    if isinstance(vset, (list, tuple)):
        from ..array.arrays import array as from_py
        vset = from_py(list(vset),
                       col.type if col.type.id != dt.TypeId.DICTIONARY
                       else col.type.value_type)
    if col.type.id == dt.TypeId.DICTIONARY:
        dvals = col.dictionary.to_pylist()
        sset = set(vset.to_pylist())
        member = np.array([v in sset for v in dvals], dtype=np.bool_)
        member_d = jnp.asarray(member) if len(member) else jnp.zeros(1, jnp.bool_)
        out_vals = jnp.take(member_d, jnp.clip(col.values, 0, max(len(dvals) - 1, 0)))
        set_has_null = any(v is None for v in vset.to_pylist())
    else:
        sd = to_device(vset)
        svals = sd.values[: len(vset)] if len(vset) else sd.values[:0]
        smask = (np.ones(len(vset), bool) if vset.null_count == 0
                 else vset.validity_bools())
        sv = np.asarray(jax.device_get(svals))[np.asarray(smask)]
        sv_sorted = jnp.asarray(np.sort(sv)) if sv.size else jnp.zeros(0, svals.dtype)
        if sv_sorted.size:
            pos = jnp.searchsorted(sv_sorted, col.values, method="sort")
            pos_c = jnp.clip(pos, 0, sv_sorted.shape[0] - 1)
            out_vals = jnp.take(sv_sorted, pos_c) == col.values
        else:
            out_vals = jnp.zeros(col.padded, jnp.bool_)
        set_has_null = vset.null_count > 0
    valid_rows = row_mask(col.padded, col.length)
    if col.validity is not None:
        isvalid = bitmap.expand_words(col.validity, col.padded)
        if set_has_null and not options.skip_nulls:
            out_vals = jnp.where(isvalid, out_vals, True)
        else:
            out_vals = jnp.where(isvalid, out_vals, False)
    out_vals = out_vals & valid_rows
    out = DeviceColumn(out_vals, None, col.length, dt.bool_)
    return _maybe_host(out, values)


def index_in(values, options: SetLookupOptions = None, value_set=None):
    if options is None:
        options = SetLookupOptions(value_set=value_set)
    col = _as_device(values)
    vset = options.value_set
    from ..array.arrays import array as from_py
    if isinstance(vset, (list, tuple)):
        vset = from_py(list(vset), col.type if col.type.id != dt.TypeId.DICTIONARY
                       else col.type.value_type)
    # host memo of set -> first index
    memo = {}
    for i, v in enumerate(vset.to_pylist()):
        if v not in memo:
            memo[v] = i
    host_vals = (from_device(col).to_pylist())
    out = [memo.get(v) for v in host_vals]
    res = from_py(out, dt.int32)
    if isinstance(values, DeviceColumn):
        return to_device(res)
    return res


# ---------------------------------------------------------------------------
# fill_null / if_else / coalesce
# ---------------------------------------------------------------------------

def fill_null(values, fill_value):
    col = _as_device(values)
    if col.validity is None:
        return _maybe_host(col, values)
    isvalid = bitmap.expand_words(col.validity, col.padded)
    if isinstance(fill_value, DeviceColumn):
        fv = fill_value.values
    else:
        fv = jnp.full(col.padded, fill_value, col.values.dtype)
    out = DeviceColumn(jnp.where(isvalid, col.values, fv), None, col.length,
                       col.type, col.dictionary)
    return _maybe_host(out, values)


def if_else(cond, left, right):
    c = _as_device(cond)
    pad = c.padded
    l = left if isinstance(left, DeviceColumn) else (
        _as_device(left, pad) if isinstance(left, (Array, ChunkedArray)) else left)
    r = right if isinstance(right, DeviceColumn) else (
        _as_device(right, pad) if isinstance(right, (Array, ChunkedArray)) else right)
    lt = l.type if isinstance(l, DeviceColumn) else r.type if isinstance(r, DeviceColumn) else None
    if lt is None:
        raise ArrowNotImplemented("if_else needs at least one array operand")
    lv = l.values if isinstance(l, DeviceColumn) else jnp.full(pad, l, lt.np_dtype)
    rv = r.values if isinstance(r, DeviceColumn) else jnp.full(pad, r, lt.np_dtype)
    out_vals = jnp.where(c.values, lv, rv)
    lval = l.validity if isinstance(l, DeviceColumn) else None
    rval = r.validity if isinstance(r, DeviceColumn) else None
    lmask = bitmap.expand_words(lval, pad) if lval is not None else jnp.ones(pad, jnp.bool_)
    rmask = bitmap.expand_words(rval, pad) if rval is not None else jnp.ones(pad, jnp.bool_)
    chosen = jnp.where(c.values, lmask, rmask)
    if c.validity is not None:
        chosen = chosen & bitmap.expand_words(c.validity, pad)
    # always pack (keeps this kernel traceable inside fused expressions)
    validity = bitmap.pack_mask(chosen)
    out = DeviceColumn(out_vals, validity, c.length, lt)
    return _maybe_host(out, cond, left, right)


def make_struct(*args, options=None):
    """Zip N columns into one struct column (reference expression.go:573-581:
    Expression.Project builds on make_struct; registered at
    exec_internals). Output rows are never null — nulls stay in the
    children. Accepts Arrays / DeviceColumns / python scalars."""
    if options is None:
        options = MakeStructOptions()
    elif isinstance(options, dict):
        options = MakeStructOptions(**options)
    elif isinstance(options, (list, tuple)):
        options = MakeStructOptions(field_names=list(options))
    names = list(options.field_names)
    if len(names) < len(args):
        names += [str(i) for i in range(len(names), len(args))]

    n = None
    for a in args:
        if isinstance(a, DeviceColumn):
            n = a.length if n is None else n
        elif isinstance(a, ChunkedArray):
            n = len(a) if n is None else n
        elif isinstance(a, Array):
            n = len(a) if n is None else n
    if n is None:
        raise ArrowInvalid("make_struct needs at least one array argument")

    from ..array.arrays import ArrayData, array as make_host_array
    children = []
    for a in args:
        if isinstance(a, DeviceColumn):
            a = from_device(a)
        elif isinstance(a, ChunkedArray):
            a = a.combine()
        elif not isinstance(a, Array):
            a = make_host_array([a] * n)
        if len(a) != n:
            raise ArrowInvalid(
                f"make_struct column length {len(a)} != {n}")
        children.append(a)

    nullable = options.field_nullability or [True] * len(children)
    st = dt.struct({nm: c.type for nm, c in zip(names, children)})
    # apply nullability onto the struct's fields
    for f, nb in zip(st.fields(), nullable):
        f.nullable = bool(nb)
    data = ArrayData(st, n, [None], children=[c.data for c in children],
                     null_count=0)
    from ..array.arrays import make_array
    return make_array(data)


# ---------------------------------------------------------------------------
# scalar aggregates (reference compute "sum"/"min_max"/"count"/"mean")
# ---------------------------------------------------------------------------

def _agg_result(col: DeviceColumn, val, as_py=True):
    return val


def agg_sum(values, options=None):
    col = _as_device(values)
    if int(reductions.count_valid(col.values, col.validity, col.length)) == 0:
        return None
    return reductions.reduce(col.values, col.validity, col.length, "sum",
                             mask=None if col.validity is None
                             else col.validity_mask()).item()


def agg_min(values, options=None):
    col = _as_device(values)
    if int(reductions.count_valid(col.values, col.validity, col.length)) == 0:
        return None
    return reductions.reduce(col.values, col.validity, col.length, "min",
                             mask=None if col.validity is None
                             else col.validity_mask()).item()


def agg_max(values, options=None):
    col = _as_device(values)
    if int(reductions.count_valid(col.values, col.validity, col.length)) == 0:
        return None
    return reductions.reduce(col.values, col.validity, col.length, "max",
                             mask=None if col.validity is None
                             else col.validity_mask()).item()


def agg_mean(values, options=None):
    col = _as_device(values)
    if int(reductions.count_valid(col.values, col.validity, col.length)) == 0:
        return None
    return reductions.mean(col.values, col.validity, col.length).item()


def agg_count(values, options: Optional[CountOptions] = None):
    options = options or CountOptions()
    col = _as_device(values)
    valid = int(reductions.count_valid(col.values, col.validity, col.length))
    if options.mode == "only_valid":
        return valid
    if options.mode == "only_null":
        return col.length - valid
    return col.length


def agg_count_distinct(values, options=None):
    col = _as_device(values)
    res = hashing.encode_codes(col.values, col.type, col.validity, col.length)
    return int(res.n_unique) + (1 if bool(res.has_null) else 0)


def agg_any(values, options=None):
    col = _as_device(values)
    m = col.validity_mask()
    return bool(jnp.any(col.values & m))


def agg_all(values, options=None):
    col = _as_device(values)
    m = col.validity_mask()
    return bool(jnp.all(col.values | ~m))


def agg_product(values, options=None):
    col = _as_device(values)
    if int(reductions.count_valid(col.values, col.validity, col.length)) == 0:
        return None
    m = col.validity_mask()
    one = jnp.ones((), col.values.dtype)
    return jnp.prod(jnp.where(m, col.values, one)).item()


def agg_variance(values, options: Optional[VarianceOptions] = None):
    options = options or VarianceOptions()
    col = _as_device(values)
    m = col.validity_mask()
    cnt = jnp.sum(m.astype(jnp.float64))
    x = jnp.where(m, col.values.astype(jnp.float64), 0.0)
    mean = jnp.sum(x) / cnt
    sq = jnp.where(m, (col.values.astype(jnp.float64) - mean) ** 2, 0.0)
    return (jnp.sum(sq) / (cnt - options.ddof)).item()


def agg_stddev(values, options: Optional[VarianceOptions] = None):
    return float(np.sqrt(agg_variance(values, options)))


def min_max(values, options=None):
    return {"min": agg_min(values), "max": agg_max(values)}


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

def register_all(reg: FunctionRegistry) -> None:
    # scalar arithmetic: checked + unchecked variants (reference arithmetic.go)
    for op in ("add", "subtract", "multiply", "divide", "power", "atan2",
               "logb", "bit_wise_and", "bit_wise_or", "bit_wise_xor",
               "shift_left", "shift_right", "max_element_wise",
               "min_element_wise", "mod"):
        reg.register(Function(op, FunctionKind.SCALAR, Arity.binary(),
                              _mk_binary(op, checked=True)))
        reg.register(Function(op + "_unchecked", FunctionKind.SCALAR,
                              Arity.binary(), _mk_binary(op, checked=False)))
    for op in ("negate", "abs", "sign", "sqrt", "exp", "expm1", "sin", "cos",
               "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh", "ln",
               "log10", "log2", "log1p", "floor", "ceil", "trunc",
               "bit_wise_not"):
        reg.register(Function(op, FunctionKind.SCALAR, Arity.unary(),
                              _mk_unary(op, checked=True)))
        reg.register(Function(op + "_unchecked", FunctionKind.SCALAR,
                              Arity.unary(), _mk_unary(op, checked=False)))
    reg.register(Function("round", FunctionKind.SCALAR, Arity.unary(),
                          lambda a, options=None: kernels.round_(
                              a, **(options or {}))))
    reg.register(Function("round_to_multiple", FunctionKind.SCALAR,
                          Arity.unary(),
                          lambda a, options=None: kernels.round_to_multiple(
                              a, **(options or {"multiple": 1.0}))))

    # temporal rounding (reference arithmetic.go:593-625 floor/ceil/
    # round_temporal with RoundTemporalOptions)
    from . import temporal as _temporal
    for name, fn in (("floor_temporal", _temporal.floor_temporal),
                     ("ceil_temporal", _temporal.ceil_temporal),
                     ("round_temporal", _temporal.round_temporal)):
        reg.register(Function(
            name, FunctionKind.SCALAR, Arity.unary(),
            (lambda f: lambda a, options=None: f(a, **(options or {})))(fn)))

    # comparisons
    for op in ("equal", "not_equal", "less", "less_equal", "greater",
               "greater_equal"):
        reg.register(Function(op, FunctionKind.SCALAR, Arity.binary(),
                              _mk_compare(op)))

    # boolean
    for op in ("and", "or", "xor", "and_not", "and_kleene", "or_kleene",
               "and_not_kleene"):
        reg.register(Function(op, FunctionKind.SCALAR, Arity.binary(),
                              _mk_bool(op)))
    reg.register(Function("invert", FunctionKind.SCALAR, Arity.unary(),
                          lambda a, options=None: kernels.invert(a)))
    reg.add_alias("not", "invert")  # reference scalar_bool.go "not"

    # validity predicates
    reg.register(Function("is_null", FunctionKind.SCALAR, Arity.unary(),
                          lambda a, options=None: kernels.is_null(a)))
    reg.register(Function("is_valid", FunctionKind.SCALAR, Arity.unary(),
                          lambda a, options=None: kernels.is_valid(a)))
    reg.add_alias("is_not_null", "is_valid")
    reg.add_alias("sub", "subtract")  # reference arithmetic.go:680 "sub"
    reg.add_alias("sub_unchecked", "subtract_unchecked")
    reg.register(Function("is_nan", FunctionKind.SCALAR, Arity.unary(),
                          lambda a, options=None: kernels.is_nan(a)))
    reg.register(Function("is_finite", FunctionKind.SCALAR, Arity.unary(),
                          lambda a, options=None: kernels.is_finite(a)))

    # cast (raw args: host path handles binary-like sides, device path the
    # fixed-width lattice)
    reg.register(Function("cast", FunctionKind.SCALAR, Arity.unary(),
                          _exec_cast, raw_args=True))
    # per-target cast functions (reference cast.go:80 RegisterScalarCast
    # registers one function per output type; parameterized targets take
    # the concrete type through options["to_type"])
    _cast_targets = {
        "cast_int8": dt.int8, "cast_int16": dt.int16,
        "cast_int32": dt.int32, "cast_int64": dt.int64,
        "cast_uint8": dt.uint8, "cast_uint16": dt.uint16,
        "cast_uint32": dt.uint32, "cast_uint64": dt.uint64,
        "cast_half_float": dt.float16, "cast_float": dt.float32,
        "cast_double": dt.float64, "cast_boolean": dt.bool_,
        "cast_string": dt.string, "cast_large_string": dt.large_string,
        "cast_binary": dt.binary, "cast_large_binary": dt.large_binary,
        "cast_string_view": dt.string_view, "cast_binary_view": dt.binary_view,
        "cast_date32": dt.date32, "cast_date64": dt.date64,
        "cast_month_day_nano_interval": dt.month_day_nano_interval,
        # parameterized targets: type must come through options
        "cast_time32": None, "cast_time64": None, "cast_timestamp": None,
        "cast_duration": None, "cast_decimal": None, "cast_decimal256": None,
        "cast_fixed_sized_binary": None, "cast_list": None,
        "cast_large_list": None, "cast_fixed_size_list": None,
        "cast_struct": None, "cast_extension": None, "cast_dictionary": None,
    }
    for _cname, _ct in _cast_targets.items():
        reg.register(Function(_cname, FunctionKind.SCALAR, Arity.unary(),
                              _mk_cast_to(_cname, _ct), raw_args=True))

    # selection meta functions
    reg.register(Function("filter", FunctionKind.META, Arity.binary(),
                          filter_, raw_args=True))
    reg.register(Function("array_filter", FunctionKind.VECTOR, Arity.binary(),
                          filter_, raw_args=True))
    reg.register(Function("take", FunctionKind.META, Arity.binary(),
                          take, raw_args=True))
    reg.register(Function("array_take", FunctionKind.VECTOR, Arity.binary(),
                          take, raw_args=True))

    # vector hash
    reg.register(Function("unique", FunctionKind.VECTOR, Arity.unary(),
                          unique, raw_args=True))
    reg.register(Function("value_counts", FunctionKind.VECTOR, Arity.unary(),
                          value_counts, raw_args=True))
    reg.register(Function("dictionary_encode", FunctionKind.VECTOR,
                          Arity.unary(), dictionary_encode, raw_args=True))

    # vector sort
    reg.register(Function("sort_indices", FunctionKind.VECTOR, Arity.unary(),
                          sort_indices, raw_args=True))
    reg.register(Function("sort", FunctionKind.META, Arity.unary(),
                          sort, raw_args=True))

    # run-end encode/decode (reference vector_run_ends.go:45-90)
    from . import run_ends as _ree
    reg.register(Function(
        "run_end_encode", FunctionKind.VECTOR, Arity.unary(),
        lambda a, options=None: _ree.run_end_encode(a, **(options or {})),
        raw_args=True))
    reg.register(Function(
        "run_end_decode", FunctionKind.VECTOR, Arity.unary(),
        lambda a, options=None: _ree.run_end_decode(a), raw_args=True))

    # set lookup
    reg.register(Function("is_in", FunctionKind.SCALAR, Arity.unary(),
                          is_in, raw_args=True))
    reg.register(Function("index_in", FunctionKind.SCALAR, Arity.unary(),
                          index_in, raw_args=True))

    # structural
    reg.register(Function("fill_null", FunctionKind.SCALAR, Arity.binary(),
                          fill_null, raw_args=True))
    reg.register(Function("if_else", FunctionKind.SCALAR, Arity.ternary(),
                          if_else, raw_args=True))
    reg.register(Function("make_struct", FunctionKind.SCALAR,
                          Arity.varargs(1), make_struct, raw_args=True))

    # scalar aggregates
    for name, fn in [("sum", agg_sum), ("min", agg_min), ("max", agg_max),
                     ("mean", agg_mean), ("count", agg_count),
                     ("count_distinct", agg_count_distinct),
                     ("any", agg_any), ("all", agg_all),
                     ("product", agg_product), ("variance", agg_variance),
                     ("stddev", agg_stddev), ("min_max", min_max)]:
        reg.register(Function(name, FunctionKind.SCALAR_AGGREGATE,
                              Arity.unary(), fn, raw_args=True))


def _mk_binary(op, checked):
    def exec_fn(a, b, options=None):
        return kernels.arithmetic_binary(op, a, b, checked=checked)
    return exec_fn


def _mk_unary(op, checked):
    def exec_fn(a, options=None):
        return kernels.arithmetic_unary(op, a, checked=checked)
    return exec_fn


def _mk_compare(op):
    def exec_fn(a, b, options=None):
        return kernels.compare(op, a, b)
    return exec_fn


def _mk_bool(op):
    def exec_fn(a, b, options=None):
        return kernels.boolean_binary(op, a, b)
    return exec_fn


def _mk_cast_to(name: str, default_t):
    def exec_fn(a, options=None):
        to_t, opts = default_t, None
        if isinstance(options, dt.DataType):
            to_t = options
        elif isinstance(options, dict):
            to_t = options.get("to_type") or default_t
            opts = options.get("options")
        if to_t is None:
            raise ArrowInvalid(f"{name} requires to_type in options")
        return _exec_cast(a, {"to_type": to_t, "options": opts})
    exec_fn.__name__ = name
    return exec_fn


def _exec_cast(a, options=None):
    if isinstance(options, dt.DataType):
        to_t, opts = options, None
    elif isinstance(options, dict):
        to_t = options.get("to_type")
        opts = options.get("options")
    else:
        raise ArrowInvalid("cast requires target type")
    from ..array.arrays import Array
    from ..array.record import ChunkedArray
    from ..device.block import DeviceColumn, from_device, to_device

    if isinstance(a, DeviceColumn):
        if to_t.is_binary_like or to_t.is_decimal:
            return cast_mod.cast_host(from_device(a), to_t, opts)
        return cast_mod.cast_device(a, to_t, opts)
    if isinstance(a, (Array, ChunkedArray)):
        from_t = a.type
        storage = from_t.value_type if from_t.id == dt.TypeId.DICTIONARY \
            else from_t
        list_kinds = (dt.TypeId.LIST, dt.TypeId.LARGE_LIST,
                      dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW,
                      dt.TypeId.FIXED_SIZE_LIST)
        if storage.is_binary_like or to_t.is_binary_like or \
                storage.is_decimal or to_t.is_decimal or \
                (storage.id in list_kinds and to_t.id in list_kinds):
            return cast_mod.cast_host(a, to_t, opts)
        if isinstance(a, ChunkedArray):
            a = a.combine()
        return from_device(cast_mod.cast_device(to_device(a), to_t, opts))
    raise ArrowInvalid(f"cannot cast {type(a)}")
