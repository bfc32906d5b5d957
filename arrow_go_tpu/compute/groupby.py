"""Hash aggregate: GROUP BY over record batches (single chip).

Reference: the HashAggregate function kind (compute/functions.go:82) —
arrow-go declares the kind but group-by execution lives in its users;
BASELINE.json makes hash aggregate a north-star config. The device
implementation is the sort-based grouping core (ops/hashing.encode_codes)
plus SEGMENT aggregation in the key-sorted domain (ops/groupagg.py:
scans + compaction sorts — scatter-free, because an i64 scatter-add of
4M rows costs ~460 ms on v5e), all fused into ONE jitted XLA program per
(shape, agg-spec) signature with a single device_get per call.

Null keys form their own group (groups appear in first-occurrence order).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, from_numpy, take_host
from ..array.record import RecordBatch, Table
from ..device.block import batch_to_device, row_mask
from ..ops import bitmap, hashing
from .errors import ArrowNotImplemented

_AGGS = ("sum", "count", "count_all", "min", "max", "mean", "product",
         "any", "all", "first", "last")


def _combined_key_traced(key_vals, key_valids, key_types, length):
    """Multi-column key -> one combined int64 (null key = its own
    code, so every row is 'valid' for the final grouping)."""
    combined = None
    for vals, validity, t in zip(key_vals, key_valids, key_types):
        res = hashing.encode_codes(vals, t, validity, length, order="key")
        # null -> dedicated code n_unique
        codes = jnp.where(res.codes >= 0, res.codes, res.n_unique)
        card = res.n_unique + 1
        if combined is None:
            combined = codes.astype(jnp.int64)
        else:
            combined = combined * card.astype(jnp.int64) + codes.astype(jnp.int64)
    return combined


@functools.partial(jax.jit, static_argnames=("key_types", "agg_names"))
def _group_program(key_vals, key_valids, agg_vals, agg_valids, length,
                   *, key_types, agg_names):
    """The fused group-by executable: ONE program for key encode +
    first-occurrence ordering + every aggregation — built on SEGMENT
    aggregation in the key-sorted domain (ops/groupagg.py): an i64
    scatter-add at 4M rows costs ~460 ms on v5e while the scans and
    compaction sorts here total ~100 ms (roofline_probe6.py)."""
    from ..ops import groupagg
    from ..ops.sort import _orderable_bits
    combined = _combined_key_traced(key_vals, key_valids, key_types,
                                    length)
    P = combined.shape[0]
    row_ok = row_mask(P, length)

    # every sum-family agg's (casted) values and validity ride the
    # encode sort as PAYLOAD lanes: a random take(col, sidx) gather
    # costs ~300 ms at 33.5M rows on v5e while an extra sort lane is
    # ~15-20% of the sort (probe9)
    payloads = []
    plan = []      # per agg: (vmask, value_payload_idx, mask_payload_idx)
    for vals, valids, agg in zip(agg_vals, agg_valids, agg_names):
        if valids is None:
            vmask = row_ok
        else:
            vmask = bitmap.expand_words(valids, P) & row_ok
        vi = mi = None
        if agg in ("sum", "count", "mean"):
            acc_dt = (jnp.int64 if vals.dtype.kind in "bi"
                      else jnp.uint64 if vals.dtype.kind == "u"
                      else vals.dtype)
            vi = len(payloads)
            payloads.append(vals.astype(acc_dt))
            mi = len(payloads)
            payloads.append(vmask)
        elif agg == "any":
            mi = len(payloads)
            payloads.append(vmask & vals.astype(jnp.bool_))
        elif agg == "all":
            mi = len(payloads)
            payloads.append(vmask & ~vals.astype(jnp.bool_))
        elif agg in ("min", "max", "first", "last"):
            mi = len(payloads)       # only the valid-count needs it
            payloads.append(vmask)
        plan.append((vmask, vi, mi))

    enc, spay = hashing.encode_sorted_with(combined, dt.int64, None,
                                           length, tuple(payloads))
    n_groups = enc.n_unique

    # first/last occurrence per run (key order)
    (first_by_run,) = groupagg.compact_runs(enc.start, (enc.sidx,))
    gidx = jnp.arange(P, dtype=jnp.int32)
    in_run = gidx < n_groups
    first_x = jnp.where(in_run, first_by_run, P)
    # first-occurrence order remap: groups sorted by first-row index
    order = jnp.argsort(first_x.astype(jnp.uint32))
    rep_rows = jnp.take(first_x, order)

    def reorder(by_run):
        return jnp.take(by_run, jnp.clip(order, 0, P - 1))

    iota64 = jnp.arange(P, dtype=jnp.int64)

    # shared key lanes for the min/max family (original row order)
    kbits = _orderable_bits(combined, dt.int64).astype(jnp.uint64)
    key_flag = jnp.zeros(P, jnp.int32)
    key_hi = (kbits >> jnp.uint64(32)).astype(jnp.uint32)
    key_lo = kbits.astype(jnp.uint32)

    results = []
    for (vals, valids, agg), (vmask, vi, mi) in zip(
            zip(agg_vals, agg_valids, agg_names), plan):
        vs = None if vi is None else spay[vi]
        ms = None if mi is None else spay[mi]
        r, v = _segment_agg(groupagg, enc, key_flag, key_hi, key_lo,
                            vals, vmask, iota64, agg,
                            values_sorted=vs, mask_sorted=ms)
        results.append((reorder(r), None if v is None else reorder(v)))
    return n_groups, rep_rows, tuple(results)


def _segment_agg(groupagg, enc, key_flag, key_hi, key_lo, v, vmask,
                 iota64, agg: str, values_sorted=None, mask_sorted=None):
    """Per-run aggregation (key order). Returns (by_run[P], valid[P]|None).
    values_sorted/mask_sorted are payload lanes carried through the
    encode sort (no re-gather)."""
    from ..ops.sort import _orderable_bits as orderable
    P = v.shape[0]
    zeros64 = jnp.zeros(P, jnp.int64)

    if agg in ("sum", "count", "count_all", "mean", "any", "all"):
        if agg == "count_all":
            s, c = groupagg.segment_sum_count(
                enc, zeros64, None, values_sorted=zeros64)
            return c, None
        if agg == "any":
            s, c = groupagg.segment_sum_count(
                enc, zeros64, None, values_sorted=zeros64,
                valid_sorted=mask_sorted)
            return c > 0, None
        if agg == "all":
            s, c = groupagg.segment_sum_count(
                enc, zeros64, None, values_sorted=zeros64,
                valid_sorted=mask_sorted)
            return c == 0, None
        s, c = groupagg.segment_sum_count(
            enc, v, None, values_sorted=values_sorted,
            valid_sorted=mask_sorted)
        if agg == "count":
            return c, None
        if agg == "mean":
            return (s.astype(jnp.float64)
                    / jnp.maximum(c, 1).astype(jnp.float64), c > 0)
        return s, c > 0

    if agg in ("min", "max"):
        was_bool = v.dtype == jnp.bool_
        vv = v.astype(jnp.int32) if was_bool else v
        from .. import dtypes as dt_
        vt = dt_.bool_ if was_bool else None
        vkey = orderable(v if not was_bool else vv,
                         vt).astype(jnp.uint64)
        out = groupagg.segment_min_max(key_flag, key_hi, key_lo, vv, vkey,
                                       vmask, agg)
        _, c = groupagg.segment_sum_count(enc, zeros64, None,
                                          values_sorted=zeros64,
                                          valid_sorted=mask_sorted)
        if was_bool:
            out = out.astype(jnp.bool_)
        return out, c > 0

    if agg in ("first", "last"):
        ikey = iota64.astype(jnp.uint64)
        sel = groupagg.segment_min_max(
            key_flag, key_hi, key_lo, iota64.astype(jnp.int32),
            ikey, vmask, "min" if agg == "first" else "max")
        vals_out = jnp.take(v, jnp.clip(sel, 0, P - 1))
        _, c = groupagg.segment_sum_count(enc, zeros64, None,
                                          values_sorted=zeros64,
                                          valid_sorted=mask_sorted)
        return vals_out, c > 0

    if agg == "product":
        # rare agg: scatter path via per-row run ids scattered back
        _, codes = jax.lax.sort(
            (enc.sidx, jnp.where(enc.svalid, enc.run_id, -1)),
            num_keys=1, is_stable=True)
        slot = jnp.where(vmask & (codes >= 0), codes, P)
        acc_dt = jnp.int64 if v.dtype.kind in "bi" else v.dtype
        s = jnp.ones(P + 1, acc_dt).at[slot].multiply(
            jnp.where(vmask, v.astype(acc_dt), jnp.ones((), acc_dt)),
            mode="drop")
        cnt = jnp.zeros(P + 1, jnp.int32).at[slot].add(
            jnp.where(vmask, 1, 0), mode="drop")
        return s[:P], cnt[:P] > 0

    raise ArrowNotImplemented(agg)


_slice_jit = None


def _slice_prog():
    global _slice_jit
    if _slice_jit is None:
        _slice_jit = jax.jit(
            lambda a, k: jax.lax.dynamic_slice_in_dim(a, 0, k),
            static_argnums=(1,))
    return _slice_jit


_finalize_jit = None


def _finalize_prog():
    """ONE program for the whole group-by tail: slice rep_rows + every
    aggregate result to the group bucket AND gather the key-column
    representatives — the eager chain it replaces (a slice dispatch per
    result, an index build + take + fetch per key column) cost a full
    round trip each on the remote tunnel (~9 trips for 1 key x 2 aggs)."""
    global _finalize_jit
    if _finalize_jit is None:
        from ..ops import selection

        @functools.partial(jax.jit, static_argnames=("kb",))
        def raw(rep_rows, results, key_inputs, n_groups, *, kb):
            rep = jax.lax.dynamic_slice_in_dim(rep_rows, 0, kb)
            out_res = tuple(
                (jax.lax.dynamic_slice_in_dim(r, 0, kb),
                 None if v is None else jax.lax.dynamic_slice_in_dim(v, 0, kb))
                for r, v in results)
            idx = jnp.where(jnp.arange(kb, dtype=jnp.int32)
                            < jnp.asarray(n_groups, jnp.int32),
                            rep.astype(jnp.int32), -1)
            keys_out = tuple(
                (selection.gather(v, idx),
                 selection.take_validity(w, idx, n_groups, kb))
                for v, w in key_inputs)
            return rep, out_res, keys_out

        _finalize_jit = raw
    return _finalize_jit


def group_by(data, keys, aggregations: Sequence[Tuple[str, str]],
             ) -> RecordBatch:
    """GROUP BY `keys` with aggregations [(column, agg_name), ...].

    Output columns: key columns (first-occurrence values) followed by
    '<col>_<agg>' result columns.
    """
    from ..device.block import DeviceBatch
    if isinstance(data, Table):
        data = RecordBatch(data.schema,
                           [data.column(i).combine()
                            for i in range(data.num_columns)], data.num_rows)
    if isinstance(keys, str):
        keys = [keys]
    for col, agg in aggregations:
        if agg not in _AGGS:
            raise ArrowNotImplemented(f"aggregation {agg!r}")

    # DeviceBatch composes device-resident (values already in HBM)
    db = data if isinstance(data, DeviceBatch) else batch_to_device(data)
    key_cols = [db.column(k) for k in keys]
    agg_cols = [db.column(c) for c, _ in aggregations]
    for (col_name, agg), vcol in zip(aggregations, agg_cols):
        if vcol.type.id == dt.TypeId.DICTIONARY and agg not in (
                "count", "count_all"):
            raise ArrowNotImplemented(f"{agg} on string/dictionary column")

    n_groups_dev, rep_rows_dev, results_dev = _group_program(
        tuple(c.values for c in key_cols),
        tuple(c.validity for c in key_cols),
        tuple(c.values for c in agg_cols),
        tuple(c.validity for c in agg_cols),
        db.length,
        key_types=tuple(c.type if c.type.id != dt.TypeId.DICTIONARY
                        else dt.int32 for c in key_cols),
        agg_names=tuple(agg for _, agg in aggregations))

    # fetch the group COUNT first (a scalar), then ONE fused program
    # slices every result to the group-bucket size AND gathers the
    # key representatives on device, and ONE device_get ships it all:
    # the results are padded to the row count, and shipping ~P-sized
    # arrays over a remote-TPU link cost seconds per call (group
    # results are tiny); each extra dispatch/fetch is a round trip
    n_groups = int(jax.device_get(n_groups_dev))
    from ..device.block import _unpack_words, array_from_host
    from ..device.block import pad_length as _plen
    kb = min(_plen(max(n_groups, 1)), rep_rows_dev.shape[0])
    dev_keys = (key_cols if isinstance(data, DeviceBatch) else [])
    rep_rows_dev, results_dev, keys_dev = _finalize_prog()(
        rep_rows_dev, results_dev,
        tuple((c.values, c.validity) for c in dev_keys),
        n_groups, kb=kb)
    rep_rows, results, keys_fetched = jax.device_get(
        (rep_rows_dev, results_dev, keys_dev))
    rep_rows = np.asarray(rep_rows)[:n_groups]

    out_cols: List[Array] = []
    names: List[str] = []
    for j, name in enumerate(keys):
        if isinstance(data, DeviceBatch):
            c = dev_keys[j]
            kvals, kwords = keys_fetched[j]
            kmask = (None if kwords is None
                     else _unpack_words(np.asarray(kwords), n_groups))
            out_cols.append(array_from_host(
                np.asarray(kvals)[:n_groups], kmask, c.type,
                c.dictionary, n_groups))
        else:
            out_cols.append(take_host(data.column(name), rep_rows))
        names.append(name)
    for (col_name, agg), vcol, (res, validity) in zip(aggregations, agg_cols,
                                                      results):
        res_np = np.asarray(res)[:n_groups]
        mask_np = (np.asarray(validity)[:n_groups]
                   if validity is not None else None)
        out_cols.append(from_numpy(res_np, mask_np, _out_type(vcol.type, agg)))
        names.append(f"{col_name}_{agg}")

    return RecordBatch.from_arrays(out_cols, names)


def _out_type(t: dt.DataType, agg: str) -> dt.DataType:
    if agg in ("count", "count_all"):
        return dt.int64
    if agg == "mean":
        return dt.float64
    if agg in ("any", "all"):
        return dt.bool_
    if agg == "sum":
        if t.is_signed_integer or t.id == dt.TypeId.BOOL:
            return dt.int64
        if t.is_unsigned_integer:
            return dt.uint64
        return t
    return t
