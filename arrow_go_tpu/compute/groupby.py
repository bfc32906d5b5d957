"""Hash aggregate: GROUP BY over record batches (single chip).

Reference: the HashAggregate function kind (compute/functions.go:82) —
arrow-go declares the kind but group-by execution lives in its users;
BASELINE.json makes hash aggregate a north-star config. Here the device
implementation is the sort-based grouping core (ops/hashing.encode_codes)
plus scatter-reductions per aggregation, one XLA program per agg.

Null keys form their own group (pandas/arrow `use_threads=False` order:
groups appear in first-occurrence order).
"""
from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, from_numpy, make_array, take_host
from ..array.record import RecordBatch, Table
from ..device.block import DeviceBatch, DeviceColumn, batch_to_device, row_mask
from ..ops import bitmap, hashing
from .errors import ArrowInvalid, ArrowNotImplemented

_AGGS = ("sum", "count", "count_all", "min", "max", "mean", "product",
         "any", "all", "first", "last")


def _combined_codes(db: DeviceBatch, key_names: Sequence[str]):
    """Dense group codes over (possibly multiple) key columns.
    Null key -> its own code. Returns (codes[P], n_groups, first_row[P])."""
    P = db.padded
    combined = None
    for name in key_names:
        col = db.column(name)
        res = hashing.encode_codes(col.values, col.type, col.validity,
                                   col.length)
        # null -> dedicated code n_unique
        codes = jnp.where(res.codes >= 0, res.codes, res.n_unique)
        card = res.n_unique + 1
        if combined is None:
            combined, total_card = codes.astype(jnp.int64), card.astype(jnp.int64)
        else:
            combined = combined * card.astype(jnp.int64) + codes.astype(jnp.int64)
            total_card = total_card * card.astype(jnp.int64)
    # re-encode the combined key to dense first-occurrence codes
    res = hashing.encode_codes(combined, dt.int64, None, db.length)
    return res.codes, res.n_unique, res.first_index


def group_by(data, keys, aggregations: Sequence[Tuple[str, str]],
             ) -> RecordBatch:
    """GROUP BY `keys` with aggregations [(column, agg_name), ...].

    Output columns: key columns (first-occurrence values) followed by
    '<col>_<agg>' result columns.
    """
    if isinstance(data, Table):
        data = RecordBatch(data.schema,
                           [data.column(i).combine()
                            for i in range(data.num_columns)], data.num_rows)
    if isinstance(keys, str):
        keys = [keys]
    for col, agg in aggregations:
        if agg not in _AGGS:
            raise ArrowNotImplemented(f"aggregation {agg!r}")

    db = batch_to_device(data)
    P = db.padded
    codes, n_groups_dev, first = _combined_codes(db, keys)
    n_groups = int(n_groups_dev)
    first_np = np.asarray(jax.device_get(first))[:n_groups]

    # key columns: values at the first occurrence of each group, in
    # first-occurrence order
    order = np.argsort(first_np, kind="stable")
    rep_rows = first_np[order]
    out_cols: List[Array] = []
    names: List[str] = []
    for name in keys:
        host_col = data.column(name)
        out_cols.append(take_host(host_col, rep_rows))
        names.append(name)

    # remap codes to first-occurrence order for result alignment
    remap = np.zeros(max(n_groups, 1), dtype=np.int64)
    remap[order] = np.arange(n_groups)
    remap_dev = jnp.asarray(remap)
    codes_ord = jnp.where(codes >= 0,
                          jnp.take(remap_dev, jnp.clip(codes, 0, None),
                                   mode="clip"), -1)

    for col_name, agg in aggregations:
        vcol = db.column(col_name)
        if vcol.type.id == dt.TypeId.DICTIONARY and agg not in (
                "count", "count_all"):
            raise ArrowNotImplemented(f"{agg} on string/dictionary column")
        result, validity = _grouped_agg(vcol, codes_ord, n_groups, agg)
        res_np = np.asarray(jax.device_get(result))[:n_groups]
        mask_np = (np.asarray(jax.device_get(validity))[:n_groups]
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


@functools.partial(jax.jit, static_argnames=("P",))
def _count_per_group(codes, valid, P):
    acc = jnp.zeros(P + 1, jnp.int64)
    slot = jnp.where(valid & (codes >= 0), codes, P)
    return acc.at[slot].add(1, mode="drop")[:P]


def _grouped_agg(col: DeviceColumn, codes, n_groups: int, agg: str):
    """Returns (per-group results [P], validity bool [P] or None)."""
    P = col.padded
    valid = col.validity_mask()
    slot = jnp.where(valid & (codes >= 0), codes, P)

    if agg == "count_all":
        acc = jnp.zeros(P + 1, jnp.int64).at[
            jnp.where(codes >= 0, codes, P)].add(1, mode="drop")
        return acc[:P], None
    if agg == "count":
        return _count_per_group(codes, valid, P), None

    v = col.values
    if agg == "mean":
        s = jnp.zeros(P + 1, jnp.float64).at[slot].add(
            jnp.where(valid, v.astype(jnp.float64), 0.0), mode="drop")
        c = _count_per_group(codes, valid, P)
        return s[:P] / jnp.maximum(c, 1), np.asarray(c) > 0
    if agg == "sum":
        acc_dt = (jnp.int64 if v.dtype.kind in "bi"
                  else jnp.uint64 if v.dtype.kind == "u" else v.dtype)
        s = jnp.zeros(P + 1, acc_dt).at[slot].add(
            jnp.where(valid, v.astype(acc_dt), jnp.zeros((), acc_dt)),
            mode="drop")
        c = _count_per_group(codes, valid, P)
        return s[:P], np.asarray(c) > 0
    if agg == "product":
        acc_dt = jnp.int64 if v.dtype.kind in "bi" else v.dtype
        s = jnp.ones(P + 1, acc_dt).at[slot].multiply(
            jnp.where(valid, v.astype(acc_dt), jnp.ones((), acc_dt)),
            mode="drop")
        c = _count_per_group(codes, valid, P)
        return s[:P], np.asarray(c) > 0
    if agg in ("min", "max"):
        if v.dtype.kind == "f":
            ident = jnp.array(jnp.inf if agg == "min" else -jnp.inf, v.dtype)
        elif v.dtype == jnp.bool_:
            v = v.astype(jnp.int32)
            ident = jnp.array(1 if agg == "min" else 0, jnp.int32)
        else:
            info = jnp.iinfo(v.dtype)
            ident = jnp.array(info.max if agg == "min" else info.min, v.dtype)
        init = jnp.full(P + 1, ident, v.dtype)
        red = init.at[slot].min if agg == "min" else init.at[slot].max
        s = red(jnp.where(valid, v, ident), mode="drop")
        c = _count_per_group(codes, valid, P)
        out = s[:P]
        if col.type.id == dt.TypeId.BOOL:
            out = out.astype(jnp.bool_)
        return out, np.asarray(c) > 0
    if agg in ("any", "all"):
        b = v.astype(jnp.bool_)
        if agg == "any":
            s = jnp.zeros(P + 1, jnp.bool_).at[slot].max(
                jnp.where(valid, b, False), mode="drop")
        else:
            s = jnp.ones(P + 1, jnp.bool_).at[slot].min(
                jnp.where(valid, b, True), mode="drop")
        return s[:P], None
    if agg in ("first", "last"):
        iota = jnp.arange(P, dtype=jnp.int64)
        pick = (jnp.full(P + 1, P, jnp.int64).at[slot].min(
            jnp.where(valid, iota, P), mode="drop") if agg == "first"
            else jnp.full(P + 1, -1, jnp.int64).at[slot].max(
                jnp.where(valid, iota, -1), mode="drop"))
        sel = pick[:P]
        ok = (sel < P) & (sel >= 0)
        vals = jnp.take(v, jnp.clip(sel, 0, P - 1))
        return vals, np.asarray(ok)
    raise ArrowNotImplemented(agg)
