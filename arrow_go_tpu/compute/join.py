"""Hash join over record batches (single chip).

North-star config #5 machinery (BASELINE.json): the local join kernel under
the distributed hash join. Device algorithm: encode both sides' keys into
ONE shared code space (sort-based encode over the concatenated key column),
sort the right side's codes, then probe with searchsorted — every step is
static-shape XLA (sort/gather/scan); output cardinality is fetched once at
the host boundary to size the result bucket (count-then-materialize).

Supported: inner, left outer, right outer, full outer, left semi,
left anti; multi-column keys; null keys never match (SQL semantics).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, take_host
from ..array.record import RecordBatch, Table
from ..device.block import DeviceBatch, batch_to_device, row_mask
from ..ops import bitmap, hashing
from .errors import ArrowInvalid, ArrowNotImplemented

_HOWS = ("inner", "left outer", "right outer", "full outer",
         "left semi", "left anti", "right semi", "right anti")


def _key_codes(left: DeviceBatch, right: DeviceBatch,
               left_keys: Sequence[str], right_keys: Sequence[str]):
    """Shared-space dense codes for both sides (-1 = null/padding)."""
    PL, PR = left.padded, right.padded
    combined = None
    for lname, rname in zip(left_keys, right_keys):
        lc, rc = left.column(lname), right.column(rname)
        if lc.type.id == dt.TypeId.DICTIONARY or rc.type.id == dt.TypeId.DICTIONARY:
            lv, rv = _shared_dict_codes(lc, rc)
        else:
            if lc.values.dtype != rc.values.dtype:
                raise ArrowInvalid(
                    f"join key dtype mismatch: {lc.type} vs {rc.type}")
            lv, rv = lc.values, rc.values
        both = jnp.concatenate([lv, rv])
        val_both = jnp.concatenate([_valid(lc), _valid(rc)])
        words = bitmap.pack_mask(val_both)
        res = hashing.encode_codes(both, lc.type if lc.type.id != dt.TypeId.DICTIONARY else dt.int32,
                                   words, both.shape[0])
        codes = res.codes
        card = res.n_unique.astype(jnp.int64) + 1
        part = jnp.where(codes >= 0, codes.astype(jnp.int64), -1)
        if combined is None:
            combined = part
        else:
            combined = jnp.where((combined >= 0) & (part >= 0),
                                 combined * card + part, -1)
    lcodes, rcodes = combined[:PL], combined[PL:]
    return lcodes, rcodes


def _valid(c):
    return c.validity_mask()


def _shared_dict_codes(lc, rc):
    """Map both dictionary columns into one shared code space (host memo)."""
    memo = {}

    def remap(col):
        if col.type.id != dt.TypeId.DICTIONARY:
            raise ArrowInvalid("join keys must both be strings/dictionary")
        vals = col.dictionary.to_pylist()
        m = np.empty(max(len(vals), 1), dtype=np.int32)
        for i, v in enumerate(vals):
            if v not in memo:
                memo[v] = len(memo)
            m[i] = memo[v]
        return jnp.take(jnp.asarray(m),
                        jnp.clip(col.values, 0, max(len(vals) - 1, 0)))

    return remap(lc), remap(rc)


def hash_join(left, right, keys=None, *, left_keys=None, right_keys=None,
              join_type: str = "inner",
              left_suffix: str = "", right_suffix: str = "_right"
              ) -> RecordBatch:
    """Join two record batches / tables."""
    if join_type not in _HOWS:
        raise ArrowNotImplemented(f"join type {join_type!r}")
    left = _as_batch(left)
    right = _as_batch(right)
    if keys is not None:
        if isinstance(keys, str):
            keys = [keys]
        left_keys = right_keys = list(keys)
    if isinstance(left_keys, str):
        left_keys = [left_keys]
    if isinstance(right_keys, str):
        right_keys = [right_keys]

    ldb, rdb = batch_to_device(left), batch_to_device(right)
    lcodes, rcodes = _key_codes(ldb, rdb, left_keys, right_keys)
    PL, PR = ldb.padded, rdb.padded

    lvalid = row_mask(PL, ldb.length) & (lcodes >= 0)
    rvalid = row_mask(PR, rdb.length) & (rcodes >= 0)

    # build side: sort right codes with original indices
    BIG = jnp.int64(1) << 62
    rsort_key = jnp.where(rvalid, rcodes, BIG)
    r_iota = jnp.arange(PR, dtype=jnp.int32)
    rk_sorted, ridx_sorted = jax.lax.sort((rsort_key, r_iota), num_keys=1,
                                          is_stable=True)

    # probe: match range per left row
    lq = jnp.where(lvalid, lcodes, BIG - 1)
    lo = jnp.searchsorted(rk_sorted, lq, side="left", method="sort")
    hi = jnp.searchsorted(rk_sorted, lq, side="right", method="sort")
    counts = jnp.where(lvalid, hi - lo, 0)

    if join_type == "left semi":
        mask = (counts > 0) & row_mask(PL, ldb.length)
        return _select_left(left, mask, ldb.length)
    if join_type == "left anti":
        mask = (counts == 0) & row_mask(PL, ldb.length)
        return _select_left(left, mask, ldb.length)
    if join_type in ("right semi", "right anti"):
        r_matched = _right_matched(rk_sorted, ridx_sorted, lq, lvalid, PR)
        mask = r_matched if join_type == "right semi" else ~r_matched
        mask = mask & row_mask(PR, rdb.length)
        return _select_left(right, mask, rdb.length)

    outer_left = join_type in ("left outer", "full outer")
    outer_right = join_type in ("right outer", "full outer")

    if outer_left:
        emit = jnp.maximum(counts, 1)
        emit = jnp.where(row_mask(PL, ldb.length), emit, 0)
    else:
        emit = jnp.where(row_mask(PL, ldb.length), counts, 0)

    offsets = jnp.cumsum(emit)
    total = int(offsets[-1]) if PL else 0

    n_extra = 0
    r_matched = None
    if outer_right:
        r_matched = _right_matched(rk_sorted, ridx_sorted, lq, lvalid, PR)
        r_unmatched = ~r_matched & row_mask(PR, rdb.length)
        n_extra = int(jnp.sum(r_unmatched.astype(jnp.int32)))

    # materialize pair indices on host-sized buffers
    out_n = total + n_extra
    if out_n == 0:
        li = np.zeros(0, np.int64)
        ri = np.zeros(0, np.int64)
    else:
        starts = np.asarray(jax.device_get(offsets - emit))
        emit_np = np.asarray(jax.device_get(emit))
        lo_np = np.asarray(jax.device_get(lo))
        cnt_np = np.asarray(jax.device_get(counts))
        ridx_np = np.asarray(jax.device_get(ridx_sorted))
        li = np.empty(out_n, np.int64)
        ri = np.empty(out_n, np.int64)
        # vectorized expansion: one segment per left row
        pos = 0
        row_of = np.repeat(np.arange(PL), emit_np)
        li[:total] = row_of
        within = np.arange(total) - np.repeat(starts, emit_np)
        src = lo_np[row_of] + within
        has_match = cnt_np[row_of] > 0
        ri[:total] = np.where(has_match,
                              ridx_np[np.clip(src, 0, len(ridx_np) - 1)], -1)
        if n_extra:
            extra_rows = np.asarray(jax.device_get(
                jnp.nonzero(~r_matched & row_mask(PR, rdb.length),
                            size=PR, fill_value=-1)[0]))[:n_extra]
            li[total:] = -1
            ri[total:] = extra_rows

    out_cols: List[Array] = []
    names: List[str] = []
    rkey_set = set(right_keys)
    for f, col in zip(left.schema.fields, left.columns):
        out_cols.append(take_host(col, li))
        names.append(f.name + left_suffix)
    for f, col in zip(right.schema.fields, right.columns):
        if f.name in rkey_set and join_type == "inner" and \
                f.name in set(left_keys):
            continue
        out_cols.append(take_host(col, ri))
        names.append(f.name + (right_suffix
                               if (f.name + left_suffix) in names else ""))
    return RecordBatch.from_arrays(out_cols, names)


def _right_matched(rk_sorted, ridx_sorted, lq, lvalid, PR):
    """Bool per original right row: appears in any probe match range."""
    # mark matched positions in sorted domain via diff-scatter
    sentinel = jnp.where(lvalid, lq, jnp.int64(1) << 62)
    lo = jnp.searchsorted(rk_sorted, sentinel, side="left", method="sort")
    hi = jnp.searchsorted(rk_sorted, sentinel, side="right", method="sort")
    delta = jnp.zeros(PR + 1, jnp.int32)
    delta = delta.at[jnp.where(lvalid, lo, PR + 0 * lo)].add(
        jnp.where(lvalid, 1, 0), mode="drop")
    delta = delta.at[jnp.where(lvalid, hi, PR + 0 * hi)].add(
        jnp.where(lvalid, -1, 0), mode="drop")
    cover = jnp.cumsum(delta[:PR]) > 0
    matched_sorted = cover
    out = jnp.zeros(PR, jnp.bool_).at[ridx_sorted].set(matched_sorted)
    return out


def _select_left(batch: RecordBatch, mask, n) -> RecordBatch:
    keep = np.asarray(jax.device_get(mask))[:n]
    idx = np.nonzero(keep)[0]
    cols = [take_host(c, idx) for c in batch.columns]
    return RecordBatch(batch.schema, cols, len(idx))


def _as_batch(x) -> RecordBatch:
    if isinstance(x, Table):
        return RecordBatch(x.schema,
                           [x.column(i).combine() for i in range(x.num_columns)],
                           x.num_rows)
    return x
