"""Segment aggregation over a sorted key domain — the scatter-free
group-by core.

Cost model (benchmarks/roofline_probe6.py, v5e, 4M rows): an i64
scatter-add costs ~460 ms while sorts are ~15-25 ms and cumulative scans
are ~5 ms. So per-group reductions run in the KEY-SORTED domain:

  sum/count/mean — chunked cumulative sum; per-run total = prefix at the
                   run's last position; one compaction sort moves the
                   run-boundary values to the front (result indexed by
                   run id, i.e. key order)
  min/max        — one extra sort keyed by (key, orderable(value)): the
                   run's first position holds the min (last holds the
                   max); same compaction
  first/last     — the stable (key, original index) sort already puts
                   the first/last occurrence at the run boundary

The int64 cumsum reformulates as a 2-D row-wise cumsum + row-prefix add
(a plain 4M i64 jnp.cumsum fails to compile on v5e — scoped-VMEM
reduce-window limit; see BENCH_NOTES.md).
"""
from __future__ import annotations

from typing import Optional

from ..jaxenv import jax, jnp
from .hashing import SortedEncode

INNER = 2048        # per-row scan length: v5e's 64-bit reduce-window
                    # blows scoped VMEM beyond a few thousand elements


def chunked_cumsum(v: jax.Array) -> jax.Array:
    """Exact cumulative sum that compiles for 64-bit dtypes on TPU at any
    size: bound the scanned window to INNER elements, recurse on the
    row totals. Lengths that are not a multiple of INNER pad with
    sum-neutral zeros first (so e.g. an arbitrary-length
    DELTA_BINARY_PACKED delta vector never falls back to the plain
    jnp.cumsum that fails to compile for >4M int64 on v5e)."""
    P = v.shape[0]
    if P < INNER * 2:
        return jnp.cumsum(v)
    if P % INNER:
        pad = INNER - (P % INNER)
        return chunked_cumsum(
            jnp.concatenate([v, jnp.zeros(pad, v.dtype)]))[:P]
    rows = P // INNER
    v2 = v.reshape(rows, INNER)
    row_cs = jnp.cumsum(v2, axis=1)
    row_tot = row_cs[:, -1]
    row_pref = chunked_cumsum(row_tot) - row_tot
    return (row_cs + row_pref[:, None]).reshape(-1)


def chunked_cummax(v: jax.Array) -> jax.Array:
    """Cumulative max that compiles for 64-bit dtypes on TPU at any size
    (same 2-D window-bounding as chunked_cumsum; max is associative so
    the row-prefix combine is elementwise max). Values must be
    >= 0 for unsigned dtypes (the pad/identity is 0/dtype-min)."""
    P = v.shape[0]
    if P < INNER * 2:
        return jax.lax.cummax(v)
    ident = (jnp.zeros((), v.dtype) if v.dtype.kind == "u"
             else jnp.array(jnp.iinfo(v.dtype).min, v.dtype)
             if v.dtype.kind == "i" else jnp.array(-jnp.inf, v.dtype))
    if P % INNER:
        pad = INNER - (P % INNER)
        return chunked_cummax(
            jnp.concatenate([v, jnp.full(pad, ident, v.dtype)]))[:P]
    rows = P // INNER
    v2 = v.reshape(rows, INNER)
    row_cm = jax.lax.cummax(v2, axis=1)
    row_tot = row_cm[:, -1]
    row_pref = chunked_cummax(row_tot)
    prev = jnp.concatenate([jnp.full(1, ident, v.dtype), row_pref[:-1]])
    return jnp.maximum(row_cm, prev[:, None]).reshape(-1)


def _is_last(start: jax.Array) -> jax.Array:
    return jnp.concatenate([start[1:], jnp.ones(1, start.dtype)])


def compact_runs(flag_keep: jax.Array, payloads) -> tuple:
    """Move rows where flag_keep to the front (stable): entries
    [0, n_keep) of each payload are the per-run results in key order.
    Blocked per-block sort + Pallas stitch on TPU (3.4x the full-height
    compaction sort at 4M — roofline_probe10), global sort elsewhere."""
    from .compaction import compact_flagged
    return compact_flagged(flag_keep != 0, payloads)


def segment_sum_count(enc: SortedEncode, values: jax.Array,
                      valid_rows: Optional[jax.Array],
                      values_sorted: Optional[jax.Array] = None,
                      valid_sorted: Optional[jax.Array] = None):
    """(sums_by_run[P], counts_by_run[P]): per-run sum and valid count,
    indexed by run id (slots >= n_unique are padding).

    Pass values_sorted/valid_sorted (payloads carried through the
    encode sort — hashing.encode_sorted_with) to skip the random
    `take(col, sidx)` gathers, which dominate at large row counts."""
    P = values.shape[0]
    vs = (values_sorted if values_sorted is not None
          else jnp.take(values, enc.sidx))
    ok = enc.svalid
    if valid_sorted is not None:
        ok = ok & valid_sorted
    elif valid_rows is not None:
        ok = ok & jnp.take(valid_rows, enc.sidx)
    x = jnp.where(ok, vs, jnp.zeros((), vs.dtype))
    cs = chunked_cumsum(x)
    # the count scan stays 32-bit: row counts fit i32, the i32 cumsum
    # compiles plain at any size, and it is one stitch lane instead of
    # two through the boundary compaction
    cnt = jnp.cumsum(ok.astype(jnp.int32), dtype=jnp.int32)
    last = _is_last(enc.start)
    # per-run total = prefix at last - prefix at (start - 1); compute via
    # prefix differences on the compacted boundary values
    sums_at_last, cnts_at_last = compact_runs(last, (cs, cnt))
    prev_sum = jnp.concatenate([jnp.zeros(1, cs.dtype), sums_at_last[:-1]])
    prev_cnt = jnp.concatenate([jnp.zeros(1, cnt.dtype), cnts_at_last[:-1]])
    return (sums_at_last - prev_sum,
            (cnts_at_last - prev_cnt).astype(jnp.int64))


def segment_min_max(key_flag: jax.Array, key_hi: jax.Array,
                    key_lo: jax.Array, values: jax.Array,
                    value_key: jax.Array,
                    valid_rows: Optional[jax.Array], op: str):
    """Per-run min ('min') or max ('max') via ONE (key, orderable(value))
    sort: the run's first position holds the extremum.

    key_flag/key_hi/key_lo: the encode sort's key operands in ORIGINAL
    row order (flag 1 = invalid KEY row). valid_rows masks value nulls —
    those rows keep their key run (so run ids stay aligned with the
    main encode) but their value lane saturates, sorting them last
    within the run; a group with zero valid values returns garbage
    masked by the caller's count > 0 validity.
    Returns values_by_run[P] (key order; slots >= n_unique padding)."""
    P = values.shape[0]
    vhi = (value_key >> jnp.uint64(32)).astype(jnp.uint32)
    vlo = value_key.astype(jnp.uint32)
    if op == "max":
        vhi, vlo = ~vhi, ~vlo
    if valid_rows is not None:
        sat = jnp.uint32(0xFFFFFFFF)
        vhi = jnp.where(valid_rows, vhi, sat)
        vlo = jnp.where(valid_rows, vlo, sat)
    sflag, shi, slo, _, _, sval = jax.lax.sort(
        (key_flag, key_hi, key_lo, vhi, vlo, values), num_keys=5,
        is_stable=True)
    pos = jnp.arange(P, dtype=jnp.int32)
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = ((shi != prev_hi) | (slo != prev_lo) | (pos == 0)) & (sflag == 0)
    (out,) = compact_runs(start, (sval,))
    return out
