"""Vector hash family: unique / dictionary_encode / value_counts cores.

TPU-native counterpart of the reference's memo-table engine
(internal/hashing/xxh3_memo_table.go — GetOrInsert returning dense memo
indices in first-occurrence order; vector_hash.go kernels built on it).

The sequential memo table does not vectorize; the TPU design reaches the
identical *semantics* (dense codes, first-occurrence order, null tracked
separately) through sort + segment reductions, all static-shape XLA:

  1. radix-key sort of (key, original index)
  2. run starts mark distinct values; group id = prefix sum of run starts
  3. representative index per group = segment-min of original index
  4. first-occurrence rank = rank of representative among representatives
     (reps sorted by original position), giving reference-identical codes

Also: murmur-style avalanche hash for partitioning (parallel/shuffle).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..device.block import DeviceColumn, row_mask
from ..ops import bitmap
from ..ops.sort import _orderable_bits


class EncodeResult(NamedTuple):
    codes: jax.Array        # int32 memo index per row (-1 for null/oob)
    n_unique: jax.Array     # device scalar: distinct non-null values
    has_null: jax.Array     # device scalar bool
    first_index: jax.Array  # [P] original row of first occurrence per code
    null_first_row: jax.Array  # device scalar: first null row (P if none)


class SortedEncode(NamedTuple):
    """Sorted-domain view of a key column (the encode sort's outputs):
    the substrate for segment aggregation (ops/groupagg.py), where
    per-group reductions ride cumulative scans + compaction sorts
    instead of i64 scatters (an i64 scatter-add of 4M rows costs ~460 ms
    on v5e — benchmarks/roofline_probe6.py)."""
    sidx: jax.Array        # [P] original row at sorted position
    start: jax.Array       # [P] bool: run (distinct valid key) starts here
    svalid: jax.Array      # [P] bool: sorted position holds a valid row
    run_id: jax.Array      # [P] int32: run index at sorted position
    n_unique: jax.Array    # device scalar


def encode_sorted(values: jax.Array, t: dt.DataType,
                  validity: Optional[jax.Array], n) -> SortedEncode:
    """One radix-key sort -> sorted-domain run structure."""
    enc, _ = encode_sorted_with(values, t, validity, n, ())
    return enc


def encode_sorted_with(values: jax.Array, t: dt.DataType,
                       validity: Optional[jax.Array], n,
                       payloads=()):
    """encode_sorted carrying PAYLOAD columns through the key sort as
    extra operands — per-group aggregation then reads them in sorted
    order directly instead of re-gathering with `take(col, sidx)`
    (a random 33.5M gather costs ~300 ms on v5e while an extra sort
    lane is ~15-20% of the sort). Returns (SortedEncode, sorted
    payload tuple)."""
    P = values.shape[0]
    all_valid = (validity is None and isinstance(n, int) and n >= P)
    valid = row_mask(P, n)
    if validity is not None:
        valid = valid & bitmap.expand_words(validity, P)
    key = _orderable_bits(values, t).astype(jnp.uint64)
    khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
    klo = key.astype(jnp.uint32)
    iota = jnp.arange(P, dtype=jnp.int32)
    if all_valid:
        # statically null-free and unpadded: the invalid-cluster flag
        # lane is identically zero — drop it (~20% of the sort)
        out = jax.lax.sort((khi, klo, iota) + tuple(payloads),
                           num_keys=2, is_stable=True)
        shi, slo, sidx = out[:3]
        spayloads = tuple(out[3:])
    else:
        # the flag key clusters invalid rows at the tail, so
        # per-position validity is just (position < n_valid) — one sort
        # lane saved
        flag = (~valid).astype(jnp.int32)
        out = jax.lax.sort((flag, khi, klo, iota) + tuple(payloads),
                           num_keys=3, is_stable=True)
        _, shi, slo, sidx = out[:4]
        spayloads = tuple(out[4:])
    n_valid = jnp.sum(valid.astype(jnp.int32))
    svalid = iota < n_valid
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = (shi != prev_hi) | (slo != prev_lo) | (iota == 0)
    start = start & svalid
    run_id = jnp.cumsum(start.astype(jnp.int32)) - 1
    n_unique = jnp.sum(start.astype(jnp.int32))
    return SortedEncode(sidx, start, svalid, run_id, n_unique), spayloads


def encode_codes(values: jax.Array, t: dt.DataType,
                 validity: Optional[jax.Array], n,
                 order: str = "first_occurrence") -> EncodeResult:
    """Dense codes for each row (the MemoTable analog).

    order='first_occurrence': codes numbered by first appearance —
    reference memo-table parity (dictionary_encode/unique observables).
    order='key': codes numbered in key-sorted order — equality-only
    consumers (group-by internals, join code spaces, shuffles) take this
    path: it skips the rep-ranking sort + searchsorted + extra scatter,
    ~2x cheaper on TPU (benchmarks/roofline_probe4.py: searchsorted and
    scatter dominate; sort/cumsum are cheap)."""
    P = values.shape[0]
    all_valid = (validity is None and isinstance(n, int) and n >= P)
    valid = row_mask(P, n)
    if validity is not None:
        valid = valid & bitmap.expand_words(validity, P)

    key = _orderable_bits(values, t).astype(jnp.uint64)
    # invalid rows cluster at the end via a separate flag key; 64-bit keys
    # sort as two u32 lanes (TPU-native compares, no u64 emulation)
    khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
    klo = key.astype(jnp.uint32)

    iota = jnp.arange(P, dtype=jnp.int32)
    if all_valid:
        # statically null-free and unpadded: drop the all-zero flag lane
        shi, slo, sidx = jax.lax.sort(
            (khi, klo, iota), num_keys=2, is_stable=True)
    else:
        # flag clusters invalid rows at the tail: svalid = pos < n_valid
        # (one sort lane saved)
        flag = (~valid).astype(jnp.int32)
        _, shi, slo, sidx = jax.lax.sort(
            (flag, khi, klo, iota), num_keys=3, is_stable=True)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    svalid = iota < n_valid
    # run starts among valid rows
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = (shi != prev_hi) | (slo != prev_lo) | (iota == 0)
    start = start & svalid
    n_unique = jnp.sum(start.astype(jnp.int32))

    isnull = ~valid & row_mask(P, n)
    has_null = jnp.any(isnull)
    null_first_row = jnp.min(jnp.where(isnull, iota, P))

    if order == "key":
        # run id in key order IS the code. Scatters cost ~25 ms per 4M
        # updates on v5e while a 2-operand sort is ~7 ms (probe9), so
        # BOTH inversions ride sorts:
        #   codes: sidx is a permutation — sorting (sidx, value) by
        #   sidx IS the inverse permutation
        #   first_index: the run-start rows compacted to the front are
        #   already in run order (compact_runs)
        run_id = jnp.cumsum(start.astype(jnp.int32)) - 1
        _, codes = jax.lax.sort(
            (sidx, jnp.where(svalid, run_id, -1)), num_keys=1,
            is_stable=True)
        from .groupagg import compact_runs
        (first_index,) = compact_runs(start, (sidx,))
        first_index = jnp.where(iota < n_unique, first_index, P)
        return EncodeResult(codes, n_unique, has_null, first_index,
                            null_first_row)

    # first-occurrence ranks without searchsorted, argsort OR gathers
    # (probe4/7: binary search and random gathers are the expensive
    # primitives — a 4M gather costs ~36 ms while sorts are ~15 ms and
    # chunked scans ~10 ms):
    #   1. forward-fill each run's FIRST original index (the stable
    #      (key, iota) sort puts the minimum at the run start) through
    #      the run via a two-lane (position, value) pack + chunked u64
    #      cummax — the position lane is monotone so the fill is exact
    #   2. ONE more sort keyed by that first index: runs land in
    #      first-occurrence order, so the run counter IS the code
    from .groupagg import chunked_cummax
    pack = jnp.where(start,
                     (iota.astype(jnp.uint64) << jnp.uint64(32))
                     | sidx.astype(jnp.uint32).astype(jnp.uint64),
                     jnp.uint64(0))
    f_fill = (chunked_cummax(pack)
              & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    if all_valid:
        f2, sidx2 = jax.lax.sort((f_fill, sidx), num_keys=1,
                                 is_stable=True)
        valid2 = jnp.ones(P, jnp.bool_)
    else:
        flag2_in = (~svalid).astype(jnp.int32)
        flag2, f2, sidx2 = jax.lax.sort((flag2_in, f_fill, sidx),
                                        num_keys=2, is_stable=True)
        valid2 = flag2 == 0
    prev_f = jnp.concatenate([~f2[:1], f2[:-1]])     # differs at pos 0
    start2 = (f2 != prev_f) & valid2
    code2 = jnp.cumsum(start2.astype(jnp.int32)) - 1
    # both inversions ride sorts (scatter ~25 ms vs sort ~7 ms, probe9):
    # sidx2 is a permutation; run starts compacted to the front are in
    # first-occurrence (code) order
    _, codes = jax.lax.sort(
        (sidx2, jnp.where(valid2, code2, -1)), num_keys=1,
        is_stable=True)
    from .groupagg import compact_runs
    (first_index,) = compact_runs(start2, (f2.astype(jnp.int32),))
    first_index = jnp.where(iota < n_unique, first_index, P)

    return EncodeResult(codes, n_unique, has_null, first_index, null_first_row)


def value_counts_from_codes(res: EncodeResult, P: int, n) -> jax.Array:
    """counts[code] for code in [0, n_unique); slot P holds the null count.
    Rows beyond n scatter out of bounds and are dropped."""
    counts = jnp.zeros(P + 1, jnp.int32)
    slot = jnp.where(res.codes >= 0, res.codes, P)
    slot = jnp.where(row_mask(P, n), slot, P + 1)
    counts = counts.at[slot].add(1, mode="drop")
    return counts


# ---------------------------------------------------------------------------
# scalar hashing for partitioning (reference hash_funcs.go prime-multiply)
# ---------------------------------------------------------------------------

# numpy (not jnp) scalars: module-level jnp constants initialize the
# XLA backend at import time, which breaks jax.distributed.initialize
# in multi-process workers (it must run before any backend exists)
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)


def hash32(values: jax.Array) -> jax.Array:
    """Avalanching 32-bit hash of any fixed-width column (murmur3 finalizer
    style — role of the reference's prime-multiply hash, hash_funcs.go:27)."""
    d = jnp.dtype(values.dtype)
    if d == jnp.bool_:
        x = values.astype(jnp.uint32)
    elif d.itemsize <= 4:
        if d.kind == "f":
            # canonicalize NaN / -0.0 so equal values hash equal
            v = jnp.where(jnp.isnan(values), jnp.array(jnp.nan, d), values)
            v = jnp.where(v == 0, jnp.zeros((), d), v).astype(jnp.float32)
            x = jax.lax.bitcast_convert_type(v, jnp.uint32)
        else:
            x = values.astype(jnp.uint32)
    else:
        if d.kind == "f":
            v = jnp.where(jnp.isnan(values), jnp.array(jnp.nan, d), values)
            v = jnp.where(v == 0, jnp.zeros((), d), v)
            # f64 bitcasts do not lower on v5e — arithmetic IEEE bits
            from .sort import f64_bits
            b = f64_bits(v)
        else:
            b = jax.lax.bitcast_convert_type(values.astype(
                jnp.int64 if d.kind == "i" else jnp.uint64), jnp.uint64)
        x = (b ^ (b >> 32)).astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 13)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


def hash_combine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Boost-style hash combine for multi-column keys."""
    return a ^ (b + jnp.uint32(0x9E3779B9) + (a << 6) + (a >> 2))
