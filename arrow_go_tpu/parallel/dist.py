"""Generalized distributed operators over the device mesh.

Round-3 expansion of the distributed tier (parallel/{shuffle,aggregate,
join,sort}.py kept for the narrow single-column forms): every operator
here takes TUPLES of key columns and payload columns, so multi-column /
string-keyed (dictionary-coded) queries run distributed, and the two
skew/efficiency mechanisms the north star calls out are built in:

- **Pre-aggregating group-by (combiner).** Each shard aggregates locally
  BEFORE the exchange, so a hot key ships at most one partial row per
  shard — per-shard received row counts are bounded by (global distinct
  groups), not by the skew of the raw rows, and exchange volume drops
  from O(rows) to O(local groups). This is the skew-proof form of hash
  aggregation (role of the reference's chunked-stream hash aggregate;
  SURVEY.md §7 hard parts "skewed shuffle").
- **Hot-key broadcast join.** Per-shard key histograms (device top-k)
  detect hot keys; their build-side rows are all_gather-broadcast to
  every shard instead of hash-routed to one, and their probe-side rows
  never move. Non-hot keys take the normal hash all_to_all. A single
  Zipf-hot key therefore costs O(hot_build_rows) replicated memory
  instead of overflowing one shard's capacity (north-star "skew-aware
  repartitioning + hot keys").

Everything is shard_map + XLA collectives over ICI; no host syncs inside
the step (overflow flags and counts return as device scalars).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..ops import bitmap, hashing

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS
from . import shuffle as shuf

# numpy (not jnp) scalar: a module-level jnp constant would
# initialize the XLA backend at import time, breaking
# jax.distributed.initialize in multi-process workers
BIG = np.int64(1) << 62


def _dt_of(arr) -> dt.DataType:
    return dt.bool_ if arr.dtype == jnp.bool_ else dt.from_numpy_dtype(
        jnp.dtype(arr.dtype))


def _hash_multi(keys: Tuple[jax.Array, ...]) -> jax.Array:
    """Combined 32-bit hash over multiple key columns."""
    h = None
    for k in keys:
        hk = hashing.hash32(k)
        h = hk if h is None else (h * jnp.uint32(0x9E3779B1)) ^ hk
    return h


def _local_codes(keys: Tuple[jax.Array, ...], valid: jax.Array):
    """Per-shard dense codes over a multi-column key (exact equality
    within the shard — cardinality-multiplied per-column encodes, then a
    final encode of the combination)."""
    L = keys[0].shape[0]
    words = bitmap.pack_mask(valid)
    combined = None
    for k in keys:
        res = hashing.encode_codes(k, _dt_of(k), words, L, order="key")
        card = res.n_unique.astype(jnp.int64) + 1
        part = jnp.where(res.codes >= 0, res.codes.astype(jnp.int64), -1)
        if combined is None:
            combined = part
        else:
            combined = jnp.where((combined >= 0) & (part >= 0),
                                 combined * card + part, -1)
    return hashing.encode_codes(combined, dt.int64,
                                bitmap.pack_mask(combined >= 0), L,
                                order="key")


# ---------------------------------------------------------------------------
# distributed group-by with local pre-aggregation
# ---------------------------------------------------------------------------

_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _combined_local_key(keys: Tuple[jax.Array, ...], valid: jax.Array):
    """Multi-column key -> one combined int64 per row (-1 = null/invalid)."""
    L = keys[0].shape[0]
    words = bitmap.pack_mask(valid)
    combined = None
    for k in keys:
        res = hashing.encode_codes(k, _dt_of(k), words, L, order="key")
        card = res.n_unique.astype(jnp.int64) + 1
        part = jnp.where(res.codes >= 0, res.codes.astype(jnp.int64), -1)
        if combined is None:
            combined = part
        else:
            combined = jnp.where((combined >= 0) & (part >= 0),
                                 combined * card + part, -1)
    return combined


def _segment_group(keys: Tuple[jax.Array, ...], valid: jax.Array,
                   specs):
    """Per-shard group-by via SEGMENT aggregation (ops/groupagg — the
    i64 scatter-add alternative costs ~460ms/4M rows on v5e, probe6).
    specs: ((values, agg, value_valid_mask_or_None), ...) — the value
    mask excludes null VALUES from the aggregation while the row keeps
    its key run (so run ids stay aligned across specs).
    Returns (gkeys by run, gvalid, partial arrays by run, n_unique)."""
    from ..ops import groupagg
    from ..ops.sort import _orderable_bits
    L = keys[0].shape[0]
    combined = _combined_local_key(keys, valid)
    rows_ok = valid & (combined >= 0)
    # sum/count values + masks ride the encode sort as payload lanes
    # (random take(col, sidx) re-gathers dominate at scale — probe9)
    payloads = []
    plan = []
    for v, agg, vmask in specs:
        vi = mi = None
        if agg in ("sum", "count"):
            acc_dt = (jnp.int64 if v.dtype.kind in "bi"
                      else jnp.uint64 if v.dtype.kind == "u" else v.dtype)
            vi = len(payloads)
            payloads.append(v.astype(acc_dt))
            if vmask is not None:
                mi = len(payloads)
                payloads.append(vmask)
        plan.append((vi, mi))
    enc, spay = hashing.encode_sorted_with(
        combined, dt.int64, bitmap.pack_mask(rows_ok), L,
        tuple(payloads))
    (first_by_run,) = groupagg.compact_runs(enc.start, (enc.sidx,))
    gkeys = tuple(jnp.take(k, jnp.clip(first_by_run, 0, L - 1))
                  for k in keys)
    gvalid = jnp.arange(L, dtype=jnp.int32) < enc.n_unique
    kbits = _orderable_bits(combined, dt.int64).astype(jnp.uint64)
    key_flag = (~rows_ok).astype(jnp.int32)
    key_hi = (kbits >> jnp.uint64(32)).astype(jnp.uint32)
    key_lo = kbits.astype(jnp.uint32)
    parts = []
    for (v, agg, vmask), (vi, mi) in zip(specs, plan):
        if agg in ("sum", "count"):
            s, c = groupagg.segment_sum_count(
                enc, v, None, values_sorted=spay[vi],
                valid_sorted=None if mi is None else spay[mi])
            parts.append(c if agg == "count" else s)
        elif agg in ("min", "max"):
            vkey = _orderable_bits(v, _dt_of(v)).astype(jnp.uint64)
            parts.append(groupagg.segment_min_max(
                key_flag, key_hi, key_lo, v, vkey, vmask, agg))
        else:
            raise ValueError(agg)
    return gkeys, gvalid, tuple(parts), enc.n_unique


def _expand_aggs(agg_specs):
    """Every agg expands to partials that carry enough state to merge
    AND to decide output validity (a group whose values are all null
    emits null, matching compute.group_by): sum/min/max/mean ship a
    valid-value COUNT partial alongside. Returns (partial specs,
    finisher list); finisher = (name, n_partials_consumed)."""
    partials = []        # (val_idx, partial_agg)
    finishers = []       # (final_agg, consumed)
    for vi, agg in agg_specs:
        if agg in ("mean", "sum"):
            partials.append((vi, "sum"))
            partials.append((vi, "count"))
            finishers.append((agg, 2))
        elif agg in ("min", "max"):
            partials.append((vi, agg))
            partials.append((vi, "count"))
            finishers.append((agg, 2))
        elif agg == "count":
            partials.append((vi, "count"))
            finishers.append((agg, 1))
        else:
            raise ValueError(agg)
    return tuple(partials), tuple(finishers)


def make_distributed_group_by(mesh: Mesh, cap: int, n_keys: int,
                              agg_specs: Tuple[Tuple[int, str], ...],
                              n_vals: int):
    """Jitted distributed GROUP BY over multi-column keys.

    agg_specs: ((val_index, 'sum'|'count'|'min'|'max'|'mean'), ...).
    Inputs (row-sharded): *keys, *vals, valid, *val_valids — one bool
    mask per value column (null VALUES are excluded from sum/min/max/
    mean and not counted by count, matching compute.group_by).
    Outputs (row-sharded): key columns (group reps), final agg columns,
    per-agg validity masks (False = all-null group -> null result),
    n_groups[1] per shard, overflow flag.
    """
    D = mesh.devices.size
    partial_specs, finishers = _expand_aggs(tuple(agg_specs))

    def step(*args):
        keys = args[:n_keys]
        vals = args[n_keys:n_keys + n_vals]
        valid = args[n_keys + n_vals]
        vvalids = args[n_keys + n_vals + 1: n_keys + 2 * n_vals + 1]
        L = keys[0].shape[0]

        # 1. local pre-aggregation (combiner): one partial row per local
        # group — hot keys collapse before any row moves. Value masks
        # exclude null values; count partials count valid values only.
        specs1 = tuple((vals[vi], pa, vvalids[vi] & valid)
                       for vi, pa in partial_specs)
        gkeys, gvalid, parts, _ = _segment_group(keys, valid, specs1)

        # 2. shuffle PARTIALS by key hash (volume = local groups, not rows)
        dest = shuf.partition_of(_hash_multi(gkeys), D)
        body = shuf.shuffle_shard_fn(D, cap)
        received, counts, overflow = body(dest, gvalid, *(gkeys + parts))
        rkeys = received[:n_keys]
        rparts = received[n_keys:]
        rvalid = shuf.row_validity_mask(rkeys[0], counts, cap)

        # 3. final merge: re-encode received keys, merge-reduce partials.
        # A min/max partial from a group with zero valid values is
        # garbage — its sibling count partial (always at i+1) masks it.
        specs2 = []
        for i, ((vi, pa), rp) in enumerate(zip(partial_specs, rparts)):
            vmask2 = None
            if pa in ("min", "max"):
                vmask2 = (rparts[i + 1] > 0) & rvalid
            specs2.append((rp, _MERGE[pa], vmask2))
        out_keys, _gv2, merged, n_unique2 = _segment_group(
            rkeys, rvalid, tuple(specs2))
        merged = list(merged)
        outs, valids = [], []
        i = 0
        for agg, consumed in finishers:
            if agg == "mean":
                s, c = merged[i], merged[i + 1]
                outs.append(s.astype(jnp.float64)
                            / jnp.maximum(c, 1).astype(jnp.float64))
                valids.append(c > 0)
            elif agg in ("sum", "min", "max"):
                outs.append(merged[i])
                valids.append(merged[i + 1] > 0)
            else:                       # count: always valid
                outs.append(merged[i])
                valids.append(jnp.ones(merged[i].shape[0], jnp.bool_))
            i += consumed
        return (out_keys, tuple(outs), tuple(valids),
                n_unique2.reshape(1),
                jax.lax.pmax(overflow.astype(jnp.int32),
                             SHARD_AXIS).astype(jnp.bool_))

    spec = P(SHARD_AXIS)
    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec,) * (n_keys + 2 * n_vals + 1),
                   out_specs=((spec,) * n_keys,
                              (spec,) * len(finishers),
                              (spec,) * len(finishers), spec, P()))
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# distributed join: multi-key, multi-payload, join types, hot-key broadcast
# ---------------------------------------------------------------------------

def _local_pairs(lcodes, lvalid, rcodes, rvalid, cap_out: int, how: str):
    """Traced local join (sort-merge core, parallel/join.py — probe4:
    searchsorted costs ~430ms/16M queries on v5e, the merged sort ~50ms)."""
    from .join import local_join_inner, local_join_semi
    lk = lcodes.astype(jnp.int64)
    rk = rcodes.astype(jnp.int64)
    if how in ("left semi", "left anti"):
        return local_join_semi(lk, lvalid, rk, rvalid, how)
    return local_join_inner(lk, lvalid, rk, rvalid, cap_out, how=how)


def _hot_key_list(keys: Tuple[jax.Array, ...], valid, K: int, thresh: int):
    """Device top-K hot DETECTION per shard + all_gather union: returns a
    sorted [D*K] int64 list of combined-hash sentinels for hot keys (the
    sentinel BIG marks unused slots). Detection keys on the combined key
    hash — a collision only costs an unnecessary broadcast, never a
    wrong result (equality is re-checked by the join codes)."""
    h = _hash_multi(keys).astype(jnp.int64)
    h = jnp.where(valid, h, -1)
    L = h.shape[0]
    res = hashing.encode_codes(h, dt.int64, bitmap.pack_mask(valid), L,
                               order="key")
    codes = res.codes
    cnt = jnp.zeros(L + 1, jnp.int32).at[
        jnp.where(codes >= 0, codes, L)].add(1, mode="drop")[:L]
    topv, topi = jax.lax.top_k(cnt, K)
    first = jnp.clip(res.first_index, 0, L - 1)
    cand = jnp.take(h, jnp.take(first, topi))
    cand = jnp.where(topv > thresh, cand, BIG)
    allc = jax.lax.all_gather(cand, SHARD_AXIS).reshape(-1)
    return jnp.sort(allc)


def _in_sorted(sorted_list, x):
    pos = jnp.searchsorted(sorted_list, x, side="left", method="sort")
    pos_c = jnp.clip(pos, 0, sorted_list.shape[0] - 1)
    return jnp.take(sorted_list, pos_c) == x


def make_distributed_join(mesh: Mesh, cap_shuffle: int, cap_out: int,
                          n_keys: int = 1, n_lpay: int = 1, n_rpay: int = 1,
                          how: str = "inner", hot_k: int = 0,
                          hot_thresh: int = 0, cap_hot: int = 0,
                          cap_hot_out: int = 0):
    """Jitted distributed join over multi-column keys with payloads.

    how: 'inner' | 'left outer' | 'right outer' | 'full outer' |
    'left semi' | 'left anti'. (hot_k skew handling supports
    inner/left outer only — a broadcast build row appears on every
    shard, so per-shard unmatched-right detection would duplicate it.)
    Semi/anti take ONE extra trailing input `lnull` (bool, row-sharded):
    True marks REAL left rows whose key is null (excluded from lvalid).
    'left anti' ORs them into the verdict — SQL semantics, matching
    compute.hash_join; pass zeros when keys have no nulls.
    hot_k > 0 enables skew handling with TWO per-shard top-hot_k hot
    lists (count > hot_thresh):
    - PROBE-hot keys (path A): their build rows broadcast to every
      shard; their probe rows never move. For right/full outer, a
      broadcast build row's matched flags union across shards via pmax
      and only its ORIGIN shard emits it unmatched — the exclusion the
      round-3 verdict flagged is lifted.
    - BUILD-hot keys (path B, inner/left outer/semi/anti): their build
      rows are SALTED — spread round-robin over all shards through the
      normal exchange — and their probe rows broadcast, joining each
      shard's received build rows. Right-side Zipf therefore cannot
      hot-spot one shard. Unmatched broadcast-probe rows (left outer)
      emit once at their origin shard via the same pmax union.
    Capacities: cap_hot broadcast rows per shard, cap_hot_out output
    pairs per shard per path.

    Inputs (row-sharded): *lkeys, *lpays, lvalid, *rkeys, *rpays, rvalid.
    Outputs per shard: key cols + left payloads + right payloads of the
    matched pairs (slots >= n_out padded -1/0), n_out, overflow — for
    semi/anti: a row mask over the left side instead. With hot_k the
    tuple carries THREE (keys, lp, rp, rmatch, n) groups: exchanged,
    path A (probe-hot), path B (build-hot).
    """
    D = mesh.devices.size
    nl = n_keys + n_lpay
    semi = how in ("left semi", "left anti")
    # build-side salting applies where probe-row replication is an exact
    # decomposition; right/full outer instead get the probe-hot path
    # with psum-matched unmatched-build emission (no salting: the main
    # join's unmatched-right detection must see every build row once)
    salt_b = bool(hot_k) and how in ("inner", "left outer", "left semi",
                                     "left anti")

    def gather_cols(cols, idx, fill=0):
        out = []
        for c in cols:
            g = jnp.take(c, jnp.clip(idx, 0, c.shape[0] - 1))
            out.append(jnp.where(idx >= 0, g,
                                 jnp.zeros((), c.dtype) if c.dtype != jnp.bool_
                                 else False))
        return tuple(out)

    def step(*args):
        lkeys = args[:n_keys]
        lpays = args[n_keys:nl]
        lvalid = args[nl]
        rkeys = args[nl + 1: nl + 1 + n_keys]
        rpays = args[nl + 1 + n_keys: nl + 1 + n_keys + n_rpay]
        rvalid = args[nl + 1 + n_keys + n_rpay]
        lnull = args[nl + 2 + n_keys + n_rpay] if semi else None

        lv, rv = lvalid, rvalid
        rv_ex = rvalid
        if hot_k:
            # TWO hot lists: keys hot by PROBE counts join via build-side
            # broadcast (path A); keys hot by BUILD counts are SALTED —
            # their build rows spread over all shards through the normal
            # exchange and their probe rows broadcast (path B) — so
            # right-side Zipf cannot hot-spot one shard either. A key hot
            # on both sides takes the salt path (spread work).
            lhash = _hash_multi(lkeys).astype(jnp.int64)
            rhash = _hash_multi(rkeys).astype(jnp.int64)
            hotP = _hot_key_list(lkeys, lvalid, hot_k, hot_thresh)
            if salt_b:
                hotB = _hot_key_list(rkeys, rvalid, hot_k, hot_thresh)
                lhotB = _in_sorted(hotB, lhash) & lvalid
                rhotB = _in_sorted(hotB, rhash) & rvalid
            else:
                lhotB = jnp.zeros_like(lvalid)
                rhotB = jnp.zeros_like(rvalid)
            lhot = _in_sorted(hotP, lhash) & lvalid & ~lhotB
            rhot = _in_sorted(hotP, rhash) & rvalid & ~rhotB
            lv = lvalid & ~lhot & ~lhotB
            rv = rvalid & ~rhot & ~rhotB
            rv_ex = rv | rhotB          # salted rows ride the exchange

        # normal path: hash exchange of non-hot rows (+ salted hot build
        # rows at round-robin destinations)
        body = shuf.shuffle_shard_fn(D, cap_shuffle)
        ldest = shuf.partition_of(_hash_multi(lkeys), D)
        lrecv, lcounts, lov = body(ldest, lv, *(lkeys + lpays))
        rdest = shuf.partition_of(_hash_multi(rkeys), D)
        if hot_k and salt_b:
            iota_r = jnp.arange(rkeys[0].shape[0], dtype=jnp.int32)
            rdest = jnp.where(rhotB, iota_r % D, rdest)
        rrecv, rcounts, rov = body(rdest, rv_ex, *(rkeys + rpays))
        slk, slp = lrecv[:n_keys], lrecv[n_keys:]
        srk, srp = rrecv[:n_keys], rrecv[n_keys:]
        lrows = shuf.row_validity_mask(slk[0], lcounts, cap_shuffle)
        rrows = shuf.row_validity_mask(srk[0], rcounts, cap_shuffle)

        # per-shard codes over the CONCAT of both sides (exact equality)
        Lc, Rc = slk[0].shape[0], srk[0].shape[0]
        both = tuple(jnp.concatenate([a, b]) for a, b in zip(slk, srk))
        bvalid = jnp.concatenate([lrows, rrows])
        resb = _local_codes(both, bvalid)
        lcodes, rcodes = resb.codes[:Lc], resb.codes[Lc:]

        if semi:
            # semi/anti need the verdict on ORIGINAL left rows: route the
            # match mask back is complex; instead run the match where the
            # left rows landed, then ship the mask back via a reverse
            # all_to_all of the packed mask
            m = _local_pairs(lcodes, lrows, rcodes, rrows, 1, how)
            # reverse exchange: received rows came as [D, cap] blocks
            back = jax.lax.all_to_all(m.reshape(D, cap_shuffle), SHARD_AXIS,
                                      split_axis=0, concat_axis=0,
                                      tiled=True).reshape(-1)
            # unpack: row i of this shard sits at (dest block, slot) — recompute
            dest_l = jnp.where(lv, ldest, D)
            order = jnp.argsort(jnp.where(lv, dest_l, D), stable=True)
            sorted_dest = jnp.take(dest_l, order)
            iota = jnp.arange(dest_l.shape[0], dtype=jnp.int32)
            startc = jnp.cumsum(jnp.zeros(D + 2, jnp.int32).at[
                jnp.clip(sorted_dest + 1, 0, D + 1)].add(1))
            slot_sorted = iota - jnp.take(startc, sorted_dest)
            slot = jnp.zeros_like(iota).at[order].set(slot_sorted)
            flat = jnp.clip(dest_l, 0, D - 1) * cap_shuffle + \
                jnp.clip(slot, 0, cap_shuffle - 1)
            verdict = jnp.take(back, flat) & lv
            sem_ov = lov | rov
            if hot_k:
                # probe-hot left rows never entered the exchange: their
                # verdict comes from the broadcast build side
                hverd, hovf = _hot_semi(lkeys, lhot, rkeys, rpays, rhot,
                                        how)
                verdict = jnp.where(lhot, hverd, verdict)
                # build-hot (salted) left rows broadcast; each shard
                # matches them against ITS received build rows and the
                # flags union via pmax back to the origin shard
                hkl, _hp0, hrows_l, lpos, bovf = _broadcast_hot(
                    lkeys, lhotB, cap_hot, n_keys)
                bverd = _hot_semi_salted(lhotB, lpos, hkl, hrows_l,
                                         srk, rrows, how)
                verdict = jnp.where(lhotB, bverd, verdict)
                # a hot row beyond cap_hot never broadcast: its verdict
                # would be silently wrong — surface the overflow
                sem_ov = sem_ov | hovf | bovf
            if how == "left anti":
                # null-key left rows match nothing -> they belong in the
                # anti output (SQL semantics, = compute.hash_join)
                verdict = verdict | lnull
            ov = jax.lax.pmax(sem_ov.astype(jnp.int32), SHARD_AXIS)
            return verdict, ov.astype(jnp.bool_)

        li, ri, rperm, n_out, jov = _local_pairs(lcodes, lrows, rcodes,
                                                 rrows, cap_out, how)
        out_keys = gather_cols(slk, li)
        out_lp = gather_cols(slp, li)
        # ri is a key-sorted right RANK (gather-free join core): permute
        # payloads once by rperm, then gather by rank
        srp_ranked = tuple(
            jnp.take(c, jnp.clip(rperm, 0, c.shape[0] - 1)) for c in srp)
        out_rp = gather_cols(srp_ranked, ri)
        if how in ("right outer", "full outer"):
            # unmatched-RIGHT rows (li=-1, ri=rank) must carry their KEY
            # from the right side — a zero-filled left gather loses it
            srk_ranked = tuple(
                jnp.take(c, jnp.clip(rperm, 0, c.shape[0] - 1))
                for c in srk)
            rkeys_out = gather_cols(srk_ranked, ri)
            out_keys = tuple(jnp.where(li >= 0, a, b)
                             for a, b in zip(out_keys, rkeys_out))
        rmatch = jnp.where(li >= 0, ri >= 0, False)
        overflow = lov | rov | jov

        if hot_k:
            # ---- path A: probe-hot keys — broadcast the (small) hot
            # build side everywhere, join against the LOCAL hot probe
            # rows (they never moved)
            hk, hp, hrows, rpos, hbov = _broadcast_hot(
                rkeys + rpays, rhot, cap_hot, n_keys)
            bothh = tuple(jnp.concatenate([a, b]) for a, b in zip(lkeys, hk))
            bvh = jnp.concatenate([lhot, hrows])
            resh = _local_codes(bothh, bvh)
            Lh = lkeys[0].shape[0]
            how_h = ("left outer" if how in ("left outer", "full outer")
                     else "inner")
            hli, hri, hrperm, hn, hovf = _local_pairs(
                resh.codes[:Lh], lhot, resh.codes[Lh:], hrows,
                cap_hot_out, how_h)
            hout_keys = gather_cols(lkeys, hli)
            hout_lp = gather_cols(lpays, hli)
            hp_ranked = tuple(
                jnp.take(c, jnp.clip(hrperm, 0, c.shape[0] - 1)) for c in hp)
            hout_rp = gather_cols(hp_ranked, hri)
            hrmatch = jnp.where(hli >= 0, hri >= 0, False)
            overflow = overflow | hovf | hbov
            if how in ("right outer", "full outer"):
                # a broadcast build row is on EVERY shard: union its
                # matched flags with pmax, then only the ORIGIN shard
                # emits it as an unmatched-right row — exactly once
                HB = hk[0].shape[0]
                matched_b = _matched_everywhere(hri, hrperm, HB)
                my = jax.lax.axis_index(SHARD_AXIS)
                myslot = my * cap_hot + jnp.clip(rpos, 0, cap_hot - 1)
                un_r = rhot & (rpos < cap_hot) & \
                    ~jnp.take(matched_b, myslot)
                outs = hout_keys + hout_lp + hout_rp + (hrmatch,)
                srcs = rkeys + (None,) * n_lpay + rpays + (None,)
                outs, hn, ovf2 = _append_unmatched(outs, srcs, un_r, hn,
                                                   cap_hot_out)
                hout_keys = outs[:n_keys]
                hout_lp = outs[n_keys:n_keys + n_lpay]
                hout_rp = outs[n_keys + n_lpay:n_keys + n_lpay + n_rpay]
                hrmatch = outs[-1]
                overflow = overflow | ovf2

            # ---- path B: build-hot keys — build rows were SALTED
            # through the exchange (round-robin dests); their probe rows
            # broadcast here and join the received build rows per shard.
            # Each build row lives on exactly ONE shard, so pairs are
            # emitted exactly once.
            hkl, hpl, hrows_l, lpos, bbov = _broadcast_hot(
                lkeys + lpays, lhotB, cap_hot, n_keys)
            HBl = hkl[0].shape[0]
            both2 = tuple(jnp.concatenate([a, b])
                          for a, b in zip(hkl, srk))
            bv2 = jnp.concatenate([hrows_l, rrows])
            res2 = _local_codes(both2, bv2)
            bli, bri, brperm, bn, bovf = _local_pairs(
                res2.codes[:HBl], hrows_l, res2.codes[HBl:], rrows,
                cap_hot_out, "inner")
            bout_keys = gather_cols(hkl, bli)
            bout_lp = gather_cols(hpl, bli)
            srp_ranked2 = tuple(
                jnp.take(c, jnp.clip(brperm, 0, c.shape[0] - 1))
                for c in srp)
            bout_rp = gather_cols(srp_ranked2, bri)
            brmatch = jnp.where(bli >= 0, bri >= 0, False)
            overflow = overflow | bovf | bbov
            if how in ("left outer", "full outer"):
                # unmatched broadcast-probe rows emit once at origin
                slots_id = jnp.arange(HBl, dtype=jnp.int32)
                matched_l = _matched_everywhere(
                    jnp.where(bli >= 0, bli, -1), slots_id, HBl)
                my = jax.lax.axis_index(SHARD_AXIS)
                myslot = my * cap_hot + jnp.clip(lpos, 0, cap_hot - 1)
                un_l = lhotB & (lpos < cap_hot) & \
                    ~jnp.take(matched_l, myslot)
                outs = bout_keys + bout_lp + bout_rp + (brmatch,)
                srcs = lkeys + lpays + (None,) * n_rpay + (None,)
                outs, bn, ovf3 = _append_unmatched(outs, srcs, un_l, bn,
                                                   cap_hot_out)
                bout_keys = outs[:n_keys]
                bout_lp = outs[n_keys:n_keys + n_lpay]
                bout_rp = outs[n_keys + n_lpay:n_keys + n_lpay + n_rpay]
                brmatch = outs[-1]
                overflow = overflow | ovf3

            ov = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)
            return (out_keys, out_lp, out_rp, rmatch, n_out.reshape(1),
                    hout_keys, hout_lp, hout_rp, hrmatch, hn.reshape(1),
                    bout_keys, bout_lp, bout_rp, brmatch, bn.reshape(1),
                    ov.astype(jnp.bool_))

        ov = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)
        return (out_keys, out_lp, out_rp, rmatch, n_out.reshape(1),
                ov.astype(jnp.bool_))

    def _broadcast_hot(cols_in, hot, cap_h, n_first):
        """Compact local hot rows to [cap_h], all_gather in BLOCK layout
        (slot d*cap_h+i came from shard d — origin identity preserved so
        unmatched-row emission can be claimed by the owning shard).
        Returns (first n_first col tuple, rest col tuple, rows mask,
        local compact position per row, overflow)."""
        pos = jnp.cumsum(hot.astype(jnp.int32)) - 1
        nhot = jnp.sum(hot.astype(jnp.int32))
        ovf = nhot > cap_h
        tgt = jnp.where(hot & (pos < cap_h), pos, cap_h)
        cols = []
        for c in cols_in:
            buf = jnp.zeros(cap_h + 1, c.dtype).at[tgt].set(c, mode="drop")
            cols.append(buf[:cap_h])
        gathered = [jax.lax.all_gather(c, SHARD_AXIS).reshape(-1)
                    for c in cols]
        ns = jax.lax.all_gather(jnp.minimum(nhot, cap_h),
                                SHARD_AXIS).reshape(-1)
        rows = shuf.row_validity_mask(gathered[0], ns, cap_h)
        ovf_any = jax.lax.pmax(ovf.astype(jnp.int32),
                               SHARD_AXIS).astype(jnp.bool_)
        return (tuple(gathered[:n_first]), tuple(gathered[n_first:]),
                rows, pos, ovf_any)

    def _matched_everywhere(idx, perm, HB):
        """Global per-broadcast-slot matched flags: idx are join ranks,
        perm maps rank -> broadcast slot; pmax unions the shards."""
        slots = jnp.where(idx >= 0,
                          jnp.take(perm, jnp.clip(idx, 0, HB - 1)), HB)
        m = jnp.zeros(HB, jnp.int32).at[slots].max(1, mode="drop")
        return jax.lax.pmax(m, SHARD_AXIS) > 0

    def _append_unmatched(outs, srcs, un, base, cap_buf):
        """Append rows where `un` (values from srcs columns; zero-fill
        columns pass None) into outs at offset base. Returns (new outs,
        new count, overflow)."""
        k = jnp.cumsum(un.astype(jnp.int32)) - 1
        n_add = jnp.sum(un.astype(jnp.int32))
        tgt = jnp.where(un & (base + k < cap_buf), base + k, cap_buf)
        new = []
        for arr, src in zip(outs, srcs):
            if src is None:
                src = jnp.zeros(un.shape[0], arr.dtype)
            pad = jnp.concatenate([arr, jnp.zeros(1, arr.dtype)])
            new.append(pad.at[tgt].set(src.astype(arr.dtype),
                                       mode="drop")[:cap_buf])
        return tuple(new), base + n_add, (base + n_add) > cap_buf

    def _hot_semi(lkeys, lhot, rkeys, rpays, rhot, how_):
        hk, hp, hrows, _pos, hovf = _broadcast_hot(
            rkeys + rpays, rhot, cap_hot, n_keys)
        bothh = tuple(jnp.concatenate([a, b]) for a, b in zip(lkeys, hk))
        bvh = jnp.concatenate([lhot, hrows])
        resh = _local_codes(bothh, bvh)
        Lh = lkeys[0].shape[0]
        verdict = _local_pairs(resh.codes[:Lh], lhot, resh.codes[Lh:],
                               hrows, 1, how_)
        return verdict, hovf

    def _hot_semi_salted(lhotB, lpos, hkeys_l, hrows_l, srk, rrows, how_):
        """Semi/anti verdict for broadcast PROBE rows (build side salted
        through the exchange): each shard matches the broadcast probe
        buffer against ITS received build rows; per-slot flags union via
        pmax; the origin shard reads back its own rows."""
        HB = hkeys_l[0].shape[0]
        both2 = tuple(jnp.concatenate([a, b])
                      for a, b in zip(hkeys_l, srk))
        bv2 = jnp.concatenate([hrows_l, rrows])
        res2 = _local_codes(both2, bv2)
        verd_slots = _local_pairs(res2.codes[:HB], hrows_l,
                                  res2.codes[HB:], rrows, 1, "left semi")
        any_match = jax.lax.pmax(verd_slots.astype(jnp.int32),
                                 SHARD_AXIS) > 0
        my = jax.lax.axis_index(SHARD_AXIS)
        myslot = my * cap_hot + jnp.clip(lpos, 0, cap_hot - 1)
        mine = jnp.take(any_match, myslot) & lhotB & (lpos < cap_hot)
        if how_ == "left anti":
            return ~mine & lhotB
        return mine

    spec = P(SHARD_AXIS)
    n_in = (n_keys + n_lpay + 1) + (n_keys + n_rpay + 1) + (1 if semi else 0)
    if semi:
        out_specs = (spec, P())
    elif hot_k:
        out_specs = ((spec,) * n_keys, (spec,) * n_lpay, (spec,) * n_rpay,
                     spec, spec,
                     (spec,) * n_keys, (spec,) * n_lpay, (spec,) * n_rpay,
                     spec, spec,
                     (spec,) * n_keys, (spec,) * n_lpay, (spec,) * n_rpay,
                     spec, spec, P())
    else:
        out_specs = ((spec,) * n_keys, (spec,) * n_lpay, (spec,) * n_rpay,
                     spec, spec, P())
    fn = shard_map(step, mesh=mesh, in_specs=(spec,) * n_in,
                   out_specs=out_specs)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# distributed multi-key sort
# ---------------------------------------------------------------------------

def make_distributed_sort_multi(mesh: Mesh, cap: int, n_keys: int,
                                n_payload: int = 0, n_samples: int = 64,
                                descending: Tuple[bool, ...] = ()):
    """Range-partition on the primary key (equal primaries land on the
    same shard), exchange all key+payload columns, local multi-key sort
    via ops/sort.argsort_multi. Reading shards in order yields the global
    multi-key ascending order."""
    from ..ops import sort as sort_ops
    D = mesh.devices.size
    desc = tuple(descending) + (False,) * (n_keys - len(descending))

    def body(*args):
        keys = args[:n_keys]
        valid = args[n_keys]
        payload = args[n_keys + 1:]
        k0 = keys[0]
        sent = (jnp.array(jnp.inf, k0.dtype) if k0.dtype.kind == "f"
                else jnp.array(jnp.iinfo(k0.dtype).max, k0.dtype))
        kprim = jnp.where(valid, k0, sent)
        L = kprim.shape[0]

        sk = jnp.sort(kprim)
        # sample only the VALID prefix (invalid/padding rows sorted to
        # the tail as sentinel-max): a mostly-padding shard must not skew
        # splitters toward the sentinel and concentrate real rows on the
        # last shard
        nval = jnp.sum(valid.astype(jnp.int64))
        # int64 positions: arange(i32) * nval wraps at ~34M rows/shard
        pos = (jnp.arange(n_samples, dtype=jnp.int64)
               * jnp.maximum(nval, 1)) // jnp.int64(n_samples)
        sample = jnp.take(sk, jnp.clip(pos, 0, L - 1))
        # an all-padding shard contributes only sentinels (harmless: they
        # sort to the top quantiles and drop out of the splitter cut)
        sample = jnp.where(nval > 0, sample, sent)
        all_samples = jax.lax.all_gather(sample, SHARD_AXIS).reshape(-1)
        flat = jnp.sort(all_samples)
        S = flat.shape[0]
        qpos = (jnp.arange(1, D, dtype=jnp.int32) * S) // D
        splitters = jnp.take(flat, qpos)
        dest = jnp.searchsorted(splitters, kprim,
                                side="right").astype(jnp.int32)

        packed, counts, overflow = shuf._pack_for_send(
            dest, valid, D, cap, keys + payload)
        received = [jax.lax.all_to_all(p, SHARD_AXIS, split_axis=0,
                                       concat_axis=0, tiled=True)
                    for p in packed]
        recv_counts = jax.lax.all_to_all(counts, SHARD_AXIS, split_axis=0,
                                         concat_axis=0, tiled=True)
        any_ov = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)

        rmask = shuf.row_validity_mask(received[0].reshape(-1), recv_counts,
                                       cap)
        rkeys = [r.reshape(-1) for r in received[:n_keys]]
        rpay = [r.reshape(-1) for r in received[n_keys:]]
        ops = []
        for i, rk in enumerate(rkeys):
            # padding slots sort to the tail via the validity flag
            # (exchange already dropped real nulls, so flag 2 marks
            # padding only); all received rows are "in range" (n = L2)
            ops.append(sort_ops.sort_key(
                rk, _dt_of(rk), bitmap.pack_mask(rmask),
                rk.shape[0], descending=desc[i]))
        perm = sort_ops.argsort_multi(ops)
        out_keys = tuple(jnp.take(rk, perm) for rk in rkeys)
        out_pay = tuple(jnp.take(rp, perm) for rp in rpay)
        n_local = jnp.sum(recv_counts).astype(jnp.int32)
        return out_keys, out_pay, n_local.reshape(1), \
            any_ov.astype(jnp.bool_)

    spec = P(SHARD_AXIS)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec,) * (n_keys + 1 + n_payload),
                   out_specs=((spec,) * n_keys, (spec,) * n_payload,
                              spec, P()))
    return jax.jit(fn)
