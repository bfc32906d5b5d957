"""Distributed hash join over the device mesh (north-star config #5).

Both sides hash-partition by key over the shards (shuffle.py all_to_all
over ICI); each shard then runs a fully-traced local SORT-MERGE join
with a capacity-bounded pair expansion (see local_join_inner for the
TPU cost model). No host syncs inside the step — output counts and
overflow flags come back as device scalars, so the whole distributed
join is ONE jitted XLA program.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from ..jaxenv import jax, jnp
from ..ops import hashing

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS
from . import shuffle as shuf

# numpy (not jnp) scalar: a module-level jnp constant would
# initialize the XLA backend at import time, breaking
# jax.distributed.initialize in multi-process workers
BIG = np.int64(1) << 62


class JoinState(NamedTuple):
    """Sorted-domain join state: everything the pair expansion needs,
    all [N]-shaped (N = PL + PR) — so count-then-materialize callers
    can fetch `total` after ONE sort+count pass and run the expansion
    as a second jitted phase without re-sorting (compute/join.py)."""
    starts_j: jax.Array     # [N] first output slot per position
    emitting: jax.Array     # [N] bool: position emits >= 1 pair
    is_left: jax.Array      # [N] bool (valid left row at position)
    sorig: jax.Array        # [N] original row id at position
    rank: jax.Array         # [N] right rank (R_incl - 1)
    counts_pos: jax.Array   # [N] match count per left position
    R_before: jax.Array     # [N] rights before the position's group
    total: jax.Array        # scalar int32: pairs to emit
    rperm: jax.Array        # [PR] right rank -> original right row


def join_sorted_state(lkeys, lvalid, rkeys, rvalid,
                      how: str = "inner") -> JoinState:
    """Phase 1 of the gather-free sort-merge join: ONE combined sort +
    scan-filled counts (see local_join_inner for the cost model)."""
    PL, PR = lkeys.shape[0], rkeys.shape[0]
    N = PL + PR
    keys_all = jnp.concatenate([rkeys, lkeys])
    valid_all = jnp.concatenate([rvalid, lvalid])
    # side+orig fold into ONE i32 sort lane (side in bit 30): ascending
    # order = rights before lefts within a key, each side by original
    # row — identical to the old (side, orig) two-lane stable order
    side_orig = jnp.concatenate([
        jnp.arange(PR, dtype=jnp.int32),
        jnp.arange(PL, dtype=jnp.int32) | jnp.int32(1 << 30)])
    flag = (~valid_all).astype(jnp.int32)
    k_u = jax.lax.bitcast_convert_type(keys_all, jnp.uint64) \
        ^ (jnp.uint64(1) << 63)
    khi = (k_u >> jnp.uint64(32)).astype(jnp.uint32)
    klo = k_u.astype(jnp.uint32)
    sflag, shi, slo, sso = jax.lax.sort(
        (flag, khi, klo, side_orig), num_keys=4, is_stable=True)
    sside = (sso >> jnp.int32(30)).astype(jnp.int32)
    sorig = sso & jnp.int32((1 << 30) - 1)
    pos = jnp.arange(N, dtype=jnp.int32)
    # run starts among valid rows (key change in sorted order)
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = ((shi != prev_hi) | (slo != prev_lo) | (pos == 0)) \
        & (sflag == 0)
    is_right = (sside == 0) & (sflag == 0)
    is_left = (sside == 1) & (sflag == 0)
    R_incl = jnp.cumsum(is_right.astype(jnp.int32))
    # rights before each group: marks at starts are monotone across
    # groups, so a cummax forward-fill replaces the per-position gather
    R_before = jnp.maximum(jax.lax.cummax(
        jnp.where(start, R_incl - is_right.astype(jnp.int32), -1)), 0)
    counts_pos = jnp.where(is_left, R_incl - R_before, 0)
    if how in ("left outer", "full outer"):
        emit_pos = jnp.where(is_left, jnp.maximum(counts_pos, 1), 0)
    else:
        emit_pos = counts_pos
    if how in ("right outer", "full outer"):
        # rights whose group has NO left emit one (li=-1, ri=self-rank)
        # row. lefts-in-group = L at group end - L before group start,
        # both scan-filled (no gathers): L_before forward-fills from
        # start marks; L_end backward-fills from end-of-run marks with a
        # reverse cummin (mark values increase rightward, so the min of
        # marks at-or-right of a position is its own group's end).
        L_incl = jnp.cumsum(is_left.astype(jnp.int32))
        L_before = jnp.maximum(jax.lax.cummax(
            jnp.where(start, L_incl - is_left.astype(jnp.int32), -1)), 0)
        valid_row = sflag == 0
        nxt_start = jnp.concatenate([start[1:], jnp.ones(1, start.dtype)])
        nxt_invalid = jnp.concatenate(
            [(sflag[1:] != 0), jnp.ones(1, jnp.bool_)])
        is_last = valid_row & (nxt_start | nxt_invalid)
        imax = jnp.iinfo(jnp.int32).max
        grp_L_end = jax.lax.cummin(
            jnp.where(is_last, L_incl, imax), reverse=True)
        lefts_in_group = grp_L_end - L_before
        unmatched_right = is_right & (lefts_in_group == 0)
        emit_pos = emit_pos + unmatched_right.astype(jnp.int32)
    offsets = jnp.cumsum(emit_pos)
    total = offsets[-1] if N else jnp.asarray(0, jnp.int32)

    # right rank -> original right row id
    rank = R_incl - 1
    # rights in key-sorted order ARE rank order: blocked compaction
    # (ops/compaction.py) replaces the rank scatter (~25 ms, probe9)
    from ..ops.compaction import compact_flagged
    rperm = compact_flagged(is_right, (sorig,))[0][:max(PR, 1)]
    return JoinState(offsets - emit_pos, emit_pos > 0, is_left, sorig,
                     rank, counts_pos, R_before, total, rperm)


def join_expand(st: JoinState, cap_out: int):
    """Phase 2: the gather-free pair expansion. Each emitting position
    scatter-SETs its first output slot (slots are distinct);
    forward-fill runs via cummax. The owner fields ride a u64 pack
    whose high bits are the (monotone) output base, so ONE chunked u64
    cummax fills owner id + flags with no gather; i32 lanes fill the
    (monotone) base/rank-base directly. The u64 pack is scattered as
    TWO u32 lanes (64-bit scatters are the slow primitive on v5e:
    probe6 measured an i64 scatter at ~460 ms/4M updates while u32
    scatters are ~0.1 ms) and combined AFTER the scatter, where the
    u64 work is elementwise. Returns (li, ri, overflow)."""
    starts_j, emitting = st.starts_j, st.emitting
    overflow = st.total > cap_out
    tgt = jnp.where(emitting, jnp.clip(starts_j, 0, cap_out - 1), cap_out)
    # TWO u64 pack fills carry everything (probe9: each scatter of N
    # updates costs ~25 ms at 4-5M, so the lane scatters merge into ONE
    # 2-D row scatter and the old separate fill_start scatter+cummax is
    # gone — the pack's high 32 bits ARE the owner's starts_j):
    #   pack A (u64): [base:32][owner_left:1][matched:1][orig_or_rank:30]
    #   pack B (u64): [base:32][R_before:32]
    field = jnp.where(st.is_left, st.sorig, st.rank).astype(jnp.uint32)
    lane_hi = starts_j.astype(jnp.uint32)
    lane_a = ((st.is_left.astype(jnp.uint32) << jnp.uint32(31))
              | ((st.counts_pos > 0).astype(jnp.uint32) << jnp.uint32(30))
              | field)
    lane_b = jnp.where(emitting, st.R_before, 0).astype(jnp.uint32)
    # three 1-D scatters: a single [N,3] row scatter lowers to the
    # SERIAL path on v5e (measured 5x worse than 3 separate 1-D sets)
    s_hi = jnp.zeros(cap_out, jnp.uint32).at[tgt].set(lane_hi, mode="drop")
    s_a = jnp.zeros(cap_out, jnp.uint32).at[tgt].set(lane_a, mode="drop")
    s_b = jnp.zeros(cap_out, jnp.uint32).at[tgt].set(lane_b, mode="drop")
    # both fills share the owner-base high word: ONE Pallas sequential
    # scan (ops/scan.py, ~2.5 ms vs 2 x 15.2 ms chunked u64 cummax at
    # 16M — roofline_probe11) fills base + both payload lanes
    from ..ops.scan import cummax_u64_lanes
    fill_hi, fill_a, fill_b = cummax_u64_lanes(s_hi, [s_a, s_b])
    fill_start = fill_hi.astype(jnp.int32)
    fill_rbase = fill_b.astype(jnp.int32)
    f_left = ((fill_a >> jnp.uint32(31)) & jnp.uint32(1)) != 0
    f_match = ((fill_a >> jnp.uint32(30)) & jnp.uint32(1)) != 0
    f_field = (fill_a & jnp.uint32((1 << 30) - 1)).astype(jnp.int32)
    j = jnp.arange(cap_out, dtype=jnp.int32)
    within = j - fill_start
    r_rank = fill_rbase + within
    in_range = j < st.total
    li = jnp.where(in_range & f_left, f_field, -1)
    ri = jnp.where(in_range & f_left & f_match, r_rank,
                   jnp.where(in_range & ~f_left, f_field, -1))
    return li, ri, overflow


def local_join_inner(lkeys, lvalid, rkeys, rvalid, cap_out: int,
                     how: str = "inner"):
    """Traced join on one shard — SORT-MERGE over both sides at once,
    with a GATHER-FREE pair expansion (join_sorted_state + join_expand).

    TPU cost model (benchmarks/roofline_probe{4,7}.py, v5e, 4M probe /
    1M build / 16M pairs): `lax.sort` of the combined sides costs
    ~29 ms, cumsum/cummax ~2-6 ms, scatter-set/max ~0.1 ms — but ONE
    random 16M-index gather costs ~144 ms (monotone indices are no
    cheaper). The round-3 expansion spent ~430 ms of its 609 ms in four
    such gathers; this version has ZERO gathers:

    - `R_before` (rights before each group) forward-fills from run-start
      marks with a cummax — the marks are monotone across groups.
    - the expansion's owner fields unpack from a chunked-u64-cummax
      forward fill (see join_expand).
    - `ri` is returned as the owner's RIGHT RANK in key-sorted order
      (rank base + slot offset — pure arithmetic); `rperm` maps rank ->
      original right row. Consumers gather payloads through
      `take(col, rperm)[ri]` (or `take(rperm, ri)` for row ids) — the
      same per-column gathers they always paid, none inside the kernel.

    how: 'inner' | 'left outer' | 'right outer' | 'full outer'.
    Returns (li[cap_out], ri[cap_out], rperm[PR], n_out, overflow):
    li = original left row ids; ri = right-side KEY-SORTED ranks
    (-1 = no match / padding); rperm[rank] = original right row.
    Sides are limited to 2^30 rows per call (rank/id pack in 30 bits).
    """
    st = join_sorted_state(lkeys, lvalid, rkeys, rvalid, how)
    li, ri, overflow = join_expand(st, cap_out)
    return li, ri, st.rperm, st.total, overflow


def local_join_semi(lkeys, lvalid, rkeys, rvalid, how: str):
    """Traced semi/anti verdict per ORIGINAL left row (sort-merge probe,
    same cost model as local_join_inner). how: 'left semi'|'left anti'."""
    PL, PR = lkeys.shape[0], rkeys.shape[0]
    N = PL + PR
    keys_all = jnp.concatenate([rkeys, lkeys])
    valid_all = jnp.concatenate([rvalid, lvalid])
    side_orig = jnp.concatenate([
        jnp.arange(PR, dtype=jnp.int32),
        jnp.arange(PL, dtype=jnp.int32) | jnp.int32(1 << 30)])
    flag = (~valid_all).astype(jnp.int32)
    k_u = jax.lax.bitcast_convert_type(keys_all, jnp.uint64) \
        ^ (jnp.uint64(1) << 63)
    khi = (k_u >> jnp.uint64(32)).astype(jnp.uint32)
    klo = k_u.astype(jnp.uint32)
    sflag, shi, slo, sso = jax.lax.sort(
        (flag, khi, klo, side_orig), num_keys=4, is_stable=True)
    sside = (sso >> jnp.int32(30)).astype(jnp.int32)
    sorig = sso & jnp.int32((1 << 30) - 1)
    pos = jnp.arange(N, dtype=jnp.int32)
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = ((shi != prev_hi) | (slo != prev_lo) | (pos == 0)) \
        & (sflag == 0)
    is_right = (sside == 0) & (sflag == 0)
    is_left = (sside == 1) & (sflag == 0)
    R_incl = jnp.cumsum(is_right.astype(jnp.int32))
    # gather-free R_before: forward-fill monotone run-start marks
    R_before = jnp.maximum(jax.lax.cummax(
        jnp.where(start, R_incl - is_right.astype(jnp.int32), -1)), 0)
    matched = is_left & ((R_incl - R_before) > 0)
    # ALL left-side rows (incl. invalid ones, whose matched is False)
    # sorted by original row id = the verdict in original row order:
    # one sort replaces the scatter (~7 ms vs ~25 ms, probe9)
    out = jax.lax.sort(
        ((1 - sside).astype(jnp.int32), sorig,
         matched.astype(jnp.int32)), num_keys=2,
        is_stable=True)[2][:PL] > 0
    if how == "left anti":
        return ~out & lvalid
    return out & lvalid


def make_distributed_join(mesh: Mesh, cap_shuffle: int, cap_out: int):
    """Jitted distributed inner join on int64 keys with one payload column
    per side.

    Global inputs (row-sharded): lkeys, lvals, lvalid, rkeys, rvals, rvalid.
    Global outputs (row-sharded per shard): joined key, lval, rval arrays
    (padding -1/0 beyond n_out), n_out per shard, overflow flag.
    """
    D = mesh.devices.size

    def step(lkeys, lvals, lvalid, rkeys, rvals, rvalid):
        body = shuf.shuffle_shard_fn(D, cap_shuffle)
        ldest = shuf.partition_of(hashing.hash32(lkeys), D)
        (slk, slv), lcounts, lov = body(ldest, lvalid, lkeys, lvals)
        rdest = shuf.partition_of(hashing.hash32(rkeys), D)
        (srk, srv), rcounts, rov = body(rdest, rvalid, rkeys, rvals)
        lval_rows = shuf.row_validity_mask(slk, lcounts, cap_shuffle)
        rval_rows = shuf.row_validity_mask(srk, rcounts, cap_shuffle)
        li, ri, rperm, n_out, jov = local_join_inner(
            slk, lval_rows, srk, rval_rows, cap_out)
        ok = jnp.take(slk, jnp.clip(li, 0, slk.shape[0] - 1))
        out_k = jnp.where(li >= 0, ok, -1)
        out_l = jnp.where(li >= 0,
                          jnp.take(slv, jnp.clip(li, 0, slv.shape[0] - 1)), 0)
        # ri is a key-sorted right RANK: pre-permute the payload once
        # (build-sized gather), then the per-pair gather rides ranks
        srv_ranked = jnp.take(srv, jnp.clip(rperm, 0, srv.shape[0] - 1))
        out_r = jnp.where(ri >= 0,
                          jnp.take(srv_ranked,
                                   jnp.clip(ri, 0, srv.shape[0] - 1)), 0)
        overflow = jax.lax.pmax(
            (lov | rov | jov).astype(jnp.int32), SHARD_AXIS).astype(jnp.bool_)
        return out_k, out_l, out_r, n_out.reshape(1), overflow

    spec = P(SHARD_AXIS)
    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec,) * 6,
                   out_specs=(spec, spec, spec, spec, P()))
    return jax.jit(fn)
