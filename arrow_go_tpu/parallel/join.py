"""Distributed hash join over the device mesh (north-star config #5).

Both sides hash-partition by key over the shards (shuffle.py all_to_all
over ICI); each shard then runs a fully-traced local SORT-MERGE join
with a capacity-bounded pair expansion (see local_join_inner for the
TPU cost model). No host syncs inside the step — output counts and
overflow flags come back as device scalars, so the whole distributed
join is ONE jitted XLA program.
"""
from __future__ import annotations

from typing import Tuple

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


def local_join_inner(lkeys, lvalid, rkeys, rvalid, cap_out: int,
                     how: str = "inner"):
    """Traced join on one shard — SORT-MERGE over both sides at once.

    TPU rationale (benchmarks/roofline_probe4.py): `searchsorted` costs
    ~430 ms per 16M queries on v5e while `lax.sort` is ~50 ms and cumsum/
    cummax are ~5 ms, so the probe phase is ONE combined sort of
    [right; left] with a side flag (rights sort before lefts within a
    key), match counts fall out of prefix sums, and the pair expansion
    maps output slot -> sorted position with a scatter-max + cummax fill
    instead of a binary search.

    how: 'inner' | 'left outer' | 'right outer' | 'full outer'.
    Returns (li[cap_out], ri[cap_out], n_out, overflow): local row indices
    of matched pairs; slots >= n_out are padding (-1).
    """
    PL, PR = lkeys.shape[0], rkeys.shape[0]
    N = PL + PR
    keys_all = jnp.concatenate([rkeys, lkeys])
    valid_all = jnp.concatenate([rvalid, lvalid])
    side = jnp.concatenate([jnp.zeros(PR, jnp.int32),
                            jnp.ones(PL, jnp.int32)])
    orig = jnp.concatenate([jnp.arange(PR, dtype=jnp.int32),
                            jnp.arange(PL, dtype=jnp.int32)])
    flag = (~valid_all).astype(jnp.int32)
    k_u = jax.lax.bitcast_convert_type(keys_all, jnp.uint64) \
        ^ (jnp.uint64(1) << 63)
    khi = (k_u >> jnp.uint64(32)).astype(jnp.uint32)
    klo = k_u.astype(jnp.uint32)
    sflag, shi, slo, sside, sorig = jax.lax.sort(
        (flag, khi, klo, side, orig), num_keys=4, is_stable=True)
    pos = jnp.arange(N, dtype=jnp.int32)
    # run starts among valid rows (key change in sorted order)
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = ((shi != prev_hi) | (slo != prev_lo) | (pos == 0)) \
        & (sflag == 0)
    is_right = (sside == 0) & (sflag == 0)
    is_left = (sside == 1) & (sflag == 0)
    R_incl = jnp.cumsum(is_right.astype(jnp.int32))
    grp_start = jax.lax.cummax(jnp.where(start, pos, -1))
    grp_start_c = jnp.clip(grp_start, 0, N - 1)
    R_before = jnp.take(R_incl, grp_start_c) - \
        jnp.take(is_right, grp_start_c).astype(jnp.int32)
    counts_pos = jnp.where(is_left, R_incl - R_before, 0)
    if how in ("left outer", "full outer"):
        emit_pos = jnp.where(is_left, jnp.maximum(counts_pos, 1), 0)
    else:
        emit_pos = counts_pos
    if how in ("right outer", "full outer"):
        # rights whose group has NO left emit one (li=-1, ri=self) row.
        # lefts follow rights within a group, so a right row needs the
        # group's TOTAL left count: lefts between group start and the
        # next group start (suffix-min gives the next start position).
        L_incl = jnp.cumsum(is_left.astype(jnp.int32))
        arr = jnp.where(start, pos, N)
        suffix_min = jax.lax.cummin(arr, reverse=True)
        next_start = jnp.concatenate(
            [suffix_min[1:], jnp.full(1, N, suffix_min.dtype)])
        L_at = jnp.concatenate([jnp.zeros(1, jnp.int32), L_incl])
        lefts_in_group = jnp.take(L_at, jnp.clip(next_start, 0, N)) - \
            jnp.take(L_at, jnp.clip(grp_start_c, 0, N))
        unmatched_right = is_right & (lefts_in_group == 0)
        emit_pos = emit_pos + unmatched_right.astype(jnp.int32)
    offsets = jnp.cumsum(emit_pos)
    total = offsets[-1] if N else jnp.asarray(0, jnp.int32)
    overflow = total > cap_out

    # right rank -> original right row id
    rank = R_incl - 1
    right_orig = jnp.zeros(max(PR, 1), jnp.int32).at[
        jnp.where(is_right, rank, PR)].set(sorig, mode="drop")

    # slot j -> pair: each emitting position scatters at its first output
    # slot; cummax forward-fills the runs. MONOTONE quantities (sorted
    # position, run start slot, right-rank base) fill directly — cummax
    # of a monotone sequence's marks yields the owning run's value — so
    # only li and ri need a gather each (probe4: per-slot random gathers
    # are the expensive primitive).
    starts_j = offsets - emit_pos
    tgt = jnp.where(emit_pos > 0, jnp.clip(starts_j, 0, cap_out - 1),
                    cap_out)
    rowpos = jax.lax.cummax(
        jnp.zeros(cap_out, jnp.int32).at[tgt].max(pos, mode="drop"))
    fill_start = jax.lax.cummax(
        jnp.zeros(cap_out, jnp.int32).at[tgt].max(starts_j, mode="drop"))
    fill_rbase = jax.lax.cummax(
        jnp.zeros(cap_out, jnp.int32).at[tgt].max(
            jnp.where(emit_pos > 0, R_before, 0), mode="drop"))
    j = jnp.arange(cap_out, dtype=jnp.int32)
    within = j - fill_start
    r_rank = fill_rbase + within
    in_range = j < total
    if how in ("left outer", "full outer"):
        fill_match = jax.lax.cummax(
            jnp.full(cap_out, -1, jnp.int32).at[tgt].max(
                jnp.where(counts_pos > 0, pos, -1), mode="drop"))
        has_match = fill_match == rowpos
    else:
        has_match = in_range
    owner_orig = jnp.take(sorig, rowpos)
    if how in ("right outer", "full outer"):
        # an emitting RIGHT position is an unmatched right: li=-1, ri=self
        owner_is_left = jnp.take(sside, rowpos) == 1
        li = jnp.where(in_range & owner_is_left, owner_orig, -1)
        ri = jnp.where(
            in_range & owner_is_left & has_match,
            jnp.take(right_orig, jnp.clip(r_rank, 0, max(PR - 1, 0))),
            jnp.where(in_range & ~owner_is_left, owner_orig, -1))
        return li, ri, total, overflow
    li = jnp.where(in_range, owner_orig, -1)
    ri = jnp.where(in_range & has_match,
                   jnp.take(right_orig, jnp.clip(r_rank, 0, max(PR - 1, 0))),
                   -1)
    return li, ri, total, overflow


def local_join_semi(lkeys, lvalid, rkeys, rvalid, how: str):
    """Traced semi/anti verdict per ORIGINAL left row (sort-merge probe,
    same cost model as local_join_inner). how: 'left semi'|'left anti'."""
    PL, PR = lkeys.shape[0], rkeys.shape[0]
    N = PL + PR
    keys_all = jnp.concatenate([rkeys, lkeys])
    valid_all = jnp.concatenate([rvalid, lvalid])
    side = jnp.concatenate([jnp.zeros(PR, jnp.int32),
                            jnp.ones(PL, jnp.int32)])
    orig = jnp.concatenate([jnp.arange(PR, dtype=jnp.int32),
                            jnp.arange(PL, dtype=jnp.int32)])
    flag = (~valid_all).astype(jnp.int32)
    k_u = jax.lax.bitcast_convert_type(keys_all, jnp.uint64) \
        ^ (jnp.uint64(1) << 63)
    khi = (k_u >> jnp.uint64(32)).astype(jnp.uint32)
    klo = k_u.astype(jnp.uint32)
    sflag, shi, slo, sside, sorig = jax.lax.sort(
        (flag, khi, klo, side, orig), num_keys=4, is_stable=True)
    pos = jnp.arange(N, dtype=jnp.int32)
    prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    start = ((shi != prev_hi) | (slo != prev_lo) | (pos == 0)) \
        & (sflag == 0)
    is_right = (sside == 0) & (sflag == 0)
    is_left = (sside == 1) & (sflag == 0)
    R_incl = jnp.cumsum(is_right.astype(jnp.int32))
    grp_start = jax.lax.cummax(jnp.where(start, pos, -1))
    grp_start_c = jnp.clip(grp_start, 0, N - 1)
    R_before = jnp.take(R_incl, grp_start_c) - \
        jnp.take(is_right, grp_start_c).astype(jnp.int32)
    matched = is_left & ((R_incl - R_before) > 0)
    out = jnp.zeros(PL, jnp.bool_).at[
        jnp.where(is_left, sorig, PL)].set(matched, mode="drop")
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
        li, ri, n_out, jov = local_join_inner(slk, lval_rows, srk, rval_rows,
                                              cap_out)
        ok = jnp.take(slk, jnp.clip(li, 0, slk.shape[0] - 1))
        out_k = jnp.where(li >= 0, ok, -1)
        out_l = jnp.where(li >= 0,
                          jnp.take(slv, jnp.clip(li, 0, slv.shape[0] - 1)), 0)
        out_r = jnp.where(ri >= 0,
                          jnp.take(srv, jnp.clip(ri, 0, srv.shape[0] - 1)), 0)
        overflow = jax.lax.pmax(
            (lov | rov | jov).astype(jnp.int32), SHARD_AXIS).astype(jnp.bool_)
        return out_k, out_l, out_r, n_out.reshape(1), overflow

    spec = P(SHARD_AXIS)
    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec,) * 6,
                   out_specs=(spec, spec, spec, spec, P()))
    return jax.jit(fn)
