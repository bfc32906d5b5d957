"""Distributed hash join over the device mesh (north-star config #5).

Both sides hash-partition by key over the shards (shuffle.py all_to_all
over ICI); each shard then runs a fully-traced local join: sort-build +
searchsorted-probe with a capacity-bounded pair expansion. No host syncs
inside the step — output counts and overflow flags come back as device
scalars, so the whole distributed join is ONE jitted XLA program.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

from ..jaxenv import jax, jnp
from ..device.block import row_mask
from ..ops import hashing

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS
from . import shuffle as shuf

BIG = jnp.int64(1) << 62


def local_join_inner(lkeys, lvalid, rkeys, rvalid, cap_out: int):
    """Traced inner join on one shard.

    Returns (li[cap_out], ri[cap_out], n_out, overflow): local row indices
    of matched pairs; slots >= n_out are padding.
    """
    PL, PR = lkeys.shape[0], rkeys.shape[0]
    rkey = jnp.where(rvalid, rkeys, BIG)
    r_iota = jnp.arange(PR, dtype=jnp.int32)
    # sort via two u32 lanes (TPU-native compares), recombine for the
    # binary-search probe
    rk_u = jax.lax.bitcast_convert_type(rkey, jnp.uint64) ^ (jnp.uint64(1) << 63)
    rhi = (rk_u >> jnp.uint64(32)).astype(jnp.uint32)
    rlo = rk_u.astype(jnp.uint32)
    shi, slo, ridx_sorted = jax.lax.sort((rhi, rlo, r_iota), num_keys=2,
                                         is_stable=True)
    rk_sorted = jax.lax.bitcast_convert_type(
        (shi.astype(jnp.uint64) << jnp.uint64(32)) | slo.astype(jnp.uint64),
        jnp.int64) ^ jnp.int64(-(2**63))
    lq = jnp.where(lvalid, lkeys, BIG - 1)
    lo = jnp.searchsorted(rk_sorted, lq, side="left", method="sort")
    hi = jnp.searchsorted(rk_sorted, lq, side="right", method="sort")
    counts = jnp.where(lvalid, hi - lo, 0).astype(jnp.int32)
    offsets = jnp.cumsum(counts)
    total = offsets[-1] if PL else jnp.asarray(0, jnp.int32)
    overflow = total > cap_out

    j = jnp.arange(cap_out, dtype=jnp.int32)
    row = jnp.searchsorted(offsets, j, side="right", method="sort").astype(jnp.int32)
    row_c = jnp.clip(row, 0, PL - 1)
    start = jnp.where(row_c > 0, offsets[jnp.maximum(row_c - 1, 0)], 0)
    start = jnp.where(row_c == 0, 0, start)
    within = j - start
    src = jnp.clip(lo[row_c] + within, 0, PR - 1)
    li = row_c
    ri = jnp.take(ridx_sorted, src)
    valid_out = j < total
    li = jnp.where(valid_out, li, -1)
    ri = jnp.where(valid_out, ri, -1)
    return li, ri, total, overflow


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
