"""Distributed sort over the device mesh: sample-based range partitioning
+ all_to_all exchange + local sort (SURVEY.md §7 step 8 — the TPU-native
"sort-merge of sorted shards"; the reference's multi-chunk analog is the
stable merge of sorted spans, arrow/compute/internal/kernels/
vector_sort.go:254-388 mergeAdjacentStable).

Mechanism inversion: instead of merging sorted runs pointer-style (a
serial, branchy pattern), every shard samples its keys, the sample union
yields D-1 range splitters, rows travel to their range's shard via one
all_to_all over ICI, and each shard runs one vectorized lax.sort. The
concatenation of shard outputs is globally sorted. Static shapes: the
exchange reuses the capacity-bounded slot-matrix pack of
parallel/shuffle.py (overflow flag + host retry).

Invalid (null) rows are dropped by the exchange, matching the shuffle
contract; callers wanting null placement handle nulls before/after.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..jaxenv import jax, jnp

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS
from .shuffle import _pack_for_send


class DistSortResult(NamedTuple):
    keys: jax.Array      # [N] row-sharded; each shard: sorted valid rows
    payload: tuple       # payload columns, permuted with the keys
    counts: jax.Array    # [D] valid rows per shard (concat order = global)
    overflow: jax.Array  # scalar bool


def _sentinel_for(dtype):
    d = jnp.dtype(dtype)
    if jnp.issubdtype(d, jnp.floating):
        return jnp.array(jnp.inf, d)
    return jnp.array(jnp.iinfo(d).max, d)


def make_distributed_sort(mesh: Mesh, cap: int, n_payload: int = 0,
                          n_samples: int = 64):
    """Build the jitted distributed ascending sort.

    Inputs (row-sharded over `mesh`): keys[N], valid[N], *payload[N].
    Output: DistSortResult — shard d's first counts[d] rows are sorted and
    every key on shard d <= every key on shard d+1, so reading shards in
    order yields the global ascending order.
    """
    D = mesh.devices.size

    def body(keys, valid, *payload):
        sent = _sentinel_for(keys.dtype)
        k = jnp.where(valid, keys, sent)
        L = k.shape[0]

        # 1. splitters from a per-shard sample of the sorted local keys
        sk = jnp.sort(k)
        pos = (jnp.arange(n_samples, dtype=jnp.int32)
               * jnp.int32(max(L // n_samples, 1))) % jnp.int32(L)
        sample = jnp.take(sk, pos)
        all_samples = jax.lax.all_gather(sample, SHARD_AXIS).reshape(-1)
        flat = jnp.sort(all_samples)
        S = flat.shape[0]
        qpos = (jnp.arange(1, D, dtype=jnp.int32) * S) // D
        splitters = jnp.take(flat, qpos)            # [D-1]

        # 2. destination shard per row = range bucket
        dest = jnp.searchsorted(splitters, k, side="right").astype(jnp.int32)

        # 3. capacity-bounded all_to_all exchange (shuffle machinery)
        packed, counts, overflow = _pack_for_send(
            dest, valid, D, cap, (keys,) + payload)
        received = [jax.lax.all_to_all(p, SHARD_AXIS, split_axis=0,
                                       concat_axis=0, tiled=True)
                    for p in packed]
        recv_counts = jax.lax.all_to_all(counts, SHARD_AXIS, split_axis=0,
                                         concat_axis=0, tiled=True)
        any_overflow = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)

        # 4. local sort of the valid received rows (invalid -> sentinel,
        # which sorts to the tail and is excluded by n_local)
        slot = jnp.arange(D * cap, dtype=jnp.int32) % cap
        src = jnp.arange(D * cap, dtype=jnp.int32) // cap
        rmask = slot < jnp.take(recv_counts, src)
        rkeys = jnp.where(rmask, received[0].reshape(-1), sent)
        order = jnp.argsort(rkeys)
        out_keys = jnp.take(rkeys, order)
        out_payload = tuple(jnp.take(r.reshape(-1), order)
                            for r in received[1:])
        n_local = jnp.sum(recv_counts).astype(jnp.int32)
        return out_keys, out_payload, \
            n_local.reshape(1), any_overflow.astype(jnp.bool_)

    spec = P(SHARD_AXIS)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, spec) + (spec,) * n_payload,
                   out_specs=(spec, (spec,) * n_payload, spec, P()))

    def run(keys, valid, *payload) -> DistSortResult:
        out_keys, out_payload, counts, overflow = fn(keys, valid, *payload)
        return DistSortResult(out_keys, out_payload, counts, overflow)

    return jax.jit(run)
