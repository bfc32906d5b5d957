"""Compute/communication-overlapped distributed aggregation.

North-star requirement: "exchange overlapped with compute via async
collectives over ICI". The barrier form (parallel/aggregate.py) runs ONE
all_to_all of everything, then aggregates. The streamed form here splits
the local rows into C chunks and unrolls

    exchange(chunk 0) -> aggregate(chunk 0) | exchange(chunk 1) -> ...

inside one jitted program. Aggregation of chunk c has no data dependency
on the exchange of chunk c+1, so XLA's latency-hiding scheduler issues
the next collective's async-start before the previous chunk's
scatter-adds finish — on TPU the all_to_all rides ICI concurrently with
VPU work (collective-start/collective-done async pairs). The per-chunk
received rows accumulate into one persistent open-addressing hash table
in HBM (ops/hashtable.build with resume), so group identities are exact
across chunks and no final re-merge is needed.

bench_overlap() measures barrier vs streamed wall-clock on the current
mesh and is wired into benchmarks/suite.py.
"""
from __future__ import annotations

import time
from ..jaxenv import jax, jnp
from ..ops import hashing, hashtable

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS
from . import shuffle as shuf


def make_group_by_sum_streamed(mesh: Mesh, cap: int, n_chunks: int,
                               table_size: int):
    """Chunk-pipelined distributed GROUP BY key -> sum(value), count(*).

    Inputs (row-sharded): keys[N] int64, values[N], valid[N] bool.
    Outputs per shard: table_keys[T], sums[T], counts[T], occupied[T],
    n_groups[1], overflow. Group results live in hash-slot order.
    """
    D = mesh.devices.size
    T = table_size

    def step(keys, values, valid):
        L = keys.shape[0]
        chunk = L // n_chunks
        dest = shuf.partition_of(hashing.hash32(keys), D)

        # accumulators must be marked shard-varying for the while_loop
        # carries inside hashtable.build
        def vary(x):
            return jax.lax.pcast(x, (SHARD_AXIS,), to="varying")

        table_keys = vary(jnp.zeros(T, keys.dtype))
        occupied = vary(jnp.zeros(T, jnp.bool_))
        sums = vary(jnp.zeros(T, values.dtype))
        counts = vary(jnp.zeros(T, jnp.int32))
        overflow = vary(jnp.asarray(False))

        # static unroll: exchange c+1 is independent of aggregate c, so
        # the async scheduler overlaps them
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            packed, pcnt, ovf = shuf._pack_for_send(
                dest[sl], valid[sl], D, cap, (keys[sl], values[sl]))
            rk = jax.lax.all_to_all(packed[0], SHARD_AXIS, split_axis=0,
                                    concat_axis=0, tiled=True).reshape(-1)
            rv = jax.lax.all_to_all(packed[1], SHARD_AXIS, split_axis=0,
                                    concat_axis=0, tiled=True).reshape(-1)
            rcnt = jax.lax.all_to_all(pcnt, SHARD_AXIS, split_axis=0,
                                      concat_axis=0, tiled=True)
            rvalid = shuf.row_validity_mask(rk, rcnt, cap)
            ht = hashtable.build(rk, rvalid, T, init_keys=table_keys,
                                 init_occupied=occupied)
            table_keys, occupied = ht.keys, ht.occupied
            slot = jnp.where(ht.slots >= 0, ht.slots, T)
            sums = sums.at[jnp.clip(slot, 0, T - 1)].add(
                jnp.where(rvalid & (ht.slots >= 0), rv,
                          jnp.zeros((), rv.dtype)))
            counts = counts.at[jnp.clip(slot, 0, T - 1)].add(
                jnp.where(rvalid & (ht.slots >= 0), 1, 0))
            overflow = overflow | ovf

        n_groups = jnp.sum(occupied.astype(jnp.int32))
        ov = jax.lax.pmax(overflow.astype(jnp.int32),
                          SHARD_AXIS).astype(jnp.bool_)
        return (table_keys, sums, counts, occupied,
                n_groups.reshape(1), ov)

    spec = P(SHARD_AXIS)
    fn = shard_map(step, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=(spec, spec, spec, spec, spec, P()))
    return jax.jit(fn)


def bench_overlap(mesh: Mesh, n_rows_per_shard: int = 1 << 16,
                  n_keys: int = 512, n_chunks: int = 4, repeats: int = 5):
    """Wall-clock: barrier all_to_all + aggregate vs chunk-pipelined.
    Returns (barrier_s, streamed_s) medians."""
    import numpy as np
    from . import aggregate
    from .mesh import row_sharding

    D = mesh.devices.size
    N = n_rows_per_shard * D
    rng = np.random.default_rng(0)
    sh = row_sharding(mesh)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, n_keys, N).astype(np.int64)), sh)
    vals = jax.device_put(jnp.asarray(
        rng.integers(0, 100, N).astype(np.int64)), sh)
    valid = jax.device_put(jnp.ones(N, jnp.bool_), sh)

    cap = n_rows_per_shard          # worst-case: all rows to one dest
    barrier = aggregate.make_group_by_sum(mesh, cap)
    streamed = make_group_by_sum_streamed(
        mesh, cap // n_chunks + n_keys, n_chunks, table_size=4 * n_keys)

    def timeit(fn):
        out = fn(keys, vals, valid)
        jax.block_until_ready(out)          # compile + warm
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(keys, vals, valid))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    return timeit(barrier), timeit(streamed)
