"""Distributed hash-partition shuffle over the device mesh.

The TPU-native replacement for Flight's host-to-host record-batch streaming
(reference arrow/flight DoGet/DoPut): rows move between shards as an
all_to_all of capacity-bounded, size-bucketed blocks over ICI, inside
shard_map (SURVEY.md §7 step 7). Static-shape discipline: each shard packs
rows destined for partition p into a fixed-capacity slot matrix
[D, cap]; per-destination counts travel alongside; overflow is detected on
device and surfaced to the host, which retries with a larger capacity
(the documented count-then-materialize + capacity-retry pattern).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

from ..jaxenv import jax, jnp
from ..ops import hashing

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS


class ShuffleResult(NamedTuple):
    """Per-shard received rows (padded to capacity) + per-source counts."""
    data: Tuple[jax.Array, ...]   # each [D*cap] rows (local shard view)
    counts: jax.Array             # [D] rows received from each source shard
    overflow: jax.Array           # scalar bool (any send bucket overflowed)


def partition_of(keys_hash: jax.Array, n_parts: int) -> jax.Array:
    """Destination shard per row from a 32-bit key hash."""
    return (keys_hash % jnp.uint32(n_parts)).astype(jnp.int32)


def _pack_for_send(dest: jax.Array, valid: jax.Array, n_parts: int, cap: int,
                   columns: Sequence[jax.Array]):
    """Scatter rows into a [n_parts, cap] slot matrix per column."""
    L = dest.shape[0]
    dest = jnp.where(valid, dest, n_parts)         # invalid -> dropped
    # slot within destination bucket: stable rank of the row among rows
    # with the same destination = sort by dest then position
    order = jnp.argsort(dest, stable=True)         # rows grouped by dest
    sorted_dest = jnp.take(dest, order)
    iota = jnp.arange(L, dtype=jnp.int32)
    first_of_dest = jnp.zeros(n_parts + 2, jnp.int32).at[
        jnp.clip(sorted_dest + 1, 0, n_parts + 1)].add(1)
    start = jnp.cumsum(first_of_dest)              # start offset per dest
    slot_sorted = iota - jnp.take(start, sorted_dest)
    # scatter back to original row order
    slot = jnp.zeros(L, jnp.int32).at[order].set(slot_sorted)
    counts = jnp.zeros(n_parts + 1, jnp.int32).at[
        jnp.clip(dest, 0, n_parts)].add(1)
    overflow = jnp.any(counts[:n_parts] > cap)
    flat = dest * cap + jnp.clip(slot, 0, cap - 1)
    flat = jnp.where((dest < n_parts) & (slot < cap), flat, n_parts * cap)
    packed = []
    for col in columns:
        buf = jnp.zeros((n_parts * cap,), col.dtype)
        buf = buf.at[flat].set(col, mode="drop")
        packed.append(buf.reshape(n_parts, cap))
    return packed, counts[:n_parts], overflow


def shuffle_shard_fn(n_parts: int, cap: int):
    """Returns the per-shard body: (dest, valid, *cols) -> ShuffleResult
    pieces. Use inside shard_map with axis SHARD_AXIS."""

    def body(dest, valid, *cols):
        packed, counts, overflow = _pack_for_send(dest, valid, n_parts, cap,
                                                  cols)
        # exchange: row-blocks to their destination shards
        received = [jax.lax.all_to_all(p, SHARD_AXIS, split_axis=0,
                                       concat_axis=0, tiled=True)
                    for p in packed]
        recv_counts = jax.lax.all_to_all(counts, SHARD_AXIS, split_axis=0,
                                         concat_axis=0, tiled=True)
        any_overflow = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)
        return tuple(r.reshape(-1) for r in received), recv_counts, \
            any_overflow.astype(jnp.bool_)

    return body


def make_shuffle(mesh: Mesh, n_cols: int, cap: int):
    """Build the jitted distributed shuffle over `mesh`.

    Inputs (global, row-sharded): dest[N], valid[N], cols[N]...
    Outputs (row-sharded): received cols [D*D*cap], counts [D*D], overflow.
    """
    D = mesh.devices.size
    body = shuffle_shard_fn(D, cap)
    spec = P(SHARD_AXIS)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, spec) + (spec,) * n_cols,
                   out_specs=((spec,) * n_cols, spec, P()))
    return jax.jit(fn)


def row_validity_mask(received: jax.Array, counts: jax.Array, cap: int):
    """Bool mask over a received [D*cap]-flattened buffer: rows < counts[d]."""
    D = counts.shape[0]
    slot = jnp.arange(D * cap, dtype=jnp.int32) % cap
    src = jnp.arange(D * cap, dtype=jnp.int32) // cap
    return slot < jnp.take(counts, src)
