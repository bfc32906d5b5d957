"""Vectorized open-addressing hash table in HBM.

The TPU answer to the reference's CPython-style perturbation-probing
HashTable (internal/hashing/xxh3_memo_table_types.go:112-155): a whole
column probes in parallel. Each round is a handful of gathers/scatters:

  1. unresolved rows compute pos = (h + round) mod T
  2. claim: scatter-min of row id per slot picks one writer per slot
  3. winners whose slot is empty insert their key
  4. every unresolved row re-reads its slot: key match -> resolved

`lax.while_loop` carries the round counter, so chain length adapts to the
data with no recompilation (SURVEY.md §7 hard parts: multi-round conflict
resolution for scatter-insert).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

from ..jaxenv import jax, jnp
from . import hashing


class HashTable(NamedTuple):
    keys: jax.Array       # [T] stored keys (valid where occupied)
    occupied: jax.Array   # [T] bool
    slots: jax.Array      # [P] slot per input row (-1 for invalid rows)
    n_groups: jax.Array   # scalar int32


def build(keys: jax.Array, valid: jax.Array, table_size: int,
          init_keys=None, init_occupied=None) -> HashTable:
    """Insert all valid rows' keys; equal keys share a slot.

    init_keys/init_occupied: resume from an existing table (the streamed
    chunked-aggregation path in parallel/overlap.py inserts chunk after
    chunk into one persistent table)."""
    P = keys.shape[0]
    T = table_size
    h = (hashing.hash32(keys) % jnp.uint32(T)).astype(jnp.int32)
    rowid = jnp.arange(P, dtype=jnp.int32)

    def cond(state):
        _, _, unresolved, r = state
        return jnp.any(unresolved) & (r < T)

    def body(state):
        table_keys, occupied, unresolved, r = state
        pos = (h + r) % T
        # one writer per contested slot
        claim = jnp.full(T, P, jnp.int32).at[
            jnp.where(unresolved, pos, T)].min(
            jnp.where(unresolved, rowid, P), mode="drop")
        winner = unresolved & (jnp.take(claim, pos) == rowid)
        empty = ~jnp.take(occupied, pos)
        do_write = winner & empty
        table_keys = table_keys.at[jnp.where(do_write, pos, T)].set(
            keys, mode="drop")
        occupied = occupied.at[jnp.where(do_write, pos, T)].set(
            True, mode="drop")
        # resolution check for every unresolved row
        slot_key = jnp.take(table_keys, pos)
        slot_occ = jnp.take(occupied, pos)
        matched = unresolved & slot_occ & (slot_key == keys)
        unresolved = unresolved & ~matched
        return table_keys, occupied, unresolved, r + 1

    # derive shard-varying-ness from the inputs so while_loop carries
    # type-match when running inside shard_map (zeros alone would be
    # replicated); outside shard_map these are no-ops
    zvar = keys.sum() * 0
    table_keys0 = (init_keys if init_keys is not None
                   else jnp.zeros(T, keys.dtype) + zvar)
    occupied0 = (init_occupied if init_occupied is not None
                 else jnp.zeros(T, jnp.bool_) | (zvar > 0))
    state = (table_keys0, occupied0, valid, jnp.asarray(0, jnp.int32))
    table_keys, occupied, _, _ = jax.lax.while_loop(cond, body, state)

    # final slot per row (re-probe; chains are short so a bounded fori
    # re-walk keeps this one fused pass per round)
    def find_cond(s):
        slots, unresolved, r = s
        return jnp.any(unresolved) & (r < T)

    def find_body(s):
        slots, unresolved, r = s
        pos = (h + r) % T
        hit = unresolved & jnp.take(occupied, pos) & \
            (jnp.take(table_keys, pos) == keys)
        slots = jnp.where(hit, pos, slots)
        unresolved = unresolved & ~hit
        return slots, unresolved, r + 1

    slots0 = jnp.full(P, -1, jnp.int32) + h * 0
    slots, _, _ = jax.lax.while_loop(
        find_cond, find_body, (slots0, valid, jnp.asarray(0, jnp.int32)))
    n_groups = jnp.sum(occupied.astype(jnp.int32))
    return HashTable(table_keys, occupied, slots, n_groups)


def group_sum(keys: jax.Array, values: jax.Array, valid: jax.Array,
              table_size: int):
    """Hash-based GROUP BY sum/count: returns (group_keys[T], sums[T],
    counts[T], occupied[T], n_groups). Slot order is hash order."""
    ht = build(keys, valid, table_size)
    T = table_size
    slot = jnp.where(ht.slots >= 0, ht.slots, T)
    sums = jnp.zeros(T + 1, values.dtype).at[slot].add(
        jnp.where(valid, values, jnp.zeros((), values.dtype)), mode="drop")
    counts = jnp.zeros(T + 1, jnp.int32).at[slot].add(
        jnp.where(valid, 1, 0), mode="drop")
    return ht.keys, sums[:T], counts[:T], ht.occupied, ht.n_groups


def probe(ht_keys: jax.Array, occupied: jax.Array, query: jax.Array,
          qvalid: jax.Array):
    """Membership probe against a built table: returns (found[Q], slot[Q])."""
    T = ht_keys.shape[0]
    Q = query.shape[0]
    h = (hashing.hash32(query) % jnp.uint32(T)).astype(jnp.int32)

    def cond(s):
        _, _, unresolved, r = s
        return jnp.any(unresolved) & (r < T)

    def body(s):
        slots, found, unresolved, r = s
        pos = (h + r) % T
        occ = jnp.take(occupied, pos)
        hit = unresolved & occ & (jnp.take(ht_keys, pos) == query)
        miss = unresolved & ~occ          # open slot -> key absent
        slots = jnp.where(hit, pos, slots)
        found = found | hit
        unresolved = unresolved & ~hit & ~miss
        return slots, found, unresolved, r + 1

    slots0 = jnp.full(Q, -1, jnp.int32) + h * 0
    found0 = jnp.zeros(Q, jnp.bool_) | ((h * 0) > 0)
    slots, found, _, _ = jax.lax.while_loop(
        cond, body, (slots0, found0, qvalid, jnp.asarray(0, jnp.int32)))
    return found, slots
