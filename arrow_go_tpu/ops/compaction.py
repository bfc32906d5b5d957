"""Blocked compaction: the engine-wide stable-partition primitive.

TPU-native counterpart of the reference's selection compaction
(arrow/compute/internal/kernels/vector_selection.go:267 — bit-run
batched output writing). Every "move flagged rows to the front, keep
order" step here (filter, group-by run-boundary collection,
first-occurrence ranks) previously rode ONE full-height stable sort:
O(N log^2 N) compare levels at the full array height (24 bitonic levels
at 16M rows).

benchmarks/roofline_probe10.py bounds that design with this two-level
one (v5e, measured):

  1. batched per-block lax.sort over (P/B, B) — the SAME sort network
     but only 13 levels at B=8192, and each row fits VMEM:
     13.9 ms vs 63.9 ms for the global sort at 16M rows
  2. a sequential-grid Pallas "stitch" kernel writes block k's
     compacted prefix at its global offset (exclusive cumsum of
     per-block counts): 3.3 ms at 16M.  TPU grids execute sequentially
     on the core, so block k+1's window legitimately overwrites block
     k's garbage tail — the ragged concat needs no second sort and no
     scatter (XLA TPU scatter is serial: 113 ms/16M, probe4).

  filter 16M i64 @50%: 17.4 ms blocked vs 63.9 ms global  (3.7x)
  run-compaction 4M:    5.1 ms blocked vs 17.2 ms global  (3.4x)

Mosaic constraint: DMA row slices must be 8-sublane aligned (1024 i32
elements), so arbitrary offsets are realised as roll-and-merge — the
block is rotated by off%1024 in VMEM (dynamic pltpu.roll lane+sublane
rotates), the first partially-owned 8-row tile is merged with a
read-back of the already-written output head, and the whole window is
written at the aligned offset just below off.

Payloads travel as 32-bit lanes (the v5e X64-rewrite cannot feed s64
through a pallas custom call; f64 bitcasts do not lower either):
64-bit ints split arithmetically, f64 goes through the arithmetic IEEE
bit codec (ops/sort.f64_bits / f64_from_bits).

Non-TPU backends (the CPU test mesh) and short arrays keep the
global-sort path — identical semantics, same stability.
"""
from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple

from ..jaxenv import jax, jnp, on_tpu

BLOCK = 8192                   # rows per block: 64 KB i64 in VMEM, 13
                               # sort levels; must be a multiple of 1024
_MIN_BLOCKS = 4                # below this the global sort wins


# ---------------------------------------------------------------------------
# 32-bit lane codec
# ---------------------------------------------------------------------------

def _to_lanes(v: jax.Array) -> Tuple[List[jax.Array], Callable]:
    """Encode an array as i32/u32 lanes + a decoder back to its dtype."""
    d = jnp.dtype(v.dtype)
    # the stitch hands every lane back as i32; decoders re-type
    # bit-exactly (i32 -> u32 wraps = bit-preserving; u32 -> i64 is a
    # zero-extend, so 64-bit recombines route through u32 first)
    if d == jnp.bool_:
        return [v.astype(jnp.int32)], lambda ls: ls[0] != 0
    if d.kind in "iu" and d.itemsize <= 4:
        return [v], lambda ls, d=d: ls[0].astype(d)
    if d == jnp.float32:
        return ([jax.lax.bitcast_convert_type(v, jnp.uint32)],
                lambda ls: jax.lax.bitcast_convert_type(
                    ls[0].astype(jnp.uint32), jnp.float32))
    if d == jnp.float16:
        return ([jax.lax.bitcast_convert_type(v, jnp.uint16)
                 .astype(jnp.uint32)],
                lambda ls: jax.lax.bitcast_convert_type(
                    ls[0].astype(jnp.uint16), jnp.float16))
    if d.kind in "iu" and d.itemsize == 8:
        hi = (v >> 32).astype(jnp.int32)
        lo = v.astype(jnp.uint32)
        def dec64(ls, d=d):
            out = ((ls[0].astype(jnp.int64) << 32)
                   | ls[1].astype(jnp.uint32).astype(jnp.int64))
            return out.astype(d)
        return [hi, lo], dec64
    if d == jnp.float64:
        from .sort import f64_bits, f64_from_bits
        bits = f64_bits(v)
        hi = (bits >> jnp.uint64(32)).astype(jnp.uint32)
        lo = bits.astype(jnp.uint32)
        def decf64(ls):
            b = ((ls[0].astype(jnp.uint32).astype(jnp.uint64)
                  << jnp.uint64(32))
                 | ls[1].astype(jnp.uint32).astype(jnp.uint64))
            return f64_from_bits(b)
        return [hi, lo], decf64
    raise NotImplementedError(f"compaction lane dtype {d}")


# ---------------------------------------------------------------------------
# the stitch kernel
# ---------------------------------------------------------------------------

def _stitch(offs: jax.Array, lanes: Sequence[jax.Array], nb: int):
    """lanes: (nb, BLOCK) i32/u32 arrays; block k's row lands flat at
    offs[k]. Returns flat (nb*BLOCK,) arrays (tail past the total count
    is garbage, as everywhere in the padded-domain convention)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pay = len(lanes)
    r_blk = BLOCK // 128
    r = r_blk + 8

    def kernel(offs_ref, *refs):
        ins = refs[:n_pay]
        outs = refs[n_pay:2 * n_pay]
        head_s, x_s, buf_s, sems = refs[2 * n_pay:]
        k = pl.program_id(0)
        off = offs_ref[k]
        q = jax.lax.div(off, jnp.int32(1024))
        arow = pl.multiple_of(q * jnp.int32(8), 8)
        rot = off - q * jnp.int32(1024)
        for i in range(n_pay):
            pltpu.make_async_copy(
                ins[i].at[pl.ds(k * r_blk, r_blk), :],
                x_s.at[jnp.int32(i)], sems.at[jnp.int32(i)]).start()
            pltpu.make_async_copy(
                outs[i].at[pl.ds(arow, 8), :], head_s.at[jnp.int32(i)],
                sems.at[jnp.int32(n_pay + i)]).start()
        lanerot = jax.lax.rem(rot, jnp.int32(128))
        rowshift = jax.lax.div(rot, jnp.int32(128))
        col = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)
        flat = row * jnp.int32(128) + col
        for i in range(n_pay):
            pltpu.make_async_copy(
                ins[i].at[pl.ds(k * r_blk, r_blk), :],
                x_s.at[jnp.int32(i)], sems.at[jnp.int32(i)]).wait()
            xp = jnp.concatenate(
                [x_s[jnp.int32(i)], jnp.zeros((8, 128), jnp.int32)],
                axis=0)
            y = pltpu.roll(xp, lanerot, axis=1)
            w = pltpu.roll(y, rowshift, axis=0)
            z = pltpu.roll(y, rowshift + jnp.int32(1), axis=0)
            rolled = jnp.where(col >= lanerot, w, z)
            pltpu.make_async_copy(
                outs[i].at[pl.ds(arow, 8), :], head_s.at[jnp.int32(i)],
                sems.at[jnp.int32(n_pay + i)]).wait()
            hext = jnp.concatenate(
                [head_s[jnp.int32(i)],
                 jnp.zeros((r - 8, 128), jnp.int32)], axis=0)
            buf_s[jnp.int32(i)] = jnp.where(flat < rot, hext, rolled)
            pltpu.make_async_copy(
                buf_s.at[jnp.int32(i)], outs[i].at[pl.ds(arow, r), :],
                sems.at[jnp.int32(2 * n_pay + i)]).start()
        for i in range(n_pay):
            pltpu.make_async_copy(
                buf_s.at[jnp.int32(i)], outs[i].at[pl.ds(arow, r), :],
                sems.at[jnp.int32(2 * n_pay + i)]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_pay,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_pay,
        scratch_shapes=[pltpu.VMEM((n_pay, 8, 128), jnp.int32),
                        pltpu.VMEM((n_pay, r_blk, 128), jnp.int32),
                        pltpu.VMEM((n_pay, r, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((3 * n_pay,))],
    )
    # window of the last block may extend one aligned tile past the end
    out_rows = nb * r_blk + r
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_rows, 128), jnp.int32)
                   for _ in lanes])
    flat_ins = [l.reshape(nb * r_blk, 128).astype(jnp.int32)
                for l in lanes]
    outs = fn(offs, *flat_ins)
    return [o.reshape(-1)[:nb * BLOCK] for o in outs]


# ---------------------------------------------------------------------------
# public: stable front-compaction of flagged rows
# ---------------------------------------------------------------------------

def _sort_compact(keep: jax.Array, payloads) -> tuple:
    """Fallback: ONE full-height stable sort on ~keep (original design)."""
    operands = ((~keep).astype(jnp.int32),) + tuple(payloads)
    res = jax.lax.sort(operands, num_keys=1, is_stable=True)
    return tuple(res[1:])


def compact_flagged(keep: jax.Array, payloads) -> tuple:
    """Stable-move rows where `keep` to the front of every payload.

    Entries [0, sum(keep)) of each output hold the kept rows in
    original order; the tail is garbage (padded-domain convention).
    Output length == input length.
    """
    P = keep.shape[0]
    payloads = tuple(payloads)
    if (not on_tpu()) or P < _MIN_BLOCKS * BLOCK:
        return _sort_compact(keep, payloads)
    pad = (-P) % BLOCK
    if pad:
        keep = jnp.concatenate([keep, jnp.zeros(pad, keep.dtype)])
        payloads = tuple(
            jnp.concatenate([p, jnp.zeros(pad, p.dtype)]) for p in payloads)
    Pp = P + pad
    nb = Pp // BLOCK

    lanes: List[jax.Array] = []
    decoders = []        # (decode_fn, lane_count)
    for p in payloads:
        ls, dec = _to_lanes(p)
        lanes.extend(ls)
        decoders.append((dec, len(ls)))

    m2 = keep.reshape(nb, BLOCK)
    flag = (~m2).astype(jnp.int32)
    c = jnp.sum(m2.astype(jnp.int32), axis=1)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(c, dtype=jnp.int32)[:-1]])
    sorted_ops = jax.lax.sort(
        (flag,) + tuple(l.reshape(nb, BLOCK) for l in lanes),
        num_keys=1, is_stable=True, dimension=-1)
    stitched = _stitch(offs, sorted_ops[1:], nb)

    outs = []
    i = 0
    for dec, k in decoders:
        outs.append(dec(stitched[i:i + k])[:P])
        i += k
    return tuple(outs)
