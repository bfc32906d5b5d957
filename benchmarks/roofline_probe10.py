"""Roofline probe v10: bound the sort-based compaction tier with
competing blocked/Pallas designs (VERDICT r4 #1).

The engine's compactions (filter, group-by run-boundary collection) are
ONE full-height stable sort: O(N log^2 N) compare stages at the FULL
array height. The competing design measured here is hierarchical:

  blocked compaction = batched per-block lax.sort (height B: 13 vs 24
  bitonic levels at 16M) + a sequential-grid Pallas "stitch" kernel
  that DMA-writes each block's compacted prefix at its global offset
  (exclusive cumsum of per-block counts). TPU Pallas grids execute
  sequentially on the core, so block k+1's window legitimately
  overwrites block k's garbage tail — the ragged concat needs no
  second sort and no scatter.

Also bounded here (analysis, not run): a one-hot-matmul in-block
compaction (compacted = onehot(dest)^T @ values on the MXU) costs
N*B*128 MACs with the 128-wide MXU minimum — at B=1024 that is 22 ms of
pure f32 MXU time for 16M rows, strictly worse than the measured
blocked sort, so it is not a contender.

Configs (suite shapes: filter 16M rows ~50% selectivity, group-by 4M):
  filter_sort3_16M    — current filter_with_payload (flag, null, v) sort
  filter_sort2_16M    — drop-nulls fast path: (flag, v) only
  blocksort2_16M      — the batched (nb, B) 2-lane sort alone
  stitch_16M          — the Pallas stitch kernel alone
  filter_blocked_16M  — full blocked filter (sort + counts + stitch)
  gb_tail_4M          — current segment_sum_count tail (cumsums+compact)
  cumsum_i64_4M       — chunked_cumsum alone
  compact_runs_4M     — the full-height boundary compaction sort alone
  compact_blocked_4M  — blocked compaction of the same boundaries
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

L2 = 17
REPEATS = 5
B = 8192  # block height: VMEM-friendly, 13 sort levels


def make_stitch(nb: int, bsz: int, dtypes, out_pad: int):
    """Pallas sequential stitch: payload i's (nb, bsz) blocks -> flat
    compacted arrays where block k's data lands at offs[k] (arbitrary,
    unaligned). TPU grids execute sequentially, so block k+1's window
    legitimately overwrites block k's garbage tail — the ragged concat
    needs no second sort and no scatter.

    Mosaic requires DMA row slices aligned to 8 sublanes (1024 i32
    elements), so unaligned offsets are realised as roll-and-merge:
    the block is rotated by off%1024 in VMEM (dynamic pltpu.roll lane +
    sublane rotates), the first partially-owned 8-row tile is merged
    with a read-back of the already-written output head, and the whole
    window is written at the aligned offset below off."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pay = len(dtypes)
    assert bsz % 1024 == 0
    r_blk = bsz // 128
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
                outs[i].at[pl.ds(arow, 8), :],
                head_s.at[jnp.int32(i)],
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
                [x_s[jnp.int32(i)], jnp.zeros((8, 128), jnp.int32)], axis=0)
            y = pltpu.roll(xp, lanerot, axis=1)
            w = pltpu.roll(y, rowshift, axis=0)
            z = pltpu.roll(y, rowshift + jnp.int32(1), axis=0)
            rolled = jnp.where(col >= lanerot, w, z)
            pltpu.make_async_copy(
                outs[i].at[pl.ds(arow, 8), :], head_s.at[jnp.int32(i)],
                sems.at[jnp.int32(n_pay + i)]).wait()
            hext = jnp.concatenate(
                [head_s[jnp.int32(i)], jnp.zeros((r - 8, 128), jnp.int32)],
                axis=0)
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
    out_rows = (nb * bsz + out_pad + 1024 + 1023) // 1024 * 8
    out_shapes = [jax.ShapeDtypeStruct((out_rows, 128), jnp.int32)
                  for _ in dtypes]
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=out_shapes)

    def stitch(offs, payload_blocks):
        flat = [p.reshape(nb * r_blk, 128).astype(jnp.int32)
                for p in payload_blocks]
        outs = fn(offs, *flat)
        return tuple(o.reshape(-1)[:nb * bsz + out_pad].astype(d)
                     for o, d in zip(outs, dtypes))
    return stitch


def split64(v):
    """i64 -> (hi i32, lo u32) arithmetic split (the X64-rewrite pass on
    this backend cannot feed s64 through a pallas custom call)."""
    import jax.numpy as jnp
    return ((v >> 32).astype(jnp.int32),
            v.astype(jnp.uint32))


def combine64(hi, lo):
    import jax.numpy as jnp
    return (hi.astype(jnp.int64) << 32) | lo.astype(jnp.int64)


def blocked_filter(mask, payload, n, stitch):
    """Competing filter: batched per-block sort + stitch. Returns
    (compacted payload incl. B-slot pad tail, count)."""
    import jax.numpy as jnp
    import jax
    nb = n // B
    m2 = mask.reshape(nb, B)
    flag = (~m2).astype(jnp.int32)
    v2 = payload.reshape(nb, B)
    c = jnp.sum(m2.astype(jnp.int32), axis=1)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(c, dtype=jnp.int32)[:-1]])
    _, sv = jax.lax.sort((flag, v2), num_keys=1, is_stable=True,
                         dimension=-1)
    hi, lo = split64(sv)
    ohi, olo = stitch(offs, (hi, lo))
    return combine64(ohi, olo), jnp.sum(c)


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import hashing, selection
    from arrow_go_tpu.ops import groupagg
    from arrow_go_tpu import dtypes as dt

    lax = jax.lax
    n = 1 << 24
    nh = 1 << 22
    nb = n // B
    nbh = nh // B

    stitch1_i64 = make_stitch(nb, B, [jnp.int32, jnp.uint32], B)
    stitch2_gb = make_stitch(nbh, B, [jnp.int32, jnp.uint32,
                                      jnp.int32, jnp.uint32], B)

    # ---- correctness fence (outside timing): blocked == sort filter ----
    iota = np.arange(n, dtype=np.int64)
    mvals = ((iota * 2654435761) % 1000).astype(np.int64)
    mask_np = mvals > 500
    jm, jv = jnp.asarray(mask_np), jnp.asarray(mvals)

    @jax.jit
    def check_blocked(m, v):
        return blocked_filter(m, v, n, stitch1_i64)
    out_b, cnt_b = check_blocked(jm, jv)
    cnt = int(cnt_b)
    expect = mvals[mask_np]
    got = np.asarray(out_b[:cnt])
    assert cnt == expect.shape[0], (cnt, expect.shape)
    assert np.array_equal(got, expect), "blocked filter mismatch"
    print(json.dumps({"check": "blocked_filter_exact", "ok": True,
                      "count": cnt}), flush=True)

    def make_program(which):
      @jax.jit
      def program(bias, Ls):
        iota32 = jnp.arange(n, dtype=jnp.int32)
        fvals0 = (hashing.hash32(iota32) % jnp.uint32(1000)).astype(jnp.int64)
        iota_h = jnp.arange(nh, dtype=jnp.int32)
        keys0 = (hashing.hash32(iota_h + jnp.int32(3))
                 % jnp.uint32(1 << 16)).astype(jnp.int64)
        hv0 = (hashing.hash32(iota_h) % jnp.uint32(1000)).astype(jnp.int64)
        # precomputed encode state (isolates the aggregation tail)
        enc0, (hv_s0,) = hashing.encode_sorted_with(
            keys0, dt.int64, None, nh, (hv0,))
        checks = []

        def chain(idx, body, init):
            def b(_, carry):
                k, acc = carry
                k = lax.dynamic_update_slice(
                    k, k[0:1] + bias.astype(k.dtype), (0,))
                return k, acc + body(k).astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (init, jnp.float64(0)))
            return acc

        def f_sort3(v):
            m = v > 500
            (out,), _nulls, cnt2 = selection.filter_with_payload(
                m, None, n, (v,))
            return cnt2 + out[0] + out[n // 2]

        def f_sort2(v):
            m = v > 500
            flag = (~m).astype(jnp.int32)
            cnt2 = jnp.sum(m.astype(jnp.int32))
            _, out = jax.lax.sort((flag, v), num_keys=1, is_stable=True)
            return cnt2 + out[0] + out[n // 2]

        def f_blocksort(v):
            m2 = (v > 500).reshape(nb, B)
            flag = (~m2).astype(jnp.int32)
            _, sv = jax.lax.sort((flag, v.reshape(nb, B)), num_keys=1,
                                 is_stable=True, dimension=-1)
            return sv[0, 0] + sv[nb // 2, B // 2]

        def f_stitch(v):
            # counts + stitch only (per-block data already "compacted":
            # window writes of the raw blocks)
            m2 = (v > 500).reshape(nb, B)
            c = jnp.sum(m2.astype(jnp.int32), axis=1)
            offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(c, dtype=jnp.int32)[:-1]])
            hi, lo = split64(v.reshape(nb, B))
            ohi, olo = stitch1_i64(offs, (hi, lo))
            out = combine64(ohi, olo)
            return out[0] + out[n // 2]

        def f_blocked(v):
            out, cnt2 = blocked_filter(v > 500, v, n, stitch1_i64)
            return cnt2 + out[0] + out[n // 2]

        def gb_tail(k):
            s, c = groupagg.segment_sum_count(enc0, hv0, None,
                                              values_sorted=hv_s0 + k[0])
            return s[0] + c[0] + s[nh // 2]

        def cumsum_tail(k):
            x = hv_s0 + k[0]
            cs = groupagg.chunked_cumsum(x)
            return cs[0] + cs[nh - 1]

        def compact_tail(k):
            last = jnp.concatenate([enc0.start[1:],
                                    jnp.ones(1, enc0.start.dtype)])
            cs = hv_s0 + k[0]
            a, b_ = groupagg.compact_runs(last, (cs, cs * 2))
            return a[0] + b_[nh // 2]

        def compact_blocked(k):
            last = jnp.concatenate([enc0.start[1:],
                                    jnp.ones(1, enc0.start.dtype)])
            cs = hv_s0 + k[0]
            m2 = last.reshape(nbh, B)
            c = jnp.sum(m2.astype(jnp.int32), axis=1)
            offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(c, dtype=jnp.int32)[:-1]])
            flag = (~m2).astype(jnp.int32)
            _, s1, s2 = jax.lax.sort(
                (flag, cs.reshape(nbh, B), (cs * 2).reshape(nbh, B)),
                num_keys=1, is_stable=True, dimension=-1)
            h1, l1 = split64(s1)
            h2, l2 = split64(s2)
            oh1, ol1, oh2, ol2 = stitch2_gb(offs, (h1, l1, h2, l2))
            return combine64(oh1, ol1)[0] + combine64(oh2, ol2)[nh // 2]

        all_bodies = [
            (f_sort3, fvals0), (f_sort2, fvals0), (f_blocksort, fvals0),
            (f_stitch, fvals0), (f_blocked, fvals0),
            (gb_tail, keys0), (cumsum_tail, keys0), (compact_tail, keys0),
            (compact_blocked, keys0),
        ]
        sel = range(0, 5) if which == 0 else [4 + which]
        for i, gi in enumerate(sel):
            body, init = all_bodies[gi]
            checks.append(chain(i, body, init))
        return jnp.stack(checks)
      return program

    groups = [
        ["filter_sort3_16M", "filter_sort2_16M", "blocksort2_16M",
         "stitch_16M", "filter_blocked_16M"],
        ["gb_tail_4M"], ["cumsum_i64_4M"], ["compact_runs_4M"],
        ["compact_blocked_4M"],
    ]
    bias = jnp.float64(0)
    import os
    only = os.environ.get("P10_GROUPS")
    only_set = set(int(x) for x in only.split(",")) if only else None
    for which, configs in enumerate(groups):
        if only_set is not None and which not in only_set:
            continue
        program = make_program(which)
        K = len(configs)
        zeros = jnp.zeros(K, jnp.int32)
        t0 = time.perf_counter()
        np.asarray(program(bias, jnp.ones(K, jnp.int32)))
        print(json.dumps({"note": "compiled", "group": which, "s": round(
            time.perf_counter() - t0, 1)}), flush=True)

        def run(Ls):
            t0 = time.perf_counter()
            out = np.asarray(program(bias, Ls))
            return time.perf_counter() - t0, out

        for i, name in enumerate(configs):
            base_i = zeros.at[i].set(1)
            hi_i = zeros.at[i].set(L2)
            run(base_i); run(hi_i)
            deltas = []
            for _ in range(REPEATS):
                tb, _ = run(base_i)
                th, _ = run(hi_i)
                deltas.append((th - tb) / (L2 - 1))
            dt_ = max(float(np.median(deltas)), 1e-9)
            print(json.dumps({"bench": name, "ms": round(dt_ * 1e3, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
