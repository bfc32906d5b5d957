"""Extended benchmark suite: the BASELINE.json north-star configs.

Run on real TPU:      python benchmarks/suite.py
Run on CPU (smoke):   PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/suite.py --small

Configs (BASELINE.json):
  1. Int64/Float64 Sum over arrays (arrow/math bench)
  2. Filter + take on int64/float64 rows with validity bitmaps
  3. Hash aggregate: GROUP BY low/high-cardinality keys, sum/count
  4. Sort on 64-bit keys
  5. Hash join (single-chip local kernel; distributed variant needs chips)

Each prints a json line: {"bench", "rows_per_s", "gb_per_s", "ms"}.
Methodology: dependent chains defeat runtime memoization; median of timed
iterations after compile warmup.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench(fn, args, iters=20):
    """Dependency-chain timing: every bench fn returns a device SCALAR that
    is folded into the next call's input, so the runtime can neither
    memoize nor ack-and-defer executions. Two chain lengths are timed and
    DIFFERENCED, cancelling the fixed dispatch/transfer overhead; each
    chain ends with a host materialization of the scalar, the only sync
    this runtime honors (its block_until_ready can return early)."""
    import jax.numpy as jnp

    def chain(k):
        carry = jnp.asarray(0, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(k):
            carry = fn(*args, carry)   # fns return a masked int32 scalar
        _block(carry)                  # host materialization = completion
        return time.perf_counter() - t0

    chain(1); chain(1)                 # compile + warm both paths
    lo, hi = max(iters // 4, 1), iters
    deltas = []
    for _ in range(3):
        t1, t2 = chain(lo), chain(hi)
        deltas.append((t2 - t1) / (hi - lo))
    deltas.sort()
    return max(deltas[len(deltas) // 2], 1e-9)   # median


def _block(out):
    import numpy as _np
    _np.asarray(out)   # device->host copy: the only true completion fence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import arrow_go_tpu as agt
    from arrow_go_tpu.device import to_device
    from arrow_go_tpu.ops import bitmap, hashing, reductions, selection, sort

    n = 1 << (20 if ns.small else 24)
    n_heavy = 1 << (18 if ns.small else 22)   # sort/group/join (bitonic cost)
    rng = np.random.default_rng(0)
    results = []

    def report(name, dt_s, rows, bytes_):
        import sys
        rec = {"bench": name, "rows_per_s": round(rows / dt_s, 0),
               "gb_per_s": round(bytes_ / dt_s / 1e9, 2),
               "ms": round(dt_s * 1e3, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # 1. masked sums
    for npdt, name in [(np.float64, "sum_f64"), (np.int64, "sum_i64"),
                       (np.float32, "sum_f32")]:
        vals = rng.integers(0, 1000, n).astype(npdt)
        mask = rng.random(n) < 0.95
        col = to_device(agt.from_numpy(vals, mask))

        @jax.jit
        def step(v, w, it):
            s_ = reductions.reduce_xla(v + it.astype(v.dtype), w, n, "sum")
            return (s_ - s_ // 4096 * 4096).astype(jnp.int32)

        dt_s = _bench(lambda it: step(col.values, col.validity, it), ())
        report(name, dt_s, n, vals.nbytes)

    # pallas variant (f32)
    vals = rng.integers(0, 1000, n).astype(np.float32)
    col = to_device(agt.from_numpy(vals, rng.random(n) < 0.95))

    @jax.jit
    def pallas_step(v, w, it):
        s_ = reductions.reduce_pallas(v + it.astype(v.dtype), w, n, "sum")
        return s_.astype(jnp.int32) & 4095
    dt_s = _bench(pallas_step, (col.values, col.validity))
    report("sum_f32_pallas", dt_s, n, vals.nbytes)

    # 2. filter + take
    vals = rng.integers(0, 1000, n).astype(np.int64)
    mask = rng.random(n) < 0.95
    col = to_device(agt.from_numpy(vals, mask))

    @jax.jit
    def filter_take(v, w, it):
        m = (v + it.astype(v.dtype)) > 500
        idx, cnt = selection.filter_indices(m, w, n)
        out = selection.gather(v, idx)
        return (cnt + out[0] + out[n // 2]).astype(jnp.int32)

    dt_s = _bench(lambda it: filter_take(col.values, col.validity, it), ())
    report("filter_take_i64", dt_s, n, vals.nbytes * 2)

    # 3. hash aggregate (low + high cardinality)
    for card, name in [(64, "group_by_low_card"), (1 << 16, "group_by_high_card")]:
        nh = n_heavy
        keys = rng.integers(0, card, nh).astype(np.int64)
        hvals = vals[:nh]
        kcol = to_device(agt.from_numpy(keys))
        vcol = to_device(agt.from_numpy(hvals))

        @jax.jit
        def agg(k, v, it):
            res = hashing.encode_codes(k + it.astype(k.dtype), agt.int64,
                                       None, nh)
            P = k.shape[0]
            s = jnp.zeros(P + 1, jnp.int64).at[
                jnp.where(res.codes >= 0, res.codes, P)].add(v, mode="drop")
            return (res.n_unique + s[0] + s[P // 2]).astype(jnp.int32)

        dt_s = _bench(agg, (kcol.values, vcol.values))
        report(name, dt_s, nh, keys.nbytes + hvals.nbytes)

    # 3b. hash-table group-by (open addressing, vs the sort-based core)
    from arrow_go_tpu.ops import hashtable
    for card, name in [(64, "group_by_hashtable_low"),
                       (1 << 16, "group_by_hashtable_high")]:
        nh = n_heavy
        keys = rng.integers(0, card, nh).astype(np.int64)
        hvals = vals[:nh]
        kcol = to_device(agt.from_numpy(keys))
        vcol = to_device(agt.from_numpy(hvals))
        Tsize = max(256, 1 << (int(card - 1).bit_length() + 1))

        @jax.jit
        def hagg(k, v, it):
            gk, s_, c_, occ, ng = hashtable.group_sum(
                k + it.astype(k.dtype), v,
                jnp.ones(k.shape[0], jnp.bool_), Tsize)
            return (ng + s_[0] + c_[0]).astype(jnp.int32)

        dt_s = _bench(hagg, (kcol.values, vcol.values))
        report(name, dt_s, nh, keys.nbytes + hvals.nbytes)

    # 4. sort on 64-bit keys
    keys = rng.integers(-10**12, 10**12, n_heavy).astype(np.int64)
    kcol = to_device(agt.from_numpy(keys))

    @jax.jit
    def do_sort(k, it):
        op = sort.sort_key(k + it.astype(k.dtype), agt.int64, None, n_heavy)
        perm = sort.argsort_single(op)
        return (perm[0] + perm[n_heavy // 2] + perm[-1]).astype(jnp.int32)

    dt_s = _bench(do_sort, (kcol.values,))
    report("sort_i64", dt_s, n_heavy, keys.nbytes)

    # 5. local hash join kernel
    n = n_heavy
    m = n // 4
    lk = rng.integers(0, n // 8, n).astype(np.int64)
    rk = rng.integers(0, n // 8, m).astype(np.int64)
    from arrow_go_tpu.parallel.join import local_join_inner
    lkd = to_device(agt.from_numpy(lk))
    rkd = to_device(agt.from_numpy(rk))
    cap = 4 * n

    @jax.jit
    def do_join(l, r, it):
        lv = jnp.ones(l.shape[0], jnp.bool_)
        rv = jnp.ones(r.shape[0], jnp.bool_)
        li, ri, total, ov = local_join_inner(l + it.astype(l.dtype), lv,
                                             r + it.astype(r.dtype), rv, cap)
        return (total + li[0] + ri[cap // 2]).astype(jnp.int32)

    dt_s = _bench(do_join, (lkd.values, rkd.values))
    report("hash_join_local", dt_s, n + m, lk.nbytes + rk.nbytes)

    # 6. parquet scan (host decode path; reference
    #    parquet/internal/encoding/encoding_benchmarks_test.go configs)
    import io as _io
    nh = n_heavy
    # 8 incompressible float64 columns: the codec-bound scan shape where
    # the threaded per-field fan-out pays (strings are GIL-bound python
    # decode and are covered by tests, not this throughput config)
    pt = agt.table({f"c{i}": agt.from_numpy(rng.standard_normal(nh))
                    for i in range(8)})
    from arrow_go_tpu import parquet as pq
    buf = _io.BytesIO()
    pq.write_table(pt, buf, compression="zstd",
                   row_group_size=max(nh // 8, 1024))
    blob = buf.getvalue()
    for use_threads, name in [(False, "parquet_scan_serial"),
                              (True, "parquet_scan_threads")]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = pq.ParquetFile(blob).read_table(use_threads=use_threads)
            ts.append(time.perf_counter() - t0)
        assert out.num_rows == nh
        report(name, float(np.median(ts)), nh, len(blob))

    print(json.dumps({"suite": "done", "n": n,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
