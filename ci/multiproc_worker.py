"""Worker for the multi-process distributed tier (ci/multiproc_run.py).

Each spawned process joins the jax distributed runtime, then the FULL
parallel/dist.py tier runs across the REAL process boundary: pre-
aggregating group-by (with value nulls), multi-key hash join, hot-key
broadcast join under Zipf skew, multi-key sort, and the chunk-pipelined
streamed shuffle. Every process verifies against a numpy oracle built
from the same seed; process 0 writes the result JSON.

The reference's distributed tests are inherently multi-process (real
loopback gRPC: arrow/internal/flight_integration/scenario.go:94); this
is the TPU-native equivalent — same operators as the in-process mesh,
now with Gloo/DCN transport underneath the shard_map collectives.
"""
import argparse
import collections
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--rows", type=int, default=1 << 14)
    ap.add_argument("--out", default="")
    ap.add_argument("--bench", action="store_true",
                    help="also time the group-by/shuffle steps")
    args = ap.parse_args()

    from arrow_go_tpu.parallel import multiproc
    mesh = multiproc.init_worker(args.process_id, args.num_processes,
                                 args.port)
    import jax
    import jax.numpy as jnp
    from arrow_go_tpu.parallel import dist, overlap

    D = mesh.devices.size
    N = args.rows
    rng = np.random.default_rng(12345)     # identical data on every process
    results = {"processes": args.num_processes,
               "local_devices": len(jax.local_devices()),
               "global_devices": D, "rows": N, "checks": {}}

    def put(*arrays):
        return [multiproc.global_put(mesh, np.asarray(a)) for a in arrays]

    # ---- 1. pre-aggregating group-by with value nulls ------------------
    keys = rng.integers(0, 200, N).astype(np.int64)
    vals = rng.integers(0, 100, N).astype(np.int64)
    vmask = rng.random(N) < 0.9
    gfn = dist.make_distributed_group_by(
        mesh, cap=max(512, N // D), n_keys=1,
        agg_specs=((0, "sum"), (0, "count"), (0, "min")), n_vals=1)
    ak, av, avl, avm = put(keys, vals, np.ones(N, np.bool_), vmask)
    keys_out, aggs, valids, ng, ov = gfn(ak, av, avl, avm)
    assert not bool(ov), "group-by overflow"
    ko = multiproc.collect(keys_out[0])
    so, co, mo = (multiproc.collect(a) for a in aggs)
    vmin = multiproc.collect(valids[2])
    ngs = multiproc.collect(ng)
    L = ko.shape[0] // D
    got = {}
    for d in range(D):
        for g in range(int(ngs[d])):
            i = d * L + g
            got[int(ko[i])] = (int(so[i]), int(co[i]),
                               int(mo[i]) if vmin[i] else None)
    want = {}
    for k in np.unique(keys):
        m = (keys == k) & vmask
        want[int(k)] = ((int(vals[m].sum()), int(m.sum()), int(vals[m].min()))
                        if m.any() else (0, 0, None))
    assert got == want, "group-by mismatch across processes"
    results["checks"]["group_by"] = {"groups": len(got), "ok": True}

    # ---- 2. multi-key inner join --------------------------------------
    NL, NR = N, N // 2
    KL = max(50, N // 256)   # key cardinality scales with N so per-shard
    lk1 = rng.integers(0, KL, NL).astype(np.int64)   # pair counts stay
    lk2 = rng.integers(0, 4, NL).astype(np.int64)    # bounded by cap_out
    rk1 = rng.integers(0, KL, NR).astype(np.int64)
    rk2 = rng.integers(0, 4, NR).astype(np.int64)
    lv = np.arange(NL, dtype=np.int64)
    rv = np.arange(NR, dtype=np.int64)
    jfn = dist.make_distributed_join(
        mesh, cap_shuffle=NL, cap_out=8 * NL, n_keys=2, n_lpay=1, n_rpay=1)
    jargs = put(lk1, lk2, lv, np.ones(NL, np.bool_),
                rk1, rk2, rv, np.ones(NR, np.bool_))
    ok_, olp, orp, _rm, n_out, jov = jfn(*jargs)
    assert not bool(jov), "join overflow"
    n_pairs = int(multiproc.collect(n_out).sum())
    cl = collections.Counter(zip(lk1.tolist(), lk2.tolist()))
    cr = collections.Counter(zip(rk1.tolist(), rk2.tolist()))
    want_pairs = sum(c * cr.get(k, 0) for k, c in cl.items())
    assert n_pairs == want_pairs, (n_pairs, want_pairs)
    results["checks"]["join_multikey"] = {"pairs": n_pairs, "ok": True}

    # ---- 3. Zipf hot-key broadcast join -------------------------------
    R = max(64, NR // 128)   # ~128 build rows per key at any N
    zlk = np.where(rng.random(NL) < 0.8, 7,
                   rng.integers(0, R, NL)).astype(np.int64)
    zrk = rng.integers(0, R, NR).astype(np.int64)
    cap_shuffle = max(256, NL // (2 * D))   # << hot-key row count
    # hot pairs per shard ~= (0.8*NL/D) * (NR/64): size cap_hot_out for it
    zfn = dist.make_distributed_join(
        mesh, cap_shuffle=cap_shuffle, cap_out=8 * NL,
        n_keys=1, n_lpay=1, n_rpay=1, hot_k=4,
        hot_thresh=cap_shuffle // 2, cap_hot=256, cap_hot_out=32 * NL)
    zargs = put(zlk, lv, np.ones(NL, np.bool_),
                zrk, rv, np.ones(NR, np.bool_))
    zout = zfn(*zargs)
    assert not bool(zout[-1]), "hot-key join overflow"
    zpairs = int(multiproc.collect(zout[4]).sum()
                 + multiproc.collect(zout[9]).sum()
                 + multiproc.collect(zout[14]).sum())
    czl = collections.Counter(zlk.tolist())
    czr = collections.Counter(zrk.tolist())
    want_z = sum(c * czr.get(k, 0) for k, c in czl.items())
    assert zpairs == want_z, (zpairs, want_z)
    results["checks"]["join_zipf_hotkey"] = {
        "pairs": zpairs, "cap_shuffle": cap_shuffle,
        "hot_rows": int((zlk == 7).sum()), "ok": True}

    # ---- 4. multi-key distributed sort --------------------------------
    sk1 = rng.integers(0, 30, N).astype(np.int64)
    sk2 = rng.standard_normal(N)
    pay = np.arange(N, dtype=np.int64)
    sfn = dist.make_distributed_sort_multi(mesh, cap=N, n_keys=2,
                                           n_payload=1)
    sargs = put(sk1, sk2, np.ones(N, np.bool_), pay)
    keys_s, pay_s, counts_s, sov = sfn(*sargs)
    assert not bool(sov), "sort overflow"
    k1o = multiproc.collect(keys_s[0])
    k2o = multiproc.collect(keys_s[1])
    po = multiproc.collect(pay_s[0])
    cn = multiproc.collect(counts_s)
    Ls = k1o.shape[0] // D
    rows = []
    for d in range(D):
        for j in range(int(cn[d])):
            i = d * Ls + j
            rows.append((int(k1o[i]), float(k2o[i]), int(po[i])))
    want_rows = sorted(zip(sk1.tolist(), sk2.tolist(), pay.tolist()))
    assert rows == [(a, b, c) for a, b, c in want_rows], "sort mismatch"
    results["checks"]["sort_multikey"] = {"rows": len(rows), "ok": True}

    # ---- 5. chunk-pipelined streamed shuffle --------------------------
    okeys = rng.integers(0, 64, N).astype(np.int64)
    ovals = rng.integers(0, 100, N).astype(np.int64)
    ovalid = rng.random(N) < 0.9
    ofn = overlap.make_group_by_sum_streamed(
        mesh, cap=max(256, N // D), n_chunks=4, table_size=256)
    oargs = put(okeys, ovals, ovalid)
    tk, sums, counts, occ, _ng, oov = ofn(*oargs)
    assert not bool(oov), "streamed shuffle overflow"
    tkh = multiproc.collect(tk)
    sh_ = multiproc.collect(sums)
    ch_ = multiproc.collect(counts)
    oh = multiproc.collect(occ)
    got_o = {int(tkh[i]): (int(sh_[i]), int(ch_[i]))
             for i in np.flatnonzero(oh)}
    want_o = {}
    for k in set(okeys[ovalid].tolist()):
        m = (okeys == k) & ovalid
        want_o[int(k)] = (int(ovals[m].sum()), int(m.sum()))
    assert got_o == want_o, "streamed shuffle mismatch"
    results["checks"]["streamed_shuffle"] = {"groups": len(got_o), "ok": True}

    # ---- bench: steady-state group-by + join step times ---------------
    if args.bench:
        jax.block_until_ready(gfn(ak, av, avl, avm))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(gfn(ak, av, avl, avm))
            ts.append(time.perf_counter() - t0)
        results["bench"] = {"group_by_ms": round(float(np.median(ts)) * 1e3,
                                                 2)}
        jax.block_until_ready(jfn(*jargs))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(*jargs))
            ts.append(time.perf_counter() - t0)
        results["bench"]["join_ms"] = round(float(np.median(ts)) * 1e3, 2)

    results["ok"] = all(c["ok"] for c in results["checks"].values())
    if args.process_id == 0:
        out = json.dumps(results)
        print(out, flush=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(out)


if __name__ == "__main__":
    main()
