"""TPU smoke test: compiled-kernel behavior vs analytic oracles on the
real chip, in ONE executable (one tunnel warm-up).

The pytest suite pins JAX_PLATFORMS=cpu (virtual mesh); this script is
the compiled-TPU half of the reference's asm-vs-noasm dual CI runs
(ci/scripts/test.sh runs every suite twice): a handful of load-bearing
kernels execute compiled on the TPU and their results are checked
exactly against host-computed oracles.

Covered: masked sum (f64/i64/u32), filter count+checksum, sort
permutation checksum, group-by encode cardinality + per-group sum
checksum, local join pair count, decimal128/256 limb add/compare,
bitmap pack/expand/popcount, Pallas f32 reduction vs its XLA twin.

Run: python ci/tpu_smoke.py   (exits nonzero on mismatch)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    from arrow_go_tpu.jaxenv import jax, jnp, on_tpu
    from arrow_go_tpu.ops import bitmap, hashing, reductions, selection
    from arrow_go_tpu.ops import sort as sort_ops
    from arrow_go_tpu.ops import decimal as dec
    from arrow_go_tpu import dtypes as dt
    from arrow_go_tpu.parallel.join import local_join_inner

    n = 1 << 16

    # ---- host oracles --------------------------------------------------
    i = np.arange(n, dtype=np.int64)
    vals = (i * 2654435761 % 1000).astype(np.int64)
    mask = (i % 10) != 0
    o_sum = int((vals * mask).sum())
    o_fsum = float((vals.astype(np.float64) * mask).sum())
    sel = (vals > 500) & mask
    o_cnt = int(sel.sum())
    o_selsum = int(vals[sel].sum())
    perm_o = np.argsort(vals, kind="stable")
    o_sortck = int((perm_o * np.arange(n)).sum() % (1 << 31))
    o_card = len(np.unique(vals))
    gsums = np.zeros(1000, np.int64)
    np.add.at(gsums, vals, i)
    o_gck = int(gsums.sum() % (1 << 31))
    rk = (i.astype(np.uint64) * np.uint64(11400714819323198485)
          % np.uint64(997)).astype(np.int64)[: n // 4]
    lk = vals % 997
    import collections
    rc = collections.Counter(rk.tolist())
    o_pairs = int(sum(rc[k] for k in lk.tolist()))
    # decimals
    a_lo = np.uint64(0xFFFFFFFFFFFFFFFF)
    o_dec_add = (0xFFFFFFFFFFFFFFFF + 5)  # carries into hi limb

    @jax.jit
    def program():
        iota = jnp.arange(n, dtype=jnp.int64)
        v = iota * 2654435761 % 1000
        m = (iota % 10) != 0
        words = bitmap.pack_mask(m)
        outs = {}
        outs["sum_i64"] = reductions.reduce_xla(v, words, n, "sum")
        outs["sum_f64"] = reductions.reduce_xla(
            v.astype(jnp.float64), words, n, "sum")
        outs["sum_u32"] = reductions.reduce_xla(
            v.astype(jnp.uint32), words, n, "sum")
        # pallas vs xla twin (f32)
        outs["sum_f32_pallas"] = reductions.reduce_pallas(
            v.astype(jnp.float32), words, n, "sum")
        outs["sum_f32_xla"] = reductions.reduce_xla(
            v.astype(jnp.float32), words, n, "sum")
        # filter
        selm = (v > 500) & m
        idx, cnt = selection.filter_indices(selm, None, n)
        gathered = selection.gather(v, idx)
        pos = jnp.arange(n) < cnt
        outs["filter_cnt"] = cnt
        outs["filter_sum"] = jnp.sum(jnp.where(pos, gathered, 0))
        # sort
        op = sort_ops.sort_key(v, dt.int64, None, n)
        perm = sort_ops.argsort_single(op)
        outs["sort_ck"] = jnp.sum(
            perm.astype(jnp.int64) * jnp.arange(n, dtype=jnp.int64)
        ) % (1 << 31)
        # group-by encode + scatter sum
        res = hashing.encode_codes(v, dt.int64, None, n)
        outs["card"] = res.n_unique
        s = jnp.zeros(n + 1, jnp.int64).at[
            jnp.where(res.codes >= 0, res.codes, n)].add(iota, mode="drop")
        outs["group_ck"] = jnp.sum(s[:n]) % (1 << 31)
        # join
        lkd = v % 997
        rkd = (iota.astype(jnp.uint64) * jnp.uint64(11400714819323198485)
               % jnp.uint64(997)).astype(jnp.int64)[: n // 4]
        ones_l = jnp.ones(n, jnp.bool_)
        ones_r = jnp.ones(n // 4, jnp.bool_)
        li, ri, rperm, total, ov = local_join_inner(lkd, ones_l, rkd, ones_r, 1)
        outs["join_pairs"] = total
        # decimal limb arithmetic: carry propagation + compare
        a = jnp.broadcast_to(
            jnp.asarray([[0xFFFFFFFFFFFFFFFF, 0]], jnp.uint64), (8, 2))
        b = jnp.broadcast_to(jnp.asarray([[5, 0]], jnp.uint64), (8, 2))
        s2 = dec.addn(a, b)
        outs["dec_lo"] = s2[0, 0].astype(jnp.uint64)
        outs["dec_hi"] = s2[0, 1].astype(jnp.uint64)
        a4 = jnp.broadcast_to(jnp.asarray(
            [[0xFFFFFFFFFFFFFFFF] * 3 + [0]], jnp.uint64), (8, 4))
        b4 = jnp.broadcast_to(jnp.asarray([[1, 0, 0, 0]], jnp.uint64), (8, 4))
        s4 = dec.addn(a4, b4)
        outs["dec256_top"] = s4[0, 3].astype(jnp.uint64)
        outs["dec_cmp"] = jnp.sum(dec.cmpn(a4, b4))
        # bitmap round trip
        outs["popcount"] = bitmap.popcount_words(words)
        outs["expand_ck"] = jnp.sum(
            bitmap.expand_words(words, n).astype(jnp.int32))
        return outs

    t0 = time.perf_counter()
    out = {k: np.asarray(v2) for k, v2 in program().items()}
    dt_s = time.perf_counter() - t0

    checks = [
        ("sum_i64", int(out["sum_i64"]), o_sum),
        ("sum_f64", float(out["sum_f64"]), o_fsum),
        ("sum_u32", int(out["sum_u32"]), o_sum % (1 << 64)),
        ("pallas_vs_xla_f32", float(out["sum_f32_pallas"]),
         float(out["sum_f32_xla"])),
        ("filter_cnt", int(out["filter_cnt"]), o_cnt),
        ("filter_sum", int(out["filter_sum"]), o_selsum),
        ("sort_ck", int(out["sort_ck"]), o_sortck),
        ("card", int(out["card"]), o_card),
        ("group_ck", int(out["group_ck"]), o_gck),
        ("join_pairs", int(out["join_pairs"]), o_pairs),
        ("dec_lo", int(out["dec_lo"]), o_dec_add % (1 << 64)),
        ("dec_hi", int(out["dec_hi"]), o_dec_add >> 64),
        ("dec256_top", int(out["dec256_top"]), 1),   # carry reaches top limb
        ("dec_cmp", int(out["dec_cmp"]), 8),
        ("popcount", int(out["popcount"]), int(mask.sum())),
        ("expand_ck", int(out["expand_ck"]), int(mask.sum())),
    ]
    bad = [(nm, g, w) for nm, g, w in checks if g != w]
    print(json.dumps({
        "tpu_smoke": "FAIL" if bad else "OK",
        "backend": "tpu" if on_tpu() else "cpu",
        "n_checks": len(checks), "compile_plus_run_s": round(dt_s, 1),
        "failures": [{"check": nm, "got": g, "want": w}
                     for nm, g, w in bad]}, default=str), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
