"""Roofline probe v2: long chains (robust vs tunnel jitter) + masked-sum
implementation variants. One executable, runtime trip counts.

Variants for the masked f64 sum (the north-star config):
  masked_where   — current reduce_xla path: where(mask, v, 0) in f64
  masked_u32sel  — mask applied in the NATIVE u32 domain: bitcast f64 ->
                   (n,2) u32, select, bitcast back, then sum. The select
                   runs on native 32-bit lanes; only the adds pay f64
                   emulation.
  masked_mul     — v * mask.astype(f64)
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 401
REPEATS = 7


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import bitmap, reductions

    lax = jax.lax
    n = 1 << 24                 # 16Mi f64 = 128 MiB
    n32 = 1 << 25

    ih = np.arange(n, dtype=np.int64)
    mask_host = (ih % 20) != 0
    vals_host = (ih & 1023) + 1
    oracle = float(vals_host.sum())
    oracle_masked = float((vals_host * mask_host).sum())
    oracle_u32 = float(((np.arange(n32, dtype=np.int64) & 1023) + 1).sum())

    @jax.jit
    def program(bias, Ls):
        iota = jnp.arange(n, dtype=jnp.int32)
        iota32 = jnp.arange(n32, dtype=jnp.int32)
        v64 = ((iota & 1023) + 1).astype(jnp.float64)
        vu32 = ((iota32 & 1023) + 1).astype(jnp.uint32)
        mask = (iota % 20) != 0
        words = bitmap.pack_mask(mask)
        checks = []

        def chain(idx, v, red):
            def body(_, carry):
                vv, acc = carry
                vv = lax.dynamic_update_slice(
                    vv, vv[0:1] + bias.astype(vv.dtype), (0,))
                return vv, acc + red(vv)
            _, acc = lax.fori_loop(0, Ls[idx], body, (v, jnp.float64(0)))
            return acc

        checks.append(chain(0, vu32,
                            lambda v: jnp.sum(v.astype(jnp.uint64)
                                              ).astype(jnp.float64)))
        checks.append(chain(1, v64, jnp.sum))
        checks.append(chain(
            2, v64, lambda v: reductions.reduce_xla(v, words, n, "sum")))
        checks.append(chain(3, v64,
                            lambda v: jnp.sum(v, where=mask)))
        checks.append(chain(
            4, v64, lambda v: jnp.sum(v * mask.astype(jnp.float64))))

        def copy_body(_, carry):
            vv, acc = carry
            vv = vv + bias
            return vv, acc + vv[0]
        _, acc5 = lax.fori_loop(0, Ls[5], copy_body, (v64, jnp.float64(0)))
        checks.append(acc5)
        return jnp.stack(checks)

    configs = [
        ("sum_u32", n32 * 4, oracle_u32),
        ("sum_f64", n * 8, oracle),
        ("masked_where", n * 8, oracle_masked),
        ("masked_sumwhere", n * 8, oracle_masked),
        ("masked_mul", n * 8, oracle_masked),
        ("copy_f64", n * 16, None),
    ]
    K = len(configs)
    bias = jnp.float64(0)
    zeros = jnp.zeros(K, jnp.int32)

    t0 = time.perf_counter()
    c1 = np.asarray(program(bias, jnp.ones(K, jnp.int32)))
    print(json.dumps({"note": "compiled", "s": round(
        time.perf_counter() - t0, 1),
        "device": jax.devices()[0].device_kind}), flush=True)
    for i, (name, _, orc) in enumerate(configs):
        if orc is not None and c1[i] != orc:
            raise SystemExit(f"WRONG {name}: {c1[i]} != {orc}")

    def run(Ls):
        t0 = time.perf_counter()
        out = np.asarray(program(bias, Ls))
        return time.perf_counter() - t0, out

    for i, (name, bytes_, orc) in enumerate(configs):
        base_i = zeros.at[i].set(1)
        hi_i = zeros.at[i].set(L2)
        run(base_i); run(hi_i)
        deltas = []
        for _ in range(REPEATS):
            tb, cb = run(base_i)
            th, ch = run(hi_i)
            if orc is not None and not np.isclose(ch[i], L2 * cb[i],
                                                  rtol=0, atol=1.0):
                raise SystemExit(f"chain check failed {name}")
            deltas.append((th - tb) / (L2 - 1))
        dt = max(float(np.median(deltas)), 1e-9)
        print(json.dumps({"bench": name,
                          "gb_per_s": round(bytes_ / dt / 1e9, 1),
                          "pct_819": round(bytes_ / dt / 1e9 / 819 * 100, 1),
                          "us": round(dt * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
