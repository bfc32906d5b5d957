"""Roofline probe: where does the masked f64 Sum ceiling come from?

Measures, on the real chip with ONE executable (bench.py methodology:
per-config runtime trip counts, differenced chains, analytic oracles):

  sum_u32     — native 32-bit lane sum of 128 MiB: the pure HBM-read
                ceiling for a reduction (no 64-bit emulation)
  sum_f32     — native f32 sum of 128 MiB
  sum_i64     — emulated 64-bit integer sum of 128 MiB
  sum_f64     — emulated f64 sum of 128 MiB (the north-star config)
  sum_f64_masked — with a 95%-valid packed validity mask
  copy_f64    — read+write stream (a += bias): RW bandwidth bound

If sum_u32 saturates ~roofline while sum_f64 sits lower, the f64 gap is
64-bit EMULATION ALU cost, not memory — i.e. the f64 ceiling is the
emulation throughput, and that number is the honest roofline for this
op on this chip. Prints one json line per config.
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 25
REPEATS = 5


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import bitmap, reductions

    lax = jax.lax
    n64 = 1 << 24               # 16Mi 8-byte elements = 128 MiB
    n32 = 1 << 25               # 32Mi 4-byte elements = 128 MiB

    i64h = np.arange(n64, dtype=np.int64)
    mask_host = (i64h % 20) != 0
    oracle_f64 = float((((i64h & 1023) + 1)).sum())
    oracle_f64_masked = float((((i64h & 1023) + 1) * mask_host).sum())
    i32h = np.arange(n32, dtype=np.int64)
    oracle_32 = float((((i32h & 1023) + 1)).sum())

    @jax.jit
    def program(bias, Ls):
        iota64 = jnp.arange(n64, dtype=jnp.int32)
        iota32 = jnp.arange(n32, dtype=jnp.int32)
        vals_u32 = ((iota32 & 1023) + 1).astype(jnp.uint32)
        vals_f32 = ((iota32 & 1023) + 1).astype(jnp.float32)
        vals_i64 = ((iota64 & 1023) + 1).astype(jnp.int64)
        vals_f64 = ((iota64 & 1023) + 1).astype(jnp.float64)
        words = bitmap.pack_mask((iota64 % 20) != 0)
        checks = []

        def chain(idx, v, red):
            def body(_, carry):
                vv, acc = carry
                vv = lax.dynamic_update_slice(
                    vv, vv[0:1] + bias.astype(vv.dtype), (0,))
                return vv, acc + red(vv)
            _, acc = lax.fori_loop(0, Ls[idx], body,
                                   (v, jnp.float64(0)))
            return acc

        checks.append(chain(0, vals_u32,
                            lambda v: jnp.sum(v.astype(jnp.uint64)
                                              ).astype(jnp.float64)))
        checks.append(chain(1, vals_f32,
                            lambda v: jnp.sum(v.astype(jnp.float64))))
        checks.append(chain(2, vals_i64,
                            lambda v: jnp.sum(v).astype(jnp.float64)))
        checks.append(chain(3, vals_f64, jnp.sum))
        checks.append(chain(
            4, vals_f64,
            lambda v: reductions.reduce_xla(v, words, n64, "sum")))

        # copy: a += bias over the whole buffer (read+write)
        def copy_body(_, carry):
            vv, acc = carry
            vv = vv + bias
            return vv, acc + vv[0]
        _, acc5 = lax.fori_loop(0, Ls[5], copy_body,
                                (vals_f64, jnp.float64(0)))
        checks.append(acc5)
        return jnp.stack(checks)

    configs = [
        ("sum_u32", n32 * 4, oracle_32),
        ("sum_f32", n32 * 4, oracle_32),
        ("sum_i64", n64 * 8, oracle_f64),
        ("sum_f64", n64 * 8, oracle_f64),
        ("sum_f64_masked", n64 * 8, oracle_f64_masked),
        ("copy_f64", n64 * 16, 1.0),     # read + write
    ]
    K = len(configs)
    bias = jnp.float64(0)
    zeros = jnp.zeros(K, jnp.int32)

    t0 = time.perf_counter()
    c1 = np.asarray(program(bias, jnp.ones(K, jnp.int32)))
    print(json.dumps({"note": "compiled", "s": round(
        time.perf_counter() - t0, 1),
        "backend": jax.default_backend()}), flush=True)
    for i, (name, _, oracle) in enumerate(configs):
        if name != "copy_f64" and c1[i] != oracle:
            raise SystemExit(f"WRONG {name}: {c1[i]} != {oracle}")

    def run(Ls):
        t0 = time.perf_counter()
        out = np.asarray(program(bias, Ls))
        return time.perf_counter() - t0, out

    for i, (name, bytes_, oracle) in enumerate(configs):
        base_i = zeros.at[i].set(1)
        hi_i = zeros.at[i].set(L2)
        run(base_i); run(hi_i)
        deltas = []
        for _ in range(REPEATS):
            tb, cb = run(base_i)
            th, ch = run(hi_i)
            if name != "copy_f64" and not np.isclose(
                    ch[i], L2 * cb[i], rtol=0, atol=0.5):
                raise SystemExit(f"chain check failed {name}")
            deltas.append((th - tb) / (L2 - 1))
        dt = max(float(np.median(deltas)), 1e-9)
        print(json.dumps({"bench": name,
                          "gb_per_s": round(bytes_ / dt / 1e9, 1),
                          "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
