"""Roofline probe v3: masked-sum EXPANSION variants. The fused
`jnp.sum(where=)` closed the select gap (probe2: 185 -> 511 GB/s with a
raw bool mask); what remains is the packed-word -> bool expansion cost.

  A_expand_reshape — current ops/bitmap.expand_words:
                     (P/32, 32) shift matrix -> reshape(P)
  D_lane128        — (P/128, 128)-shaped expansion (the Pallas kernel's
                     concat-broadcast trick) feeding a 2-D where= reduce:
                     everything stays in native lane layout
  G_bool_cached    — mask expanded ONCE outside the timed loop (the
                     cached-expansion design point: what a DeviceColumn
                     carrying a lazily-materialized bool mask would pay)
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 401
REPEATS = 7


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import bitmap

    lax = jax.lax
    n = 1 << 24

    ih = np.arange(n, dtype=np.int64)
    mask_host = (ih % 20) != 0
    oracle_masked = float((((ih & 1023) + 1) * mask_host).sum())

    def lane128_mask(words, rows):
        w = lax.bitcast_convert_type(words, jnp.int32).reshape(rows, 4)
        lane = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        w128 = jnp.concatenate(
            [jnp.broadcast_to(w[:, j:j + 1], (rows, 32)) for j in range(4)],
            axis=1)
        return ((w128 >> (lane % 32)) & 1) == 1

    @jax.jit
    def program(bias, Ls):
        iota = jnp.arange(n, dtype=jnp.int32)
        v64 = ((iota & 1023) + 1).astype(jnp.float64)
        mask_bool = (iota % 20) != 0
        words = bitmap.pack_mask(mask_bool)
        rows = n // 128
        checks = []

        def chain(idx, red):
            def body(_, carry):
                vv, acc = carry
                vv = lax.dynamic_update_slice(vv, vv[0:1] + bias, (0,))
                return vv, acc + red(vv)
            _, acc = lax.fori_loop(0, Ls[idx], body, (v64, jnp.float64(0)))
            return acc

        checks.append(chain(0, lambda v: jnp.sum(
            v, where=bitmap.expand_words(words, n))))
        checks.append(chain(1, lambda v: jnp.sum(
            v.reshape(rows, 128), where=lane128_mask(words, rows))))
        checks.append(chain(2, lambda v: jnp.sum(v, where=mask_bool)))
        return jnp.stack(checks)

    configs = [("A_expand_reshape", n * 8), ("D_lane128", n * 8),
               ("G_bool_cached", n * 8)]
    K = len(configs)
    bias = jnp.float64(0)
    zeros = jnp.zeros(K, jnp.int32)

    t0 = time.perf_counter()
    c1 = np.asarray(program(bias, jnp.ones(K, jnp.int32)))
    print(json.dumps({"note": "compiled", "s": round(
        time.perf_counter() - t0, 1)}), flush=True)
    for i, (name, _) in enumerate(configs):
        if c1[i] != oracle_masked:
            raise SystemExit(f"WRONG {name}: {c1[i]} != {oracle_masked}")

    def run(Ls):
        t0 = time.perf_counter()
        out = np.asarray(program(bias, Ls))
        return time.perf_counter() - t0, out

    for i, (name, bytes_) in enumerate(configs):
        base_i = zeros.at[i].set(1)
        hi_i = zeros.at[i].set(L2)
        run(base_i); run(hi_i)
        deltas = []
        for _ in range(REPEATS):
            tb, cb = run(base_i)
            th, ch = run(hi_i)
            if not np.isclose(ch[i], L2 * cb[i], rtol=0, atol=1.0):
                raise SystemExit(f"chain check failed {name}")
            deltas.append((th - tb) / (L2 - 1))
        dt = max(float(np.median(deltas)), 1e-9)
        print(json.dumps({"bench": name,
                          "gb_per_s": round(bytes_ / dt / 1e9, 1),
                          "pct_819": round(bytes_ / dt / 1e9 / 819 * 100, 1),
                          "us": round(dt * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
