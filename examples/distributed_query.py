"""Distributed query on a device mesh: shuffle -> group-by -> join -> sort.

Runs on any mesh — real TPU chips or the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_query.py

The pattern (SURVEY.md §7 step 7-8): tables live row-sharded across the
mesh; repartitioning is an all_to_all of capacity-bounded blocks over ICI
inside shard_map; group-by / join / sort then run shard-locally on their
hash or range partition. This replaces the reference's host-to-host
Flight streaming with single-program XLA collectives.
"""
import os

if os.environ.get("JAX_PLATFORMS") == "cpu" and \
        "xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from arrow_go_tpu.parallel import (aggregate, join, make_mesh,
                                       row_sharding, sort)

    mesh = make_mesh()
    D = mesh.devices.size
    print(f"mesh: {D} devices ({jax.devices()[0].platform})")

    N = 4096 * D
    cap = 4096 * 4
    rng = np.random.default_rng(0)
    sh = row_sharding(mesh)

    # fact table: (customer_key, amount); dimension table: (customer_key, region)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, 97, N).astype(np.int64)), sh)
    amounts = jax.device_put(jnp.asarray(
        rng.integers(1, 1000, N).astype(np.int64)), sh)
    valid = jax.device_put(jnp.asarray(rng.random(N) < 0.98), sh)

    # 1. distributed GROUP BY customer_key SUM(amount)
    agg = aggregate.make_group_by_sum(mesh, cap)
    gk, sums, cnts, ngroups, overflow = agg(keys, amounts, valid)
    assert not bool(overflow)
    total_groups = int(np.asarray(ngroups).sum())
    print(f"group-by: {total_groups} groups across {D} shards")

    # 2. distributed hash join on a (near-unique) order id: each row of the
    # left matches at most one row of the right
    oid = jax.device_put(jnp.asarray(
        rng.permutation(N).astype(np.int64)), sh)
    jfn = join.make_distributed_join(mesh, cap_shuffle=cap, cap_out=cap * D)
    jk, jl, jr, nout, jov = jfn(oid, amounts, valid, oid, amounts, valid)
    assert not bool(jov)
    pairs = int(np.asarray(nout).sum())
    print(f"join: {pairs} matched pairs")

    # 3. distributed ORDER BY amount (range partition + local sort)
    sfn = sort.make_distributed_sort(mesh, cap=N, n_payload=1)
    res = sfn(amounts, valid, keys)
    assert not bool(res.overflow)
    counts = np.asarray(res.counts)
    ks = np.asarray(res.keys).reshape(D, -1)
    merged = np.concatenate([ks[d, :counts[d]] for d in range(D)])
    assert (np.diff(merged) >= 0).all()
    print(f"sort: {len(merged)} rows globally ordered "
          f"(min={merged[0]}, max={merged[-1]})")





def skew_and_strings():
    """Round-3 tier (parallel/dist.py): Zipf-skewed keys + multi-column
    string-keyed queries. Run after main() on the same mesh env."""
    import jax
    import jax.numpy as jnp
    from arrow_go_tpu.parallel import dist, make_mesh, row_sharding

    mesh = make_mesh()
    D = mesh.devices.size
    sh = row_sharding(mesh)
    N = 2048 * D
    rng = np.random.default_rng(1)

    # 80%-hot key: the pre-aggregating group-by finishes at a capacity far
    # below the hot key's row count (one partial row per shard per group)
    zkeys = np.where(rng.random(N) < 0.8, 7,
                     rng.integers(0, 50, N)).astype(np.int64)
    vals = rng.integers(0, 100, N).astype(np.int64)
    gfn = dist.make_distributed_group_by(
        mesh, cap=128, n_keys=1,
        agg_specs=((0, "sum"), (0, "mean"), (0, "max")), n_vals=1)
    keys_out, aggs, _valids, ngroups, ov = gfn(
        jax.device_put(jnp.asarray(zkeys), sh),
        jax.device_put(jnp.asarray(vals), sh),
        jax.device_put(jnp.ones(N, jnp.bool_), sh),
        jax.device_put(jnp.ones(N, jnp.bool_), sh))
    assert not bool(ov)
    print(f"skewed group-by: {int(np.asarray(ngroups).sum())} groups, "
          f"no overflow at cap 128 (hot key has ~{int((zkeys == 7).sum())} rows)")

    # hot-key broadcast join: the hot probe rows never move; the hot build
    # rows broadcast over ICI
    rk = rng.integers(0, 50, N).astype(np.int64)
    jfn = dist.make_distributed_join(
        mesh, cap_shuffle=1024, cap_out=1 << 18, n_keys=1, n_lpay=1,
        n_rpay=1, hot_k=4, hot_thresh=64, cap_hot=128, cap_hot_out=1 << 20)
    out = jfn(jax.device_put(jnp.asarray(zkeys), sh),
              jax.device_put(jnp.asarray(vals), sh),
              jax.device_put(jnp.ones(N, jnp.bool_), sh),
              jax.device_put(jnp.asarray(rk), sh),
              jax.device_put(jnp.asarray(vals), sh),
              jax.device_put(jnp.ones(N, jnp.bool_), sh))
    assert not bool(out[-1])
    pairs = int(np.asarray(out[4]).sum() + np.asarray(out[9]).sum()
                + np.asarray(out[14]).sum())
    print(f"hot-key broadcast join: {pairs} pairs, overflow-free")

    # multi-column string keys ride as shared dictionary codes
    s1 = rng.integers(0, 25, N).astype(np.int32)     # codes of 25 strings
    s2 = rng.integers(0, 3, N).astype(np.int64)
    mfn = dist.make_distributed_group_by(
        mesh, cap=128, n_keys=2, agg_specs=((0, "count"),), n_vals=1)
    mout = mfn(jax.device_put(jnp.asarray(s1), sh),
               jax.device_put(jnp.asarray(s2), sh),
               jax.device_put(jnp.asarray(vals), sh),
               jax.device_put(jnp.ones(N, jnp.bool_), sh),
               jax.device_put(jnp.ones(N, jnp.bool_), sh))
    print(f"string 2-key group-by: {int(np.asarray(mout[3]).sum())} groups")


if __name__ == "__main__":
    main()
    skew_and_strings()
