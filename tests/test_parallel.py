"""Distributed tier tests on the virtual 8-device CPU mesh
(SURVEY.md §7 step 7: hash-partition shuffle + distributed aggregate)."""
import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arrow_go_tpu.parallel import aggregate, make_mesh, row_sharding
from arrow_go_tpu.parallel import shuffle as shuf


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def test_mesh_basics(mesh):
    assert mesh.devices.size == 8
    sh = row_sharding(mesh)
    x = jax.device_put(jnp.arange(64), sh)
    assert len(x.sharding.device_set) == 8


def test_distributed_group_by_sum(mesh, rng):
    N, cap = 2048, 2048 // 8
    keys = rng.integers(0, 57, N).astype(np.int64)
    vals = rng.integers(-50, 100, N).astype(np.int64)
    valid = rng.random(N) < 0.85
    sh = row_sharding(mesh)
    fn = aggregate.make_group_by_sum(mesh, cap)
    gk, sums, cnts, ngroups, overflow = fn(
        jax.device_put(jnp.asarray(keys), sh),
        jax.device_put(jnp.asarray(vals), sh),
        jax.device_put(jnp.asarray(valid), sh))
    assert not bool(overflow)
    gk, sums, cnts, ngroups = map(np.asarray, (gk, sums, cnts, ngroups))
    D = 8
    Pshard = gk.shape[0] // D
    got = {}
    for d in range(D):
        for i in range(int(ngroups[d])):
            got[int(gk[d * Pshard + i])] = (int(sums[d * Pshard + i]),
                                            int(cnts[d * Pshard + i]))
    es, ec = collections.defaultdict(int), collections.defaultdict(int)
    for k, v, m in zip(keys, vals, valid):
        if m:
            es[int(k)] += int(v)
            ec[int(k)] += 1
    assert got == {k: (es[k], ec[k]) for k in es}


def test_shuffle_overflow_detected(mesh):
    # all rows to one partition with tiny capacity -> overflow flag
    N, cap = 256, 2
    keys = np.zeros(N, dtype=np.int64)   # single key -> one destination
    vals = np.ones(N, dtype=np.int64)
    valid = np.ones(N, dtype=bool)
    sh = row_sharding(mesh)
    fn = aggregate.make_group_by_sum(mesh, cap)
    *_, overflow = fn(jax.device_put(jnp.asarray(keys), sh),
                      jax.device_put(jnp.asarray(vals), sh),
                      jax.device_put(jnp.asarray(valid), sh))
    assert bool(overflow)


def test_graft_entry():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out["count"]) > 0
    assert float(out["min"]) <= float(out["max"])


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_distributed_join(mesh, rng):
    import collections
    from arrow_go_tpu.parallel import join as pjoin
    NL, NR = 1024, 512
    lk = rng.integers(0, 100, NL).astype(np.int64)
    lv = np.arange(NL, dtype=np.int64)
    rk = rng.integers(50, 150, NR).astype(np.int64)
    rv = np.arange(NR, dtype=np.int64)
    lvalid = rng.random(NL) < 0.9
    rvalid = np.ones(NR, bool)
    fn = pjoin.make_distributed_join(mesh, cap_shuffle=NL // 4, cap_out=NL * 2)
    sh = row_sharding(mesh)
    put = lambda x: jax.device_put(jnp.asarray(x), sh)
    k, l, r, nout, ov = fn(put(lk), put(lv), put(lvalid),
                           put(rk), put(rv), put(rvalid))
    assert not bool(ov)
    k, l, r, nout = map(np.asarray, (k, l, r, nout))
    per = k.shape[0] // 8
    got = sorted((int(k[d * per + i]), int(l[d * per + i]), int(r[d * per + i]))
                 for d in range(8) for i in range(int(nout[d])))
    rmap = collections.defaultdict(list)
    for key, val in zip(rk, rv):
        rmap[int(key)].append(int(val))
    expect = sorted((int(key), int(val), rvv)
                    for key, val, ok in zip(lk, lv, lvalid) if ok
                    for rvv in rmap.get(int(key), []))
    assert got == expect


def test_distributed_join_overflow_flag(mesh):
    from arrow_go_tpu.parallel import join as pjoin
    N = 256
    keys = np.zeros(N, dtype=np.int64)  # everything collides on one shard
    vals = np.arange(N, dtype=np.int64)
    valid = np.ones(N, bool)
    fn = pjoin.make_distributed_join(mesh, cap_shuffle=N, cap_out=4)
    sh = row_sharding(mesh)
    put = lambda x: jax.device_put(jnp.asarray(x), sh)
    *_, ov = fn(put(keys), put(vals), put(valid),
                put(keys), put(vals), put(valid))
    assert bool(ov)  # N^2 pairs cannot fit cap_out=4


def test_distributed_sort():
    """Range-partitioned distributed sort (parallel/sort.py): concat of
    shard outputs is globally sorted; payload rides the permutation."""
    import numpy as np
    from arrow_go_tpu.parallel.mesh import make_mesh
    from arrow_go_tpu.parallel.sort import make_distributed_sort
    import jax.numpy as jnp

    mesh = make_mesh()
    D = mesh.devices.size
    n = D * 64
    rng = np.random.default_rng(7)
    keys = rng.integers(-1000, 1000, n).astype(np.int64)
    valid = rng.random(n) < 0.9
    payload = np.arange(n, dtype=np.int64)   # original row ids

    fn = make_distributed_sort(mesh, cap=n, n_payload=1, n_samples=16)
    res = fn(jnp.asarray(keys), jnp.asarray(valid), jnp.asarray(payload))
    assert not bool(res.overflow)
    counts = np.asarray(res.counts)
    ks = np.asarray(res.keys).reshape(D, -1)
    ps = np.asarray(res.payload[0]).reshape(D, -1)
    got_keys, got_rows = [], []
    for d in range(D):
        got_keys.extend(ks[d, :counts[d]].tolist())
        got_rows.extend(ps[d, :counts[d]].tolist())
    expect = np.sort(keys[valid], kind="stable")
    assert got_keys == expect.tolist()
    # payload permuted consistently: key at original row matches
    for k, r in zip(got_keys, got_rows):
        assert keys[r] == k and valid[r]
    assert sum(counts) == valid.sum()


def test_multihost_helpers_single_process():
    """initialize_multihost is a no-op single-process; local_row_range
    covers the whole table when one process owns every shard."""
    from arrow_go_tpu.parallel import mesh as pm
    pm.initialize_multihost()          # must not raise single-process
    m = pm.make_mesh()
    lo, hi = pm.local_row_range(m, 1000)
    assert lo == 0 and hi == 1000
