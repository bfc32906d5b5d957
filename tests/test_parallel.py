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
