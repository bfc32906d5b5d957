"""Device-resident operator composition: DeviceBatch flows through
filter -> hash_join -> expressions -> group_by without values leaving
HBM (the engine's operator-to-operator contract, SURVEY §7 — the
reference composes operators over in-memory arrays the same way,
compute/exec.go; here "in memory" means the device)."""
import numpy as np
import pytest

import arrow_go_tpu as agt
import arrow_go_tpu.compute as pc
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.device.block import DeviceBatch, batch_to_device


def test_device_resident_filter_join_group_by(rng):
    n = 5000
    lt = agt.record_batch({"k": agt.from_numpy(rng.integers(0, 50, n)),
                           "v": agt.from_numpy(rng.standard_normal(n)),
                           "d": agt.from_numpy(rng.integers(0, 30, n))})
    rt = agt.record_batch({"k": agt.from_numpy(np.arange(50)),
                           "w": agt.from_numpy(rng.integers(0, 9, 50))})
    ldb, rdb = batch_to_device(lt), batch_to_device(rt)
    mask = pc.execute_scalar_expression(
        pc.call("greater", [pc.field("d"), pc.literal(10)]), ldb)
    f = pc.filter(ldb, mask)
    assert isinstance(f, DeviceBatch)
    j = pc.hash_join(f, rdb, "k")
    assert isinstance(j, DeviceBatch)
    rev = pc.execute_scalar_expression(
        pc.call("multiply", [pc.field("v"), pc.literal(2.0)]), j)
    jb = DeviceBatch(dt.Schema([dt.Field("w", dt.int64),
                                dt.Field("rev", dt.float64)]),
                     [j.column("w"), rev], j.length)
    g = pc.group_by(jb, "w", [("rev", "sum"), ("rev", "count")])

    # host oracle
    k = lt.column(0).to_numpy()
    v = lt.column(1).to_numpy()
    d = lt.column(2).to_numpy()
    w_of = dict(zip(range(50), rt.column(1).to_numpy()))
    sel = d > 10
    import collections
    sums = collections.defaultdict(float)
    cnts = collections.Counter()
    for ki, vi in zip(k[sel], v[sel]):
        sums[int(w_of[ki])] += 2.0 * vi
        cnts[int(w_of[ki])] += 1
    got = dict(zip(g.column("w").to_pylist(),
                   zip(g.column("rev_sum").to_pylist(),
                       g.column("rev_count").to_pylist())))
    assert set(got) == set(sums)
    for wk in sums:
        np.testing.assert_allclose(got[wk][0], sums[wk], rtol=1e-9)
        assert got[wk][1] == cnts[wk]


def test_device_batch_filter_rejects_nested(rng):
    rb = agt.record_batch({
        "a": agt.from_numpy(rng.integers(0, 5, 10)),
        "lst": agt.array([[1, 2], [3]] * 5)})
    db = batch_to_device(rb)
    mask = pc.execute_scalar_expression(
        pc.call("greater", [pc.field("a"), pc.literal(2)]), db)
    with pytest.raises(Exception):
        pc.filter(db, mask)


def test_device_batch_join_outer_types(rng):
    lt = agt.record_batch({"k": agt.from_numpy(rng.integers(0, 20, 200)),
                           "lv": agt.from_numpy(np.arange(200))})
    rt = agt.record_batch({"k": agt.from_numpy(rng.integers(10, 30, 80)),
                           "rv": agt.from_numpy(np.arange(80))})
    ldb, rdb = batch_to_device(lt), batch_to_device(rt)
    for how in ("inner", "left outer", "right outer", "full outer"):
        dj = pc.hash_join(ldb, rdb, "k", join_type=how)
        hj = pc.hash_join(lt, rt, "k", join_type=how)
        assert isinstance(dj, DeviceBatch)
        from arrow_go_tpu.device.block import batch_from_device
        drb = batch_from_device(dj)
        a = sorted(map(tuple, zip(*[drb.column(i).to_pylist()
                                    for i in range(drb.num_columns)])),
                   key=str)
        b = sorted(map(tuple, zip(*[hj.column(i).to_pylist()
                                    for i in range(hj.num_columns)])),
                   key=str)
        assert a == b, how
