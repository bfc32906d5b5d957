"""Expression compiler, group-by, and hash-join tests."""
import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import compute as pc
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.device import batch_to_device, from_device

pa = pytest.importorskip("pyarrow")
pac = pytest.importorskip("pyarrow.compute")


# -- expressions -------------------------------------------------------------

def test_expression_repr_and_sugar():
    e = (pc.field("a") + 1) * pc.field("b")
    assert "add" in repr(e) and "multiply" in repr(e)


def test_execute_scalar_expression():
    rb = agt.record_batch({"a": [1, 2, None, 4], "b": [10.0, 20.0, 30.0, None]})
    out = pc.execute_scalar_expression((pc.field("a") * 2 + pc.field("b")) > 15,
                                       rb)
    assert out.to_pylist() == [False, True, None, None]


def test_compiled_expression_matches_eager():
    rb = agt.record_batch({"a": [1, 2, None, 4], "b": [10.0, 20.0, 30.0, None]})
    expr = ((pc.field("a").cast(dt.float64) / pc.field("b")) < 0.15) | \
        pc.field("a").is_null()
    eager = pc.execute_scalar_expression(expr, rb)
    fn = pc.compile_expression(expr, rb.schema)
    compiled = from_device(fn(batch_to_device(rb)))
    assert compiled.to_pylist() == eager.to_pylist()


def test_compiled_expression_no_recompile_across_lengths():
    schema = agt.schema({"x": dt.int64})
    expr = pc.field("x") + 10
    fn = pc.compile_expression(expr, schema)
    for n in [5, 50, 100]:  # all in the 128 bucket
        rb = agt.record_batch({"x": list(range(n))}, schema=schema)
        out = from_device(fn(batch_to_device(rb)))
        assert out.to_pylist() == [i + 10 for i in range(n)]


def test_expression_isin_fillnull():
    rb = agt.record_batch({"x": [1, 2, None, 5]})
    out = pc.execute_scalar_expression(pc.field("x").isin([2, 5]), rb)
    assert out.to_pylist() == [False, True, False, True]
    out2 = pc.execute_scalar_expression(
        pc.call("fill_null", [pc.field("x"), 0]), rb)
    assert out2.to_pylist() == [1, 2, 0, 5]


def test_expression_kleene_logic():
    rb = agt.record_batch({"p": [True, None, False], "q": [True, True, None]})
    out = pc.execute_scalar_expression(pc.field("p") & pc.field("q"), rb)
    assert out.to_pylist() == [True, None, False]
    out2 = pc.execute_scalar_expression(pc.field("p") | pc.field("q"), rb)
    assert out2.to_pylist() == [True, True, None]


# -- group by ---------------------------------------------------------------

def test_group_by_basic():
    rb = agt.record_batch({"k": ["a", "b", "a", None, "b", "a"],
                           "v": [1, 2, 3, 4, None, 6]})
    g = pc.group_by(rb, "k", [("v", "sum"), ("v", "count"), ("v", "mean"),
                              ("v", "max"), ("v", "min")])
    assert g.to_pydict() == {
        "k": ["a", "b", None],
        "v_sum": [10, 2, 4], "v_count": [3, 1, 1],
        "v_mean": [10 / 3, 2.0, 4.0],
        "v_max": [6, 2, 4], "v_min": [1, 2, 4]}


def test_group_by_matches_pyarrow(rng):
    n = 5000
    keys = rng.integers(0, 50, n)
    vals = rng.integers(-100, 100, n)
    mask = rng.random(n) < 0.9
    rb = agt.record_batch({"k": agt.from_numpy(keys),
                           "v": agt.from_numpy(vals, mask)})
    ours = pc.group_by(rb, "k", [("v", "sum"), ("v", "count")])
    pt = pa.table({"k": keys, "v": pa.array(vals, mask=~mask)})
    theirs = pt.group_by("k").aggregate([("v", "sum"), ("v", "count")])
    od = {k: v for k, v in zip(ours.column("k").to_pylist(),
                               zip(ours.column("v_sum").to_pylist(),
                                   ours.column("v_count").to_pylist()))}
    td = {k: v for k, v in zip(theirs.column("k").to_pylist(),
                               zip(theirs.column("v_sum").to_pylist(),
                                   theirs.column("v_count").to_pylist()))}
    assert od == td


def test_group_by_multi_key():
    rb = agt.record_batch({"a": [1, 1, 2, 2, 1], "b": ["x", "y", "x", "x", "x"],
                           "v": [1, 2, 3, 4, 5]})
    g = pc.group_by(rb, ["a", "b"], [("v", "sum")])
    got = {(a, b): s for a, b, s in zip(g.column("a").to_pylist(),
                                        g.column("b").to_pylist(),
                                        g.column("v_sum").to_pylist())}
    assert got == {(1, "x"): 6, (1, "y"): 2, (2, "x"): 7}


def test_group_by_first_last_any_all():
    rb = agt.record_batch({"k": [1, 1, 2, 2], "v": [5, None, None, 7],
                           "b": [True, False, False, False]})
    g = pc.group_by(rb, "k", [("v", "first"), ("v", "last"),
                              ("b", "any"), ("b", "all")])
    assert g.to_pydict() == {"k": [1, 2], "v_first": [5, 7], "v_last": [5, 7],
                             "b_any": [True, False], "b_all": [False, False]}


def test_group_by_count_all_vs_count():
    rb = agt.record_batch({"k": [1, 1], "v": [None, 3]})
    g = pc.group_by(rb, "k", [("v", "count"), ("v", "count_all")])
    assert g.to_pydict() == {"k": [1], "v_count": [1], "v_count_all": [2]}


# -- join -------------------------------------------------------------------

def test_join_inner():
    left = agt.record_batch({"k": [1, 2, 3, 2], "lv": ["a", "b", "c", "d"]})
    right = agt.record_batch({"k": [2, 2, 4], "rv": [10.0, 20.0, 30.0]})
    j = pc.hash_join(left, right, "k")
    rows = sorted(zip(j.column("k").to_pylist(), j.column("lv").to_pylist(),
                      j.column("rv").to_pylist()))
    assert rows == [(2, "b", 10.0), (2, "b", 20.0), (2, "d", 10.0),
                    (2, "d", 20.0)]


def test_join_left_outer():
    left = agt.record_batch({"k": [1, 2], "lv": ["a", "b"]})
    right = agt.record_batch({"k": [2], "rv": [9]})
    j = pc.hash_join(left, right, "k", join_type="left outer")
    got = sorted(zip(j.column("k").to_pylist(), j.column("rv").to_pylist()),
                 key=lambda r: r[0])
    assert got == [(1, None), (2, 9)]


def test_join_full_outer():
    left = agt.record_batch({"k": [1, 2]})
    right = agt.record_batch({"k": [2, 3], "rv": [9, 8]})
    j = pc.hash_join(left, right, "k", join_type="full outer")
    assert j.num_rows == 3
    assert sorted([x for x in j.column("rv").to_pylist() if x is not None]) \
        == [8, 9]


def test_join_semi_anti():
    left = agt.record_batch({"k": [1, 2, 3]})
    right = agt.record_batch({"k": [2, 2]})
    assert pc.hash_join(left, right, "k",
                        join_type="left semi").to_pydict() == {"k": [2]}
    assert pc.hash_join(left, right, "k",
                        join_type="left anti").to_pydict() == {"k": [1, 3]}
    assert pc.hash_join(left, right, "k",
                        join_type="right semi").to_pydict() == {"k": [2, 2]}
    assert pc.hash_join(left, right, "k",
                        join_type="right anti").to_pydict() == {"k": []}


def test_join_null_keys_never_match():
    left = agt.record_batch({"k": [1, None]})
    right = agt.record_batch({"k": [None, 1], "v": [5, 6]})
    j = pc.hash_join(left, right, "k")
    assert j.to_pydict() == {"k": [1], "v": [6]}


def test_join_string_keys():
    l2 = agt.record_batch({"s": ["x", "y", None], "v": [1, 2, 3]})
    r2 = agt.record_batch({"s": ["y", "z", None], "w": [9, 8, 7]})
    assert pc.hash_join(l2, r2, "s").to_pydict() == \
        {"s": ["y"], "v": [2], "w": [9]}


def test_join_multi_key():
    left = agt.record_batch({"a": [1, 1, 2], "b": ["x", "y", "x"],
                             "v": [10, 20, 30]})
    right = agt.record_batch({"a": [1, 2], "b": ["y", "x"], "w": [7, 8]})
    j = pc.hash_join(left, right, ["a", "b"])
    got = sorted(zip(j.column("v").to_pylist(), j.column("w").to_pylist()))
    assert got == [(20, 7), (30, 8)]


def test_join_matches_pyarrow(rng):
    n = 2000
    lk = rng.integers(0, 100, n)
    rk = rng.integers(50, 150, n // 2)
    left = agt.table({"k": agt.from_numpy(lk),
                      "lv": agt.from_numpy(np.arange(n))})
    right = agt.table({"k": agt.from_numpy(rk),
                       "rv": agt.from_numpy(np.arange(len(rk)))})
    ours = pc.hash_join(left, right, "k")
    pl = pa.table({"k": lk, "lv": np.arange(n)})
    pr = pa.table({"k": rk, "rv": np.arange(len(rk))})
    theirs = pl.join(pr, "k", join_type="inner")
    ours_set = sorted(zip(ours.column("k").to_pylist(),
                          ours.column("lv").to_pylist(),
                          ours.column("rv").to_pylist()))
    theirs_set = sorted(zip(theirs.column("k").to_pylist(),
                            theirs.column("lv").to_pylist(),
                            theirs.column("rv").to_pylist()))
    assert ours_set == theirs_set


def test_hash_join_nested_payload_and_scale():
    """Join output gathers device-side for flat columns and through the
    host kernels for nested payloads (round-3: np.repeat host expansion
    deleted from compute/join.py)."""
    left = agt.table({
        "k": agt.array([1, 2, 3, 4, 2], dt.int64),
        "tags": agt.array([[1], [2, 3], None, [], [5]], dt.list_(dt.int64)),
    })
    right = agt.table({"k": agt.array([2, 3, 2], dt.int64),
                       "v": agt.array([10.0, 20.0, 30.0])})
    j = pc.hash_join(left, right, "k")
    got = sorted(zip(j.column("k").to_pylist(),
                     [tuple(x) if x is not None else None
                      for x in j.column("tags").to_pylist()],
                     j.column("v").to_pylist()))
    assert got == [(2, (2, 3), 10.0), (2, (2, 3), 30.0),
                   (2, (5,), 10.0), (2, (5,), 30.0), (3, None, 20.0)]
    # pyarrow cross-check at a few thousand rows
    import numpy as np
    import pyarrow as pa
    rng = np.random.default_rng(3)
    lk = rng.integers(0, 500, 4000)
    rk = rng.integers(0, 500, 3000)
    lv = rng.standard_normal(4000)
    rv = rng.standard_normal(3000)
    lt = agt.table({"k": agt.from_numpy(lk), "lv": agt.from_numpy(lv)})
    rt = agt.table({"k": agt.from_numpy(rk), "rv": agt.from_numpy(rv)})
    for how_ours, how_pa in [("inner", "inner"), ("left outer", "left outer"),
                             ("full outer", "full outer")]:
        j = pc.hash_join(lt, rt, "k", join_type=how_ours)
        plt = pa.table({"k": lk, "lv": lv})
        prt = pa.table({"k": rk, "rv": rv})
        want = plt.join(prt, "k", join_type=how_pa)
        a = sorted(map(tuple, zip(*[j.column(c).to_pylist()
                                    for c in ("k", "lv", "rv")])),
                   key=lambda x: (x[0] is None, x))
        b = sorted(map(tuple, zip(*[want.column(c).to_pylist()
                                    for c in ("k", "lv", "rv")])),
                   key=lambda x: (x[0] is None, x))
        assert a == b, how_ours


def test_hash_join_null_keys_all_types():
    """Null join keys never match; anti includes null-key left rows
    (reference SQL semantics) — exercised on the sort-merge fast path."""
    import pyarrow as pa
    lt = agt.table({"k": agt.array([1, None, 2, 3], dt.int64),
                    "v": agt.array([10, 20, 30, 40], dt.int64)})
    rt = agt.table({"k": agt.array([2, None, 3], dt.int64),
                    "w": agt.array([5, 6, 7], dt.int64)})
    plt = pa.table({"k": [1, None, 2, 3], "v": [10, 20, 30, 40]})
    prt = pa.table({"k": [2, None, 3], "w": [5, 6, 7]})
    for how in ("inner", "left outer", "left semi", "left anti"):
        got = pc.hash_join(lt, rt, "k", join_type=how)
        want = plt.join(prt, "k", join_type=how)
        cols = [c for c in ("k", "v", "w") if c in want.column_names
                and c in got.schema.names]
        ga = sorted(map(tuple, zip(*[got.column(c).to_pylist()
                                     for c in cols])), key=str)
        wa = sorted(map(tuple, zip(*[want.column(c).to_pylist()
                                     for c in cols])), key=str)
        assert ga == wa, (how, ga, wa)


def test_hash_join_right_full_outer_null_keys_vs_pyarrow():
    import pyarrow as pa
    lt = agt.table({"k": agt.array([1, None, 2, 3], dt.int64),
                    "v": agt.array([10, 20, 30, 40], dt.int64)})
    rt = agt.table({"k": agt.array([2, None, 3, 9], dt.int64),
                    "w": agt.array([5, 6, 7, 8], dt.int64)})
    plt = pa.table({"k": [1, None, 2, 3], "v": [10, 20, 30, 40]})
    prt = pa.table({"k": [2, None, 3, 9], "w": [5, 6, 7, 8]})
    for how in ("right outer", "full outer", "right semi", "right anti"):
        got = pc.hash_join(lt, rt, "k", join_type=how)
        want = plt.join(prt, "k", join_type=how)
        cols = [c for c in ("v", "w") if c in want.column_names
                and c in got.schema.names]
        ga = sorted(map(tuple, zip(*[got.column(c).to_pylist()
                                     for c in cols])), key=str)
        wa = sorted(map(tuple, zip(*[want.column(c).to_pylist()
                                     for c in cols])), key=str)
        assert ga == wa, (how, ga, wa)


def test_join_output_columns_projection():
    lt = agt.table({"k": agt.array([1, 2, 2, 3], dt.int64),
                    "v": agt.array([10, 20, 30, 40], dt.int64),
                    "u": agt.array([1.0, 2.0, 3.0, 4.0], dt.float64)})
    rt = agt.table({"k": agt.array([2, 3, 9], dt.int64),
                    "w": agt.array([5, 6, 8], dt.int64)})
    got = pc.hash_join(lt, rt, "k", join_type="inner",
                       output_columns=["v", "w"])
    assert got.schema.names == ["v", "w"]
    rows = sorted(zip(got.column("v").to_pylist(),
                      got.column("w").to_pylist()))
    assert rows == [(20, 5), (30, 5), (40, 6)]
    # outer joins and semi/anti project too
    got = pc.hash_join(lt, rt, "k", join_type="left outer",
                       output_columns=["k", "w"])
    assert got.schema.names == ["k", "w"]
    assert sorted(zip(got.column("k").to_pylist(),
                      got.column("w").to_pylist()),
                  key=str) == [(1, None), (2, 5), (2, 5), (3, 6)]
    got = pc.hash_join(lt, rt, "k", join_type="left semi",
                       output_columns=["u"])
    assert got.schema.names == ["u"]
    assert sorted(got.column("u").to_pylist()) == [2.0, 3.0, 4.0]


def test_join_output_columns_device_batch():
    from arrow_go_tpu.device.block import batch_from_device, batch_to_device
    lb = agt.record_batch({"k": agt.array([1, 2, 2, 3], dt.int64),
                           "v": agt.array([10, 20, 30, 40], dt.int64)})
    rb = agt.record_batch({"k": agt.array([2, 3, 9], dt.int64),
                           "w": agt.array([5, 6, 8], dt.int64)})
    db = pc.hash_join(batch_to_device(lb), batch_to_device(rb), "k",
                      output_columns=["v", "w"])
    out = batch_from_device(db)
    assert out.schema.names == ["v", "w"]
    assert sorted(zip(out.column("v").to_pylist(),
                      out.column("w").to_pylist())) == \
        [(20, 5), (30, 5), (40, 6)]
