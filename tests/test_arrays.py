import datetime
import decimal as pydec

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt


def test_numeric_roundtrip():
    a = agt.array([1, 2, None, 4], dt.int32)
    assert a.type == dt.int32
    assert len(a) == 4
    assert a.null_count == 1
    assert a.to_pylist() == [1, 2, None, 4]
    assert a[0] == 1 and a[2] is None and a[-1] == 4


def test_from_numpy_zero_copy():
    v = np.arange(10, dtype=np.float64)
    a = agt.from_numpy(v)
    assert a.type == dt.float64
    assert np.shares_memory(a.to_numpy(), v)


def test_bool_array():
    a = agt.array([True, False, None, True])
    assert a.type == dt.bool_
    assert a.to_pylist() == [True, False, None, True]


def test_string_binary():
    s = agt.array(["hello", "", None, "wörld"])
    assert s.type == dt.string
    assert s.to_pylist() == ["hello", "", None, "wörld"]
    b = agt.array([b"\x00\x01", None, b""], dt.binary)
    assert b.to_pylist() == [b"\x00\x01", None, b""]


def test_large_string():
    s = agt.array(["a", None, "bc"], dt.large_string)
    assert s.type == dt.large_string
    assert s.to_pylist() == ["a", None, "bc"]
    assert s.offsets.dtype == np.int64


def test_slicing():
    a = agt.array([1, 2, None, 4, 5])
    s = a.slice(1, 3)
    assert s.to_pylist() == [2, None, 4]
    assert s.null_count == 1
    s2 = a[2:5]
    assert s2.to_pylist() == [None, 4, 5]
    # slice of slice
    assert s.slice(1, 2).to_pylist() == [None, 4]


def test_list_array():
    a = agt.array([[1, 2], [], None, [3, None, 5]])
    assert a.type == dt.list_(dt.int64)
    assert a.to_pylist() == [[1, 2], [], None, [3, None, 5]]


def test_fixed_size_list():
    t = dt.fixed_size_list(dt.int32, 2)
    a = agt.array([[1, 2], None, [3, 4]], t)
    assert a.to_pylist() == [[1, 2], None, [3, 4]]


def test_struct_array():
    a = agt.array([{"x": 1, "y": "a"}, None, {"x": 3, "y": None}],
                  dt.struct({"x": dt.int64, "y": dt.string}))
    assert a.to_pylist() == [{"x": 1, "y": "a"}, None, {"x": 3, "y": None}]
    assert a.field("x").to_pylist() == [1, None, 3]


def test_map_array():
    t = dt.map_(dt.string, dt.int64)
    a = agt.array([{"a": 1, "b": 2}, None, {}], t)
    assert a.to_pylist() == [[("a", 1), ("b", 2)], None, []]


def test_dictionary_array():
    t = dt.dictionary(dt.int16, dt.string)
    a = agt.array(["x", "y", "x", None, "z", "y"], t)
    assert a.to_pylist() == ["x", "y", "x", None, "z", "y"]
    assert a.dictionary.to_pylist() == ["x", "y", "z"]
    assert a.indices.to_pylist()[:3] == [0, 1, 0]
    dec = a.decode()
    assert dec.to_pylist() == ["x", "y", "x", None, "z", "y"]


def test_decimal128():
    t = dt.decimal128(20, 2)
    a = agt.array([pydec.Decimal("12.34"), None, pydec.Decimal("-0.01")], t)
    assert a.to_pylist() == [pydec.Decimal("12.34"), None, pydec.Decimal("-0.01")]
    assert a.unscaled(0) == 1234
    assert a.unscaled(2) == -1


def test_decimal256_big():
    t = dt.decimal256(76, 0)
    big = 10**70 + 7
    a = agt.array([pydec.Decimal(big), pydec.Decimal(-big)], t)
    assert a.unscaled(0) == big
    assert a.unscaled(1) == -big


def test_fixed_size_binary():
    t = dt.fixed_size_binary(3)
    a = agt.array([b"abc", None, b"xyz"], t)
    assert a.to_pylist() == [b"abc", None, b"xyz"]


def test_timestamp_date():
    ts = agt.array([datetime.datetime(2020, 1, 1), None], dt.timestamp("us"))
    assert ts.to_pylist()[0] == 1577836800 * 10**6
    d = agt.array([datetime.date(1970, 1, 2)], dt.date32)
    assert d.to_pylist() == [1]


def test_run_end_encoded():
    t = dt.run_end_encoded(dt.int32, dt.string)
    a = agt.array(["a", "a", "a", "b", None, None, "a"], t)
    assert a.to_pylist() == ["a", "a", "a", "b", None, None, "a"]
    assert len(a.run_ends) == 4
    assert a.decode().to_pylist() == ["a", "a", "a", "b", None, None, "a"]


def test_null_array():
    a = agt.array([None, None, None])
    assert a.type == dt.null
    assert a.null_count == 3
    assert a.to_pylist() == [None, None, None]


def test_concat():
    a = agt.array([1, None, 3])
    b = agt.array([4, 5], dt.int64)
    c = agt.concat_arrays([a, b])
    assert c.to_pylist() == [1, None, 3, 4, 5]

    s1 = agt.array(["a", None])
    s2 = agt.array(["bc"])
    assert agt.concat_arrays([s1, s2]).to_pylist() == ["a", None, "bc"]

    l1 = agt.array([[1], [2, 3]])
    l2 = agt.array([None, [4]], dt.list_(dt.int64))
    assert agt.concat_arrays([l1, l2]).to_pylist() == [[1], [2, 3], None, [4]]


def test_concat_dictionary_unifies():
    t = dt.dictionary(dt.int32, dt.string)
    a = agt.array(["x", "y"], t)
    b = agt.array(["y", "z"], t)
    c = agt.concat_arrays([a, b])
    assert c.to_pylist() == ["x", "y", "y", "z"]
    assert c.dictionary.to_pylist() == ["x", "y", "z"]


def test_record_batch():
    rb = agt.record_batch({"a": [1, 2, 3], "b": ["x", None, "z"]})
    assert rb.num_rows == 3 and rb.num_columns == 2
    assert rb.column("b").to_pylist() == ["x", None, "z"]
    assert rb.slice(1, 2).to_pydict() == {"a": [2, 3], "b": [None, "z"]}
    assert rb.select(["b"]).schema.names == ["b"]
    assert rb.to_pylist()[1] == {"a": 2, "b": None}


def test_table():
    rb1 = agt.record_batch({"a": [1, 2]})
    rb2 = agt.record_batch({"a": [3]})
    t = agt.Table.from_batches([rb1, rb2])
    assert t.num_rows == 3
    assert t.column("a").num_chunks == 2
    assert t.to_pydict() == {"a": [1, 2, 3]}
    combined = t.combine_chunks()
    assert combined.column("a").num_chunks == 1
    batches = t.to_batches(max_chunksize=2)
    assert [b.num_rows for b in batches] == [2, 1]


def test_chunked_array_ops():
    ca = agt.ChunkedArray([agt.array([1, 2]), agt.array([None, 4])],
                          dt.int64)
    assert len(ca) == 4
    assert ca.null_count == 1
    assert ca[2] is None and ca[3] == 4
    assert ca.slice(1, 2).to_pylist() == [2, None]
    assert ca.combine().to_pylist() == [1, 2, None, 4]


def test_builder_validity_optimized_away():
    a = agt.array([1, 2, 3])
    assert a.data.validity is None
    assert a.null_count == 0


def test_tracked_allocator():
    alloc = agt.TrackedAllocator()
    b = alloc.allocate(100)
    assert alloc.allocated_bytes == 100
    with pytest.raises(AssertionError):
        alloc.assert_size(0)
    alloc.free(b)
    alloc.assert_size(0)
    with pytest.raises(RuntimeError):
        alloc.free(b)


def test_builder_append_none_is_null():
    """append(None) == append_null for every builder family (reference
    builders treat nil as AppendNull); finish() resets the builder
    (reference Builder.NewArray reuse semantics)."""
    from arrow_go_tpu.array.builders import make_builder
    cases = [
        (dt.int64, [1, None, 3]),
        (dt.bool_, [True, None]),
        (dt.string, ["a", None]),
        (dt.binary_view, [b"xy", None]),
        (dt.fixed_size_binary(2), [b"ab", None]),
        (dt.decimal128(10, 2), [None]),
        (dt.list_(dt.int64), [[1], None, [2, 3]]),
        (dt.ListViewType(dt.int64), [[1], None]),
        (dt.map_(dt.string, dt.int64), [{"k": 1}, None]),
        (dt.fixed_size_list(dt.int64, 2), [[1, 2], None]),
        (dt.struct({"x": dt.int64}), [{"x": 1}, None]),
        (dt.dictionary(dt.int32, dt.string), ["a", None, "a"]),
        (dt.run_end_encoded(dt.int32, dt.string), ["a", "a", None]),
    ]
    for t, vals in cases:
        b = make_builder(t)
        for v in vals:
            b.append(v)            # None must go through append_null
        arr = b.finish()
        want = [v if not isinstance(v, dict) else v for v in vals]
        if t.id == dt.TypeId.MAP:
            want = [sorted(v.items()) if isinstance(v, dict) else v
                    for v in vals]
            got = [sorted(x) if isinstance(x, list) else x
                   for x in arr.to_pylist()]
            assert got == want, t
        else:
            assert arr.to_pylist() == want, t
        if t.id != dt.TypeId.RUN_END_ENCODED:   # REE nulls live in values
            assert arr.null_count == sum(v is None for v in vals), t
        # finish() reset the builder: next finish is an empty array
        again = b.finish()
        assert len(again) == 0, t
