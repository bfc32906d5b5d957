"""Integration-JSON coverage of every type family (reference
arrow/internal/arrjson/arrjson.go:511-543,781 — dictionaries section,
unions, run-end encoding, views, list views, intervals), round-tripped
through write_arrjson/read_arrjson and cross-checked against pyarrow
semantics where pyarrow can build the input."""
import json

import numpy as np
import pyarrow as pa
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.array.builders import make_builder
from arrow_go_tpu.array.record import RecordBatch
from arrow_go_tpu.interop.arrjson import read_arrjson, write_arrjson
from arrow_go_tpu.interop.pyarrow_interop import array_from_pyarrow

from fixtures import canonical_batches


def _roundtrip(rb: RecordBatch) -> RecordBatch:
    text = write_arrjson([rb])
    back = read_arrjson(text)
    assert len(back) == 1
    return back[0]


def _assert_equal(a: RecordBatch, b: RecordBatch):
    assert a.schema.names == b.schema.names
    for i in range(a.num_columns):
        ca, cb = a.column(i), b.column(i)
        assert ca.type == cb.type, a.schema.names[i]
        la, lb = ca.to_pylist(), cb.to_pylist()
        if any(isinstance(v, float) for v in la if v is not None):
            for va, vb_ in zip(la, lb):
                if va is None or (isinstance(va, float) and va != va):
                    assert vb_ is None or vb_ != vb_
                else:
                    assert va == vb_
        else:
            assert la == lb, a.schema.names[i]


@pytest.mark.parametrize("family", ["primitives", "binary", "temporal",
                                    "decimal", "nested", "dictionary"])
def test_arrjson_canonical_families(family):
    rb = canonical_batches()[family]
    _assert_equal(rb, _roundtrip(rb))


def test_arrjson_dictionaries_section_shape():
    rb = canonical_batches()["dictionary"]
    doc = json.loads(write_arrjson([rb]))
    assert "dictionaries" in doc
    ids = [d["id"] for d in doc["dictionaries"]]
    assert sorted(ids) == ids and len(ids) == 2
    fj = doc["schema"]["fields"][0]
    assert fj["dictionary"]["indexType"]["name"] == "int"
    # the record column holds index DATA only
    col0 = doc["batches"][0]["columns"][0]
    assert all(isinstance(v, int) for v in col0["DATA"])


def test_arrjson_unions():
    for mode in ("sparse", "dense"):
        if mode == "sparse":
            parr = pa.UnionArray.from_sparse(
                pa.array([0, 1, 0, 0], pa.int8()),
                [pa.array([1, None, 3, 4], pa.int64()),
                 pa.array(["a", "b", None, "d"])])
        else:
            parr = pa.UnionArray.from_dense(
                pa.array([0, 1, 0, 1], pa.int8()),
                pa.array([0, 0, 1, 1], pa.int32()),
                [pa.array([10, 20], pa.int64()),
                 pa.array(["x", None])])
        ours = array_from_pyarrow(parr)
        schema = dt.Schema([dt.Field("u", ours.type, True)])
        rb = RecordBatch(schema, [ours], len(ours))
        back = _roundtrip(rb)
        assert back.column(0).to_pylist() == parr.to_pylist()


def test_arrjson_run_end_encoded():
    parr = pa.RunEndEncodedArray.from_arrays(
        pa.array([2, 5, 7], pa.int32()),
        pa.array(["a", None, "b"]))
    ours = array_from_pyarrow(parr)
    rb = RecordBatch(dt.Schema([dt.Field("r", ours.type, True)]),
                     [ours], len(ours))
    back = _roundtrip(rb)
    assert back.column(0).to_pylist() == parr.to_pylist()
    doc = json.loads(write_arrjson([rb]))
    col = doc["batches"][0]["columns"][0]
    assert "VALIDITY" not in col and len(col["children"]) == 2


def test_arrjson_views():
    svals = ["short", "a" * 25, None, "", "exactly12chr", "longer than twelve"]
    bvals = [b"x" * 40, None, b"yo", b"", b"k" * 13, b"q" * 12]
    sb = make_builder(dt.string_view)
    for v in svals:
        sb.append(v) if v is not None else sb.append_null()
    bb = make_builder(dt.binary_view)
    for v in bvals[:len(svals)]:
        bb.append(v) if v is not None else bb.append_null()
    sv, bv = sb.finish(), bb.finish()
    rb = RecordBatch(dt.Schema([dt.Field("s", dt.string_view, True),
                                dt.Field("b", dt.binary_view, True)]),
                     [sv, bv], len(sv))
    back = _roundtrip(rb)
    assert back.column(0).to_pylist() == svals
    assert back.column(1).to_pylist() == bvals[:len(svals)]
    doc = json.loads(write_arrjson([rb]))
    col = doc["batches"][0]["columns"][0]
    assert any("PREFIX_HEX" in v for v in col["VIEWS"])
    assert any("INLINED" in v for v in col["VIEWS"])
    assert "VARIADIC_DATA_BUFFERS" in col


def test_arrjson_list_views():
    lvals = [[1, 2, 3], None, [], [7], [9, 9]]
    lvt = dt.ListViewType(dt.Field("item", dt.int64, True))
    b = make_builder(lvt)
    for v in lvals:
        b.append(v) if v is not None else b.append_null()
    arr = b.finish()
    rb = RecordBatch(dt.Schema([dt.Field("lv", lvt, True)]),
                     [arr], len(arr))
    back = _roundtrip(rb)
    assert back.column(0).to_pylist() == lvals
    col = json.loads(write_arrjson([rb]))["batches"][0]["columns"][0]
    assert "OFFSET" in col and "SIZE" in col


def test_arrjson_intervals():
    mi = agt.array([1, None, -3], dt.month_interval)
    vals_dt = np.zeros(3, dt.day_time_interval.np_dtype)
    vals_dt[0] = (5, 100)
    vals_dt[2] = (-1, 7)
    from arrow_go_tpu.array.arrays import from_numpy
    di = from_numpy(vals_dt, np.array([True, False, True]),
                    dt.day_time_interval)
    vals_mdn = np.zeros(3, dt.month_day_nano_interval.np_dtype)
    vals_mdn[0] = (1, 2, 3_000_000_000)
    vals_mdn[1] = (0, -4, -5)
    mdn = from_numpy(vals_mdn, np.array([True, True, False]),
                     dt.month_day_nano_interval)
    rb = RecordBatch(dt.Schema([dt.Field("m", dt.month_interval, True),
                                dt.Field("d", dt.day_time_interval, True),
                                dt.Field("n", dt.month_day_nano_interval,
                                         True)]),
                     [mi, di, mdn], 3)
    back = _roundtrip(rb)
    _assert_equal(rb, back)
    doc = json.loads(write_arrjson([rb]))
    cols = doc["batches"][0]["columns"]
    assert cols[1]["DATA"][0] == {"days": 5, "milliseconds": 100}
    assert cols[2]["DATA"][0]["nanoseconds"] == 3_000_000_000
    assert doc["schema"]["fields"][1]["type"] == {
        "name": "interval", "unit": "DAY_TIME"}


def test_arrjson_nested_dictionary():
    # list<dictionary<string>> — nested dictionary ids resolve
    pdict = pa.array(["a", "b", "a", None, "b"]).dictionary_encode()
    parr = pa.ListArray.from_arrays(pa.array([0, 2, 2, 5], pa.int32()),
                                    pdict)
    ours = array_from_pyarrow(parr)
    rb = RecordBatch(dt.Schema([dt.Field("ld", ours.type, True)]),
                     [ours], len(ours))
    back = _roundtrip(rb)
    assert back.column(0).to_pylist() == parr.to_pylist()
