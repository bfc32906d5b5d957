"""Cross-implementation golden tests against pyarrow (the role the archery
integration harness plays for the reference — SURVEY.md §4)."""
import datetime
import decimal as pydec

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.interop import pyarrow_interop as px

pa = pytest.importorskip("pyarrow")

CASES = [
    ([1, 2, None, 4], dt.int64),
    ([1, 2, 3], dt.int8),
    ([None, 2**63 - 1, -(2**63)], dt.int64),
    ([0, 255, None], dt.uint8),
    ([1.5, None, float("inf")], dt.float64),
    ([1.5, 2.5], dt.float32),
    ([True, None, False], dt.bool_),
    (["a", None, "bc", ""], dt.string),
    ([b"\x00", None], dt.binary),
    (["big", None], dt.large_string),
    ([[1, 2], None, []], dt.list_(dt.int64)),
    ([{"x": 1, "y": "a"}, None], dt.struct({"x": dt.int64, "y": dt.string})),
    ([pydec.Decimal("1.23"), None], dt.decimal128(10, 2)),
    ([pydec.Decimal("999.99")], dt.decimal256(40, 2)),
    ([b"abc", None], dt.fixed_size_binary(3)),
    ([1000, None], dt.timestamp("ms")),
    ([5, None], dt.date32),
    ([12345, None], dt.time64("us")),
    ([[1, 2], None, [3, 4]], dt.fixed_size_list(dt.int32, 2)),
    (["x", "y", None, "x"], dt.dictionary(dt.int32, dt.string)),
]


def _comparable(parr, typ):
    """pyarrow list view comparable to ours: temporal types compare on the
    raw int storage (our to_pylist exposes storage ints)."""
    if typ.is_temporal:
        return parr.cast(pa.int64() if typ.bit_width == 64 else pa.int32()).to_pylist()
    return parr.to_pylist()


@pytest.mark.parametrize("values,typ", CASES, ids=lambda v: str(v)[:40])
def test_roundtrip_ours_to_pyarrow(values, typ):
    ours = agt.array(values, typ)
    theirs = px.array_to_pyarrow(ours)
    theirs.validate(full=True)
    assert _comparable(theirs, typ) == ours.to_pylist()


@pytest.mark.parametrize("values,typ", CASES, ids=lambda v: str(v)[:40])
def test_roundtrip_pyarrow_to_ours(values, typ):
    src = values
    if typ.is_temporal:
        theirs = pa.array(values, pa.int64() if typ.bit_width == 64 else pa.int32()
                          ).cast(px.type_to_pyarrow(typ))
    else:
        theirs = pa.array(values, px.type_to_pyarrow(typ))
    ours = px.array_from_pyarrow(theirs)
    assert ours.type == typ
    assert ours.to_pylist() == _comparable(theirs, typ)


def test_sliced_pyarrow_import():
    theirs = pa.array([1, None, 3, 4, 5]).slice(1, 3)
    ours = px.array_from_pyarrow(theirs)
    assert ours.to_pylist() == [None, 3, 4]


def test_schema_roundtrip():
    s = agt.schema({"a": dt.int64, "b": dt.string, "c": dt.list_(dt.float32)},
                   dt.Metadata({"k": "v"}))
    ps = px.schema_to_pyarrow(s)
    back = px.schema_from_pyarrow(ps)
    assert back.equals(s)
    assert back.metadata.get("k") == "v"


def test_record_batch_roundtrip():
    rb = agt.record_batch({"i": [1, None, 3], "s": ["a", "b", None],
                           "f": [1.0, 2.0, 3.0]})
    prb = px.record_batch_to_pyarrow(rb)
    prb.validate(full=True)
    back = px.record_batch_from_pyarrow(prb)
    assert back.equals(rb)


def test_table_roundtrip():
    t = agt.Table.from_batches([agt.record_batch({"x": [1, 2]}),
                                agt.record_batch({"x": [None, 4]})])
    pt_ = px.table_to_pyarrow(t)
    back = px.table_from_pyarrow(pt_)
    assert back.to_pydict() == t.to_pydict()


def test_dictionary_roundtrip_via_pyarrow():
    theirs = pa.array(["a", "b", "a", None]).dictionary_encode()
    ours = px.array_from_pyarrow(theirs)
    assert ours.to_pylist() == ["a", "b", "a", None]
    back = px.array_to_pyarrow(ours)
    assert back.to_pylist() == theirs.to_pylist()


# ---------------------------------------------------------------------------
# Device Data Interface + Async stream (reference cdata abi.h device/async
# sections, interface.go:300-360)
# ---------------------------------------------------------------------------

def test_cdata_device_array_roundtrip():
    from arrow_go_tpu import cdata as cd
    a = agt.array([1, None, 3], dt.int64)
    dptr = cd.device_array_handle()
    sptr, _ = cd.schema_handles()
    cd.export_device_array(a, dptr, sptr)
    f = cd.import_field(sptr)
    back = cd.import_device_array(dptr, f.type)
    assert back.to_pylist() == [1, None, 3]


def test_cdata_device_array_pyarrow():
    pa = pytest.importorskip("pyarrow")
    if not hasattr(pa.Array, "_import_from_c_device"):
        pytest.skip("pyarrow too old for device interface")
    from arrow_go_tpu import cdata as cd
    a = agt.array([1.5, None, 2.5], dt.float64)
    dptr = cd.device_array_handle()
    sptr, _ = cd.schema_handles()
    cd.export_device_array(a, dptr, sptr)
    arr = pa.Array._import_from_c_device(dptr, sptr)
    assert arr.to_pylist() == [1.5, None, 2.5]


def test_cdata_device_stream_roundtrip():
    from arrow_go_tpu import cdata as cd
    t = agt.table({"x": agt.array([1, 2, 3, 4], dt.int32),
                   "s": ["a", None, "c", "d"]})
    ptr = cd.device_stream_handle()
    cd.export_device_stream(t, ptr)
    got = cd.import_device_stream(ptr).read_all()
    assert got.to_pydict() == t.to_pydict()


def test_cdata_async_stream_roundtrip():
    from arrow_go_tpu import cdata as cd
    t = agt.table({"x": agt.array(list(range(10)), dt.int64),
                   "y": agt.array([float(i) for i in range(10)],
                                  dt.float64)})
    batches = t.to_batches(max_chunksize=3)  # several tasks
    consumer = cd.AsyncRecordBatchStream(queue_size=2)
    cd.export_async_stream((t.schema, iter(batches)), consumer.handler_ptr)
    got = consumer.read_all()
    assert got.to_pydict() == t.to_pydict()
    assert consumer.error is None
