"""IPC cross-implementation golden tests: our writer -> pyarrow reader and
pyarrow writer -> our reader, both stream and file formats (the role of the
reference's arrow-json-integration-test / archery runs, SURVEY.md §4)."""
import io

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import ipc

pa = pytest.importorskip("pyarrow")
import pyarrow.ipc as paipc  # noqa: E402

from arrow_go_tpu.interop import pyarrow_interop as px  # noqa: E402


def _sample_batch():
    return agt.record_batch({
        "i64": [1, 2, None, 4],
        "f32": agt.array([1.5, None, 3.5, 4.5], dt.float32),
        "s": ["a", None, "ccc", ""],
        "b": [True, False, None, True],
        "lst": agt.array([[1, 2], None, [], [3]], dt.list_(dt.int64)),
        "st": agt.array([{"x": 1, "y": "u"}, None, {"x": 3, "y": None},
                         {"x": 4, "y": "w"}],
                        dt.struct({"x": dt.int64, "y": dt.string})),
        "dec": agt.array([None, 2, 3, 4], dt.decimal128(20, 2)),
        "dict": agt.array(["p", "q", "p", None],
                          dt.dictionary(dt.int32, dt.string)),
        "ts": agt.array([1, 2, 3, None], dt.timestamp("us", "UTC")),
    })


def test_stream_roundtrip_ours():
    rb = _sample_batch()
    buf = io.BytesIO()
    with ipc.new_stream(buf, rb.schema) as w:
        w.write(rb)
        w.write(rb.slice(1, 2))
    buf.seek(0)
    r = ipc.open_stream(buf)
    assert r.schema.equals(rb.schema)
    batches = list(r)
    assert len(batches) == 2
    assert batches[0].equals(rb)
    assert batches[1].to_pydict() == rb.slice(1, 2).to_pydict()


def test_stream_ours_to_pyarrow():
    rb = _sample_batch()
    buf = io.BytesIO()
    with ipc.new_stream(buf, rb.schema) as w:
        w.write(rb)
    data = buf.getvalue()
    pr = paipc.open_stream(data)
    pb = pr.read_all()
    pb.validate(full=True)
    expected = px.record_batch_to_pyarrow(rb)
    assert pb.to_batches()[0].equals(expected)


def test_stream_pyarrow_to_ours():
    prb = px.record_batch_to_pyarrow(_sample_batch())
    sink = io.BytesIO()
    with paipc.new_stream(sink, prb.schema) as w:
        w.write_batch(prb)
    sink.seek(0)
    r = ipc.open_stream(sink)
    got = r.read_next_batch()
    assert got.to_pydict() == _sample_batch().to_pydict()


def test_file_roundtrip_ours(tmp_path):
    rb = _sample_batch()
    p = tmp_path / "t.arrow"
    with open(p, "wb") as f:
        with ipc.new_file(f, rb.schema) as w:
            w.write(rb)
            w.write(rb)
    with open(p, "rb") as f:
        r = ipc.open_file(f)
        assert r.num_record_batches == 2
        assert r.get_batch(1).equals(rb)
        t = r.read_all()
        assert t.num_rows == 8


def test_file_ours_to_pyarrow(tmp_path):
    rb = _sample_batch()
    p = tmp_path / "t.arrow"
    with open(p, "wb") as f:
        with ipc.new_file(f, rb.schema) as w:
            w.write(rb)
    with pa.memory_map(str(p)) as source:
        pr = paipc.open_file(source)
        pt = pr.read_all()
        pt.validate(full=True)
        assert pt.to_batches()[0].equals(px.record_batch_to_pyarrow(rb))


def test_file_pyarrow_to_ours(tmp_path):
    prb = px.record_batch_to_pyarrow(_sample_batch())
    p = tmp_path / "t.arrow"
    with paipc.new_file(str(p), prb.schema) as w:
        w.write_batch(prb)
    with open(p, "rb") as f:
        r = ipc.open_file(f)
        assert r.get_batch(0).to_pydict() == _sample_batch().to_pydict()


def test_zstd_compression_roundtrip():
    rb = agt.record_batch({"x": list(range(1000)),
                           "y": ["v" + str(i % 7) for i in range(1000)]})
    buf = io.BytesIO()
    with ipc.new_stream(buf, rb.schema, compression="zstd") as w:
        w.write(rb)
    data = buf.getvalue()
    r = ipc.open_stream(data)
    assert r.read_next_batch().equals(rb)
    # pyarrow can read our compressed stream
    pb = paipc.open_stream(data).read_all()
    pb.validate(full=True)
    assert pb.num_rows == 1000
    assert pb.column("x").to_pylist() == list(range(1000))


def test_zstd_pyarrow_to_ours():
    prb = pa.record_batch({"x": list(range(500))})
    sink = io.BytesIO()
    opts = paipc.IpcWriteOptions(compression="zstd")
    with paipc.new_stream(sink, prb.schema, options=opts) as w:
        w.write_batch(prb)
    r = ipc.open_stream(sink.getvalue())
    assert r.read_next_batch().to_pydict() == {"x": list(range(500))}


def test_empty_stream():
    s = agt.schema({"a": dt.int64})
    buf = io.BytesIO()
    with ipc.new_stream(buf, s) as w:
        pass
    r = ipc.open_stream(buf.getvalue())
    assert r.schema.equals(s)
    assert list(r) == []


def test_schema_metadata_roundtrip():
    s = agt.schema({"a": dt.int64}, dt.Metadata({"origin": "test"}))
    buf = io.BytesIO()
    with ipc.new_stream(buf, s) as w:
        w.write(agt.RecordBatch(s, [agt.array([1])]))
    r = ipc.open_stream(buf.getvalue())
    assert r.schema.metadata.get("origin") == "test"


def test_dictionary_replacement():
    t = dt.dictionary(dt.int32, dt.string)
    s = agt.schema({"d": t})
    rb1 = agt.RecordBatch(s, [agt.array(["a", "b"], t)])
    rb2 = agt.RecordBatch(s, [agt.array(["c", "d"], t)])
    buf = io.BytesIO()
    with ipc.new_stream(buf, s) as w:
        w.write(rb1)
        w.write(rb2)
    r = ipc.open_stream(buf.getvalue())
    got = list(r)
    assert got[0].column(0).to_pylist() == ["a", "b"]
    assert got[1].column(0).to_pylist() == ["c", "d"]


def test_lz4_compression_both_directions():
    rb = agt.record_batch({"x": list(range(2000)),
                           "s": [f"v{i % 9}" for i in range(2000)]})
    buf = io.BytesIO()
    with ipc.new_stream(buf, rb.schema, compression="lz4") as w:
        w.write(rb)
    data = buf.getvalue()
    assert ipc.open_stream(data).read_next_batch().equals(rb)
    pb = paipc.open_stream(data).read_all()
    pb.validate(full=True)
    assert pb.column("x").to_pylist() == list(range(2000))
    sink = io.BytesIO()
    opts = paipc.IpcWriteOptions(compression="lz4")
    with paipc.new_stream(sink, pa.schema([("x", pa.int64())]),
                          options=opts) as w:
        w.write_batch(pa.record_batch({"x": list(range(1000))}))
    got = ipc.open_stream(sink.getvalue()).read_next_batch()
    assert got.to_pydict() == {"x": list(range(1000))}


import os

REF_DIR = "/root/reference/arrow/ipc/testdata"


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference checkout not present")
def test_reference_golden_ipc_files():
    """Golden .arrow/.arrows files written by arrow-go itself."""
    t = ipc.open_file(os.path.join(REF_DIR, "custom_metadata.arrow")).read_all()
    assert t.schema.metadata.get("schema_key") == "schema_value"
    with open(os.path.join(REF_DIR, "custom_metadata_stream.arrows"), "rb") as f:
        t2 = ipc.open_stream(f).read_all()
    assert t2.to_pydict() == t.to_pydict()
    # matches pyarrow's decode of the same files
    ptab = paipc.open_file(os.path.join(REF_DIR,
                                        "custom_metadata.arrow")).read_all()
    assert t.to_pydict() == ptab.to_pydict()


# ---------------------------------------------------------------------------
# endianness: big-endian files (reference arrow/ipc/endian_swap.go)
# ---------------------------------------------------------------------------

def test_big_endian_stream_roundtrip():
    import decimal as pydec
    t = agt.table({
        "i": agt.array([1, None, 3], dt.int64),
        "i16": agt.array([100, -7, None], dt.int16),
        "f": agt.array([0.5, None, 2.5], dt.float64),
        "s": agt.array(["aa", None, "ccc"], dt.string),
        "ls": agt.array([[1, 2], None, [3]], dt.list_(dt.int32)),
        "st": agt.array([{"x": 1.0}, None, {"x": 3.0}],
                        dt.struct([dt.Field("x", dt.float64)])),
        "dec": agt.array([pydec.Decimal("1.23"), None,
                          pydec.Decimal("-9.87")], dt.decimal128(10, 2)),
        "d": agt.array(["low", "hi", "low"],
                       dt.dictionary(dt.int32, dt.string)),
    })
    buf = io.BytesIO()
    with ipc.StreamWriter(buf, t.schema, endianness="big") as w:
        w.write_table(t)
    blob = buf.getvalue()
    r = ipc.StreamReader(io.BytesIO(blob))
    assert r._swap is True
    got = r.read_all()
    assert got.to_pydict() == t.to_pydict()
    # the BE body must differ from the LE body (proves the payload really
    # is byte-swapped on the wire, not just flagged)
    buf_le = io.BytesIO()
    with ipc.StreamWriter(buf_le, t.schema) as w:
        w.write_table(t)
    assert blob != buf_le.getvalue()


def test_big_endian_file_roundtrip():
    t = agt.table({"x": agt.array([1, 2, None], dt.int32),
                   "y": agt.array([1.5, None, 3.5], dt.float32)})
    buf = io.BytesIO()
    w = ipc.FileWriter(buf, t.schema, endianness="big")
    w.write_table(t)
    w.close()
    r = ipc.FileReader(buf.getvalue())
    assert r._swap is True
    assert r.read_all().to_pydict() == t.to_pydict()


def test_compress_concurrency():
    """Concurrent per-buffer body compression (reference
    WithCompressConcurrency, ipc/ipc.go:160-170): same bytes either way."""
    import numpy as np
    cols = {f"c{i}": agt.array(np.arange(1000) % 7) for i in range(6)}
    t = agt.table(cols)
    serial, conc = io.BytesIO(), io.BytesIO()
    with ipc.StreamWriter(serial, t.schema, compression="zstd") as w:
        w.write_table(t)
    with ipc.StreamWriter(conc, t.schema, compression="zstd",
                          compression_concurrency=4) as w:
        w.write_table(t)
    assert serial.getvalue() == conc.getvalue()
    got = ipc.StreamReader(io.BytesIO(conc.getvalue())).read_all()
    assert got.to_pydict() == t.to_pydict()


def test_concurrent_body_decompression():
    """decompress_concurrency>1 (read-side WithCompressConcurrency mirror)
    must be byte-identical to the serial decode for every codec."""
    t = agt.table({"x": list(range(20000)),
                   "s": [f"value_{i % 37}" for i in range(20000)],
                   "f": [float(i) * 0.5 for i in range(20000)]})
    for codec in ("zstd", "lz4"):
        buf = io.BytesIO()
        with ipc.new_file(buf, t.schema, compression=codec) as w:
            w.write_table(t)
        data = buf.getvalue()
        serial = ipc.open_file(data).read_all()
        conc = ipc.open_file(data, decompress_concurrency=4).read_all()
        assert conc.to_pydict() == serial.to_pydict() == t.to_pydict()
        # stream flavor
        sbuf = io.BytesIO()
        with ipc.new_stream(sbuf, t.schema, compression=codec) as w:
            w.write_table(t)
        got = ipc.open_stream(sbuf.getvalue(),
                              decompress_concurrency=4).read_all()
        assert got.to_pydict() == t.to_pydict()


def test_file_reader_mmap_zero_copy(tmp_path):
    """use_mmap=True: record-batch bodies are views of the mapped file
    (reference ipc/file_reader.go:222-228), bit-identical to the
    buffered read."""
    import numpy as np
    import arrow_go_tpu as agt
    from arrow_go_tpu.ipc import open_file, FileWriter

    rng = np.random.default_rng(5)
    rb = agt.record_batch({
        "a": agt.from_numpy(rng.standard_normal(10000)),
        "s": agt.array([f"v{i % 11}" for i in range(10000)]),
    })
    path = str(tmp_path / "m.arrow")
    with open(path, "wb") as f:
        w = FileWriter(f, rb.schema)
        w.write(rb)
        w.close()
    r_m = open_file(path, use_mmap=True)
    r_b = open_file(path)
    tm = r_m.read_all()
    tb = r_b.read_all()
    assert tm.to_pydict() == tb.to_pydict()
    # the mmap path must hand out views of the map, not copies
    meta, body = r_m._read_at(*r_m._blocks[0])
    assert isinstance(body, memoryview)
    a0 = tm.to_batches()[0].column(0).to_numpy()
    assert a0.base is not None      # aliases the map, not an owned copy
