"""Parquet cross-implementation tests vs pyarrow.parquet (both directions),
covering types, nesting, codecs, row groups, dictionary encoding, stats."""
import decimal as pydec
import os
import io

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import parquet as pq

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as papq  # noqa: E402


def _roundtrip_ours(t, **kw):
    buf = io.BytesIO()
    pq.write_table(t, buf, **kw)
    return pq.read_table(buf.getvalue())


def _ours_to_pyarrow(t, **kw):
    buf = io.BytesIO()
    pq.write_table(t, buf, **kw)
    return papq.read_table(io.BytesIO(buf.getvalue()))


def _pyarrow_to_ours(pt, **kw):
    buf = io.BytesIO()
    papq.write_table(pt, buf, **kw)
    return pq.read_table(buf.getvalue())


def test_basic_types_roundtrip():
    t = agt.table({"i8": agt.array([1, None, 3], dt.int8),
                   "i16": agt.array([-5, 6, None], dt.int16),
                   "i32": agt.array([1, 2, 3], dt.int32),
                   "i64": [10**12, None, -5],
                   "u8": agt.array([0, 255, None], dt.uint8),
                   "u32": agt.array([0, 2**31 + 5, None], dt.uint32),
                   "u64": agt.array([2**63 + 1, 1, None], dt.uint64),
                   "f32": agt.array([1.5, None, 2.5], dt.float32),
                   "f64": [1.5, 2.5, None],
                   "b": [True, None, False],
                   "s": ["x", None, "yy"],
                   "bin": agt.array([b"\x00\x01", None, b""], dt.binary)})
    back = _roundtrip_ours(t)
    assert back.to_pydict() == t.to_pydict()
    pt = _ours_to_pyarrow(t)
    pt.validate(full=True)
    assert pt.to_pydict() == t.to_pydict()


def test_temporal_decimal_roundtrip():
    t = agt.table({
        "ts": agt.array([1, None, 3], dt.timestamp("us")),
        "tsms": agt.array([100, 200, None], dt.timestamp("ms")),
        "d32": agt.array([10, None, 20], dt.date32),
        "t32": agt.array([1000, None, 2000], dt.time32("ms")),
        "t64": agt.array([1, 2, None], dt.time64("us")),
        "dec": agt.array([pydec.Decimal("1.23"), None,
                          pydec.Decimal("-99.99")], dt.decimal128(20, 2)),
        "dec64": agt.array([pydec.Decimal("5.5"), None, pydec.Decimal("0.1")],
                           dt.decimal64(10, 1)),
        "fsb": agt.array([b"abc", None, b"xyz"], dt.fixed_size_binary(3)),
        "f16": agt.array(np.array([1.5, 2.5, -1.0], np.float16)),
    })
    back = _roundtrip_ours(t)
    assert back.to_pydict() == t.to_pydict()
    pt = _ours_to_pyarrow(t)
    pt.validate(full=True)


def test_pyarrow_to_ours_types():
    pt = pa.table({
        "i": pa.array([1, None, 3]),
        "f": pa.array([1.5, None, 2.5], pa.float32()),
        "s": pa.array(["a", None, "b"]),
        "b": pa.array([True, False, None]),
        "dec": pa.array([pydec.Decimal("1.50"), None],
                        pa.decimal128(10, 2)).take(pa.array([0, 1, 0])),
        "ts": pa.array([1, 2, None], pa.timestamp("us")),
    })
    ours = _pyarrow_to_ours(pt)
    assert ours.column("i").to_pylist() == [1, None, 3]
    assert ours.column("s").to_pylist() == ["a", None, "b"]
    assert ours.column("dec").to_pylist() == [pydec.Decimal("1.50"), None,
                                              pydec.Decimal("1.50")]
    assert ours.column("ts").to_pylist() == [1, 2, None]


@pytest.mark.parametrize(
    "codec", ["none", "snappy", "gzip", "zstd", "lz4", "brotli"])
def test_codecs_both_directions(codec):
    if codec == "brotli":
        from arrow_go_tpu.parquet.compress import _brotli_backend
        if _brotli_backend() is None:
            pytest.skip("no brotli library available")
    t = agt.table({"x": list(range(500)),
                   "s": [f"value_{i % 11}" for i in range(500)]})
    back = _roundtrip_ours(t, compression=codec)
    assert back.to_pydict() == t.to_pydict()
    pt = _ours_to_pyarrow(t, compression=codec)
    pt.validate(full=True)
    assert pt.column("x").to_pylist() == list(range(500))
    # pyarrow writes, we read
    pa_codec = {"none": "NONE", "snappy": "snappy", "gzip": "gzip",
                "zstd": "zstd", "lz4": "lz4", "brotli": "brotli"}[codec]
    ours = _pyarrow_to_ours(pa.table(t.to_pydict()), compression=pa_codec)
    assert ours.to_pydict() == t.to_pydict()


def test_row_groups():
    t = agt.table({"x": list(range(100))})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=30)
    pf = pq.ParquetFile(buf.getvalue())
    assert pf.num_row_groups == 4
    assert pf.read_row_group(0).num_rows == 30
    assert pf.read_row_group(3).num_rows == 10
    assert pf.read_table().to_pydict() == t.to_pydict()
    # pyarrow sees the same row groups
    ppf = papq.ParquetFile(io.BytesIO(buf.getvalue()))
    assert ppf.num_row_groups == 4


def test_list_column_roundtrip():
    t = agt.table({"l": agt.array([[1, 2], None, [], [3, None, 5]],
                                  dt.list_(dt.int64))})
    back = _roundtrip_ours(t)
    assert back.to_pydict() == t.to_pydict()
    pt = _ours_to_pyarrow(t)
    pt.validate(full=True)
    assert pt.column("l").to_pylist() == [[1, 2], None, [], [3, None, 5]]


def test_list_pyarrow_to_ours():
    pt = pa.table({"l": [[1, 2], None, [], [3, None]],
                   "ls": [["a"], ["b", None], None, []]})
    ours = _pyarrow_to_ours(pt)
    assert ours.column("l").to_pylist() == [[1, 2], None, [], [3, None]]
    assert ours.column("ls").to_pylist() == [["a"], ["b", None], None, []]


def test_struct_column_roundtrip():
    st = dt.struct({"x": dt.int64, "y": dt.string})
    t = agt.table({"s": agt.array([{"x": 1, "y": "a"}, None,
                                   {"x": 3, "y": None}], st)})
    back = _roundtrip_ours(t)
    assert back.to_pydict() == t.to_pydict()
    pt = _ours_to_pyarrow(t)
    pt.validate(full=True)
    assert pt.column("s").to_pylist() == [{"x": 1, "y": "a"}, None,
                                          {"x": 3, "y": None}]


def test_struct_pyarrow_to_ours():
    pt = pa.table({"s": pa.array([{"a": 1, "b": [1, 2]},
                                  {"a": None, "b": []}, None],
                                 pa.struct([("a", pa.int64()),
                                            ("b", pa.list_(pa.int64()))]))})
    ours = _pyarrow_to_ours(pt)
    assert ours.column("s").to_pylist() == \
        [{"a": 1, "b": [1, 2]}, {"a": None, "b": []}, None]


def test_dictionary_encoding_used():
    t = agt.table({"s": ["a", "b", "a"] * 100})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_dictionary=True)
    pf = pq.ParquetFile(buf.getvalue())
    encs = pf.metadata.row_groups[0].columns[0].meta_data.encodings
    from arrow_go_tpu.parquet import format as fmt
    assert int(fmt.Encoding.PLAIN_DICTIONARY) in encs
    assert pf.read_table().to_pydict() == t.to_pydict()


def test_dictionary_column_type():
    t = agt.table({"d": agt.array(["x", "y", None, "x"],
                                  dt.dictionary(dt.int32, dt.string))})
    pt = _ours_to_pyarrow(t)
    assert pt.column("d").to_pylist() == ["x", "y", None, "x"]


def test_statistics_written():
    t = agt.table({"x": [5, 1, None, 9]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    ppf = papq.ParquetFile(io.BytesIO(buf.getvalue()))
    st = ppf.metadata.row_group(0).column(0).statistics
    assert st.min == 1 and st.max == 9 and st.null_count == 1


def test_column_selection():
    t = agt.table({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 0.25]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    got = pq.read_table(buf.getvalue(), columns=["b", "c"])
    assert got.to_pydict() == {"b": ["x", "y"], "c": [0.5, 0.25]}


def test_pyarrow_v2_data_pages():
    pt = pa.table({"x": [1, None, 3], "s": ["a", "b", None]})
    buf = io.BytesIO()
    papq.write_table(pt, buf, data_page_version="2.0")
    ours = pq.read_table(buf.getvalue())
    assert ours.to_pydict() == {"x": [1, None, 3], "s": ["a", "b", None]}


def test_pyarrow_multi_page():
    # force many pages in one chunk
    pt = pa.table({"x": list(range(50000))})
    buf = io.BytesIO()
    papq.write_table(pt, buf, data_page_size=1024, use_dictionary=False)
    ours = pq.read_table(buf.getvalue())
    assert ours.column("x").to_pylist() == list(range(50000))


def test_schema_metadata():
    s = agt.schema({"a": dt.int64}, dt.Metadata({"team": "tpu"}))
    t = agt.Table.from_batches([agt.RecordBatch(s, [agt.array([1, 2])])])
    back = _roundtrip_ours(t)
    assert back.schema.metadata.get("team") == "tpu"


def test_all_null_column():
    t = agt.table({"x": agt.array([None, None], dt.int64)})
    assert _roundtrip_ours(t).to_pydict() == {"x": [None, None]}


def test_empty_table():
    t = agt.table({"x": agt.array([], dt.int64)})
    back = _roundtrip_ours(t)
    assert back.num_rows == 0
    assert back.schema.field(0).type == dt.int64


def test_int96_timestamps():
    pt = pa.table({"ts": pa.array([0, 10**15], pa.timestamp("ns"))})
    buf = io.BytesIO()
    papq.write_table(pt, buf, use_deprecated_int96_timestamps=True)
    ours = pq.read_table(buf.getvalue())
    assert ours.column("ts").to_pylist() == [0, 10**15]


def test_large_random_parity(rng):
    n = 20000
    vals = rng.integers(-10**9, 10**9, n)
    mask = rng.random(n) < 0.9
    strs = [f"s{int(v) % 997}" if m else None
            for v, m in zip(vals, rng.random(n) < 0.95)]
    t = agt.table({"v": agt.from_numpy(vals, mask), "s": strs})
    pt = _ours_to_pyarrow(t, compression="zstd")
    pt.validate(full=True)
    assert pt.to_pydict() == t.to_pydict()
    ours = _pyarrow_to_ours(pa.table(t.to_pydict()), compression="snappy")
    assert ours.to_pydict() == t.to_pydict()


# -- bloom filters / page index / pruning / extra encodings ------------------

def test_bloom_filter_roundtrip():
    from arrow_go_tpu.parquet import format as fmt
    t = agt.table({"x": list(range(100)), "s": [f"k{i % 7}" for i in range(100)]})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=25, write_bloom_filters=True)
    pf = pq.ParquetFile(buf.getvalue())
    bf = pf.read_bloom_filter(0, 0)
    assert all(bf.check(v, fmt.Type.INT64) for v in range(25))
    assert not bf.check(9999, fmt.Type.INT64)
    sbf = pf.read_bloom_filter(0, 1)
    assert sbf.check("k1", fmt.Type.BYTE_ARRAY)
    assert not sbf.check("zzz", fmt.Type.BYTE_ARRAY)


def test_bloom_serialize_roundtrip():
    from arrow_go_tpu.parquet.bloom import BloomFilter
    from arrow_go_tpu.parquet import format as fmt
    bf = BloomFilter(8)
    for v in [1, 5, 10**12]:
        bf.insert(v, fmt.Type.INT64)
    back = BloomFilter.deserialize(bf.serialize())
    assert back.check(5, fmt.Type.INT64)
    assert not back.check(7, fmt.Type.INT64)


def test_page_index_roundtrip():
    t = agt.table({"x": [5, 1, 9]})
    buf = io.BytesIO()
    pq.write_table(t, buf, write_page_index=True)
    pf = pq.ParquetFile(buf.getvalue())
    ci = pf.read_column_index(0, 0)
    import struct as _s
    assert _s.unpack("<q", ci.min_values[0])[0] == 1
    assert _s.unpack("<q", ci.max_values[0])[0] == 9
    oi = pf.read_offset_index(0, 0)
    assert oi.page_locations[0].first_row_index == 0


def test_page_index_from_pyarrow():
    buf = io.BytesIO()
    papq.write_table(pa.table({"x": list(range(50))}), buf,
                     write_page_index=True)
    pf = pq.ParquetFile(buf.getvalue())
    assert pf.read_column_index(0, 0) is not None
    assert pf.read_offset_index(0, 0).page_locations[0].offset > 0


def test_row_group_pruning():
    t = agt.table({"x": list(range(100)), "s": [f"k{i % 7}" for i in range(100)]})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=25, write_bloom_filters=True)
    data = buf.getvalue()
    assert pq.read_table(data, filters=[("x", ">", 60)]).num_rows == 50
    assert pq.read_table(data, filters=[("x", "==", 10)]).num_rows == 25
    assert pq.read_table(data, filters=[("x", "<", 0)]).num_rows == 0
    # bloom kills equality probes on values inside min/max gaps
    assert pq.read_table(data, filters=[("s", "==", "nope")]).num_rows == 0


def test_delta_encodings_from_pyarrow():
    buf = io.BytesIO()
    papq.write_table(
        pa.table({"d": list(range(1000)),
                  "s": [f"pre_{i}" for i in range(1000)]}),
        buf, use_dictionary=False,
        column_encoding={"d": "DELTA_BINARY_PACKED", "s": "DELTA_BYTE_ARRAY"})
    t = pq.read_table(buf.getvalue())
    assert t.column("d").to_pylist() == list(range(1000))
    assert t.column("s").to_pylist() == [f"pre_{i}" for i in range(1000)]


def test_byte_stream_split_from_pyarrow():
    vals = [float(i) / 3 for i in range(500)]
    buf = io.BytesIO()
    papq.write_table(pa.table({"f": vals}), buf, use_dictionary=False,
                     column_encoding={"f": "BYTE_STREAM_SPLIT"})
    assert pq.read_table(buf.getvalue()).column("f").to_pylist() == vals


def test_multi_page_and_column_properties():
    from arrow_go_tpu.parquet import format as fmt
    t = agt.table({"x": list(range(5000)),
                   "s": [f"val{i % 13}" for i in range(5000)],
                   "f": [float(i) if i % 7 else None for i in range(5000)]})
    buf = io.BytesIO()
    pq.write_table(t, buf, data_page_size=4096,
                   column_properties={"s": {"compression": "zstd"},
                                      "f": {"use_dictionary": False}})
    data = buf.getvalue()
    assert pq.read_table(data).to_pydict() == t.to_pydict()
    pt = papq.read_table(io.BytesIO(data))
    pt.validate(full=True)
    assert pt.to_pydict() == t.to_pydict()
    pf = pq.ParquetFile(data)
    assert len(pf.read_offset_index(0, 0).page_locations) > 1
    assert pf.metadata.row_groups[0].columns[1].meta_data.codec == \
        int(fmt.Codec.ZSTD)


def test_map_column_both_directions():
    t = agt.table({"m": agt.array([{"a": 1, "b": 2}, None, {}, {"c": None}],
                                  dt.map_(dt.string, dt.int64))})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    assert pq.read_table(buf.getvalue()).to_pydict() == t.to_pydict()
    pt = papq.read_table(io.BytesIO(buf.getvalue()))
    pt.validate(full=True)
    assert pt.column("m").to_pylist() == \
        [[("a", 1), ("b", 2)], None, [], [("c", None)]]
    buf2 = io.BytesIO()
    papq.write_table(pa.table({"m": pa.array([[("x", 1)], None, []],
                                             pa.map_(pa.string(),
                                                     pa.int64()))}), buf2)
    assert pq.read_table(buf2.getvalue()).column("m").to_pylist() == \
        [[("x", 1)], None, []]


REF_PARQUET = "/root/reference/parquet/cmd/parquet_reader/v0.7.1.parquet"


@pytest.mark.skipif(not os.path.exists(REF_PARQUET),
                    reason="reference checkout not present")
def test_reference_golden_parquet():
    """The reference repo's own test parquet file (written by parquet-cpp
    1.3.2) decodes identically to pyarrow's reading of it."""
    ours = pq.read_table(REF_PARQUET)
    theirs = papq.read_table(REF_PARQUET)
    assert ours.to_pydict() == theirs.to_pydict()


def test_delta_encoders_to_pyarrow():
    """Our DELTA_* / BYTE_STREAM_SPLIT encoders, decoded by pyarrow and by
    our own reader (reference delta_bit_packing.go encoder parity)."""
    rng = np.random.default_rng(7)
    ints = rng.integers(-10**12, 10**12, size=3001).tolist()
    small = rng.integers(0, 50, size=3001).tolist()
    strs = [f"key_{i % 97:04d}_{i}" for i in range(3001)]
    floats = (rng.standard_normal(3001) * 1e6).tolist()
    t = agt.table({"i64": ints, "i32": agt.array(small, dt.int32),
                   "s_dba": strs, "s_dlba": strs, "f": floats})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_dictionary=False, column_properties={
        "i64": {"encoding": "delta_binary_packed"},
        "i32": {"encoding": "delta_binary_packed"},
        "s_dba": {"encoding": "delta_byte_array"},
        "s_dlba": {"encoding": "delta_length_byte_array"},
        "f": {"encoding": "byte_stream_split"},
    })
    data = buf.getvalue()
    assert pq.read_table(data).to_pydict() == t.to_pydict()
    pt = papq.read_table(io.BytesIO(data))
    pt.validate(full=True)
    assert pt.to_pydict() == t.to_pydict()
    # the requested encodings actually got used
    md = pq.ParquetFile(data).metadata.row_groups[0].columns
    from arrow_go_tpu.parquet import format as fmt
    assert int(fmt.Encoding.DELTA_BINARY_PACKED) in md[0].meta_data.encodings
    assert int(fmt.Encoding.DELTA_BYTE_ARRAY) in md[2].meta_data.encodings
    assert int(fmt.Encoding.DELTA_LENGTH_BYTE_ARRAY) in md[3].meta_data.encodings
    assert int(fmt.Encoding.BYTE_STREAM_SPLIT) in md[4].meta_data.encodings


def test_delta_encoders_with_nulls_and_pages():
    vals = [None if i % 11 == 0 else i * 37 for i in range(4000)]
    t = agt.table({"x": agt.array(vals, dt.int64)})
    buf = io.BytesIO()
    pq.write_table(t, buf, data_page_size=2048, use_dictionary=False,
                   column_properties={"x": {"encoding": "delta_binary_packed"}})
    data = buf.getvalue()
    assert pq.read_table(data).column("x").to_pylist() == vals
    assert papq.read_table(io.BytesIO(data)).column("x").to_pylist() == vals


def test_delta_binary_packed_wide_deltas():
    # deltas wider than 32 bits exercise the >32-bit pack/unpack path
    vals = [0, 2**40, -2**40, 2**62, -2**62, 17, 0, 2**35]
    from arrow_go_tpu.parquet import encodings as enc2
    blob = enc2.delta_binary_packed_encode(np.array(vals, dtype=np.int64))
    out, _ = enc2.delta_binary_packed_decode(blob)
    assert out.tolist() == vals


def test_read_rows_seek():
    """SeekToRow analog: row-range reads with page skipping
    (reference parquet/file SeekToRow)."""
    n = 10000
    t = agt.table({"x": list(range(n)),
                   "s": [f"v{i}" for i in range(n)],
                   "lst": agt.array([[i, i + 1] if i % 3 else None
                                     for i in range(n)],
                                    dt.list_(dt.int64))})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=3000, data_page_size=2048)
    pf = pq.ParquetFile(buf.getvalue())
    # range spanning a row-group boundary
    got = pf.read_rows(2500, 1000)
    assert got.num_rows == 1000
    assert got.column("x").to_pylist() == list(range(2500, 3500))
    assert got.column("s").to_pylist() == [f"v{i}" for i in range(2500, 3500)]
    assert got.column("lst").to_pylist() == [
        [i, i + 1] if i % 3 else None for i in range(2500, 3500)]
    # single-row seek deep into the file
    one = pf.read_rows(9999, 1)
    assert one.column("x").to_pylist() == [9999]
    # past-the-end clamps
    assert pf.read_rows(9990, 100).num_rows == 10
    assert pf.read_rows(20000, 5).num_rows == 0
    # column projection
    assert [f.name for f in pf.read_rows(10, 5, columns=["s"]).schema.fields] \
        == ["s"]


def test_parallel_column_reads_match_serial():
    """use_threads=True (per-field fan-out, reference pqarrow
    GetFieldReaders' errgroup) must be byte-identical to the serial path,
    including nested/nullable columns across several row groups."""
    n = 5000
    t = agt.table({
        "a": list(range(n)),
        "b": [float(i) / 3 if i % 5 else None for i in range(n)],
        "s": [f"str_{i % 97}" if i % 7 else None for i in range(n)],
        "lst": agt.array([[i, i + 1] if i % 3 else None for i in range(n)],
                         dt.list_(dt.int64)),
        "st": agt.array([{"x": i, "y": f"v{i % 13}"} for i in range(n)],
                        dt.struct({"x": dt.int64, "y": dt.string})),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=1111)
    par = pq.ParquetFile(buf.getvalue()).read_table(use_threads=True)
    ser = pq.ParquetFile(buf.getvalue()).read_table(use_threads=False)
    assert par.to_pydict() == ser.to_pydict() == t.to_pydict()
    # projection + threads
    par2 = pq.ParquetFile(buf.getvalue()).read_table(columns=["s", "st"])
    assert par2.to_pydict() == {"s": t.column("s").to_pylist(),
                                "st": t.column("st").to_pylist()}


def test_buffered_stream_large_chunk(rng):
    """Buffered-stream mode must page through chunks larger than the
    initial read window (a live memoryview over the stream buffer
    blocked its resize: BufferError)."""
    import io
    import arrow_go_tpu as agt
    from arrow_go_tpu import parquet as pq
    n = 200_000
    t = agt.table({"a": agt.from_numpy(rng.integers(0, 1 << 40, n))})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none")
    props = pq.ReaderProperties(buffered_stream=True, buffer_size=8192)
    out = pq.ParquetFile(buf.getvalue(), properties=props).read_table()
    assert out.num_rows == n
    np.testing.assert_array_equal(out.column("a").combine().to_numpy(),
                                  t.column("a").combine().to_numpy())
