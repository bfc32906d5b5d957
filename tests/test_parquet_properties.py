"""WriterProperties / ReaderProperties parity tests (reference
parquet/writer_properties.go, reader_properties.go), pyarrow-verified."""
import io

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import parquet as pq

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as papq  # noqa: E402


def _sample_table():
    return agt.table({
        "i": agt.array([1, None, 3, 4, 5], dt.int64),
        "s": agt.array(["aa", "bb", None, "aa", "cc"], dt.string),
        "f": agt.array([0.5, 1.5, 2.5, None, 4.5], dt.float64),
        "ls": agt.array([[1, 2], None, [3], [], [4, 5, 6]],
                        dt.list_(dt.int32)),
    })


def _write(t, props):
    buf = io.BytesIO()
    pq.write_table(t, buf, properties=props)
    return buf.getvalue()


def test_data_page_v2_roundtrip_and_pyarrow():
    t = _sample_table()
    blob = _write(t, pq.WriterProperties(data_page_version="2.0"))
    ours = pq.read_table(blob)
    assert ours.to_pydict() == t.to_pydict()
    theirs = papq.read_table(io.BytesIO(blob))
    assert theirs.to_pydict() == t.to_pydict()
    # pyarrow-written v2 pages read by us
    pt = pa.table({"x": [1, None, 3], "s": ["a", "bb", None]})
    buf = io.BytesIO()
    papq.write_table(pt, buf, data_page_version="2.0")
    back = pq.read_table(buf.getvalue())
    assert back.to_pydict() == pt.to_pydict()


def test_data_page_v2_multi_page():
    n = 5000
    t = agt.table({"x": agt.array(list(range(n)), dt.int64)})
    blob = _write(t, pq.WriterProperties(data_page_version="2.0",
                                         data_page_size=4096,
                                         use_dictionary=False))
    assert pq.read_table(blob).column("x").to_pylist() == list(range(n))
    assert papq.read_table(
        io.BytesIO(blob)).column("x").to_pylist() == list(range(n))


def test_store_decimal_as_integer():
    import decimal as pydec
    vals = [pydec.Decimal("12345.67"), None, pydec.Decimal("-1.02")]
    t = agt.table({"d": agt.array(vals, dt.decimal128(7, 2)),
                   "big": agt.array(vals, dt.decimal128(15, 2))})
    blob = _write(t, pq.WriterProperties(store_decimal_as_integer=True))
    md = papq.ParquetFile(io.BytesIO(blob)).metadata
    assert md.row_group(0).column(0).physical_type == "INT32"
    assert md.row_group(0).column(1).physical_type == "INT64"
    theirs = papq.read_table(io.BytesIO(blob))
    assert theirs.column("d").to_pylist() == vals
    assert theirs.column("big").to_pylist() == vals
    ours = pq.read_table(blob)
    assert ours.column("d").to_pylist() == vals


def test_sorting_columns_metadata():
    t = agt.table({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    blob = _write(t, pq.WriterProperties(
        sorting_columns=[pq.SortingColumn(0, descending=True,
                                          nulls_first=True)]))
    md = papq.ParquetFile(io.BytesIO(blob)).metadata
    scs = md.row_group(0).sorting_columns
    assert scs and scs[0].column_index == 0
    assert scs[0].descending and scs[0].nulls_first
    f = pq.ParquetFile(blob)
    sc = f.metadata.row_groups[0].sorting_columns[0]
    assert (sc.column_idx, sc.descending, sc.nulls_first) == (0, True, True)


def test_write_statistics_toggle():
    t = agt.table({"a": [3, 1, 2], "b": [1.0, 2.0, 3.0]})
    blob = _write(t, pq.WriterProperties(
        write_statistics=False,
        column_properties={"b": {"write_statistics": True}}))
    md = papq.ParquetFile(io.BytesIO(blob)).metadata
    assert not md.row_group(0).column(0).is_stats_set
    st = md.row_group(0).column(1).statistics
    assert st is not None and st.min == 1.0 and st.max == 3.0


def test_created_by_and_version():
    t = agt.table({"a": [1, 2]})
    blob = _write(t, pq.WriterProperties(created_by="unit-test writer",
                                         version="1.0"))
    md = papq.ParquetFile(io.BytesIO(blob)).metadata
    assert md.created_by == "unit-test writer"
    assert md.format_version == "1.0"
    assert pq.read_table(blob).column("a").to_pylist() == [1, 2]


def test_compression_level():
    data = list(range(2000)) * 2
    t = agt.table({"x": agt.array(data, dt.int64)})
    lo = _write(t, pq.WriterProperties(compression="gzip",
                                       compression_level=1,
                                       use_dictionary=False))
    hi = _write(t, pq.WriterProperties(compression="gzip",
                                       compression_level=9,
                                       use_dictionary=False))
    assert len(hi) <= len(lo)
    assert pq.read_table(hi).column("x").to_pylist() == data
    assert papq.read_table(io.BytesIO(hi)).column("x").to_pylist() == data


def test_dictionary_pagesize_limit_fallback():
    vals = [f"string-{i}" for i in range(500)]
    t = agt.table({"s": agt.array(vals, dt.string)})
    blob = _write(t, pq.WriterProperties(dictionary_pagesize_limit=64))
    f = pq.ParquetFile(blob)
    meta = f.metadata.row_groups[0].columns[0].meta_data
    assert meta.dictionary_page_offset is None  # fell back to plain
    assert pq.read_table(blob).column("s").to_pylist() == vals
    assert papq.read_table(io.BytesIO(blob)).column("s").to_pylist() == vals


def test_buffered_stream_reader():
    n = 3000
    t = agt.table({"x": agt.array(list(range(n)), dt.int64),
                   "s": agt.array([f"v{i % 7}" for i in range(n)],
                                  dt.string)})
    blob = _write(t, pq.WriterProperties(data_page_size=1024))
    props = pq.ReaderProperties(buffer_size=37, buffered_stream=True)
    got = pq.read_table(blob, properties=props)
    assert got.to_pydict() == pq.read_table(blob).to_pydict()


def test_v2_pages_with_encryption():
    key = b"0123456789012345"
    enc = pq.FileEncryptionProperties(footer_key=key)
    t = _sample_table()
    blob = _write(t, pq.WriterProperties(data_page_version="2.0",
                                         encryption=enc))
    dec = pq.FileDecryptionProperties(footer_key=key)
    got = pq.read_table(blob, decryption=dec)
    assert got.to_pydict() == t.to_pydict()


def test_adaptive_bloom_filter_sizes_to_ndv():
    """Candidate-set builder (reference adaptive_bloom_filter.go:65):
    low-NDV streams finalize to a small filter, high-NDV to a larger
    one; sizes stay within ~1.1x of the directly-sized filter."""
    from arrow_go_tpu.parquet.bloom import (AdaptiveBloomFilter,
                                            BYTES_PER_BLOCK,
                                            optimal_num_bytes,
                                            _hash_value)
    from arrow_go_tpu.parquet import format as fmt

    def run(ndv):
        ab = AdaptiveBloomFilter(max_bytes=1 << 20, fpp=0.01)
        hs = [_hash_value(i, fmt.Type.INT64) for i in range(ndv)]
        ab.insert_bulk(hs)
        bf = ab.finalize()
        for h in hs:
            assert bf.check_hash(h)
        return bf.num_blocks * BYTES_PER_BLOCK

    small, big = run(100), run(20000)
    assert small < big
    # within the pow2-rounded envelope of the optimal direct sizing
    assert small <= 2 * max(optimal_num_bytes(500, 0.01), 32)
    assert big >= optimal_num_bytes(10000, 0.01) // 2
    # false-positive sanity on the small filter
    import random
    rng = random.Random(7)
    fp = sum(AdaptiveBloomFilter().finalize().check_hash(rng.getrandbits(64))
             for _ in range(100))
    assert fp == 0


def test_writer_dict_fallback_uses_adaptive_bloom():
    """Dictionary-fallback columns still get a usable bloom filter and
    the reader prunes with it."""
    import io
    import numpy as np
    import arrow_go_tpu as agt
    from arrow_go_tpu import parquet as pq

    n = 3000
    vals = ["v" * 200 + str(i) for i in range(n)]   # dict page > 1KB limit
    t = agt.table({"s": agt.array(vals, dt.string)})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=n, properties=pq.WriterProperties(
        write_bloom_filters=True, dictionary_pagesize_limit=1024))
    pf = pq.ParquetFile(buf.getvalue())
    # dictionary fell back: data pages are PLAIN
    md = pf.metadata
    assert pf.read_table().num_rows == n
    # bloom pruning: a present value keeps the row group, an absent one
    # prunes it
    kept = pf.read_table(filters=[("s", "==", vals[5])])
    assert kept.num_rows == n
    pruned = pf.read_table(filters=[("s", "==", "absent-value")])
    assert pruned.num_rows == 0
