"""Parquet -> HBM device fast path vs the host read path (bit-exact)."""
import io

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import parquet as pq
from arrow_go_tpu.compute.errors import ArrowNotImplemented
from arrow_go_tpu.device.block import from_device
from arrow_go_tpu.parquet.device_read import read_column_device

rng = np.random.default_rng(7)


def _file(table, **kw):
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return pq.ParquetFile(buf.getvalue())


def _check(pf, rg, col):
    dev = read_column_device(pf, rg, col)
    host = pf.read_row_group(rg, columns=[col]).column(col)
    back = from_device(dev)
    assert back.to_pylist() == host.to_pylist()
    return dev


def test_device_read_int64_with_nulls_multipage():
    n = 20000
    vals = rng.integers(-10**12, 10**12, n)
    mask = rng.random(n) < 0.9
    t = agt.table({"x": agt.from_numpy(vals, mask)})
    pf = _file(t, data_page_size=4096, use_dictionary=False)
    dev = _check(pf, 0, "x")
    assert dev.validity is not None and dev.null_count == int((~mask).sum())


def test_device_read_float64_plain_no_nulls():
    n = 8192
    t = agt.table({"f": agt.from_numpy(rng.standard_normal(n))})
    pf = _file(t, use_dictionary=False, compression="zstd")
    _check(pf, 0, "f")


def test_device_read_dictionary_encoded():
    n = 10000
    vals = rng.integers(0, 50, n).astype(np.int64)   # low card -> dict pages
    mask = rng.random(n) < 0.95
    t = agt.table({"d": agt.from_numpy(vals, mask)})
    pf = _file(t, use_dictionary=True, data_page_size=2048)
    _check(pf, 0, "d")


def test_device_read_bool_and_int32():
    n = 5000
    t = agt.table({
        "b": agt.from_numpy(rng.random(n) < 0.5, rng.random(n) < 0.9),
        "i": agt.from_numpy(rng.integers(0, 100, n).astype(np.int32)),
    })
    pf = _file(t, use_dictionary=False)
    _check(pf, 0, "b")
    _check(pf, 0, "i")


def test_device_read_byte_stream_split():
    n = 4096
    t = agt.table({"f": agt.from_numpy(rng.standard_normal(n).astype(
        np.float32), rng.random(n) < 0.85)})
    pf = _file(t, use_dictionary=False,
               column_properties={"f": {"encoding": "byte_stream_split"}})
    _check(pf, 0, "f")


def test_device_read_v2_pages_row_groups():
    n = 6000
    vals = rng.integers(0, 10**6, n)
    t = agt.table({"x": agt.from_numpy(vals, rng.random(n) < 0.9)})
    pf = _file(t, properties=pq.WriterProperties(data_page_version="2.0"),
               row_group_size=2500, use_dictionary=False,
               compression="snappy")
    for rg in range(pf.num_row_groups):
        _check(pf, rg, "x")


def test_device_read_unsupported_falls_through():
    # PLAIN-encoded strings (no dictionary) have no device representation
    t = agt.table({"s": ["a", "b", None]})
    pf = _file(t, use_dictionary=False)
    with pytest.raises(ArrowNotImplemented):
        read_column_device(pf, 0, "s")
    t2 = agt.table({"l": agt.array([[1], None], dt.list_(dt.int64))})
    pf2 = _file(t2)
    with pytest.raises((ArrowNotImplemented, Exception)):
        read_column_device(pf2, 0, "l")


def test_device_read_strings_as_dictionary_codes():
    """Dict-encoded strings land on device as int32 codes + host
    dictionary (the engine's string model, device.block.to_device)."""
    n = 8000
    words = [f"w{i}" for i in range(40)]
    vals = [words[i % 40] if i % 7 else None for i in range(n)]
    t = agt.table({"s": vals})
    pf = _file(t, use_dictionary=True, data_page_size=2048,
               compression="zstd")
    dev = read_column_device(pf, 0, "s")
    assert dev.type.id == dt.TypeId.DICTIONARY
    assert dev.dictionary is not None
    back = from_device(dev)
    assert back.to_pylist() == vals


def test_read_batch_device():
    from arrow_go_tpu.parquet.device_read import read_batch_device
    from arrow_go_tpu.device.block import batch_from_device
    n = 3000
    t = agt.table({"a": agt.from_numpy(rng.integers(0, 99, n),
                                       rng.random(n) < 0.9),
                   "b": agt.from_numpy(rng.standard_normal(n))})
    pf = _file(t, use_dictionary=False, compression="zstd")
    db = read_batch_device(pf, 0)
    back = batch_from_device(db)
    host = pf.read_row_group(0)
    assert back.to_pydict() == host.to_pydict()


def test_device_read_pyarrow_written_file():
    """Cross-implementation: pyarrow writes (its own encoder choices,
    RLE_DICTIONARY + snappy), our device path decodes bit-exactly."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as papq
    n = 30000
    ints = rng.integers(0, 200, n)
    imask = rng.random(n) < 0.9
    floats = rng.standard_normal(n)
    pt = pa.table({
        "i": pa.array([int(v) if m else None
                       for v, m in zip(ints, imask)], pa.int64()),
        "f": pa.array(floats, pa.float64()),
    })
    buf = io.BytesIO()
    papq.write_table(pt, buf, compression="snappy", data_page_size=4096)
    pf = pq.ParquetFile(buf.getvalue())
    for col in ("i", "f"):
        dev = read_column_device(pf, 0, col)
        back = from_device(dev)
        assert back.to_pylist() == pt.column(col).to_pylist()


def test_read_batch_device_column_order():
    """Caller column order must map names to the right data (round-3
    regression: schema was built in file order, cols in caller order)."""
    from arrow_go_tpu.parquet.device_read import read_batch_device
    from arrow_go_tpu.device.block import batch_from_device
    from arrow_go_tpu.compute.errors import ArrowInvalid
    n = 500
    t = agt.table({"a": agt.from_numpy(np.arange(n)),
                   "b": agt.from_numpy(np.arange(n) * 2.5)})
    pf = _file(t, use_dictionary=False)
    db = read_batch_device(pf, 0, columns=["b", "a"])
    back = batch_from_device(db)
    assert back.schema.names == ["b", "a"]
    assert back.column("a").to_pylist() == list(range(n))
    assert back.column("b").to_pylist() == [i * 2.5 for i in range(n)]
    with pytest.raises(ArrowInvalid):
        read_batch_device(pf, 0, columns=["a", "nope"])
    with pytest.raises(ArrowInvalid):
        read_batch_device(pf, 0, columns=["a", "a"])
