"""Dataset scan layer + arrjson integration format tests."""
import os

import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import compute as pc
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import parquet
from arrow_go_tpu.dataset import dataset
from arrow_go_tpu.interop.arrjson import read_arrjson, write_arrjson


@pytest.fixture(scope="module")
def pq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    for i in range(3):
        t = agt.table({"id": list(range(i * 100, (i + 1) * 100)),
                       "cat": [f"c{j % 4}" for j in range(100)],
                       "v": [float(j) for j in range(100)]})
        parquet.write_table(t, str(d / f"part{i}.parquet"),
                            row_group_size=50, write_bloom_filters=True)
    return str(d)


def test_dataset_discovery(pq_dir):
    ds = dataset(pq_dir)
    assert len(ds.fragments) == 3
    assert ds.schema.names == ["id", "cat", "v"]
    assert ds.to_table().num_rows == 300


def test_dataset_filter_pushdown(pq_dir):
    ds = dataset(pq_dir)
    t = ds.to_table(filter=pc.field("id") >= 250)
    assert t.num_rows == 50
    assert min(t.column("id").to_pylist()) == 250


def test_dataset_projection_and_residual_filter(pq_dir):
    ds = dataset(pq_dir)
    t = ds.to_table(columns=["cat"], filter=pc.field("id") == 42)
    assert t.to_pydict() == {"cat": ["c2"]}


def test_dataset_string_filter(pq_dir):
    ds = dataset(pq_dir)
    n = ds.count_rows(filter=(pc.field("cat") == "c1") &
                      (pc.field("id") < 100))
    assert n == 25


def test_dataset_empty_result(pq_dir):
    ds = dataset(pq_dir)
    t = ds.to_table(filter=pc.field("id") > 10**6)
    assert t.num_rows == 0
    assert t.schema.names == ["id", "cat", "v"]


def test_dataset_mixed_glob(pq_dir, tmp_path):
    from arrow_go_tpu import ipc
    t = agt.table({"id": [999], "cat": ["x"], "v": [0.0]})
    p = tmp_path / "extra.arrow"
    with open(p, "wb") as f:
        with ipc.new_file(f, t.schema) as w:
            w.write_table(t)
    ds = dataset([os.path.join(pq_dir, "part0.parquet"), str(p)])
    assert ds.to_table().num_rows == 101


def test_string_compare_kernels():
    rb = agt.record_batch({"s": ["a", "b", None, "a"]})
    assert pc.equal(rb["s"], "a").to_pylist() == [True, False, None, True]
    assert pc.not_equal(rb["s"], "a").to_pylist() == [False, True, None, False]
    assert pc.greater(rb["s"], "a").to_pylist() == [False, True, None, False]
    assert pc.less_equal("a", rb["s"]).to_pylist() == [True, True, None, True]


def test_arrjson_roundtrip():
    rb = agt.record_batch({
        "i": [1, None, 3], "f": [0.5, 1.5, None], "s": ["a", None, "b"],
        "bin": agt.array([b"\x00\x01", None, b""], dt.binary),
        "l": agt.array([[1, 2], None, []], dt.list_(dt.int64)),
        "st": agt.array([{"x": 1}, None, {"x": 3}], dt.struct({"x": dt.int64})),
        "dec": agt.array([None, 2, 3], dt.decimal128(10, 2)),
        "ts": agt.array([1, 2, None], dt.timestamp("us", "UTC"))})
    text = write_arrjson([rb, rb.slice(1, 2)])
    back = read_arrjson(text)
    assert back[0].to_pydict() == rb.to_pydict()
    assert back[1].to_pydict() == rb.slice(1, 2).to_pydict()
    assert back[0].schema.equals(rb.schema)


def test_dataset_parallel_scan_matches_serial(pq_dir):
    ds = dataset(pq_dir)
    f = pc.field("id") < 250
    par = ds.to_table(columns=["id", "v"], filter=f, use_threads=True)
    ser = ds.to_table(columns=["id", "v"], filter=f, use_threads=False)
    assert par.to_pydict() == ser.to_pydict()
    assert par.num_rows == 250
    assert par.column("id").to_pylist() == list(range(250))


def test_dataset_device_batches(pq_dir):
    from arrow_go_tpu.device.block import batch_from_device
    ds = dataset(pq_dir)
    sc = ds.scanner(columns=["id", "v"])
    rows = 0
    for db in sc.device_batches():
        rb = batch_from_device(db)
        assert rb.schema.names == ["id", "v"]
        rows += rb.num_rows
    assert rows == 300
    # fragment with a string column falls back to host decode + to_device
    sc2 = ds.scanner()
    got = []
    for db in sc2.device_batches():
        got.extend(batch_from_device(db).column("cat").to_pylist())
    assert got[:4] == ["c0", "c1", "c2", "c3"]


def test_dataset_device_batches_nested_column_falls_back(tmp_path):
    """A parquet fragment containing a nested (list) column must fall back
    to host decode, not crash the scan (round-3 ADVICE regression)."""
    from arrow_go_tpu.device.block import batch_from_device
    t = agt.table({
        "id": agt.array(list(range(6)), dt.int64),
        "tags": agt.array([[1, 2], None, [], [3], [4, 5, 6], [7]],
                          dt.list_(dt.int64)),
    })
    p = tmp_path / "nested.parquet"
    parquet.write_table(t, str(p))
    ds = dataset(str(p))
    out = []
    for db in ds.scanner().device_batches():
        out.append(batch_from_device(db))
    assert sum(r.num_rows for r in out) == 6
    assert out[0].column("tags").to_pylist()[0] == [1, 2]
