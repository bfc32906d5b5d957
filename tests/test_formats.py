"""CSV / JSON / Avro format tests."""
import io
import json
import struct
import zlib

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.formats import (OCFReader, read_avro, read_csv, read_json,
                                  write_csv, write_json)
from arrow_go_tpu.formats.csv import ReadOptions as CsvOptions
from arrow_go_tpu.formats.csv import WriteOptions as CsvWriteOptions


# -- csv --------------------------------------------------------------------

def test_csv_basic_inference():
    data = b"a,b,c,d\n1,1.5,true,hello\n2,2.5,false,world\n3,,true,\n"
    t = read_csv(data)
    assert t.schema.names == ["a", "b", "c", "d"]
    assert t.schema.types == [dt.int64, dt.float64, dt.bool_, dt.string]
    # string "" stays "" (pyarrow semantics: null spellings don't null
    # strings unless strings_can_be_null)
    assert t.to_pydict() == {"a": [1, 2, 3], "b": [1.5, 2.5, None],
                             "c": [True, False, True],
                             "d": ["hello", "world", ""]}


def test_csv_null_spellings():
    t = read_csv(b"x\nNULL\n5\nn/a\n")
    assert t.to_pydict() == {"x": [None, 5, None]}


def test_csv_explicit_schema():
    sch = agt.schema({"x": dt.float32, "y": dt.string})
    t = read_csv(b"x,y\n1,2\n", CsvOptions(schema=sch))
    assert t.schema.types == [dt.float32, dt.string]
    assert t.to_pydict() == {"x": [1.0], "y": ["2"]}


def test_csv_no_header():
    t = read_csv(b"1,x\n2,y\n", CsvOptions(has_header=False))
    assert t.schema.names == ["f0", "f1"]
    assert t.to_pydict() == {"f0": [1, 2], "f1": ["x", "y"]}


def test_csv_delimiter_and_dates():
    t = read_csv(b"d|ts\n2020-01-01|2020-01-01T12:00:00\n",
                 CsvOptions(delimiter="|"))
    assert t.schema.field(0).type == dt.date32
    assert t.schema.field(1).type.id == dt.TypeId.TIMESTAMP


def test_csv_roundtrip():
    t = agt.table({"i": [1, None, 3], "s": ["a", "b,c", None],
                   "f": [0.5, 1.5, None], "b": [True, False, None]})
    buf = io.StringIO()
    write_csv(t, buf)
    back = read_csv(buf.getvalue().encode(),
                    CsvOptions(strings_can_be_null=True))
    assert back.to_pydict() == t.to_pydict()


def test_csv_matches_pyarrow():
    pacsv = pytest.importorskip("pyarrow.csv")
    data = b"a,b\n1,x\n,y\n3,\n"
    ours = read_csv(data)
    theirs = pacsv.read_csv(io.BytesIO(data))
    assert ours.to_pydict() == theirs.to_pydict()


# -- json -------------------------------------------------------------------

def test_json_basic():
    data = b'{"a": 1, "b": "x"}\n{"a": null, "b": "y"}\n{"a": 3}\n'
    t = read_json(data)
    assert t.to_pydict() == {"a": [1, None, 3], "b": ["x", "y", None]}


def test_json_nested():
    data = b'{"s": {"x": 1}, "l": [1, 2]}\n{"s": {"x": 2}, "l": []}\n'
    t = read_json(data)
    assert t.to_pydict() == {"s": [{"x": 1}, {"x": 2}], "l": [[1, 2], []]}


def test_json_roundtrip():
    t = agt.table({"i": [1, None], "s": ["a", "b"], "l": [[1], [2, 3]]})
    buf = io.BytesIO()
    write_json(t, buf)
    back = read_json(buf.getvalue())
    assert back.to_pydict() == t.to_pydict()


def test_json_matches_pyarrow():
    pajson = pytest.importorskip("pyarrow.json")
    data = b'{"a": 1, "b": "x"}\n{"a": 2, "b": null}\n'
    ours = read_json(data)
    theirs = pajson.read_json(io.BytesIO(data))
    assert ours.to_pydict() == theirs.to_pydict()


# -- avro -------------------------------------------------------------------

def _zigzag(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while u >= 0x80:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)
    return bytes(out)


def _avro_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _make_ocf(schema: dict, encoded_records: list, codec: bytes = b"null"
              ) -> bytes:
    out = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec}
    out += _zigzag(len(meta))
    for k, v in meta.items():
        out += _avro_bytes(k.encode()) + _avro_bytes(v)
    out += _zigzag(0)
    sync = b"S" * 16
    out += sync
    payload = b"".join(encoded_records)
    if codec == b"deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate
    out += _zigzag(len(encoded_records)) + _zigzag(len(payload))
    out += payload + sync
    return bytes(out)


AVRO_SCHEMA = {
    "type": "record", "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "int"}},
    ],
}


def _enc_record(id_, name, score, tags):
    out = bytearray(_zigzag(id_))
    if name is None:
        out += _zigzag(0)
    else:
        out += _zigzag(1) + _avro_bytes(name.encode())
    out += struct.pack("<d", score)
    if tags:
        out += _zigzag(len(tags))
        for t in tags:
            out += _zigzag(t)
    out += _zigzag(0)
    return bytes(out)


def test_avro_read():
    recs = [_enc_record(1, "a", 0.5, [1, 2]),
            _enc_record(2, None, 1.5, [])]
    data = _make_ocf(AVRO_SCHEMA, recs)
    t = read_avro(data)
    assert t.schema.names == ["id", "name", "score", "tags"]
    assert t.to_pydict() == {"id": [1, 2], "name": ["a", None],
                             "score": [0.5, 1.5], "tags": [[1, 2], []]}


def test_avro_deflate():
    recs = [_enc_record(7, "z", 2.0, [3])]
    data = _make_ocf(AVRO_SCHEMA, recs, codec=b"deflate")
    t = read_avro(data)
    assert t.to_pydict()["id"] == [7]


def test_avro_enum_map_fixed():
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["RED", "BLUE"]}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 2}},
    ]}
    rec = _zigzag(1) + _zigzag(1) + _avro_bytes(b"k") + _zigzag(42) + \
        _zigzag(0) + b"\xAB\xCD"
    t = read_avro(_make_ocf(schema, [rec]))
    assert t.to_pydict() == {"e": ["BLUE"], "m": [[("k", 42)]],
                             "fx": [b"\xab\xcd"]}


def test_avro_bad_magic():
    from arrow_go_tpu.compute.errors import ArrowInvalid
    with pytest.raises(ArrowInvalid):
        read_avro(b"nope" + b"\x00" * 50)


# ---------------------------------------------------------------------------
# csv round-2 options: include_columns, column_types, streaming reader,
# writer crlf/null/bool options (reference arrow/csv/common.go With*)
# ---------------------------------------------------------------------------

def test_csv_include_columns_and_types():
    from arrow_go_tpu.formats import csv as acsv
    src = b"a,b,c\n1,x,9.5\n2,y,8.5\n"
    t = acsv.read_csv(src, acsv.ReadOptions(
        include_columns=["a", "c"],
        column_types={"a": dt.float64}))
    assert t.schema.names == ["a", "c"]
    assert t.schema.field_by_name("a").type == dt.float64
    assert t.to_pydict() == {"a": [1.0, 2.0], "c": [9.5, 8.5]}


def test_csv_streaming_reader():
    from arrow_go_tpu.formats import csv as acsv
    rows = "\n".join(f"{i},{i*2}" for i in range(10))
    src = ("x,y\n" + rows + "\n").encode()
    with acsv.open_csv(src, acsv.ReadOptions(chunk_size=4)) as r:
        batches = list(r)
    assert [b.num_rows for b in batches] == [4, 4, 2]
    assert batches[0].schema == batches[2].schema
    total = sum(b.num_rows for b in batches)
    assert total == 10
    # read_all equivalence
    t = acsv.open_csv(src, acsv.ReadOptions(chunk_size=3)).read_all()
    assert t.num_rows == 10
    assert t.column("y").to_pylist()[-1] == 18


def test_csv_write_options():
    import io as _io
    from arrow_go_tpu.formats import csv as acsv
    t = agt.table({"b": [True, False, None]})
    sink = _io.StringIO()
    acsv.write_csv(t, sink, acsv.WriteOptions(
        null_string="NULL", crlf=True,
        bool_formatter=lambda b: "YES" if b else "NO"))
    assert sink.getvalue() == "b\r\nYES\r\nNO\r\nNULL\r\n"


def test_avro_chunked_reader():
    """Chunked OCF iteration (reference WithChunk, avro/reader.go:385)."""
    from arrow_go_tpu.formats import OCFReader
    recs = [_enc_record(i, f"n{i}", i * 0.5, [i]) for i in range(10)]
    data = _make_ocf(AVRO_SCHEMA, recs)
    batches = list(OCFReader(data, chunk_size=4))
    assert [b.num_rows for b in batches] == [4, 4, 2]
    assert batches[0].schema == batches[2].schema
    ids = [v for b in batches for v in b.column(0).to_pylist()]
    assert ids == list(range(10))
    # chunk_size<=0: one batch per OCF block (reference chunk=-1 mode)
    batches = list(OCFReader(data, chunk_size=0))
    assert [b.num_rows for b in batches] == [10]
    # read_all unaffected
    assert OCFReader(data, chunk_size=3).read_all().num_rows == 10


FLAT_AVRO_SCHEMA = {
    "type": "record", "name": "flat",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "col", "type": {"type": "enum", "name": "c",
                                 "symbols": ["red", "green", "blue"]}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    ],
}


def _enc_flat(i):
    name = None if i % 5 == 0 else f"n{i}"
    opt = None if i % 3 == 0 else i * 7
    out = bytearray(_zigzag(i))
    out += (_zigzag(0) if name is None
            else _zigzag(1) + _avro_bytes(name.encode()))
    out += struct.pack("<d", i * 0.5)
    out += b"\x01" if i % 2 else b"\x00"
    out += _zigzag(0) if opt is None else _zigzag(1) + _zigzag(opt)
    out += _zigzag(i % 3)
    out += _zigzag(i % 1000)
    return bytes(out)


def test_avro_flat_fast_path_parity():
    """The vectorized flat-schema decoder must match the recursive one."""
    from arrow_go_tpu.formats.avro import OCFReader
    recs = [_enc_flat(i) for i in range(777)]
    data = _make_ocf(FLAT_AVRO_SCHEMA, recs)
    fast = OCFReader(data)
    assert fast._plan is not None, "flat schema must take the fast path"
    t_fast = fast.read_all()
    slow = OCFReader(data)
    slow._plan = None
    t_slow = slow.read_all()
    assert t_fast.to_pydict() == t_slow.to_pydict()
    d = t_fast.to_pydict()
    assert d["id"][:3] == [0, 1, 2]
    assert d["name"][0] is None and d["name"][1] == "n1"
    assert d["opt"][0] is None and d["opt"][1] == 7
    assert d["col"][:4] == ["red", "green", "blue", "red"]
    assert d["day"][1] == 1      # date32 lists as raw day offsets here


def test_avro_flat_fast_chunked():
    from arrow_go_tpu.formats.avro import OCFReader
    recs = [_enc_flat(i) for i in range(100)]
    # two blocks of 50
    import json as _j
    out = bytearray(b"Obj\x01")
    meta = {"avro.schema": _j.dumps(FLAT_AVRO_SCHEMA).encode(),
            "avro.codec": b"null"}
    out += _zigzag(len(meta))
    for k, v in meta.items():
        out += _avro_bytes(k.encode()) + _avro_bytes(v)
    out += _zigzag(0) + b"S" * 16
    for half in (recs[:50], recs[50:]):
        payload = b"".join(half)
        out += _zigzag(len(half)) + _zigzag(len(payload)) + payload + b"S" * 16
    r = OCFReader(bytes(out), chunk_size=30)
    sizes = []
    rows = []
    for b in r:
        sizes.append(b.num_rows)
        rows.extend(b.columns[0].to_pylist())
    assert sizes == [30, 30, 30, 10]
    assert rows == list(range(100))
