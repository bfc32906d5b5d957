"""Parquet VARIANT binary format + column round-trip tests
(reference parquet/variant/variant_test.go, builder_test.go scope)."""
import datetime as dt_
import decimal
import io
import uuid as uuid_

import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import extensions as ext
from arrow_go_tpu import parquet as pq
from arrow_go_tpu.parquet import variant as var


PRIMITIVES = [
    None, True, False, 0, -1, 127, -128, 1000, -32768, 2**20, -2**31,
    2**40, -2**62, 1.5, -0.25, float(10**100),
    "", "short", "x" * 63, "y" * 64, "unicode ünïcødé 漢字",
    b"", b"raw\x00bytes", b"z" * 300,
    decimal.Decimal("123.456"), decimal.Decimal("-0.00001"),
    decimal.Decimal("12345678901234567890.123"),
    dt_.date(2024, 2, 29), dt_.date(1969, 12, 31),
    dt_.datetime(2023, 5, 1, 12, 30, 45, 123456),
    dt_.datetime(2023, 5, 1, 12, 30, 45, 123456, tzinfo=dt_.timezone.utc),
    dt_.time(23, 59, 59, 999999),
    uuid_.UUID("f24f9b64-81fa-49d1-b74e-8c09a6e31c56"),
]


@pytest.mark.parametrize("value", PRIMITIVES,
                         ids=[repr(v)[:30] for v in PRIMITIVES])
def test_primitive_roundtrip(value):
    meta, val = var.encode(value)
    out = var.decode(meta, val)
    if isinstance(value, float):
        assert out == pytest.approx(value)
    else:
        assert out == value


def test_nested_roundtrip():
    obj = {"name": "alice", "age": 30, "tags": ["a", "b", {"k": None}],
           "address": {"city": "zurich", "zip": 8001},
           "scores": [1.5, 2.5, None, [1, [2, [3]]]],
           "meta": {"uuid": uuid_.UUID(int=7), "when": dt_.date(2020, 1, 2)}}
    meta, val = var.encode(obj)
    assert var.decode(meta, val) == obj


def test_empty_containers():
    for v in ({}, [], {"a": {}}, [[]], {"a": []}):
        meta, val = var.encode(v)
        assert var.decode(meta, val) == v


def test_large_array_and_object():
    big_list = list(range(1000))
    meta, val = var.encode(big_list)
    assert var.decode(meta, val) == big_list
    big_obj = {f"key_{i:04d}": i for i in range(300)}
    meta, val = var.encode(big_obj)
    assert var.decode(meta, val) == big_obj


def test_metadata_dictionary():
    b = var.Builder()
    v = b.build({"zeta": 1, "alpha": 2, "zeta2": {"alpha": 3}})
    # keys deduplicated in first-appearance order
    assert set(v.metadata.keys) == {"zeta", "alpha", "zeta2"}
    assert v.metadata.id_for("alpha") is not None
    assert v.metadata.dictionary_size == 3
    # empty metadata constant parses
    m = var.Metadata(var.EMPTY_METADATA)
    assert m.dictionary_size == 0


def test_object_fields_sorted_by_key():
    meta, val = var.encode({"b": 1, "a": 2, "c": 3})
    v = var.Value(var.Metadata(meta), val)
    assert list(v.to_python()) == ["a", "b", "c"]


def test_short_vs_long_string_headers():
    _, short = var.encode("hi")
    assert short[0] & 0b11 == var.BASIC_SHORT_STRING
    _, long_ = var.encode("x" * 100)
    assert long_[0] & 0b11 == var.BASIC_PRIMITIVE
    assert long_[0] >> 2 == var.P_STRING


def test_to_json():
    v = var.Builder().build({"a": [1, True, None], "d": dt_.date(2024, 1, 1)})
    import json
    assert json.loads(v.to_json()) == {"a": [1, True, None],
                                       "d": "2024-01-01"}


def test_variant_extension_type():
    t = ext.VariantType()
    assert t.extension_name == "parquet.variant"
    assert t.storage_type.id == dt.TypeId.STRUCT
    assert ext.get_extension_type("parquet.variant") is not None
    with pytest.raises(Exception):
        ext.VariantType(dt.int64)


def _variant_column(values):
    """Build a variant column (shared metadata dict) as an extension array."""
    b = var.Builder()
    blobs = [b.encode_value(v) for v in values]
    meta = b.metadata().data
    storage = agt.array([{"metadata": meta, "value": blob} for blob in blobs],
                        ext.variant.storage_type)
    from arrow_go_tpu.array.arrays import ArrayData, make_array
    d = storage.data
    return make_array(ArrayData(ext.variant, d.length, d.buffers, d.children,
                                d.dictionary, d._null_count, d.offset))


def test_variant_parquet_roundtrip():
    values = [{"a": 1, "b": "text"}, [1, 2.5, None], "plain", 42, None,
              {"nested": {"deep": [True, False]}}]
    col = _variant_column(values)
    t = agt.Table.from_arrays([col], names=["v"])
    buf = io.BytesIO()
    pq.write_table(t, buf)
    got = pq.read_table(buf.getvalue())
    f = got.schema.fields[0]
    assert f.type.id == dt.TypeId.EXTENSION
    assert f.type.extension_name == "parquet.variant"
    rows = got.column("v").to_pylist()
    decoded = [var.decode(r["metadata"], r["value"]) if r is not None else None
               for r in rows]
    assert decoded == values

    # the group element carries the VARIANT logical annotation
    pf = pq.ParquetFile(buf.getvalue())
    els = pf.metadata.schema
    vg = [e for e in els if e.name == "v"][0]
    assert vg.logicalType.VARIANT is not None


def test_variant_parquet_pyarrow_reads_storage():
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as papq
    values = [{"k": 1}, [1, 2], "s"]
    t = agt.Table.from_arrays([_variant_column(values)], names=["v"])
    buf = io.BytesIO()
    pq.write_table(t, buf)
    pt = papq.read_table(io.BytesIO(buf.getvalue()))
    rows = pt.column("v").to_pylist()
    decoded = [var.decode(r["metadata"], r["value"]) for r in rows]
    assert decoded == values


# -- shredding (reference arrow/extensions/variant.go:66,99,127) ------------

def test_shredded_variant_type_shape():
    from arrow_go_tpu import extensions as ext
    st = ext.shredded_variant_type(
        dt.struct({"latitude": dt.float64, "longitude": dt.float32}))
    names = [f.name for f in st.storage_type.fields()]
    assert names == ["metadata", "value", "typed_value"]
    tv = st.storage_type.fields()[2]
    assert tv.nullable
    lat = tv.type.fields()[0]
    assert not lat.nullable
    assert [f.name for f in lat.type.fields()] == ["value", "typed_value"]
    assert lat.type.fields()[1].type == dt.float64
    assert st.shredded and st.shred_type == dt.struct(
        {"latitude": dt.float64, "longitude": dt.float32})


def test_shred_unshred_lossless():
    from arrow_go_tpu import extensions as ext
    from arrow_go_tpu.array.builders import make_builder
    objs = [
        {"latitude": 1.5, "longitude": -2.25, "tag": "x"},
        {"latitude": 3.0},
        {"latitude": "oops", "longitude": 4.5},
        [1, 2, 3],
        None,
    ]
    vb = make_builder(ext.VariantType().storage_type)
    for o in objs:
        m, v = var.encode(o)
        vb.append({"metadata": m, "value": v})
    sh = ext.shred_variant(
        vb.finish(), dt.struct({"latitude": dt.float64,
                                "longitude": dt.float64}))
    rows = sh.storage.to_pylist()
    assert rows[0]["typed_value"]["latitude"]["typed_value"] == 1.5
    assert rows[0]["value"] is not None          # residual holds "tag"
    assert rows[1]["typed_value"]["longitude"] == {"value": None,
                                                   "typed_value": None}
    assert rows[2]["typed_value"]["latitude"]["typed_value"] is None
    assert rows[3]["typed_value"] is None and rows[3]["value"] is not None
    back = ext.unshred_variant(sh)
    got = [None if r is None else var.decode(r["metadata"], r["value"])
           for r in back.storage.to_pylist()]
    assert got == objs


def test_shredded_list_and_parquet_roundtrip():
    import io
    from arrow_go_tpu import extensions as ext, parquet as pq
    from arrow_go_tpu.array.builders import make_builder
    from arrow_go_tpu.array.record import RecordBatch, Table
    objs = [[1, 2], ["a", 3], None, [None], {"k": 1}]
    vb = make_builder(ext.VariantType().storage_type)
    for o in objs:
        m, v = var.encode(o)
        vb.append({"metadata": m, "value": v})
    sh = ext.shred_variant(vb.finish(), dt.list_(dt.int64))
    t = Table.from_batches([RecordBatch(
        dt.Schema([dt.Field("v", sh.type, True)]), [sh], len(sh))])
    buf = io.BytesIO()
    pq.write_table(t, buf)
    bc = pq.ParquetFile(buf.getvalue()).read_table().to_batches()[0].column(0)
    assert isinstance(bc.type, ext.VariantType) and bc.type.shredded
    un = ext.unshred_variant(bc)
    got = [None if r is None else var.decode(r["metadata"], r["value"])
           for r in un.storage.to_pylist()]
    assert got == objs
