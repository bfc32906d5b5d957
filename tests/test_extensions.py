"""Canonical extension types (reference arrow/extensions/*) + the
extension registry + IPC interop of extension arrays."""
import io
import uuid as uuidlib

import numpy as np
import pytest

import arrow_go_tpu as agt
import arrow_go_tpu.dtypes as dt
from arrow_go_tpu import extensions as ext
from arrow_go_tpu import ipc
from arrow_go_tpu.array import builders
from arrow_go_tpu.array.arrays import ArrayData, make_array
from arrow_go_tpu.compute.errors import ArrowInvalid, ArrowKeyError

pa = pytest.importorskip("pyarrow")


def _ext_array(ext_type, storage):
    sd = storage._data
    return make_array(ArrayData(ext_type, sd.length, sd.buffers,
                                sd.children, sd.dictionary,
                                sd._null_count, sd.offset))


def test_registry():
    class T(dt.ExtensionType):
        def __init__(self):
            super().__init__(dt.int32, "test.mytype")

    t = T()
    ext.register_extension_type(t)
    assert ext.get_extension_type("test.mytype") is t
    with pytest.raises(ArrowKeyError):
        ext.register_extension_type(T())
    ext.unregister_extension_type("test.mytype")
    assert ext.get_extension_type("test.mytype") is None


def test_canonical_types_registered():
    for name in ("arrow.uuid", "arrow.json", "arrow.bool8",
                 "parquet.variant", "arrow.timestamp_with_offset"):
        assert ext.get_extension_type(name) is not None


def test_json_storage_validation():
    with pytest.raises(ArrowInvalid):
        ext.JsonType(dt.int32)
    assert ext.JsonType(dt.large_string).storage_type == dt.large_string


def test_timestamp_with_offset_storage():
    t = ext.TimestampWithOffsetType("ms")
    fs = t.storage_type.fields()
    assert fs[0].name == "timestamp" and not fs[0].nullable
    assert fs[0].type == dt.timestamp("ms", "UTC")
    assert fs[1].name == "offset_minutes" and fs[1].type == dt.int16

    # dictionary- and REE-encoded offsets are valid (reference
    # timestamp_with_offset.go:40 isOffsetTypeOk)
    ext.TimestampWithOffsetType("s", dt.dictionary(dt.int32, dt.int16))
    ext.TimestampWithOffsetType("s", dt.run_end_encoded(dt.int32, dt.int16))
    with pytest.raises(ArrowInvalid):
        ext.TimestampWithOffsetType("s", dt.int32)

    rt = ext.TimestampWithOffsetType.from_storage(t.storage_type)
    assert rt.storage_type == t.storage_type
    bad = dt.struct([dt.field("timestamp", dt.timestamp("s"), False),
                     dt.field("offset_minutes", dt.int16, False)])
    with pytest.raises(ArrowInvalid):  # tz must be UTC
        ext.TimestampWithOffsetType.from_storage(bad)


def test_uuid_ipc_roundtrip():
    b = builders.FixedSizeBinaryBuilder(dt.fixed_size_binary(16))
    raw = [uuidlib.uuid4().bytes for _ in range(4)]
    for i, v in enumerate(raw):
        if i == 2:
            b.append_null()
        else:
            b.append(v)
    arr = _ext_array(ext.uuid, b.finish())
    schema = dt.Schema([dt.field("u", ext.uuid, True)])
    rb = agt.RecordBatch(schema, [arr])

    buf = io.BytesIO()
    w = ipc.new_stream(buf, schema)
    w.write(rb)
    w.close()

    out = ipc.open_stream(io.BytesIO(buf.getvalue())).read_next_batch()
    f = out.schema.fields[0]
    assert f.type.id == dt.TypeId.EXTENSION
    assert f.type.extension_name == "arrow.uuid"
    col = out.column(0)
    assert col.value(0) == raw[0]
    assert not col.is_valid(2)
    assert ext.UuidType.to_uuid(col.value(3)) == uuidlib.UUID(bytes=raw[3])

    # pyarrow must see the same extension (field metadata mechanism)
    t = pa.ipc.open_stream(buf.getvalue()).read_all()
    pt = t.schema.field(0).type
    assert isinstance(pt, pa.BaseExtensionType) or \
        t.schema.field(0).metadata.get(b"ARROW:extension:name") == b"arrow.uuid"


def test_extension_import_from_pyarrow():
    storage = pa.array([b"x" * 16, b"y" * 16], pa.binary(16))
    md = {"ARROW:extension:name": "arrow.uuid"}
    schema = pa.schema([pa.field("u", pa.binary(16), metadata=md)])
    batch = pa.record_batch([storage], schema=schema)
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, schema) as w:
        w.write_batch(batch)

    out = ipc.open_stream(io.BytesIO(sink.getvalue())).read_next_batch()
    f = out.schema.fields[0]
    assert f.type.id == dt.TypeId.EXTENSION
    assert f.type.extension_name == "arrow.uuid"
    assert out.column(0).value(1) == b"y" * 16


def test_opaque_metadata_roundtrip():
    t = ext.OpaqueType(dt.string, "geometry", "postgis")
    b = builders.make_builder(dt.string)
    b.append("POINT(1 2)")
    arr = _ext_array(t, b.finish())
    schema = dt.Schema([dt.field("g", t, True)])
    rb = agt.RecordBatch(schema, [arr])
    buf = io.BytesIO()
    w = ipc.new_stream(buf, schema)
    w.write(rb)
    w.close()
    out = ipc.open_stream(io.BytesIO(buf.getvalue())).read_next_batch()
    f = out.schema.fields[0]
    assert f.type.extension_name == "arrow.opaque"
    import json
    info = json.loads(f.type.serialized.decode())
    assert info == {"type_name": "geometry", "vendor_name": "postgis"}


def test_not_alias():
    from arrow_go_tpu import compute
    a = agt.from_numpy(np.array([True, False, True]),
                       np.array([True, True, False]))
    out = compute.call_function("not", [a])
    host = agt.to_host(out) if hasattr(agt, "to_host") else out
    assert list(host.to_numpy()[:2]) == [False, True]
