import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt


def test_type_ids_complete():
    # all 45 logical ids (43 + decimal32/64 additions) are defined
    assert len(dt.TypeId) == 45


def test_primitive_properties():
    assert dt.int64.is_integer and dt.int64.is_signed_integer
    assert dt.uint8.is_unsigned_integer
    assert dt.float32.is_floating and dt.float32.is_numeric
    assert dt.int32.np_dtype == np.dtype(np.int32)
    assert dt.int32.bit_width == 32
    assert dt.bool_.bit_width == 1
    assert dt.string.is_binary_like
    assert dt.list_(dt.int32).is_nested


def test_equality():
    assert dt.int32 == dt.Int32Type()
    assert dt.int32 != dt.int64
    assert dt.timestamp("us") == dt.timestamp("us")
    assert dt.timestamp("us") != dt.timestamp("ns")
    assert dt.timestamp("us", "UTC") != dt.timestamp("us")
    assert dt.decimal128(10, 2) == dt.decimal128(10, 2)
    assert dt.decimal128(10, 2) != dt.decimal128(11, 2)
    assert dt.list_(dt.int32) == dt.list_(dt.int32)
    assert dt.list_(dt.int32) != dt.list_(dt.int64)
    assert dt.struct({"a": dt.int32}) == dt.struct({"a": dt.int32})
    assert hash(dt.int32) == hash(dt.Int32Type())


def test_schema():
    s = agt.schema({"a": dt.int64, "b": dt.string})
    assert s.num_fields == 2
    assert s.field_index("b") == 1
    assert s.field_by_name("a").type == dt.int64
    s2 = s.add_field(1, dt.field("c", dt.float64))
    assert s2.names == ["a", "c", "b"]
    assert s.names == ["a", "b"]
    s3 = s2.remove_field(1)
    assert s3.equals(s)


def test_metadata():
    m = dt.Metadata({"k1": "v1", "k2": "v2"})
    assert m.get("k1") == "v1"
    assert m.get("nope", "d") == "d"
    m2 = m.with_pair("k3", "v3")
    assert len(m2) == 3 and len(m) == 2


def test_decimal_precision_bounds():
    with pytest.raises(ValueError):
        dt.decimal32(10, 0)
    with pytest.raises(ValueError):
        dt.decimal128(39, 0)
    dt.decimal256(76, 10)


def test_map_type():
    m = dt.map_(dt.string, dt.int64)
    assert m.key_type == dt.string
    assert m.item_type == dt.int64
    assert m.value_type.id == dt.TypeId.STRUCT
