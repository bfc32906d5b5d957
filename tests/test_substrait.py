"""Substrait bridge tests (reference arrow/compute/exprs scope):
ExtendedExpression serialize/deserialize, schema NamedStruct parity,
cross-validation against pyarrow.substrait (Acero) in both directions,
and evaluation of deserialized expressions through our compute layer."""
import datetime

import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.compute import substrait as sub
from arrow_go_tpu.compute.expression import call, field, literal

pa = pytest.importorskip("pyarrow")
import pyarrow.compute as pc  # noqa: E402
import pyarrow.substrait as ps  # noqa: E402

SCHEMA = dt.Schema([dt.field("a", dt.int64), dt.field("b", dt.float64),
                    dt.field("s", dt.string)])
PA_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.float64()),
                       ("s", pa.string())])


def test_schema_bytes_match_pyarrow():
    ours = sub.serialize_schema(SCHEMA)
    theirs = bytes(memoryview(ps.serialize_schema(PA_SCHEMA).schema))
    assert ours == theirs
    assert [f.name for f in sub.deserialize_schema(theirs).fields] \
        == ["a", "b", "s"]


def test_schema_nested_roundtrip():
    schema = dt.Schema([
        dt.field("x", dt.struct([dt.field("u", dt.int32),
                                 dt.field("v", dt.list_(dt.string))])),
        dt.field("m", dt.map_(dt.string, dt.int64)),
        dt.field("d", dt.decimal128(20, 3)),
        dt.field("ts", dt.timestamp("us")),
    ])
    out = sub.deserialize_schema(sub.serialize_schema(schema))
    assert [f.name for f in out.fields] == ["x", "m", "d", "ts"]
    assert out.field(0).type.id == dt.TypeId.STRUCT
    assert out.field(0).type.fields()[0].name == "u"
    assert out.field(2).type.precision == 20


def test_pyarrow_expressions_decode_and_evaluate():
    exprs = [pc.field("a") > pa.scalar(3, pa.int64()),
             pc.field("b") * pa.scalar(2.0, pa.float64()),
             pc.field("s") == pa.scalar("hi", pa.string())]
    blob = bytes(memoryview(ps.serialize_expressions(
        exprs, ["gt", "mul", "eq"], PA_SCHEMA)))
    be = sub.deserialize_expressions(blob)
    assert set(be.expressions) == {"gt", "mul", "eq"}
    assert repr(be.expressions["gt"]) == "greater($a, 3)"
    # evaluate numeric expressions through the compiled device path
    from arrow_go_tpu.compute.expression import compile_expression
    from arrow_go_tpu.device import batch_to_device, from_device
    t = agt.record_batch({"a": [1, 5, 3, 9], "b": [0.5, 1.5, 2.5, 3.5]})
    nschema = dt.Schema([dt.field("a", dt.int64), dt.field("b", dt.float64)])
    db = batch_to_device(t)
    gt = from_device(compile_expression(be.expressions["gt"], nschema)(db))
    assert gt.to_pylist() == [False, True, False, True]
    mul = from_device(compile_expression(be.expressions["mul"], nschema)(db))
    assert mul.to_pylist() == [1.0, 3.0, 5.0, 7.0]
    # string comparison evaluates through the host registry
    from arrow_go_tpu.compute.registry import call_function
    e = be.expressions["eq"]
    s = agt.array(["hi", "no", "hi", "x"])
    assert call_function(e.function, [s, e.args[1].value]).to_pylist() \
        == [True, False, True, False]


def test_our_expressions_decode_in_pyarrow():
    my = {"gt": call("greater", [field("a"), literal(3)]),
          "mix": call("and_kleene",
                      [call("greater", [field("a"), literal(3)]),
                       call("less", [field("b"), literal(9.5)])]),
          "arith": call("add", [field("a"), field("a")])}
    blob = sub.serialize_expressions(my, schema=SCHEMA)
    out = ps.deserialize_expressions(blob)
    assert set(out.expressions) == {"gt", "mix", "arith"}
    # Acero evaluates them identically
    tbl = pa.table({"a": [1, 5, 9], "b": [1.0, 20.0, 2.0],
                    "s": ["x", "y", "z"]})
    mask = pc.field("a") > pa.scalar(3, pa.int64())
    assert tbl.filter(out.expressions["gt"]).num_rows \
        == tbl.filter(mask).num_rows
    assert tbl.filter(out.expressions["mix"]).column("a").to_pylist() == [9]


def test_roundtrip_through_ourselves():
    my = {"e": call("multiply",
                    [call("add", [field("a"), literal(1)]), field("a")]),
          "cast": call("cast", [field("a")], {"to_type": dt.float64}),
          "cond": call("if_else", [call("greater", [field("a"), literal(0)]),
                                   field("a"), literal(0)])}
    blob = sub.serialize_expressions(my, schema=SCHEMA)
    be = sub.deserialize_expressions(blob)
    assert repr(be.expressions["e"]) == "multiply(add($a, 1), $a)"
    assert repr(be.expressions["cond"]).startswith("if_else(greater($a, 0)")
    from arrow_go_tpu.compute.expression import compile_expression
    from arrow_go_tpu.device import batch_to_device, from_device
    t = agt.record_batch({"a": [2, -3, 4]})
    nschema = dt.Schema([dt.field("a", dt.int64)])
    db = batch_to_device(t)
    assert from_device(compile_expression(
        be.expressions["e"], nschema)(db)).to_pylist() == [6, 6, 20]
    assert from_device(compile_expression(
        be.expressions["cond"], nschema)(db)).to_pylist() == [2, 0, 4]


def test_unchecked_variants_round_trip_overflow_option():
    my = {"u": call("add_unchecked", [field("a"), literal(1)])}
    blob = sub.serialize_expressions(my, schema=SCHEMA)
    be = sub.deserialize_expressions(blob)
    assert be.expressions["u"].function == "add_unchecked"
    # pyarrow maps SILENT overflow to the non-checked kernel
    out = ps.deserialize_expressions(blob)
    assert "add" in str(out.expressions["u"])
    assert "add_checked" not in str(out.expressions["u"])


def test_nested_field_reference():
    schema = dt.Schema([dt.field("p", dt.struct([dt.field("x", dt.int64),
                                                 dt.field("y", dt.int64)]))])
    my = {"ny": call("negate", [field("p", "y")])}
    blob = sub.serialize_expressions(my, schema=schema)
    be = sub.deserialize_expressions(blob)
    assert repr(be.expressions["ny"]) == "negate($p.y)"


def test_date_literal():
    schema = dt.Schema([dt.field("d", dt.date32)])
    my = {"cmp": call("greater", [field("d"),
                                  literal(datetime.date(2020, 6, 1))])}
    be = sub.deserialize_expressions(
        sub.serialize_expressions(my, schema=schema))
    lit = be.expressions["cmp"].args[1]
    assert lit.value == datetime.date(2020, 6, 1)
