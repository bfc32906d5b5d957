"""Scalar layer, tensors, REE encode/decode, array diff, C data interface."""
import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import compute as pc
from arrow_go_tpu.array.compare import (DiffEdit, array_approx_equal,
                                        array_equal, diff)
from arrow_go_tpu.tensor import Tensor, tensor


# -- scalars -----------------------------------------------------------------

def test_scalar_basics():
    s = pc.scalar(5)
    assert s.type == dt.int64 and s.as_py() == 5 and s.is_valid
    n = pc.scalar(None, dt.float64)
    assert not n.is_valid
    assert pc.scalar(5) == pc.scalar(5)
    assert pc.scalar(5) != pc.scalar(6)


def test_make_array_from_scalar():
    arr = pc.make_array_from_scalar(pc.scalar("x"), 3)
    assert arr.to_pylist() == ["x", "x", "x"]
    arr2 = pc.make_array_from_scalar(pc.scalar(None, dt.int32), 2)
    assert arr2.to_pylist() == [None, None]


def test_parse_scalar():
    assert pc.parse_scalar(dt.int32, "42").as_py() == 42
    assert pc.parse_scalar(dt.float64, "1.5").as_py() == 1.5
    assert pc.parse_scalar(dt.bool_, "true").as_py() is True
    import decimal
    assert pc.parse_scalar(dt.decimal128(10, 2), "1.25").as_py() == \
        decimal.Decimal("1.25")


def test_scalar_cast():
    assert pc.scalar(5).cast(dt.float64).as_py() == 5.0


# -- tensor ------------------------------------------------------------------

def test_tensor_from_numpy():
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    t = tensor(m)
    assert t.shape == (3, 4)
    assert t.ndim == 2 and t.size == 12
    assert t.is_row_major and not t.is_column_major
    assert t.value(1, 2) == 6.0
    assert np.array_equal(t.to_numpy(), m)


def test_tensor_from_array():
    a = agt.array(list(range(6)), dt.int64)
    t = Tensor(a, (2, 3))
    assert t.strides == (24, 8)
    assert t.value(1, 0) == 3


def test_tensor_rejects_nulls():
    from arrow_go_tpu.compute.errors import ArrowInvalid
    with pytest.raises(ArrowInvalid):
        Tensor(agt.array([1, None]), (2,))
    with pytest.raises(ArrowInvalid):
        Tensor(agt.array([1, 2]), (3,))


def test_tensor_device():
    t = tensor(np.eye(3, dtype=np.float32))
    d = t.to_device()
    assert d.shape == (3, 3)


# -- run-end encoding --------------------------------------------------------

def test_run_end_encode_decode():
    a = agt.array([1, 1, 1, 2, 2, None, None, 1])
    ree = pc.run_end_encode(a)
    assert ree.type.id == dt.TypeId.RUN_END_ENCODED
    assert ree.run_ends.to_pylist() == [3, 5, 7, 8]
    assert ree.values.to_pylist() == [1, 2, None, 1]
    assert pc.run_end_decode(ree).to_pylist() == a.to_pylist()


def test_run_end_encode_matches_pyarrow():
    pa = pytest.importorskip("pyarrow")
    pac = pytest.importorskip("pyarrow.compute")
    vals = [5, 5, None, 7, 7, 7]
    ours = pc.run_end_encode(agt.array(vals))
    theirs = pac.run_end_encode(pa.array(vals))
    assert ours.run_ends.to_pylist() == theirs.run_ends.to_pylist()
    assert ours.values.to_pylist() == theirs.values.to_pylist()


# -- diff / compare ----------------------------------------------------------

def test_array_equal_approx():
    assert array_equal(agt.array([1, None]), agt.array([1, None]))
    assert not array_equal(agt.array([1]), agt.array([2]))
    assert array_approx_equal(agt.array([1.0]), agt.array([1.0 + 1e-7]))
    assert not array_approx_equal(agt.array([1.0]), agt.array([1.1]))
    nan = float("nan")
    assert array_approx_equal(agt.array([nan]), agt.array([nan]),
                              nans_equal=True)
    assert not array_approx_equal(agt.array([nan]), agt.array([nan]))


def test_diff_edit_script():
    base = agt.array([1, 2, 3, 4])
    target = agt.array([1, 3, 4, 5])
    edits = diff(base, target)
    assert edits == [DiffEdit("-", 1, 2), DiffEdit("+", 3, 5)]
    assert diff(base, base) == []


# -- c data interface --------------------------------------------------------

def test_cdata_roundtrip_ours():
    from arrow_go_tpu import cdata
    from arrow_go_tpu.cdata import ffi
    a = agt.array([1, None, 3], dt.int32)
    s_ptr = ffi.new("struct ArrowSchema *")
    a_ptr = ffi.new("struct ArrowArray *")
    cdata.export_array(a, a_ptr, s_ptr)
    back = cdata.import_array(a_ptr, s_ptr)
    assert back.to_pylist() == [1, None, 3]
    assert back.type == dt.int32


@pytest.mark.parametrize("vals,typ", [
    ([1, None, 3], dt.int64),
    (["a", None], dt.string),
    ([True, False, None], dt.bool_),
    ([[1, 2], None], dt.list_(dt.int64)),
    ([{"x": 1, "y": "s"}, None], dt.struct({"x": dt.int64, "y": dt.string})),
    ([1000, None], dt.timestamp("ms")),
])
def test_cdata_pyarrow_interop(vals, typ):
    pa = pytest.importorskip("pyarrow")
    from arrow_go_tpu import cdata
    from arrow_go_tpu.cdata import ffi
    ours = agt.array(vals, typ)
    s = ffi.new("struct ArrowSchema *")
    a = ffi.new("struct ArrowArray *")
    cdata.export_array(ours, a, s)
    theirs = pa.Array._import_from_c(int(ffi.cast("intptr_t", a)),
                                     int(ffi.cast("intptr_t", s)))
    theirs.validate(full=True)
    # export back from pyarrow into us
    s2 = ffi.new("struct ArrowSchema *")
    a2 = ffi.new("struct ArrowArray *")
    theirs._export_to_c(int(ffi.cast("intptr_t", a2)),
                        int(ffi.cast("intptr_t", s2)))
    back = cdata.import_array(a2, s2)
    assert back.to_pylist() == ours.to_pylist()


# -- decimal128 device arithmetic -------------------------------------------

def test_decimal_device_arithmetic():
    import decimal as D
    a = agt.array([D.Decimal("1.25"), D.Decimal("-3.50"), None],
                  dt.decimal128(20, 2))
    b = agt.array([D.Decimal("0.75"), D.Decimal("1.25"), D.Decimal("2")],
                  dt.decimal128(20, 2))
    assert pc.add(a, b).to_pylist() == \
        [D.Decimal("2.00"), D.Decimal("-2.25"), None]
    assert pc.subtract(a, b).to_pylist() == \
        [D.Decimal("0.50"), D.Decimal("-4.75"), None]
    assert pc.multiply(a, b).to_pylist() == \
        [D.Decimal("0.9375"), D.Decimal("-4.3750"), None]
    assert pc.greater(a, b).to_pylist() == [True, False, None]
    assert pc.equal(a, D.Decimal("1.25")).to_pylist() == [True, False, None]


def test_decimal_mixed_scale_and_scalar():
    import decimal as D
    c = agt.array([D.Decimal("1.5")], dt.decimal128(10, 1))
    d = agt.array([D.Decimal("0.25")], dt.decimal128(10, 2))
    out = pc.add(c, d)
    assert out.to_pylist() == [D.Decimal("1.75")]
    assert out.type.scale == 2
    a = agt.array([D.Decimal("1.25")], dt.decimal128(20, 2))
    assert pc.add(a, D.Decimal("1.00")).to_pylist() == [D.Decimal("2.25")]


def test_decimal_128bit_magnitudes():
    import decimal as D
    big = agt.array([D.Decimal(-10**30), D.Decimal(10**30)],
                    dt.decimal128(38, 0))
    assert pc.add(big, big).to_pylist() == \
        [D.Decimal(-2 * 10**30), D.Decimal(2 * 10**30)]
    e15 = agt.array([D.Decimal(10**15)], dt.decimal128(38, 0))
    assert pc.multiply(e15, e15).to_pylist() == [D.Decimal(10**30)]


# -- c stream interface -------------------------------------------------------

def test_cdata_stream_export_to_pyarrow():
    pa = pytest.importorskip("pyarrow")
    from arrow_go_tpu import cdata
    from arrow_go_tpu.array.record import RecordBatch, Table
    schema = dt.Schema([dt.Field("a", dt.int64, True),
                        dt.Field("s", dt.string, True)])
    rb1 = RecordBatch(schema, [agt.array([1, 2, None]),
                               agt.array(["x", "y", None], dt.string)], 3)
    rb2 = RecordBatch(schema, [agt.array([4]),
                               agt.array(["z"], dt.string)], 1)
    t = Table.from_batches([rb1, rb2], schema)
    h = cdata.stream_handle()
    cdata.export_stream(t, h)
    pr = pa.RecordBatchReader._import_from_c(h)
    pt = pr.read_all()
    pt.validate(full=True)
    assert pt.column("a").to_pylist() == [1, 2, None, 4]
    assert pt.column("s").to_pylist() == ["x", "y", None, "z"]


def test_cdata_stream_import_from_pyarrow():
    pa = pytest.importorskip("pyarrow")
    from arrow_go_tpu import cdata
    pas = pa.schema([("k", pa.int32()), ("v", pa.float64())])
    batches = [pa.record_batch([pa.array([1, 2], pa.int32()),
                                pa.array([0.5, None])], schema=pas),
               pa.record_batch([pa.array([3], pa.int32()),
                                pa.array([2.5])], schema=pas)]
    reader = pa.RecordBatchReader.from_batches(pas, batches)
    h = cdata.stream_handle()
    reader._export_to_c(h)
    tbl = cdata.import_stream(h).read_all()
    assert tbl.column("k").to_pylist() == [1, 2, 3]
    assert tbl.column("v").to_pylist() == [0.5, None, 2.5]


def test_cdata_stream_roundtrip_ours():
    from arrow_go_tpu import cdata
    from arrow_go_tpu.array.record import RecordBatch, Table
    schema = dt.Schema([dt.Field("x", dt.float64, True)])
    rb = RecordBatch(schema, [agt.array([1.5, None, 2.5])], 3)
    t = Table.from_batches([rb], schema)
    h = cdata.stream_handle()
    cdata.export_stream(t, h)
    back = cdata.import_stream(h).read_all()
    assert back.column("x").to_pylist() == [1.5, None, 2.5]


def test_device_memory_watcher():
    """HBM leak watcher (TPU analog of CheckedAllocator.AssertSize)."""
    import numpy as np
    from arrow_go_tpu.utils.memwatch import DeviceMemoryWatcher, device_live_bytes
    from arrow_go_tpu.jaxenv import jnp

    with DeviceMemoryWatcher(tolerance=1 << 22) as w:
        x = jnp.asarray(np.arange(1 << 16, dtype=np.float32))
        y = (x * 2).sum()
        float(y)
        del x, y
    # on backends without memory stats this is a no-op; growth is None there
    assert w.growth is None or w.growth <= (1 << 22)


def test_device_memory_watcher_detects_leak():
    import pytest
    import numpy as np
    from arrow_go_tpu.utils.memwatch import DeviceMemoryWatcher, device_live_bytes
    from arrow_go_tpu.jaxenv import jnp
    if device_live_bytes() is None:
        pytest.skip("backend exposes no memory stats")
    leaked = []
    with pytest.raises(AssertionError):
        with DeviceMemoryWatcher(tolerance=1024):
            leaked.append(jnp.zeros(1 << 20, jnp.float32) + 1)
            leaked[-1].block_until_ready()


def test_debug_assert_tag(monkeypatch):
    """AGT_ASSERT analog of the reference `assert` build tag."""
    import importlib
    import arrow_go_tpu.utils.debug as dbg
    monkeypatch.setenv("AGT_ASSERT", "1")
    importlib.reload(dbg)
    with pytest.raises(AssertionError):
        dbg.debug_assert(False, "boom")
    dbg.debug_assert(True)
    monkeypatch.delenv("AGT_ASSERT")
    importlib.reload(dbg)
    dbg.debug_assert(False)   # no-op when tag off
