"""Fuzz round-trips over canonical + random fixtures: IPC, parquet, device
blocks, arrjson, flight data — all against self and pyarrow where
applicable (the arrdata-fixture discipline of the reference suite)."""
import io

import numpy as np
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import compute as pc
from arrow_go_tpu import ipc
from arrow_go_tpu import parquet as pq

from fixtures import canonical_batches, pyarrow_comparable, random_batch

pa = pytest.importorskip("pyarrow")
import pyarrow.ipc as paipc  # noqa: E402
import pyarrow.parquet as papq  # noqa: E402


CANON = canonical_batches()


@pytest.mark.parametrize("name", sorted(CANON))
def test_canonical_ipc_roundtrip(name):
    rb = CANON[name]
    buf = io.BytesIO()
    with ipc.new_stream(buf, rb.schema) as w:
        w.write(rb)
    back = ipc.open_stream(buf.getvalue()).read_next_batch()
    assert back.to_pydict() == rb.to_pydict()
    # pyarrow reads it too
    pb = paipc.open_stream(buf.getvalue()).read_all()
    pb.validate(full=True)
    assert pb.num_rows == rb.num_rows


@pytest.mark.parametrize("name", sorted(CANON))
def test_canonical_parquet_roundtrip(name):
    rb = CANON[name]
    buf = io.BytesIO()
    pq.write_table(agt.Table.from_batches([rb]), buf)
    back = pq.read_table(buf.getvalue())
    # fixed-size lists round-trip as plain lists (parquet has no FSL
    # group encoding; same behavior as pyarrow)
    assert back.to_pydict() == rb.to_pydict()
    pt = papq.read_table(io.BytesIO(buf.getvalue()))
    pt.validate(full=True)


@pytest.mark.parametrize("name", sorted(CANON))
def test_canonical_device_roundtrip(name):
    from arrow_go_tpu.device import batch_from_device, batch_to_device
    rb = CANON[name]
    if name in ("nested", "binary", "decimal", "temporal"):
        ok_cols = [i for i, f in enumerate(rb.schema.fields)
                   if f.type.is_fixed_width or f.type.is_binary_like
                   or f.type.id in (dt.TypeId.DICTIONARY, dt.TypeId.DECIMAL128)]
        if not ok_cols:
            pytest.skip("no device-representable columns")
        rb = rb.select([rb.schema.field(i).name for i in ok_cols])
    back = batch_from_device(batch_to_device(rb))
    assert back.to_pydict() == rb.to_pydict()


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_ipc_roundtrip(seed):
    rb = random_batch(seed)
    buf = io.BytesIO()
    with ipc.new_file(buf, rb.schema, compression="zstd") as w:
        w.write(rb)
    back = ipc.open_file(buf.getvalue()).read_all()
    assert back.to_pydict() == rb.to_pydict()
    pt = paipc.open_file(io.BytesIO(buf.getvalue())).read_all()
    pt.validate(full=True)
    assert pt.num_rows == rb.num_rows


@pytest.mark.parametrize("seed", range(12, 24))
def test_fuzz_parquet_roundtrip(seed):
    rb = random_batch(seed)
    buf = io.BytesIO()
    pq.write_table(agt.Table.from_batches([rb]), buf, row_group_size=17)
    back = pq.read_table(buf.getvalue())
    assert back.to_pydict() == rb.to_pydict()
    pt = papq.read_table(io.BytesIO(buf.getvalue()))
    pt.validate(full=True)
    assert pyarrow_comparable(pt) == rb.to_pydict()


@pytest.mark.parametrize("seed", range(24, 30))
def test_fuzz_arrjson_roundtrip(seed):
    from arrow_go_tpu.interop.arrjson import read_arrjson, write_arrjson
    rb = random_batch(seed)
    drop = [f.name for f in rb.schema.fields
            if f.type.id == dt.TypeId.DICTIONARY]
    if drop:
        rb = rb.select([f.name for f in rb.schema.fields
                        if f.name not in drop])
    if rb.num_columns == 0:
        pytest.skip("all columns dictionary")
    back = read_arrjson(write_arrjson([rb]))[0]
    assert back.to_pydict() == rb.to_pydict()


@pytest.mark.parametrize("seed", range(30, 34))
def test_fuzz_flight_data_roundtrip(seed):
    from arrow_go_tpu.flight import FlightDataReader, batches_to_flight_data
    rb = random_batch(seed)
    stream = batches_to_flight_data(rb.schema, [rb, rb.slice(0, 10)])
    reader = FlightDataReader(iter(list(stream)))
    got = list(reader)
    assert got[0].to_pydict() == rb.to_pydict()
    assert got[1].to_pydict() == rb.slice(0, 10).to_pydict()


@pytest.mark.parametrize("seed", range(34, 38))
def test_fuzz_pyarrow_ipc_to_ours(seed):
    from arrow_go_tpu.interop import pyarrow_interop as px
    rb = random_batch(seed)
    prb = px.record_batch_to_pyarrow(rb)
    sink = io.BytesIO()
    with paipc.new_stream(sink, prb.schema) as w:
        w.write_batch(prb)
    back = ipc.open_stream(sink.getvalue()).read_next_batch()
    assert back.to_pydict() == rb.to_pydict()


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_filter_take_vs_pyarrow(seed):
    """Random mixed batches (flat + nested + dict columns, random nulls)
    through filter/take, bit-exact vs pyarrow."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.compute as pac
    from fixtures import random_batch
    from arrow_go_tpu.interop.pyarrow_interop import record_batch_to_pyarrow
    rng = np.random.default_rng(100 + seed)
    rb = random_batch(seed, n=60)
    prb = record_batch_to_pyarrow(rb)
    n = rb.num_rows
    mask = [None if rng.random() < 0.07 else bool(rng.random() < 0.5)
            for _ in range(n)]
    got = pc.filter(rb, agt.array(mask, dt.bool_))
    want = prb.filter(pa.array(mask, pa.bool_()))
    assert got.to_pydict() == pyarrow_comparable(
        pa.Table.from_batches([want])), seed
    idx = [None if rng.random() < 0.07 else int(rng.integers(0, n))
           for _ in range(40)]
    got2 = pc.take(rb, agt.array(idx, dt.int64))
    want2 = prb.take(pa.array(idx, pa.int64()))
    assert got2.to_pydict() == pyarrow_comparable(
        pa.Table.from_batches([want2])), seed
