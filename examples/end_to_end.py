"""End-to-end demo: every major subsystem in one pipeline.

CSV ingest -> parquet (bloom filters, page index) -> dataset scan with
predicate pushdown + fused expression filter -> device group-by ->
hash join -> sort -> Arrow IPC -> Flight serve -> (pyarrow or our) client
readback -> FlightSQL query over sqlite.

Run: python examples/end_to_end.py            (TPU if available)
     PYTHONPATH= JAX_PLATFORMS=cpu python examples/end_to_end.py
"""
import io
import os
import tempfile

import arrow_go_tpu as agt
from arrow_go_tpu import compute as pc
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import flight as fl
from arrow_go_tpu import formats, ipc, parquet
from arrow_go_tpu.dataset import dataset


def main():
    tmp = tempfile.mkdtemp(prefix="agt_demo_")

    # 1. CSV ingest
    csv_data = b"order_id,region,amount\n" + b"".join(
        f"{i},{['east','west','north'][i % 3]},{(i * 7) % 100}.5\n".encode()
        for i in range(1000))
    orders = formats.read_csv(csv_data)
    print(f"[csv] {orders.num_rows} rows, schema {orders.schema.names}")

    # 2. parquet with bloom filters + page index, multiple row groups
    pq_path = os.path.join(tmp, "orders.parquet")
    parquet.write_table(orders, pq_path, row_group_size=250,
                        write_bloom_filters=True, compression="snappy")
    print(f"[parquet] wrote {os.path.getsize(pq_path)} bytes, "
          f"{parquet.ParquetFile(pq_path).num_row_groups} row groups")

    # 3. dataset scan: row-group pruning + fused device filter
    ds = dataset(tmp)
    hot = ds.to_table(filter=(pc.field("amount") > 50) &
                      (pc.field("order_id") >= 500))
    print(f"[scan] filtered to {hot.num_rows} rows "
          f"(pushdown skipped row groups below id 500)")

    # 3b. device scan fast path: pages decode IN HBM (bit-unpack / RLE /
    # dict gather as XLA programs); strings arrive as dictionary codes
    from arrow_go_tpu.parquet.device_read import read_batch_device
    from arrow_go_tpu.ops import reductions
    pf = parquet.ParquetFile(pq_path)
    db = read_batch_device(pf, 0)
    amt = db.column("amount")
    dev_sum = float(reductions.reduce_xla(
        amt.values, amt.validity, amt.length, "sum"))
    print(f"[device scan] row group 0 decoded in HBM, "
          f"sum(amount)={dev_sum} over {amt.length} rows")

    # 4. group-by on device
    by_region = pc.group_by(hot, "region",
                            [("amount", "sum"), ("amount", "count"),
                             ("amount", "max")])
    print(f"[group_by] {by_region.to_pydict()}")

    # 5. join with a dimension table
    dims = agt.record_batch({"region": ["east", "west", "north"],
                             "manager": ["ann", "bo", "chi"]})
    joined = pc.hash_join(by_region, dims, "region")
    # 6. sort by sum descending
    idx = pc.sort_indices(joined, pc.SortOptions(
        keys=[pc.SortKey("amount_sum", "descending")]))
    ranked = pc.take(joined, idx)
    print(f"[join+sort] {ranked.to_pydict()}")

    # 7. IPC roundtrip
    buf = io.BytesIO()
    with ipc.new_file(buf, ranked.schema, compression="zstd") as w:
        w.write(ranked)
    back = ipc.open_file(buf.getvalue()).read_all()
    assert back.to_pydict() == ranked.to_pydict()
    print(f"[ipc] zstd file roundtrip ok ({len(buf.getvalue())} bytes)")

    # 8. Flight serve + readback
    class Srv(fl.FlightServerBase):
        def do_get(self, ctx, ticket):
            return back

    with Srv("grpc://127.0.0.1:0") as srv:
        with fl.FlightClient(f"grpc://127.0.0.1:{srv.port}") as client:
            got = client.do_get(fl.Ticket(b"ranked")).read_all()
    assert got.to_pydict() == back.to_pydict()
    print(f"[flight] served + read back over gRPC")

    # 9. FlightSQL over sqlite
    with fl.SQLiteFlightSQLServer() as sqlsrv:
        with fl.FlightSQLClient(f"grpc://127.0.0.1:{sqlsrv.port}") as sc:
            sc.execute_update(
                "CREATE TABLE summary (region TEXT, total REAL)")
            for r, s in zip(ranked.column("region").to_pylist(),
                            ranked.column("amount_sum").to_pylist()):
                sc.execute_update(
                    f"INSERT INTO summary VALUES ('{r}', {s})")
            top = sc.execute_query(
                "SELECT region FROM summary ORDER BY total DESC LIMIT 1")
    print(f"[flightsql] top region: {top.column('region').to_pylist()[0]}")
    print("END-TO-END OK")


if __name__ == "__main__":
    main()
