"""Flight data-plane throughput: DoGet / DoPut over real loopback gRPC,
side by side with pyarrow.flight on the SAME batches (VERDICT r3 #8 —
the reference's transport IS its distributed product,
arrow/flight/server.go:197; wire compat was correctness-tested in
round 3 but never measured).

Four measurements, each loopback on 127.0.0.1:
  ours_do_get    our client <- our server streaming one table
  ours_do_put    our client -> our server
  pa_do_get      pyarrow client <- pyarrow server (same table)
  pa_do_put      pyarrow client -> pyarrow server

Prints JSON lines with GB/s; committed into BENCH_SUITE_r{N}.

Usage: python benchmarks/flight_bench.py [--mb 256] [--batch-rows 65536]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_batches(total_mb: int, batch_rows: int):
    import arrow_go_tpu as agt
    rng = np.random.default_rng(3)
    n_cols = 8
    bytes_per_row = n_cols * 8
    n_rows = total_mb * (1 << 20) // bytes_per_row
    n_batches = max(n_rows // batch_rows, 1)
    cols = {f"c{i}": rng.standard_normal(batch_rows) for i in range(n_cols)}
    batch = agt.record_batch({k: agt.from_numpy(v) for k, v in cols.items()})
    import pyarrow as pa
    pa_batch = pa.record_batch({k: pa.array(v) for k, v in cols.items()})
    nbytes = batch_rows * bytes_per_row * n_batches
    return batch, pa_batch, n_batches, nbytes


def bench_ours(batch, n_batches, nbytes, repeats):
    import arrow_go_tpu.flight as fl

    class Srv(fl.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")
            self.sink_rows = 0

        def do_get(self, ctx, ticket):
            return batch.schema, iter([batch] * n_batches)

        def do_put(self, ctx, desc, reader):
            rows = 0
            for b in reader:
                rows += b.num_rows
            self.sink_rows = rows
            return iter(())

    srv = Srv()
    port = srv.serve()
    cli = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    out = {}
    # DoGet
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        rows = 0
        for b in cli.do_get(fl.Ticket(b"bench")):
            rows += b.num_rows
        ts.append(time.perf_counter() - t0)
    assert rows == batch.num_rows * n_batches
    out["do_get"] = nbytes / float(np.median(ts)) / 1e9
    # DoPut
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        cli.do_put(fl.FlightDescriptor.for_path("bench"), batch.schema,
                   [batch] * n_batches)
        ts.append(time.perf_counter() - t0)
    assert srv.sink_rows == batch.num_rows * n_batches
    out["do_put"] = nbytes / float(np.median(ts)) / 1e9
    srv.shutdown()
    return out


def bench_pyarrow(pa_batch, n_batches, nbytes, repeats):
    import pyarrow.flight as paf

    class Srv(paf.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")
            self.sink_rows = 0

        def do_get(self, ctx, ticket):
            return paf.GeneratorStream(pa_batch.schema,
                                       iter([pa_batch] * n_batches))

        def do_put(self, ctx, desc, reader, writer):
            rows = 0
            for chunk in reader:
                rows += chunk.data.num_rows
            self.sink_rows = rows

    srv = Srv()
    cli = paf.connect(f"grpc://127.0.0.1:{srv.port}")
    out = {}
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        rows = 0
        for chunk in cli.do_get(paf.Ticket(b"bench")):
            rows += chunk.data.num_rows
        ts.append(time.perf_counter() - t0)
    assert rows == pa_batch.num_rows * n_batches
    out["do_get"] = nbytes / float(np.median(ts)) / 1e9
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        writer, meta = cli.do_put(
            paf.FlightDescriptor.for_path("bench"), pa_batch.schema)
        for _i in range(n_batches):
            writer.write_batch(pa_batch)
        writer.close()
        ts.append(time.perf_counter() - t0)
    out["do_put"] = nbytes / float(np.median(ts)) / 1e9
    srv.shutdown()
    return out


def bench_grpc_ceiling(nbytes, repeats):
    """Identity-serializer python-gRPC streaming of the same payload —
    the transport ceiling any python data plane can reach on this box
    (pyarrow rides gRPC C++ and is not bound by it)."""
    import grpc
    from concurrent import futures

    def ident(b):
        return b

    frames = [bytes(4 << 20)] * (nbytes // (4 << 20))

    def handler_fn(request, context):
        yield from frames

    h = grpc.unary_stream_rpc_method_handler(handler_fn, ident, ident)
    gh = grpc.method_handlers_generic_handler("S", {"M": h})
    opts = (("grpc.max_send_message_length", -1),
            ("grpc.max_receive_message_length", -1))
    srv = grpc.server(futures.ThreadPoolExecutor(4), options=opts)
    srv.add_generic_rpc_handlers((gh,))
    port = srv.add_insecure_port("127.0.0.1:0")
    srv.start()
    ch = grpc.insecure_channel(f"127.0.0.1:{port}", options=opts)
    stub = ch.unary_stream("/S/M", ident, ident)
    best = 0.0
    for _ in range(max(repeats, 3)):
        t0 = time.perf_counter()
        n = 0
        for f in stub(b"x"):
            n += len(f)
        best = max(best, n / 1e9 / (time.perf_counter() - t0))
    srv.stop(None)
    return best


def bench_ours_two_proc(args, nbytes):
    """Server in its OWN process (the deployment shape — no shared GIL
    with the client; the loopback numbers above run both ends in one
    interpreter, which pyarrow's C++ server does not suffer from)."""
    import subprocess
    import sys
    code = f"""
import sys, numpy as np
sys.path.insert(0, {repr(__file__.rsplit('/', 2)[0])})
import arrow_go_tpu as agt
import arrow_go_tpu.flight as fl
rng = np.random.default_rng(3)
batch = agt.record_batch({{f"c{{i}}": agt.from_numpy(
    rng.standard_normal({args.batch_rows})) for i in range(8)}})
class Srv(fl.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
    def do_get(self, ctx, ticket):
        return batch.schema, iter([batch] * {nbytes // (args.batch_rows * 64)})
    def do_put(self, ctx, desc, reader):
        rows = 0
        for b in reader:
            rows += b.num_rows
        return iter(())
srv = Srv()
print(srv.serve(), flush=True)
import time
time.sleep(600)
"""
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, text=True,
                            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                                 "HOME": "/root"})
    try:
        port = int(proc.stdout.readline().strip())
        import arrow_go_tpu.flight as fl
        cli = fl.FlightClient(f"grpc://127.0.0.1:{port}")
        batch, _, n_batches, _ = make_batches(args.mb, args.batch_rows)
        out = {}
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            rows = 0
            for b in cli.do_get(fl.Ticket(b"bench")):
                rows += b.num_rows
            ts.append(time.perf_counter() - t0)
        out["do_get"] = nbytes / float(np.median(ts)) / 1e9
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            cli.do_put(fl.FlightDescriptor.for_path("bench"), batch.schema,
                       [batch] * n_batches)
            ts.append(time.perf_counter() - t0)
        out["do_put"] = nbytes / float(np.median(ts)) / 1e9
        return out
    finally:
        proc.kill()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--batch-rows", type=int, default=1 << 16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    batch, pa_batch, n_batches, nbytes = make_batches(args.mb,
                                                      args.batch_rows)
    ours = bench_ours(batch, n_batches, nbytes, args.repeats)
    two = bench_ours_two_proc(args, nbytes)
    pa_res = bench_pyarrow(pa_batch, n_batches, nbytes, args.repeats)
    ceiling = bench_grpc_ceiling(nbytes, args.repeats)
    rec = {"bench": "flight_loopback",
           "payload_mb": round(nbytes / 1e6, 1),
           "batch_rows": args.batch_rows,
           "ours_do_get_gbps": round(ours["do_get"], 3),
           "ours_do_put_gbps": round(ours["do_put"], 3),
           "ours_2proc_do_get_gbps": round(two["do_get"], 3),
           "ours_2proc_do_put_gbps": round(two["do_put"], 3),
           "pyarrow_do_get_gbps": round(pa_res["do_get"], 3),
           "pyarrow_do_put_gbps": round(pa_res["do_put"], 3),
           "python_grpc_identity_ceiling_gbps": round(ceiling, 3)}
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    main()
