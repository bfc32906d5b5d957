"""CLI tools (reference L7: arrow/ipc/cmd/arrow-cat, arrow-ls,
parquet/cmd/parquet_reader, parquet_schema, file<->stream converters).

Usage:
    python -m arrow_go_tpu.cli cat file.arrow|file.parquet|file.csv
    python -m arrow_go_tpu.cli ls file.arrow|file.parquet
    python -m arrow_go_tpu.cli schema file.parquet
    python -m arrow_go_tpu.cli convert in.(arrow|parquet|csv) out.(arrow|parquet|csv)
"""
from __future__ import annotations

import argparse
import sys


def _read_any(path: str):
    from . import formats, ipc, parquet
    if path.endswith((".parquet", ".pq")):
        return parquet.read_table(path)
    if path.endswith((".arrow", ".feather", ".ipc")):
        with open(path, "rb") as f:
            return ipc.open_file(f).read_all()
    if path.endswith(".arrows"):
        with open(path, "rb") as f:
            return ipc.open_stream(f).read_all()
    if path.endswith(".csv"):
        return formats.read_csv(path)
    if path.endswith((".json", ".jsonl", ".ndjson")):
        return formats.read_json(path)
    if path.endswith(".avro"):
        return formats.read_avro(path)
    raise SystemExit(f"unknown format: {path}")


def _write_any(table, path: str):
    from . import formats, ipc, parquet
    if path.endswith((".parquet", ".pq")):
        parquet.write_table(table, path)
    elif path.endswith((".arrow", ".feather", ".ipc")):
        with open(path, "wb") as f:
            with ipc.new_file(f, table.schema) as w:
                w.write_table(table)
    elif path.endswith(".arrows"):
        with open(path, "wb") as f:
            with ipc.new_stream(f, table.schema) as w:
                w.write_table(table)
    elif path.endswith(".csv"):
        formats.write_csv(table, path)
    elif path.endswith((".json", ".jsonl", ".ndjson")):
        formats.write_json(table, path)
    else:
        raise SystemExit(f"unknown output format: {path}")


def cmd_cat(args):
    t = _read_any(args.file)
    n = args.rows if args.rows is not None else t.num_rows
    d = t.slice(0, min(n, t.num_rows)).to_pydict()
    names = list(d.keys())
    print("\t".join(names))
    for row in zip(*d.values()):
        print("\t".join("" if v is None else str(v) for v in row))


def cmd_ls(args):
    t = _read_any(args.file)
    print(f"rows: {t.num_rows}")
    for f in t.schema.fields:
        null = "" if f.nullable else " not null"
        print(f"  {f.name}: {f.type}{null}")


def cmd_schema(args):
    """Detailed parquet metadata dump (reference
    parquet/cmd/parquet_reader/main.go column/stats listing +
    parquet_schema)."""
    if args.file.endswith((".parquet", ".pq")):
        from . import parquet
        from .parquet import format as fmt
        pf = parquet.ParquetFile(args.file)
        print(f"rows: {pf.num_rows}  row_groups: {pf.num_row_groups}")
        print(f"created_by: {pf.metadata.created_by}")
        for f in pf.schema.fields:
            print(f"  {f.name}: {f.type}")
        for i, rg in enumerate(pf.metadata.row_groups or []):
            print(f"  row group {i}: rows={rg.num_rows} "
                  f"bytes={rg.total_compressed_size}")
            for ci, col in enumerate(rg.columns or []):
                m = col.meta_data
                if m is None:
                    continue
                encs = ",".join(fmt.Encoding(e).name
                                for e in (m.encodings or []))
                line = (f"    column {ci} {'.'.join(m.path_in_schema)}:"
                        f" values={m.num_values}"
                        f" codec={fmt.Codec(m.codec or 0).name}"
                        f" encodings=[{encs}]"
                        f" compressed={m.total_compressed_size}"
                        f" uncompressed={m.total_uncompressed_size}")
                st = m.statistics
                if st is not None and st.null_count is not None:
                    line += f" nulls={st.null_count}"
                print(line)
    else:
        cmd_ls(args)


def cmd_convert(args):
    _write_any(_read_any(args.src), args.dst)
    print(f"wrote {args.dst}")


def cmd_json_integration(args):
    """The archery integration-harness tool (reference
    arrow/ipc/cmd/arrow-json-integration-test/main.go): convert the
    integration JSON format <-> Arrow IPC files, or VALIDATE that a JSON
    file and an arrow file hold identical data."""
    from . import ipc
    from .array.record import Table
    from .interop import arrjson

    def read_json_batches(path):
        with open(path) as f:
            return arrjson.read_arrjson(f.read())

    def read_arrow_batches(path):
        with open(path, "rb") as f:
            r = ipc.open_file(f)
            return [r.get_batch(i) for i in range(r.num_record_batches)]

    if args.mode == "JSON_TO_ARROW":
        batches = read_json_batches(args.json)
        with open(args.arrow, "wb") as f:
            with ipc.new_file(f, batches[0].schema) as w:
                for b in batches:
                    w.write(b)
        print(f"wrote {args.arrow}")
    elif args.mode == "ARROW_TO_JSON":
        batches = read_arrow_batches(args.arrow)
        out = arrjson.write_arrjson(batches)
        with open(args.json, "w") as f:
            f.write(out)
        print(f"wrote {args.json}")
    else:  # VALIDATE
        jb = read_json_batches(args.json)
        ab = read_arrow_batches(args.arrow)
        tj = Table.from_batches(jb)
        ta = Table.from_batches(ab)
        if tj.schema != ta.schema:
            raise SystemExit(
                f"schema mismatch:\n  json: {tj.schema}\n  arrow: {ta.schema}")
        if tj.to_pydict() != ta.to_pydict():
            raise SystemExit("data mismatch between json and arrow files")
        print("validation passed")


def cmd_flight_integration(args):
    """The archery Flight integration drivers (reference
    arrow/flight/cmd/arrow-flight-integration-{server,client}/main.go over
    internal/flight_integration/scenario.go)."""
    from .flight import integration as fi
    if args.role == "list":
        for name in sorted(fi.SCENARIOS):
            print(name)
        return
    if args.scenario is None:
        raise SystemExit("--scenario is required for server/client")
    if args.role == "server":
        fi.run_scenario_server(args.scenario, args.port)
    else:
        uri = args.uri or f"grpc://localhost:{args.port}"
        fi.run_scenario_client(args.scenario, uri)


def main(argv=None):
    p = argparse.ArgumentParser(prog="arrow_go_tpu.cli")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("cat", help="print rows")
    c.add_argument("file")
    c.add_argument("--rows", type=int, default=None)
    c.set_defaults(fn=cmd_cat)
    l = sub.add_parser("ls", help="show schema + row count")
    l.add_argument("file")
    l.set_defaults(fn=cmd_ls)
    s = sub.add_parser("schema", help="detailed file metadata")
    s.add_argument("file")
    s.set_defaults(fn=cmd_schema)
    v = sub.add_parser("convert", help="convert between formats")
    v.add_argument("src")
    v.add_argument("dst")
    v.set_defaults(fn=cmd_convert)
    j = sub.add_parser(
        "json-integration",
        help="integration JSON <-> IPC convert/validate "
             "(arrow-json-integration-test)")
    j.add_argument("--mode", required=True,
                   choices=["JSON_TO_ARROW", "ARROW_TO_JSON", "VALIDATE"])
    j.add_argument("--json", required=True)
    j.add_argument("--arrow", required=True)
    j.set_defaults(fn=cmd_json_integration)
    fi = sub.add_parser(
        "flight-integration",
        help="archery Flight scenario server/client "
             "(arrow-flight-integration-server/-client)")
    fi.add_argument("role", choices=["server", "client", "list"])
    fi.add_argument("--scenario", default=None)
    fi.add_argument("--port", type=int, default=0)
    fi.add_argument("--uri", default=None)
    fi.set_defaults(fn=cmd_flight_integration)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
