"""Arrow Flight SQL (reference arrow/flight/flightsql — server.go:591
dispatch, client.go:132 Execute, schema_ref well-known schemas, and the
SQLite-backed example server).

Commands travel as `google.protobuf.Any`-packed messages inside
FlightDescriptor.cmd / Ticket, exactly per the Flight SQL spec.
"""
from __future__ import annotations

import threading
import uuid
from typing import Dict, Iterator, List, Optional, Tuple

from google.protobuf import any_pb2

from .. import dtypes as dt
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid, ArrowNotImplemented
from . import FlightSql_pb2 as sqlpb
from .service import (Action, FlightClient, FlightDescriptor, FlightEndpoint,
                      FlightInfo, FlightServerBase, Result, Ticket,
                      _schema_from_ipc_bytes, _schema_to_ipc_bytes)

_TYPE_PREFIX = "type.googleapis.com/"


def pack_any(msg) -> bytes:
    a = any_pb2.Any()
    a.Pack(msg)
    return a.SerializeToString()


def unpack_any(data: bytes):
    a = any_pb2.Any()
    a.ParseFromString(data)
    name = a.type_url.rsplit("/", 1)[-1].rsplit(".", 1)[-1]
    cls = getattr(sqlpb, name, None)
    if cls is None:
        raise ArrowNotImplemented(f"flight sql command {a.type_url}")
    msg = cls()
    a.Unpack(msg)
    return msg


# well-known result schemas (reference flightsql/schema_ref)
SCHEMA_CATALOGS = dt.Schema([dt.Field("catalog_name", dt.string, False)])
SCHEMA_DB_SCHEMAS = dt.Schema([
    dt.Field("catalog_name", dt.string),
    dt.Field("db_schema_name", dt.string, False)])
SCHEMA_TABLES = dt.Schema([
    dt.Field("catalog_name", dt.string),
    dt.Field("db_schema_name", dt.string),
    dt.Field("table_name", dt.string, False),
    dt.Field("table_type", dt.string, False)])
SCHEMA_TABLE_TYPES = dt.Schema([dt.Field("table_type", dt.string, False)])


class FlightSQLServerBase(FlightServerBase):
    """Dispatching Flight SQL server: override the do_get_* / execute
    handlers (reference BaseServer unimplemented-stub pattern,
    flightsql/server.go:284)."""

    # -- overridables ------------------------------------------------------
    def get_flight_info_statement(self, ctx, query: str,
                                  descriptor: FlightDescriptor) -> FlightInfo:
        raise ArrowNotImplemented("GetFlightInfoStatement")

    def do_get_statement(self, ctx, handle: bytes):
        raise ArrowNotImplemented("DoGetStatement")

    def get_flight_info_tables(self, ctx, cmd, descriptor) -> FlightInfo:
        return FlightInfo(SCHEMA_TABLES, descriptor,
                          [FlightEndpoint(Ticket(descriptor.command))], -1, -1)

    def do_get_tables(self, ctx, cmd):
        raise ArrowNotImplemented("DoGetTables")

    def do_get_catalogs(self, ctx):
        raise ArrowNotImplemented("DoGetCatalogs")

    def do_get_db_schemas(self, ctx, cmd):
        raise ArrowNotImplemented("DoGetDbSchemas")

    def do_get_table_types(self, ctx):
        raise ArrowNotImplemented("DoGetTableTypes")

    def do_get_prepared_statement(self, ctx, handle: bytes):
        raise ArrowNotImplemented("DoGetPreparedStatement")

    def create_prepared_statement(self, ctx, query: str
                                  ) -> Tuple[bytes, Optional[dt.Schema]]:
        raise ArrowNotImplemented("CreatePreparedStatement")

    def close_prepared_statement(self, ctx, handle: bytes) -> None:
        pass

    def execute_update(self, ctx, query: str) -> int:
        raise ArrowNotImplemented("ExecuteUpdate")

    # -- dispatch ----------------------------------------------------------
    def get_flight_info(self, ctx, descriptor: FlightDescriptor) -> FlightInfo:
        cmd = unpack_any(descriptor.command)
        if isinstance(cmd, sqlpb.CommandStatementQuery):
            return self.get_flight_info_statement(ctx, cmd.query, descriptor)
        if isinstance(cmd, (sqlpb.CommandGetTables, sqlpb.CommandGetCatalogs,
                            sqlpb.CommandGetDbSchemas,
                            sqlpb.CommandGetTableTypes)):
            schema = {sqlpb.CommandGetTables: SCHEMA_TABLES,
                      sqlpb.CommandGetCatalogs: SCHEMA_CATALOGS,
                      sqlpb.CommandGetDbSchemas: SCHEMA_DB_SCHEMAS,
                      sqlpb.CommandGetTableTypes: SCHEMA_TABLE_TYPES}[type(cmd)]
            return FlightInfo(schema, descriptor,
                              [FlightEndpoint(Ticket(descriptor.command))],
                              -1, -1)
        if isinstance(cmd, sqlpb.CommandPreparedStatementQuery):
            out = self.do_get_prepared_statement(
                ctx, cmd.prepared_statement_handle)
            schema = out.schema if isinstance(out, Table) else out[0]
            return FlightInfo(schema, descriptor,
                              [FlightEndpoint(Ticket(descriptor.command))],
                              -1, -1)
        raise ArrowNotImplemented(f"GetFlightInfo for {type(cmd).__name__}")

    def do_get(self, ctx, ticket: Ticket):
        cmd = unpack_any(ticket.ticket)
        if isinstance(cmd, sqlpb.TicketStatementQuery):
            return self.do_get_statement(ctx, cmd.statement_handle)
        if isinstance(cmd, sqlpb.CommandGetTables):
            return self.do_get_tables(ctx, cmd)
        if isinstance(cmd, sqlpb.CommandGetCatalogs):
            return self.do_get_catalogs(ctx)
        if isinstance(cmd, sqlpb.CommandGetDbSchemas):
            return self.do_get_db_schemas(ctx, cmd)
        if isinstance(cmd, sqlpb.CommandGetTableTypes):
            return self.do_get_table_types(ctx)
        if isinstance(cmd, sqlpb.CommandPreparedStatementQuery):
            return self.do_get_prepared_statement(
                ctx, cmd.prepared_statement_handle)
        raise ArrowNotImplemented(f"DoGet for {type(cmd).__name__}")

    def do_action(self, ctx, action: Action) -> Iterator[Result]:
        if action.type == "CreatePreparedStatement":
            req = unpack_any(action.body)
            handle, schema = self.create_prepared_statement(ctx, req.query)
            res = sqlpb.ActionCreatePreparedStatementResult(
                prepared_statement_handle=handle,
                dataset_schema=_schema_to_ipc_bytes(schema) if schema else b"")
            yield Result(pack_any(res))
            return
        if action.type == "ClosePreparedStatement":
            req = unpack_any(action.body)
            self.close_prepared_statement(ctx, req.prepared_statement_handle)
            return
        raise ArrowNotImplemented(f"action {action.type}")

    def list_actions(self, ctx):
        yield ("CreatePreparedStatement", "create a prepared statement")
        yield ("ClosePreparedStatement", "close a prepared statement")


class FlightSQLClient:
    """Reference flightsql/client.go:132."""

    def __init__(self, location: str):
        self._inner = FlightClient(location)

    def close(self):
        self._inner.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def execute(self, query: str) -> FlightInfo:
        cmd = sqlpb.CommandStatementQuery(query=query)
        return self._inner.get_flight_info(
            FlightDescriptor.for_command(pack_any(cmd)))

    def do_get(self, ticket: Ticket):
        return self._inner.do_get(ticket)

    def execute_query(self, query: str) -> Table:
        info = self.execute(query)
        return self._inner.do_get(info.endpoints[0].ticket).read_all()

    def execute_update(self, query: str) -> int:
        cmd = sqlpb.CommandStatementUpdate(query=query)
        desc = FlightDescriptor.for_command(pack_any(cmd))
        # spec: DoPut with the command descriptor; result in app_metadata
        empty = dt.Schema([])
        acks = self._inner.do_put(desc, empty, [])
        if acks:
            res = sqlpb.DoPutUpdateResult()
            res.ParseFromString(acks[0])
            return res.record_count
        return 0

    def _get(self, cmd) -> Table:
        desc = FlightDescriptor.for_command(pack_any(cmd))
        info = self._inner.get_flight_info(desc)
        return self._inner.do_get(info.endpoints[0].ticket).read_all()

    def get_catalogs(self) -> Table:
        return self._get(sqlpb.CommandGetCatalogs())

    def get_db_schemas(self, catalog: Optional[str] = None) -> Table:
        return self._get(sqlpb.CommandGetDbSchemas(catalog=catalog))

    def get_tables(self, catalog=None, db_schema_filter_pattern=None,
                   table_name_filter_pattern=None, table_types=()) -> Table:
        return self._get(sqlpb.CommandGetTables(
            catalog=catalog,
            db_schema_filter_pattern=db_schema_filter_pattern,
            table_name_filter_pattern=table_name_filter_pattern,
            table_types=list(table_types)))

    def get_table_types(self) -> Table:
        return self._get(sqlpb.CommandGetTableTypes())

    def prepare(self, query: str) -> "PreparedStatement":
        req = sqlpb.ActionCreatePreparedStatementRequest(query=query)
        results = list(self._inner.do_action(
            Action("CreatePreparedStatement", pack_any(req))))
        res = unpack_any(results[0].body)
        schema = (_schema_from_ipc_bytes(res.dataset_schema)
                  if res.dataset_schema else None)
        return PreparedStatement(self, res.prepared_statement_handle, schema)


class PreparedStatement:
    def __init__(self, client: FlightSQLClient, handle: bytes,
                 schema: Optional[dt.Schema]):
        self._client = client
        self.handle = handle
        self.dataset_schema = schema

    def execute(self) -> Table:
        cmd = sqlpb.CommandPreparedStatementQuery(
            prepared_statement_handle=self.handle)
        desc = FlightDescriptor.for_command(pack_any(cmd))
        info = self._client._inner.get_flight_info(desc)
        return self._client._inner.do_get(info.endpoints[0].ticket).read_all()

    def close(self) -> None:
        req = sqlpb.ActionClosePreparedStatementRequest(
            prepared_statement_handle=self.handle)
        list(self._client._inner.do_action(
            Action("ClosePreparedStatement", pack_any(req))))


# ---------------------------------------------------------------------------
# SQLite-backed example server (reference flightsql/example — the SQLite
# server used by the cross-language integration scenarios)
# ---------------------------------------------------------------------------

class SQLiteFlightSQLServer(FlightSQLServerBase):
    """Flight SQL over an in-memory sqlite3 database."""

    def __init__(self, location: str = "grpc://127.0.0.1:0",
                 db_path: str = ":memory:"):
        super().__init__(location)
        import sqlite3
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        self._prepared: Dict[bytes, str] = {}

    def _query_to_table(self, query: str) -> Table:
        import arrow_go_tpu as agt
        with self._lock:
            cur = self._conn.execute(query)
            rows = cur.fetchall()
            names = [d[0] for d in cur.description or []]
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        data = {n: list(c) for n, c in zip(names, cols)}
        if not rows:
            data = {n: [] for n in names}
        return agt.table(data) if names else agt.table({})

    def get_flight_info_statement(self, ctx, query, descriptor):
        t = self._query_to_table(query)
        ticket = pack_any(sqlpb.TicketStatementQuery(
            statement_handle=query.encode()))
        return FlightInfo(t.schema, descriptor,
                          [FlightEndpoint(Ticket(ticket))], t.num_rows, -1)

    def do_get_statement(self, ctx, handle: bytes):
        return self._query_to_table(handle.decode())

    def do_get_catalogs(self, ctx):
        import arrow_go_tpu as agt
        return Table.from_batches([RecordBatch(
            SCHEMA_CATALOGS, [agt.array(["main"])], 1)])

    def do_get_db_schemas(self, ctx, cmd):
        import arrow_go_tpu as agt
        return Table.from_batches([RecordBatch(
            SCHEMA_DB_SCHEMAS, [agt.array(["main"]), agt.array(["main"])], 1)])

    def do_get_tables(self, ctx, cmd):
        import arrow_go_tpu as agt
        q = "SELECT name, type FROM sqlite_master WHERE type IN ('table','view')"
        if cmd.table_name_filter_pattern:
            q += f" AND name LIKE '{cmd.table_name_filter_pattern}'"
        with self._lock:
            rows = self._conn.execute(q).fetchall()
        names = [r[0] for r in rows]
        types = ["TABLE" if r[1] == "table" else "VIEW" for r in rows]
        n = len(names)
        return Table.from_batches([RecordBatch(SCHEMA_TABLES, [
            agt.array(["main"] * n, dt.string),
            agt.array(["main"] * n, dt.string),
            agt.array(names, dt.string), agt.array(types, dt.string)], n)])

    def do_get_table_types(self, ctx):
        import arrow_go_tpu as agt
        return Table.from_batches([RecordBatch(
            SCHEMA_TABLE_TYPES, [agt.array(["TABLE", "VIEW"])], 2)])

    def create_prepared_statement(self, ctx, query):
        handle = uuid.uuid4().bytes
        self._prepared[handle] = query
        t = self._query_to_table(query)
        return handle, t.schema

    def do_get_prepared_statement(self, ctx, handle: bytes):
        return self._query_to_table(self._prepared[handle])

    def close_prepared_statement(self, ctx, handle: bytes) -> None:
        self._prepared.pop(handle, None)

    def do_put(self, ctx, descriptor, reader):
        cmd = unpack_any(descriptor.command)
        if isinstance(cmd, sqlpb.CommandStatementUpdate):
            with self._lock:
                cur = self._conn.execute(cmd.query)
                self._conn.commit()
            res = sqlpb.DoPutUpdateResult(record_count=cur.rowcount)
            yield res.SerializeToString()
            return
        raise ArrowNotImplemented("DoPut command")
