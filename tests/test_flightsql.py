"""Flight SQL tests against the sqlite3-backed example server (the
reference tests its flightsql layer against its SQLite example the same
way)."""
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt

pytest.importorskip("grpc")

from arrow_go_tpu.flight import (FlightSQLClient,  # noqa: E402
                                 SQLiteFlightSQLServer)


@pytest.fixture(scope="module")
def server():
    with SQLiteFlightSQLServer() as srv:
        with FlightSQLClient(f"grpc://127.0.0.1:{srv.port}") as c:
            c.execute_update("CREATE TABLE people (id INTEGER, name TEXT, "
                             "score REAL)")
            c.execute_update("INSERT INTO people VALUES (1,'ann',9.5),"
                             "(2,'bo',7.25),(3,NULL,NULL)")
        yield srv


@pytest.fixture()
def client(server):
    with FlightSQLClient(f"grpc://127.0.0.1:{server.port}") as c:
        yield c


def test_execute_query(client):
    t = client.execute_query("SELECT id, name FROM people ORDER BY id")
    assert t.to_pydict() == {"id": [1, 2, 3], "name": ["ann", "bo", None]}


def test_execute_with_expression(client):
    t = client.execute_query("SELECT COUNT(*) AS c, SUM(score) AS s "
                             "FROM people")
    assert t.to_pydict() == {"c": [3], "s": [16.75]}


def test_execute_update_rowcount(client):
    n = client.execute_update("INSERT INTO people VALUES (9,'tmp',0)")
    assert n == 1
    client.execute_update("DELETE FROM people WHERE id = 9")


def test_get_flight_info_schema(client):
    info = client.execute("SELECT id FROM people")
    assert info.schema.names == ["id"]
    assert info.total_records == 3


def test_catalog_metadata(client):
    assert client.get_catalogs().to_pydict() == {"catalog_name": ["main"]}
    assert "people" in client.get_tables().column("table_name").to_pylist()
    assert client.get_table_types().column("table_type").to_pylist() == \
        ["TABLE", "VIEW"]
    assert client.get_db_schemas().column("db_schema_name").to_pylist() == \
        ["main"]


def test_get_tables_filter(client):
    t = client.get_tables(table_name_filter_pattern="peo%")
    assert t.column("table_name").to_pylist() == ["people"]
    t2 = client.get_tables(table_name_filter_pattern="zzz%")
    assert t2.num_rows == 0


def test_prepared_statement(client):
    ps = client.prepare("SELECT name FROM people WHERE id <= 2 ORDER BY id")
    assert ps.dataset_schema.names == ["name"]
    assert ps.execute().to_pydict() == {"name": ["ann", "bo"]}
    ps.close()


def test_bad_sql_raises(client):
    import grpc
    with pytest.raises(grpc.RpcError):
        client.execute_query("SELECT nope FROM missing_table")


# ---------------------------------------------------------------------------
# round-2 surface: keys metadata, sql info, xdbc types, ingest, bind params,
# transactions (reference flightsql/server.go dispatch + sqlite example)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def keyed_server():
    with SQLiteFlightSQLServer() as srv:
        with FlightSQLClient(f"grpc://127.0.0.1:{srv.port}") as c:
            c.execute_update(
                "CREATE TABLE dept (id INTEGER PRIMARY KEY, name TEXT)")
            c.execute_update(
                "CREATE TABLE emp (id INTEGER PRIMARY KEY, dept_id INTEGER "
                "REFERENCES dept(id), name TEXT)")
            c.execute_update("INSERT INTO dept VALUES (1,'eng'),(2,'ops')")
        yield srv


@pytest.fixture()
def kclient(keyed_server):
    with FlightSQLClient(f"grpc://127.0.0.1:{keyed_server.port}") as c:
        yield c


def test_get_primary_keys(kclient):
    t = kclient.get_primary_keys("dept")
    d = t.to_pydict()
    assert d["column_name"] == ["id"]
    assert d["table_name"] == ["dept"]
    assert d["key_sequence"] == [1]


def test_get_imported_keys(kclient):
    t = kclient.get_imported_keys("emp")
    d = t.to_pydict()
    assert d["pk_table_name"] == ["dept"]
    assert d["fk_table_name"] == ["emp"]
    assert d["fk_column_name"] == ["dept_id"]


def test_get_exported_keys(kclient):
    t = kclient.get_exported_keys("dept")
    d = t.to_pydict()
    assert d["fk_table_name"] == ["emp"]


def test_get_cross_reference(kclient):
    t = kclient.get_cross_reference("dept", "emp")
    assert t.to_pydict()["fk_column_name"] == ["dept_id"]
    empty = kclient.get_cross_reference("nosuch", "emp")
    assert empty.num_rows == 0


def test_get_sql_info(kclient):
    t = kclient.get_sql_info()
    d = t.to_pydict()
    assert len(d["info_name"]) >= 5
    # filtered fetch
    from arrow_go_tpu.flight.sql import SqlInfo
    t2 = kclient.get_sql_info([SqlInfo.FLIGHT_SQL_SERVER_NAME])
    assert t2.num_rows == 1
    assert t2.column("value").to_pylist()[0] == "arrow_go_tpu sqlite example"


def test_get_xdbc_type_info(kclient):
    t = kclient.get_xdbc_type_info()
    assert "INTEGER" in t.column("type_name").to_pylist()
    t2 = kclient.get_xdbc_type_info(12)
    assert t2.column("type_name").to_pylist() == ["TEXT"]


def test_tables_with_included_schema(kclient):
    t = kclient.get_tables(table_name_filter_pattern="dept")
    assert "table_schema" not in t.schema.names
    import arrow_go_tpu.flight.FlightSql_pb2 as sqlpb
    from arrow_go_tpu.flight.sql import pack_any
    from arrow_go_tpu.flight.service import (FlightDescriptor,
                                             _schema_from_ipc_bytes)
    cmd = sqlpb.CommandGetTables(table_name_filter_pattern="dept",
                                 include_schema=True)
    info = kclient._inner.get_flight_info(
        FlightDescriptor.for_command(pack_any(cmd)))
    tt = kclient._inner.do_get(info.endpoints[0].ticket).read_all()
    blob = tt.column("table_schema").to_pylist()[0]
    sch = _schema_from_ipc_bytes(blob)
    assert sch.names == ["id", "name"]


def test_execute_ingest(kclient):
    data = agt.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    n = kclient.execute_ingest(data, "ingested")
    assert n == 3
    t = kclient.execute_query("SELECT * FROM ingested ORDER BY a")
    assert t.to_pydict() == {"a": [1, 2, 3], "b": ["x", "y", "z"]}
    # append mode
    n = kclient.execute_ingest(data, "ingested", if_exists="append")
    assert n == 3
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM ingested").to_pydict()["c"] == [6]
    # replace mode
    n = kclient.execute_ingest(data, "ingested", if_exists="replace")
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM ingested").to_pydict()["c"] == [3]
    # fail mode raises
    with pytest.raises(Exception):
        kclient.execute_ingest(data, "ingested", if_exists="fail")


def test_prepared_statement_parameters(kclient):
    ps = kclient.prepare("SELECT name FROM dept WHERE id = ?")
    params = agt.table({"p": [2]})
    ps.set_parameters(params)
    t = ps.execute()
    assert t.to_pydict() == {"name": ["ops"]}
    ps.close()


def test_prepared_update_with_params(kclient):
    kclient.execute_update("CREATE TABLE IF NOT EXISTS scratch (v INTEGER)")
    ps = kclient.prepare("INSERT INTO scratch VALUES (?)")
    n = ps.execute_update(agt.table({"v": [10, 20, 30]}))
    assert n == 3
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM scratch").to_pydict()["c"] == [3]
    ps.close()


def test_transactions(kclient):
    kclient.execute_update("CREATE TABLE IF NOT EXISTS txt (v INTEGER)")
    tid = kclient.begin_transaction()
    kclient.execute_update("INSERT INTO txt VALUES (1)")
    kclient.rollback(tid)
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM txt").to_pydict()["c"] == [0]
    tid = kclient.begin_transaction()
    kclient.execute_update("INSERT INTO txt VALUES (2)")
    kclient.commit(tid)
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM txt").to_pydict()["c"] == [1]


# ---------------------------------------------------------------------------
# DB-API 2.0 driver (reference flightsql/driver — the database/sql analog)
# ---------------------------------------------------------------------------

def test_dbapi_basic(keyed_server):
    from arrow_go_tpu.flight import dbapi
    with dbapi.connect(f"grpc://127.0.0.1:{keyed_server.port}") as conn:
        cur = conn.cursor()
        cur.execute("CREATE TABLE IF NOT EXISTS dbt (a INTEGER, b TEXT)")
        cur.executemany("INSERT INTO dbt VALUES (?, ?)",
                        [(1, "x"), (2, "y"), (3, None)])
        conn.commit()
        cur.execute("SELECT a, b FROM dbt ORDER BY a")
        assert cur.description[0][0] == "a"
        assert cur.fetchone() == (1, "x")
        assert cur.fetchmany(2) == [(2, "y"), (3, None)]
        assert cur.fetchone() is None
        cur.execute("SELECT COUNT(*) FROM dbt WHERE a > ?", (1,))
        assert cur.fetchall() == [(2,)]
        t = cur.fetch_arrow_table()
        assert t.num_rows == 1


def test_dbapi_rollback(keyed_server):
    from arrow_go_tpu.flight import dbapi
    with dbapi.connect(f"grpc://127.0.0.1:{keyed_server.port}") as conn:
        cur = conn.cursor()
        cur.execute("CREATE TABLE IF NOT EXISTS dbr (v INTEGER)")
        conn.commit()
        cur.execute("INSERT INTO dbr VALUES (1)")
        conn.rollback()
        cur.execute("SELECT COUNT(*) FROM dbr")
        assert cur.fetchone() == (0,)


def test_dbapi_iteration(keyed_server):
    from arrow_go_tpu.flight import dbapi
    with dbapi.connect(f"grpc://127.0.0.1:{keyed_server.port}") as conn:
        with conn.cursor() as cur:
            cur.execute("SELECT id FROM dept ORDER BY id")
            assert [r[0] for r in cur] == [1, 2]


def test_savepoints(kclient):
    """BeginSavepoint/EndSavepoint actions (reference flightsql/server.go:529,
    client.go BeginSavepoint)."""
    kclient.execute_update("CREATE TABLE IF NOT EXISTS spt (v INTEGER)")
    tid = kclient.begin_transaction()
    kclient.execute_update("INSERT INTO spt VALUES (1)")
    sid = kclient.begin_savepoint(tid, "sp1")
    kclient.execute_update("INSERT INTO spt VALUES (2)")
    kclient.rollback_savepoint(sid)      # undoes the second insert only
    kclient.commit(tid)
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM spt").to_pydict()["c"] == [1]
    tid = kclient.begin_transaction()
    sid = kclient.begin_savepoint(tid, "sp2")
    kclient.execute_update("INSERT INTO spt VALUES (3)")
    kclient.release_savepoint(sid)
    kclient.commit(tid)
    assert kclient.execute_query(
        "SELECT COUNT(*) AS c FROM spt").to_pydict()["c"] == [2]


def test_cancel_query_action(kclient):
    from arrow_go_tpu.flight import FlightSql_pb2 as sqlpb
    info = kclient.execute("SELECT 1 AS one")
    res = kclient.cancel_query(info)
    assert res == sqlpb.ActionCancelQueryResult.CANCEL_RESULT_NOT_CANCELLABLE


def test_savepoint_listed_in_actions(kclient):
    names = {a[0] for a in kclient._inner.list_actions()}
    assert {"BeginSavepoint", "EndSavepoint", "CancelQuery"} <= names
