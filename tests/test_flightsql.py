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
