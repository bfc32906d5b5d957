"""Flight RPC tests: loopback gRPC servers on ephemeral ports, plus
cross-implementation runs against pyarrow.flight (the reference tests the
same way — real loopback gRPC, flight_test.go / scenario.go:94)."""
import threading
import time

import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu import flight as fl

pytest.importorskip("grpc")


class DemoServer(fl.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        self.tables = {b"t1": agt.table({"x": [1, 2, None],
                                         "s": ["a", None, "c"]})}

    def do_get(self, ctx, ticket):
        return self.tables[ticket.ticket]

    def do_put(self, ctx, desc, reader):
        self.tables[desc.path[0].encode()] = reader.read_all()
        yield b"ok"

    def get_flight_info(self, ctx, desc):
        t = self.tables[desc.path[0].encode()]
        return fl.FlightInfo(t.schema, desc,
                             [fl.FlightEndpoint(fl.Ticket(desc.path[0]))],
                             t.num_rows, -1)

    def list_flights(self, ctx, criteria):
        for name, t in self.tables.items():
            d = fl.FlightDescriptor.for_path(name.decode())
            yield fl.FlightInfo(t.schema, d,
                                [fl.FlightEndpoint(fl.Ticket(name))],
                                t.num_rows, -1)

    def do_exchange(self, ctx, desc, reader):
        # echo with a filter: rows where first column is valid
        t = reader.read_all()
        from arrow_go_tpu import compute as pc
        rb = t.to_batches()[0]
        mask = pc.is_valid(rb.column(0))
        out = pc.filter(rb, mask)
        return out.schema, [out]

    def do_action(self, ctx, action):
        if action.type == "ping":
            yield fl.Result(b"pong:" + action.body)
        else:
            raise NotImplementedError(action.type)

    def list_actions(self, ctx):
        yield ("ping", "responds with pong")


@pytest.fixture(scope="module")
def server():
    with DemoServer() as srv:
        yield srv


@pytest.fixture()
def client(server):
    with fl.FlightClient(f"grpc://127.0.0.1:{server.port}") as c:
        yield c


def test_get_flight_info(client):
    info = client.get_flight_info(fl.FlightDescriptor.for_path("t1"))
    assert info.schema.names == ["x", "s"]
    assert info.total_records == 3
    assert info.endpoints[0].ticket.ticket == b"t1"


def test_do_get(client):
    t = client.do_get(fl.Ticket(b"t1")).read_all()
    assert t.to_pydict() == {"x": [1, 2, None], "s": ["a", None, "c"]}


def test_do_put_roundtrip(client):
    src = agt.table({"v": [9, 8], "w": [None, "z"],
                     "d": agt.array(["p", "p", None],
                                    dt.dictionary(dt.int32, dt.string)).slice(0, 2)})
    acks = client.do_put(fl.FlightDescriptor.for_path("up"), src.schema,
                         src.to_batches())
    assert acks == [b"ok"]
    back = client.do_get(fl.Ticket(b"up")).read_all()
    assert back.to_pydict() == src.to_pydict()


def test_list_flights(client):
    infos = list(client.list_flights())
    assert any(i.descriptor.path == ["t1"] for i in infos)


def test_get_schema(client):
    s = client.get_schema(fl.FlightDescriptor.for_path("t1"))
    assert s.names == ["x", "s"]
    assert s.field(0).type == dt.int64


def test_do_exchange(client):
    src = agt.table({"k": [1, None, 3]})
    out = client.do_exchange(fl.FlightDescriptor.for_command(b"filter"),
                             src.schema, src.to_batches()).read_all()
    assert out.to_pydict() == {"k": [1, 3]}


def test_actions(client):
    assert client.list_actions() == [("ping", "responds with pong")]
    results = list(client.do_action(fl.Action("ping", b"hi")))
    assert results[0].body == b"pong:hi"


def test_unimplemented_action_raises(client):
    import grpc
    with pytest.raises(grpc.RpcError):
        list(client.do_action(fl.Action("nope")))


def test_handshake(client):
    assert client.handshake(b"x") == b""


# -- cross implementation ----------------------------------------------------

pafl = pytest.importorskip("pyarrow.flight")
import pyarrow as pa  # noqa: E402


def test_pyarrow_client_reads_our_server(server):
    c = pafl.connect(f"grpc://127.0.0.1:{server.port}")
    t = c.do_get(pafl.Ticket(b"t1")).read_all()
    t.validate(full=True)
    assert t.to_pydict() == {"x": [1, 2, None], "s": ["a", None, "c"]}
    info = c.get_flight_info(pafl.FlightDescriptor.for_path("t1"))
    assert info.total_records == 3
    c.close()


def test_pyarrow_client_puts_to_our_server(server):
    c = pafl.connect(f"grpc://127.0.0.1:{server.port}")
    src = pa.table({"y": [10, None], "z": ["q", "r"]})
    w, _ = c.do_put(pafl.FlightDescriptor.for_path("from_pa"), src.schema)
    w.write_table(src)
    w.done_writing()
    c.close()
    deadline = time.time() + 5
    while b"from_pa" not in server.tables and time.time() < deadline:
        time.sleep(0.05)
    assert server.tables[b"from_pa"].to_pydict() == \
        {"y": [10, None], "z": ["q", "r"]}


def test_our_client_reads_pyarrow_server():
    class PaSrv(pafl.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")
            self.t = pa.table({"a": [5, 6], "b": [None, "v"]})

        def do_get(self, ctx, ticket):
            return pafl.RecordBatchStream(self.t)

    srv = PaSrv()
    th = threading.Thread(target=srv.serve, daemon=True)
    th.start()
    time.sleep(0.4)
    with fl.FlightClient(f"grpc://127.0.0.1:{srv.port}") as c:
        t = c.do_get(fl.Ticket(b"any")).read_all()
    assert t.to_pydict() == {"a": [5, 6], "b": [None, "v"]}
    srv.shutdown()


def test_session_middleware():
    class SessServer(fl.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")
            self.sessions = fl.SessionManager()

        def do_action(self, ctx, action):
            sess = self.sessions.session(ctx)
            if action.type == "bump":
                sess["hits"] = sess.get("hits", 0) + 1
                yield fl.Result(str(sess["hits"]).encode())
            elif action.type == "close":
                self.sessions.close(ctx)
                yield fl.Result(b"closed")

    with SessServer() as srv:
        mw = fl.CookieMiddleware()
        with fl.FlightClient(f"grpc://127.0.0.1:{srv.port}",
                             middleware=[mw]) as c:
            vals = [list(c.do_action(fl.Action("bump")))[0].body
                    for _ in range(3)]
            assert vals == [b"1", b"2", b"3"]
            assert len(srv.sessions) == 1
            list(c.do_action(fl.Action("close")))
            assert len(srv.sessions) == 0
        with fl.FlightClient(f"grpc://127.0.0.1:{srv.port}",
                             middleware=[fl.CookieMiddleware()]) as c2:
            assert list(c2.do_action(fl.Action("bump")))[0].body == b"1"


# ---------------------------------------------------------------------------
# standard CancelFlightInfo / RenewFlightEndpoint actions
# (reference flight/client.go CancelFlightInfo, RenewFlightEndpoint;
#  scenario.go expiration integration scenarios)
# ---------------------------------------------------------------------------

class CancellableServer(fl.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        self.cancelled = []
        self.renewed = []

    def get_flight_info(self, ctx, desc):
        t = agt.table({"x": [1]})
        return fl.FlightInfo(t.schema, desc,
                             [fl.FlightEndpoint(fl.Ticket(b"tk"))], 1, -1)

    def cancel_flight_info(self, ctx, info):
        from arrow_go_tpu.flight import Flight_pb2 as fp
        self.cancelled.append(info)
        return fp.CANCEL_STATUS_CANCELLED

    def renew_flight_endpoint(self, ctx, endpoint):
        self.renewed.append(endpoint)
        return fl.FlightEndpoint(fl.Ticket(b"tk-renewed"),
                                 ["grpc://example:1234"])


def test_cancel_and_renew_actions():
    from arrow_go_tpu.flight import Flight_pb2 as fp
    with CancellableServer() as srv:
        c = fl.FlightClient(f"grpc://127.0.0.1:{srv.port}")
        info = c.get_flight_info(fl.FlightDescriptor.for_path("t"))
        status = c.cancel_flight_info(info)
        assert status == fp.CANCEL_STATUS_CANCELLED
        assert len(srv.cancelled) == 1

        ep = c.renew_flight_endpoint(info.endpoints[0])
        assert ep.ticket.ticket == b"tk-renewed"
        assert ep.locations == ["grpc://example:1234"]
        assert len(srv.renewed) == 1
        c.close()


def test_session_options_actions():
    """Standard SetSessionOptions/GetSessionOptions/CloseSession actions
    (reference flight/session/session.go DoAction interception)."""
    from arrow_go_tpu.flight import Flight_pb2 as fp

    class SessServer(fl.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")
            self.sessions = fl.SessionManager()

    with SessServer() as srv:
        mw = fl.CookieMiddleware()
        with fl.FlightClient(f"grpc://127.0.0.1:{srv.port}",
                             middleware=[mw]) as c:
            errs = c.set_session_options({
                "catalog": "main", "max_rows": 1000,
                "trace": True, "ratio": 0.5,
                "paths": ["a", "b"]})
            assert errs == {}
            got = c.get_session_options()
            assert got == {"catalog": "main", "max_rows": 1000,
                           "trace": True, "ratio": 0.5,
                           "paths": ["a", "b"]}
            # unset via None erases
            c.set_session_options({"catalog": None})
            assert "catalog" not in c.get_session_options()
            # empty name rejected
            errs = c.set_session_options({"": "x"})
            assert errs[""] == \
                fp.SetSessionOptionsResult.ERROR_VALUE_INVALID_NAME
            assert c.close_session() == fp.CloseSessionResult.STATUS_CLOSED
            assert len(srv.sessions) == 0
