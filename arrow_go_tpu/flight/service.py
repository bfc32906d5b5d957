"""Arrow Flight RPC server + client over grpc.

Reference: arrow/flight (server.go:197 Server, client.go:64 Client,
record_batch_reader.go/record_batch_writer.go bridging IPC framing onto
the FlightData stream). gRPC stubs are hand-wired (grpc generic handlers +
channel stream factories) over the protoc-generated messages.
"""
from __future__ import annotations

import io
import queue
import struct
import threading
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import grpc

from .. import dtypes as dt
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid
from .. import ipc
from ..ipc import core as ipc_core, metadata as ipc_md
from ..ipc.fb import Reader as FbReader
from . import Flight_pb2 as fp

SERVICE = "arrow.flight.protocol.FlightService"


# ---------------------------------------------------------------------------
# descriptors / tickets / info wrappers
# ---------------------------------------------------------------------------

class FlightDescriptor:
    def __init__(self, proto: fp.FlightDescriptor):
        self.proto = proto

    @staticmethod
    def for_path(*path: str) -> "FlightDescriptor":
        return FlightDescriptor(fp.FlightDescriptor(
            type=fp.FlightDescriptor.PATH, path=list(path)))

    @staticmethod
    def for_command(cmd: bytes) -> "FlightDescriptor":
        if isinstance(cmd, str):
            cmd = cmd.encode()
        return FlightDescriptor(fp.FlightDescriptor(
            type=fp.FlightDescriptor.CMD, cmd=cmd))

    @property
    def path(self) -> List[str]:
        return list(self.proto.path)

    @property
    def command(self) -> bytes:
        return self.proto.cmd

    @property
    def descriptor_type(self) -> str:
        return "path" if self.proto.type == fp.FlightDescriptor.PATH else "cmd"

    def __eq__(self, other):
        return isinstance(other, FlightDescriptor) and \
            self.proto.SerializeToString() == other.proto.SerializeToString()

    def __hash__(self):
        return hash(self.proto.SerializeToString())


class Ticket:
    def __init__(self, ticket: bytes):
        if isinstance(ticket, str):
            ticket = ticket.encode()
        self.ticket = ticket

    def to_proto(self) -> fp.Ticket:
        return fp.Ticket(ticket=self.ticket)


@dataclass
class FlightEndpoint:
    ticket: Ticket
    locations: List[str] = dc_field(default_factory=list)
    expiration_time: Optional[float] = None   # epoch seconds
    app_metadata: bytes = b""

    def to_proto(self) -> fp.FlightEndpoint:
        out = fp.FlightEndpoint(
            ticket=self.ticket.to_proto(),
            location=[fp.Location(uri=u) for u in self.locations],
            app_metadata=self.app_metadata)
        if self.expiration_time is not None:
            out.expiration_time.seconds = int(self.expiration_time)
            out.expiration_time.nanos = int(
                (self.expiration_time % 1) * 1e9)
        return out

    @staticmethod
    def from_proto(e: fp.FlightEndpoint) -> "FlightEndpoint":
        exp = None
        if e.HasField("expiration_time"):
            exp = e.expiration_time.seconds + e.expiration_time.nanos / 1e9
        return FlightEndpoint(Ticket(e.ticket.ticket),
                              [loc.uri for loc in e.location],
                              exp, e.app_metadata)


def _schema_to_ipc_bytes(schema: dt.Schema) -> bytes:
    mapper = ipc.DictMapper()
    mapper.assign(schema)
    msg = ipc_core.build_schema_message(schema, mapper.field_to_id)
    return ipc_core.frame_message(msg)


def _schema_from_ipc_bytes(data: bytes) -> dt.Schema:
    if data[:4] == b"\xff\xff\xff\xff":
        (size,) = struct.unpack_from("<i", data, 4)
        data = data[8:8 + size]
    elif len(data) >= 4:
        head = struct.unpack_from("<I", data, 0)[0]
        if head != 0xFFFFFFFF and head == len(data) - 4:
            data = data[4:]
    r = FbReader.root(data)
    memo: Dict[int, dt.Field] = {}
    return ipc_md.read_schema(r.union(2), memo)


@dataclass
class FlightInfo:
    schema: dt.Schema
    descriptor: FlightDescriptor
    endpoints: List[FlightEndpoint]
    total_records: int = -1
    total_bytes: int = -1
    ordered: bool = False
    app_metadata: bytes = b""

    def to_proto(self) -> fp.FlightInfo:
        return fp.FlightInfo(
            schema=_schema_to_ipc_bytes(self.schema),
            flight_descriptor=self.descriptor.proto,
            endpoint=[e.to_proto() for e in self.endpoints],
            total_records=self.total_records, total_bytes=self.total_bytes,
            ordered=self.ordered, app_metadata=self.app_metadata)

    @staticmethod
    def from_proto(p: fp.FlightInfo) -> "FlightInfo":
        return FlightInfo(
            _schema_from_ipc_bytes(p.schema), FlightDescriptor(p.flight_descriptor),
            [FlightEndpoint.from_proto(e) for e in p.endpoint],
            p.total_records, p.total_bytes, p.ordered, p.app_metadata)


@dataclass
class Action:
    type: str
    body: bytes = b""


@dataclass
class Result:
    body: bytes


# ---------------------------------------------------------------------------
# FlightData <-> record batches (reference record_batch_{reader,writer}.go)
# ---------------------------------------------------------------------------

def batches_to_flight_data(schema: dt.Schema, batches,
                           descriptor: Optional[fp.FlightDescriptor] = None
                           ) -> Iterator[fp.FlightData]:
    from .wire import RawFlightData
    mapper = ipc.DictMapper()
    mapper.assign(schema)
    # FlightData.data_header carries the RAW Message flatbuffer (no
    # stream framing -- the gRPC message is the frame). Bodies stay as
    # unjoined buffer parts; the wire codec writes them once into the
    # outgoing frame (flight/wire.py).
    yield RawFlightData(
        data_header=ipc_core.build_schema_message(schema,
                                                  mapper.field_to_id),
        flight_descriptor=descriptor)
    sent_dicts: Dict[int, Any] = {}
    for rb in batches:
        dicts: Dict[int, Any] = {}
        ipc._collect_dictionaries(schema, [c.data for c in rb.columns],
                                  mapper, dicts)
        for did, ddata in dicts.items():
            prev = sent_dicts.get(did)
            if prev is not None and ipc._same_dict(prev, ddata):
                continue
            meta, parts, blen = ipc_core.build_record_batch_parts(
                [ddata], ddata.length, dictionary_id=did)
            yield RawFlightData(data_header=meta, body_parts=parts,
                                body_len=blen)
            sent_dicts[did] = ddata
        meta, parts, blen = ipc_core.build_record_batch_parts(
            [c.data for c in rb.columns], rb.num_rows)
        yield RawFlightData(data_header=meta, body_parts=parts,
                            body_len=blen)


class FlightDataReader:
    """Record-batch view over a FlightData stream."""

    def __init__(self, stream: Iterator[fp.FlightData]):
        self._stream = stream
        self._first_descriptor: Optional[fp.FlightDescriptor] = None
        self.schema: Optional[dt.Schema] = None
        self._dictionaries: Dict[int, Any] = {}
        self._mapper_fields: Dict[int, dt.Field] = {}
        self._field_ids: Dict[int, int] = {}
        self._read_schema()

    def _next_raw(self) -> Optional[fp.FlightData]:
        try:
            return next(self._stream)
        except StopIteration:
            return None

    @staticmethod
    def _unframe(header: bytes) -> bytes:
        if header[:4] == b"\xff\xff\xff\xff":
            (size,) = struct.unpack_from("<i", header, 4)
            return header[8:8 + size]
        return header

    def _read_schema(self) -> None:
        fd = self._next_raw()
        if fd is None:
            raise ArrowInvalid("empty flight data stream")
        self._first_descriptor = fd.flight_descriptor \
            if fd.HasField("flight_descriptor") else None
        meta = self._unframe(fd.data_header)
        r = FbReader.root(meta)
        if r.u8(1) != ipc_md.MSG_SCHEMA:
            raise ArrowInvalid("flight stream must start with schema message")
        memo: Dict[int, dt.Field] = {}
        self.schema = ipc_md.read_schema(r.union(2), memo)
        self._mapper_fields = memo
        self._field_ids = {id(f): did for did, f in memo.items()}

    @property
    def descriptor(self) -> Optional[FlightDescriptor]:
        return (FlightDescriptor(self._first_descriptor)
                if self._first_descriptor else None)

    def read_next_batch(self) -> Optional[RecordBatch]:
        while True:
            fd = self._next_raw()
            if fd is None:
                return None
            r = FbReader.root(self._unframe(fd.data_header))
            ht = r.u8(1)
            if ht == ipc_md.MSG_DICTIONARY_BATCH:
                db = r.union(2)
                did = db.i64(0)
                f = self._mapper_fields.get(did)
                vt = f.type.value_type if f is not None else dt.string
                rb = FbReader(db.tab.Bytes, db.table(1).tab.Pos)
                br = ipc_core.BodyReader(rb, fd.data_body)
                self._dictionaries[did] = ipc_core.load_array(br, vt)
                continue
            if ht == ipc_md.MSG_RECORD_BATCH:
                rb_r = r.union(2)
                br = ipc_core.BodyReader(rb_r, fd.data_body)
                from ..array.arrays import make_array
                cols = []
                for f in self.schema.fields:
                    data = ipc_core.load_array(
                        br, f.type, self._dictionaries,
                        lambda fld: self._field_ids.get(id(fld)), f)
                    cols.append(make_array(data))
                return RecordBatch(self.schema, cols, br.num_rows)
            raise ArrowInvalid(f"unexpected flight message header {ht}")

    def __iter__(self):
        while True:
            b = self.read_next_batch()
            if b is None:
                return
            yield b

    def read_all(self) -> Table:
        batches = list(self)
        if not batches:
            from ..array.record import ChunkedArray
            return Table(self.schema, [ChunkedArray([], f.type)
                                       for f in self.schema.fields], 0)
        return Table.from_batches(batches, self.schema)


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------

def _ser(msg) -> bytes:
    return msg.SerializeToString()


# data-plane codec: hand-framed FlightData with single-copy bodies on
# send and memoryview bodies on receive (flight/wire.py; reference
# record_batch_writer.go:97 / record_batch_reader.go:40-70)
from .wire import (RawFlightData,                             # noqa: E402
                   parse_flight_data as _parse_fd,
                   serialize_flight_data as _ser_fd)


#: record batches routinely exceed gRPC's 4 MB default message cap; the
#: reference transports arbitrary batch sizes (pyarrow.flight likewise
#: configures unlimited message lengths)
_GRPC_UNLIMITED = (("grpc.max_send_message_length", -1),
                   ("grpc.max_receive_message_length", -1))


class FlightServerBase:
    """Subclass and override handlers (reference flight.BaseFlightServer /
    flightsql BaseServer stub pattern)."""

    def __init__(self, location: str = "grpc://0.0.0.0:0",
                 middleware: Optional[List] = None):
        self._location = location
        self._server: Optional[grpc.Server] = None
        self.port: Optional[int] = None
        self._middleware = middleware or []

    # -- overridables ------------------------------------------------------
    def list_flights(self, context, criteria: bytes) -> Iterator[FlightInfo]:
        return iter(())

    def get_flight_info(self, context, descriptor: FlightDescriptor) -> FlightInfo:
        raise NotImplementedError("GetFlightInfo not implemented")

    def poll_flight_info(self, context, descriptor: FlightDescriptor):
        raise NotImplementedError("PollFlightInfo not implemented")

    def get_schema(self, context, descriptor: FlightDescriptor) -> dt.Schema:
        info = self.get_flight_info(context, descriptor)
        return info.schema

    def do_get(self, context, ticket: Ticket):
        """Return (schema, iterator-of-RecordBatch) or a Table."""
        raise NotImplementedError("DoGet not implemented")

    def do_put(self, context, descriptor: FlightDescriptor,
               reader: FlightDataReader) -> Iterator[bytes]:
        raise NotImplementedError("DoPut not implemented")

    def do_exchange(self, context, descriptor: FlightDescriptor,
                    reader: FlightDataReader):
        raise NotImplementedError("DoExchange not implemented")

    def do_action(self, context, action: Action) -> Iterator[Result]:
        raise NotImplementedError(f"action {action.type} not implemented")

    def cancel_flight_info(self, context, info: "FlightInfo") -> int:
        """Handle the standard CancelFlightInfo action; return a
        fp.CancelStatus value (reference flight/server.go CancelFlightInfo)."""
        raise NotImplementedError("CancelFlightInfo not implemented")

    def renew_flight_endpoint(self, context,
                              endpoint: "fp.FlightEndpoint") -> FlightEndpoint:
        """Handle the standard RenewFlightEndpoint action; return the renewed
        endpoint (reference flight/server.go RenewFlightEndpoint)."""
        raise NotImplementedError("RenewFlightEndpoint not implemented")

    def list_actions(self, context) -> Iterator[Tuple[str, str]]:
        return iter(())

    def handshake(self, context, requests):
        yield fp.HandshakeResponse()

    # -- grpc wiring -------------------------------------------------------

    def _handlers(self) -> grpc.GenericRpcHandler:
        me = self

        def handshake(req_iter, ctx):
            return me.handshake(ctx, req_iter)

        def list_flights(req, ctx):
            for info in me.list_flights(ctx, req.expression):
                yield info.to_proto()

        def get_flight_info(req, ctx):
            return me.get_flight_info(ctx, FlightDescriptor(req)).to_proto()

        def poll_flight_info(req, ctx):
            return me.poll_flight_info(ctx, FlightDescriptor(req))

        def get_schema(req, ctx):
            s = me.get_schema(ctx, FlightDescriptor(req))
            return fp.SchemaResult(schema=_schema_to_ipc_bytes(s))

        def do_get(req, ctx):
            out = me.do_get(ctx, Ticket(req.ticket))
            if isinstance(out, Table):
                schema, batches = out.schema, out.to_batches()
            else:
                schema, batches = out
            from .wire import pipeline_frames
            return pipeline_frames(batches_to_flight_data(schema, batches))

        def do_put(req_iter, ctx):
            reader = FlightDataReader(req_iter)
            desc = reader.descriptor
            for meta in me.do_put(ctx, desc, reader) or ():
                yield fp.PutResult(app_metadata=meta or b"")

        def do_exchange(req_iter, ctx):
            reader = FlightDataReader(req_iter)
            out = me.do_exchange(ctx, reader.descriptor, reader)
            if isinstance(out, Table):
                return batches_to_flight_data(out.schema, out.to_batches())
            schema, batches = out
            return batches_to_flight_data(schema, batches)

        def do_action(req, ctx):
            # standard spec actions intercepted for every server subclass
            if req.type in ("SetSessionOptions", "GetSessionOptions",
                            "CloseSession"):
                mgr = getattr(me, "sessions", None)
                if mgr is not None:
                    yield from _session_options_action(mgr, req, ctx)
                    return
            if req.type == "CancelFlightInfo":
                creq = fp.CancelFlightInfoRequest()
                creq.ParseFromString(req.body)
                status = me.cancel_flight_info(
                    ctx, FlightInfo.from_proto(creq.info))
                yield fp.Result(body=fp.CancelFlightInfoResult(
                    status=status).SerializeToString())
                return
            if req.type == "RenewFlightEndpoint":
                rreq = fp.RenewFlightEndpointRequest()
                rreq.ParseFromString(req.body)
                ep = me.renew_flight_endpoint(ctx, rreq.endpoint)
                out = ep.to_proto() if isinstance(ep, FlightEndpoint) else ep
                yield fp.Result(body=out.SerializeToString())
                return
            for res in me.do_action(ctx, Action(req.type, req.body)):
                yield fp.Result(body=res.body if isinstance(res, Result)
                                else bytes(res))

        def list_actions(req, ctx):
            for t, d in me.list_actions(ctx):
                yield fp.ActionType(type=t, description=d)

        method_handlers = {
            "Handshake": grpc.stream_stream_rpc_method_handler(
                handshake, fp.HandshakeRequest.FromString, _ser),
            "ListFlights": grpc.unary_stream_rpc_method_handler(
                list_flights, fp.Criteria.FromString, _ser),
            "GetFlightInfo": grpc.unary_unary_rpc_method_handler(
                get_flight_info, fp.FlightDescriptor.FromString, _ser),
            "PollFlightInfo": grpc.unary_unary_rpc_method_handler(
                poll_flight_info, fp.FlightDescriptor.FromString, _ser),
            "GetSchema": grpc.unary_unary_rpc_method_handler(
                get_schema, fp.FlightDescriptor.FromString, _ser),
            "DoGet": grpc.unary_stream_rpc_method_handler(
                do_get, fp.Ticket.FromString, _ser_fd),
            "DoPut": grpc.stream_stream_rpc_method_handler(
                do_put, _parse_fd, _ser),
            "DoExchange": grpc.stream_stream_rpc_method_handler(
                do_exchange, _parse_fd, _ser_fd),
            "DoAction": grpc.unary_stream_rpc_method_handler(
                do_action, fp.Action.FromString, _ser),
            "ListActions": grpc.unary_stream_rpc_method_handler(
                list_actions, fp.Empty.FromString, _ser),
        }
        return grpc.method_handlers_generic_handler(SERVICE, method_handlers)

    def serve(self, block: bool = False) -> int:
        from concurrent import futures
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=8),
            interceptors=self._middleware,
            options=_GRPC_UNLIMITED)
        self._server.add_generic_rpc_handlers((self._handlers(),))
        addr = self._location.replace("grpc://", "").replace("grpc+tcp://", "")
        self.port = self._server.add_insecure_port(addr)
        self._server.start()
        if block:
            self._server.wait_for_termination()
        return self.port

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.stop(grace=0.5)

    def __enter__(self):
        self.serve()
        return self

    def __exit__(self, *exc):
        self.shutdown()


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class FlightClient:
    """Reference arrow/flight client.go:64."""

    def __init__(self, location: str, middleware: Optional[List] = None):
        addr = location.replace("grpc://", "").replace("grpc+tcp://", "")
        self._channel = grpc.insecure_channel(addr,
                                              options=_GRPC_UNLIMITED)
        if middleware:
            self._channel = grpc.intercept_channel(self._channel, *middleware)
        m = f"/{SERVICE}/"
        self._get_flight_info = self._channel.unary_unary(
            m + "GetFlightInfo", _ser, fp.FlightInfo.FromString)
        self._poll_flight_info = self._channel.unary_unary(
            m + "PollFlightInfo", _ser, fp.PollInfo.FromString)
        self._get_schema = self._channel.unary_unary(
            m + "GetSchema", _ser, fp.SchemaResult.FromString)
        self._list_flights = self._channel.unary_stream(
            m + "ListFlights", _ser, fp.FlightInfo.FromString)
        self._do_get = self._channel.unary_stream(
            m + "DoGet", _ser, _parse_fd)
        self._do_put = self._channel.stream_stream(
            m + "DoPut", _ser_fd, fp.PutResult.FromString)
        self._do_exchange = self._channel.stream_stream(
            m + "DoExchange", _ser_fd, _parse_fd)
        self._do_action = self._channel.unary_stream(
            m + "DoAction", _ser, fp.Result.FromString)
        self._list_actions = self._channel.unary_stream(
            m + "ListActions", _ser, fp.ActionType.FromString)
        self._handshake = self._channel.stream_stream(
            m + "Handshake", _ser, fp.HandshakeResponse.FromString)

    def close(self):
        self._channel.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def handshake(self, payload: bytes = b"") -> bytes:
        resp = list(self._handshake(iter([fp.HandshakeRequest(payload=payload)])))
        return resp[0].payload if resp else b""

    def list_flights(self, criteria: bytes = b"") -> Iterator[FlightInfo]:
        for p in self._list_flights(fp.Criteria(expression=criteria)):
            yield FlightInfo.from_proto(p)

    def get_flight_info(self, descriptor: FlightDescriptor) -> FlightInfo:
        return FlightInfo.from_proto(self._get_flight_info(descriptor.proto))

    def poll_flight_info(self, descriptor: FlightDescriptor):
        """Returns (FlightInfo | None, retry_descriptor | None, progress)
        (reference PollFlightInfo retryable-query scenario)."""
        p = self._poll_flight_info(descriptor.proto)
        info = FlightInfo.from_proto(p.info) if p.HasField("info") else None
        retry = (FlightDescriptor(p.flight_descriptor)
                 if p.HasField("flight_descriptor") else None)
        progress = p.progress if p.HasField("progress") else None
        return info, retry, progress

    def get_schema(self, descriptor: FlightDescriptor) -> dt.Schema:
        return _schema_from_ipc_bytes(self._get_schema(descriptor.proto).schema)

    def do_get(self, ticket: Ticket) -> FlightDataReader:
        return FlightDataReader(iter(self._do_get(ticket.to_proto())))

    def do_put(self, descriptor: FlightDescriptor, schema: dt.Schema,
               batches) -> List[bytes]:
        from .wire import pipeline_frames
        data = pipeline_frames(
            batches_to_flight_data(schema, batches, descriptor.proto))
        return [r.app_metadata for r in self._do_put(data)]

    def do_exchange(self, descriptor: FlightDescriptor, schema: dt.Schema,
                    batches) -> FlightDataReader:
        data = batches_to_flight_data(schema, batches, descriptor.proto)
        return FlightDataReader(iter(self._do_exchange(data)))

    def do_action(self, action: Action) -> Iterator[Result]:
        for r in self._do_action(fp.Action(type=action.type, body=action.body)):
            yield Result(r.body)

    def set_session_options(self, options: Dict[str, Any]) -> Dict[str, int]:
        """Standard SetSessionOptions action (reference
        flight/session/session.go; use with CookieMiddleware so the
        session cookie is replayed). Returns {name: error_value} for any
        rejected options (empty = all accepted)."""
        req = fp.SetSessionOptionsRequest()
        for k, v in options.items():
            req.session_options[k].CopyFrom(_pb_option_value(v))
        results = list(self.do_action(
            Action("SetSessionOptions", req.SerializeToString())))
        res = fp.SetSessionOptionsResult()
        res.ParseFromString(results[0].body)
        return {k: e.value for k, e in res.errors.items()}

    def get_session_options(self) -> Dict[str, Any]:
        """Standard GetSessionOptions action."""
        results = list(self.do_action(Action(
            "GetSessionOptions",
            fp.GetSessionOptionsRequest().SerializeToString())))
        res = fp.GetSessionOptionsResult()
        res.ParseFromString(results[0].body)
        return {k: _py_option_value(v)
                for k, v in res.session_options.items()}

    def close_session(self) -> int:
        """Standard CloseSession action; returns fp.CloseSessionResult.Status."""
        results = list(self.do_action(Action(
            "CloseSession", fp.CloseSessionRequest().SerializeToString())))
        res = fp.CloseSessionResult()
        res.ParseFromString(results[0].body)
        return res.status

    def cancel_flight_info(self, info: FlightInfo) -> int:
        """Standard CancelFlightInfo action; returns fp.CancelStatus
        (reference flight/client.go CancelFlightInfo)."""
        req = fp.CancelFlightInfoRequest(info=info.to_proto())
        results = list(self.do_action(
            Action("CancelFlightInfo", req.SerializeToString())))
        res = fp.CancelFlightInfoResult()
        res.ParseFromString(results[0].body)
        return res.status

    def renew_flight_endpoint(self, endpoint: FlightEndpoint) -> FlightEndpoint:
        """Standard RenewFlightEndpoint action; returns the renewed endpoint
        (reference flight/client.go RenewFlightEndpoint)."""
        req = fp.RenewFlightEndpointRequest(endpoint=endpoint.to_proto())
        results = list(self.do_action(
            Action("RenewFlightEndpoint", req.SerializeToString())))
        ep = fp.FlightEndpoint()
        ep.ParseFromString(results[0].body)
        return FlightEndpoint.from_proto(ep)

    def list_actions(self) -> List[Tuple[str, str]]:
        return [(a.type, a.description)
                for a in self._list_actions(fp.Empty())]


# ---------------------------------------------------------------------------
# Standard session-option actions (Arrow Flight spec SetSessionOptions /
# GetSessionOptions / CloseSession; reference flight/session/session.go
# middleware DoAction interception :200-240)
# ---------------------------------------------------------------------------

def _pb_option_value(v) -> fp.SessionOptionValue:
    out = fp.SessionOptionValue()
    if isinstance(v, bool):
        out.bool_value = v
    elif isinstance(v, int):
        out.int64_value = v
    elif isinstance(v, float):
        out.double_value = v
    elif isinstance(v, str):
        out.string_value = v
    elif isinstance(v, (list, tuple)):
        out.string_list_value.values.extend(str(x) for x in v)
    elif v is None:
        pass  # unset = erase
    else:
        raise TypeError(f"unsupported session option type {type(v)}")
    return out


def _py_option_value(pb: fp.SessionOptionValue):
    kind = pb.WhichOneof("option_value")
    if kind is None:
        return None
    if kind == "string_list_value":
        return list(pb.string_list_value.values)
    return getattr(pb, kind)


def _session_options_action(mgr, req, ctx):
    if req.type == "SetSessionOptions":
        sreq = fp.SetSessionOptionsRequest()
        sreq.ParseFromString(req.body)
        sess = mgr.session(ctx)
        res = fp.SetSessionOptionsResult()
        for name, val in sreq.session_options.items():
            if not name:
                res.errors[name].value = \
                    fp.SetSessionOptionsResult.ERROR_VALUE_INVALID_NAME
                continue
            pyv = _py_option_value(val)
            opts = sess.setdefault("__options__", {})
            if pyv is None:
                opts.pop(name, None)   # unset value erases the option
            else:
                opts[name] = pyv
        yield fp.Result(body=res.SerializeToString())
        return
    if req.type == "GetSessionOptions":
        sess = mgr.session(ctx)
        res = fp.GetSessionOptionsResult()
        for name, val in sess.get("__options__", {}).items():
            res.session_options[name].CopyFrom(_pb_option_value(val))
        yield fp.Result(body=res.SerializeToString())
        return
    if req.type == "CloseSession":
        ok = mgr.close(ctx)
        res = fp.CloseSessionResult(
            status=fp.CloseSessionResult.STATUS_CLOSED if ok
            else fp.CloseSessionResult.STATUS_NOT_CLOSEABLE)
        yield fp.Result(body=res.SerializeToString())
        return
