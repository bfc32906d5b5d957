"""Hand-framed FlightData wire codec — the data-plane fast path.

The reference's Flight throughput comes from writing record-batch body
buffers straight into the gRPC frame and reading them as slices of it
(arrow/flight/record_batch_writer.go:97, record_batch_reader.go:40-70).
The python-protobuf path costs two extra full-body copies per message
(bytes into the FlightData object, then SerializeToString) plus a copy
on parse. This module frames the FlightData protobuf wire format
directly (protowire, like the substrait bridge) so that:

  send:    each body buffer is written ONCE into the outgoing frame
  receive: data_body is a zero-copy memoryview of the gRPC message

Wire shape (Flight.proto): FlightData { flight_descriptor = 1;
data_header = 2; app_metadata = 3; data_body = 1000; }
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

from ..interop import protowire as pw
from . import Flight_pb2 as fp

_TAG_DESC = (1 << 3) | pw.WT_BYTES
_TAG_HEADER = (2 << 3) | pw.WT_BYTES
_TAG_APPMETA = (3 << 3) | pw.WT_BYTES
_TAG_BODY = (1000 << 3) | pw.WT_BYTES


def _varint_len(v: int) -> int:
    n = 1
    while v >= 0x80:
        v >>= 7
        n += 1
    return n


class RawFlightData:
    """Duck-typed stand-in for flight_pb2.FlightData on the data plane.

    data_body may be a single bytes-like OR a list of buffer parts
    (written into the frame without an intermediate join)."""

    __slots__ = ("data_header", "app_metadata", "_body_parts", "_body_len",
                 "_descriptor_bytes", "_descriptor")

    def __init__(self, data_header: bytes = b"",
                 body_parts: Sequence = (),
                 body_len: Optional[int] = None,
                 app_metadata: bytes = b"",
                 descriptor_bytes: Optional[bytes] = None,
                 flight_descriptor=None):
        self.data_header = data_header
        self.app_metadata = app_metadata
        self._body_parts = list(body_parts)
        self._body_len = (sum(len(p) for p in self._body_parts)
                          if body_len is None else body_len)
        self._descriptor = flight_descriptor
        self._descriptor_bytes = descriptor_bytes
        if flight_descriptor is not None and descriptor_bytes is None:
            self._descriptor_bytes = flight_descriptor.SerializeToString()

    # -- protobuf-message duck typing --------------------------------------

    def HasField(self, name: str) -> bool:
        if name == "flight_descriptor":
            return self._descriptor_bytes is not None
        raise ValueError(name)

    @property
    def flight_descriptor(self):
        if self._descriptor is None and self._descriptor_bytes is not None:
            d = fp.FlightDescriptor()
            d.ParseFromString(bytes(self._descriptor_bytes))
            self._descriptor = d
        return self._descriptor

    @property
    def data_body(self) -> Union[bytes, memoryview]:
        if len(self._body_parts) == 1:
            return self._body_parts[0]
        return b"".join(bytes(p) for p in self._body_parts)

    # -- framing ------------------------------------------------------------

    def serialize(self) -> bytes:
        # ONE copy total: every piece (tag varints, header, body buffer
        # parts) joins straight into the outgoing frame
        pieces: List = []

        def vint(v: int) -> bytes:
            b = bytearray()
            pw.put_varint(b, v)
            return bytes(b)

        if self._descriptor_bytes:
            pieces += [vint(_TAG_DESC), vint(len(self._descriptor_bytes)),
                       self._descriptor_bytes]
        hdr = self.data_header
        pieces += [vint(_TAG_HEADER), vint(len(hdr)), hdr]
        if self.app_metadata:
            pieces += [vint(_TAG_APPMETA), vint(len(self.app_metadata)),
                       self.app_metadata]
        pieces += [vint(_TAG_BODY), vint(self._body_len)]
        pieces.extend(self._body_parts)
        return b"".join(pieces)


def serialize_flight_data(msg) -> bytes:
    """gRPC serializer: fast path for RawFlightData, protobuf otherwise."""
    if isinstance(msg, RawFlightData):
        return msg.serialize()
    if isinstance(msg, bytes):
        return msg                  # pre-framed by pipeline_frames
    return msg.SerializeToString()


def pipeline_frames(stream, depth: int = 2):
    """Serialize FlightData frames on a worker thread, `depth` ahead of
    the consumer — overlaps python framing with gRPC's C-level IO (the
    GIL is free during syscalls/HTTP2 work). Yields pre-framed bytes;
    serialize_flight_data passes them through."""
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    DONE = object()

    def worker():
        try:
            for fd in stream:
                q.put(serialize_flight_data(fd))
            q.put(DONE)
        except BaseException as e:          # surface errors to consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def parse_flight_data(buf: bytes) -> RawFlightData:
    """gRPC deserializer: data_body stays a memoryview of `buf`."""
    mv = memoryview(buf)
    header = b""
    app_meta = b""
    desc_bytes: Optional[bytes] = None
    body: List = []
    blen = 0
    p, n = 0, len(buf)
    while p < n:
        key, p = pw.get_varint(buf, p)
        field, wt = key >> 3, key & 7
        if wt == pw.WT_BYTES:
            ln, p = pw.get_varint(buf, p)
            val = mv[p:p + ln]
            p += ln
            if field == 2:
                header = bytes(val)
            elif field == 1000:
                body = [val]
                blen = ln
            elif field == 1:
                desc_bytes = bytes(val)
            elif field == 3:
                app_meta = bytes(val)
        elif wt == pw.WT_VARINT:
            _, p = pw.get_varint(buf, p)
        elif wt == pw.WT_FIXED64:
            p += 8
        elif wt == pw.WT_FIXED32:
            p += 4
        else:
            raise ValueError(f"bad flight wire type {wt}")
    return RawFlightData(data_header=header, body_parts=body,
                         body_len=blen, app_metadata=app_meta,
                         descriptor_bytes=desc_bytes)
