"""Avro Object Container File reader (reference arrow/avro/reader.go:87 —
OCF decoder + avro-schema -> arrow-schema conversion).

Self-contained implementation of the Avro spec: OCF framing (magic,
metadata map, sync markers, deflate/snappy codecs) and the binary
encoding (zigzag varints, unions, records, arrays, maps, enums, fixed,
logical types decimal/date/time/timestamp/uuid).
"""
from __future__ import annotations

import io
import json as _json
import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple, Union

from .. import dtypes as dt
from ..array.builders import make_builder
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid, ArrowNotImplemented

MAGIC = b"Obj\x01"


class _Bin:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def long(self) -> int:
        out = shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (out >> 1) ^ -(out & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def boolean(self) -> bool:
        b = self.buf[self.pos]
        self.pos += 1
        return b == 1

    def float_(self) -> float:
        (v,) = struct.unpack_from("<f", self.buf, self.pos)
        self.pos += 4
        return v

    def double(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.pos)
        self.pos += 8
        return v

    def fixed(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def eof(self) -> bool:
        return self.pos >= len(self.buf)


def _avro_to_arrow(sch, named: Dict[str, Any]) -> dt.DataType:
    if isinstance(sch, str):
        simple = {"null": dt.null, "boolean": dt.bool_, "int": dt.int32,
                  "long": dt.int64, "float": dt.float32, "double": dt.float64,
                  "bytes": dt.binary, "string": dt.string}
        if sch in simple:
            return simple[sch]
        if sch in named:
            return _avro_to_arrow(named[sch], named)
        raise ArrowInvalid(f"unknown avro type {sch!r}")
    if isinstance(sch, list):  # union
        non_null = [s for s in sch if s != "null"]
        if len(non_null) == 1:
            return _avro_to_arrow(non_null[0], named)
        fields = [dt.Field(f"member{i}", _avro_to_arrow(s, named))
                  for i, s in enumerate(non_null)]
        return dt.dense_union(fields)
    t = sch["type"]
    lt = sch.get("logicalType")
    if lt == "decimal":
        return dt.decimal128(sch.get("precision", 38), sch.get("scale", 0))
    if lt == "date":
        return dt.date32
    if lt == "time-millis":
        return dt.time32("ms")
    if lt == "time-micros":
        return dt.time64("us")
    if lt == "timestamp-millis":
        return dt.timestamp("ms", "UTC")
    if lt == "timestamp-micros":
        return dt.timestamp("us", "UTC")
    if lt == "uuid":
        return dt.string
    if t == "record":
        named[sch["name"]] = sch
        return dt.struct([dt.Field(f["name"],
                                   _avro_to_arrow(f["type"], named))
                          for f in sch["fields"]])
    if t == "enum":
        named[sch["name"]] = sch
        return dt.dictionary(dt.int32, dt.string)
    if t == "array":
        return dt.list_(_avro_to_arrow(sch["items"], named))
    if t == "map":
        return dt.map_(dt.string, _avro_to_arrow(sch["values"], named))
    if t == "fixed":
        named[sch["name"]] = sch
        return dt.fixed_size_binary(sch["size"])
    return _avro_to_arrow(t, named)


def _decode_value(r: _Bin, sch, named: Dict[str, Any]):
    if isinstance(sch, str):
        if sch == "null":
            return None
        if sch == "boolean":
            return r.boolean()
        if sch in ("int", "long"):
            return r.long()
        if sch == "float":
            return r.float_()
        if sch == "double":
            return r.double()
        if sch == "bytes":
            return r.bytes_()
        if sch == "string":
            return r.string()
        if sch in named:
            return _decode_value(r, named[sch], named)
        raise ArrowInvalid(f"unknown avro type {sch!r}")
    if isinstance(sch, list):
        idx = r.long()
        branch = sch[idx]
        return _decode_value(r, branch, named)
    t = sch["type"]
    lt = sch.get("logicalType")
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"], named)
                for f in sch["fields"]}
    if t == "enum":
        return sch["symbols"][r.long()]
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()  # block byte size, unused
                n = -n
            for _ in range(n):
                out.append(_decode_value(r, sch["items"], named))
        return out
    if t == "fixed":
        raw = r.fixed(sch["size"])
        if lt == "decimal":
            import decimal
            u = int.from_bytes(raw, "big", signed=True)
            return decimal.Decimal(u).scaleb(-sch.get("scale", 0))
        return raw
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.string()
                out[k] = _decode_value(r, sch["values"], named)
        return out
    if t == "bytes" and lt == "decimal":
        import decimal
        raw = r.bytes_()
        u = int.from_bytes(raw, "big", signed=True)
        return decimal.Decimal(u).scaleb(-sch.get("scale", 0))
    return _decode_value(r, t, named)


class OCFReader:
    """Avro Object Container File reader.

    chunk_size: rows per RecordBatch when iterating (reference WithChunk,
    arrow/avro/reader.go:385-392; <=0 means one batch per OCF block, the
    reference's chunk=-1 whole-rows mode)."""

    def __init__(self, source: Union[str, bytes, io.IOBase],
                 chunk_size: int = 0):
        self.chunk_size = chunk_size
        self._pending: List[dict] = []
        self._exhausted = False
        self._init(source)

    def _init(self, source: Union[str, bytes, io.IOBase]):
        if isinstance(source, str):
            with open(source, "rb") as f:
                data = f.read()
        elif isinstance(source, (bytes, bytearray)):
            data = bytes(source)
        else:
            data = source.read()
        if data[:4] != MAGIC:
            raise ArrowInvalid("bad avro OCF magic")
        r = _Bin(data[4:])
        meta: Dict[str, bytes] = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.string()
                meta[k] = r.bytes_()
        self.codec = meta.get("avro.codec", b"null").decode()
        self.avro_schema = _json.loads(meta["avro.schema"])
        self._named: Dict[str, Any] = {}
        arrow_t = _avro_to_arrow(self.avro_schema, self._named)
        if arrow_t.id != dt.TypeId.STRUCT:
            arrow_t = dt.struct([dt.Field("value", arrow_t)])
            self._wrap = True
        else:
            self._wrap = False
        self.schema = dt.Schema(arrow_t.fields())
        self._sync = r.fixed(16)
        self._r = r

    def _read_block(self) -> Optional[List[dict]]:
        r = self._r
        if r.eof():
            return None
        count = r.long()
        size = r.long()
        payload = r.fixed(size)
        sync = r.fixed(16)
        if sync != self._sync:
            raise ArrowInvalid("avro sync marker mismatch")
        if self.codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif self.codec == "snappy":
            from .. import native
            payload = native.snappy_decompress(payload[:-4])  # crc32 suffix
        elif self.codec == "zstandard":
            import zstandard
            payload = zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=1 << 31)
        elif self.codec != "null":
            raise ArrowNotImplemented(f"avro codec {self.codec}")
        br = _Bin(payload)
        out = []
        for _ in range(count):
            v = _decode_value(br, self.avro_schema, self._named)
            out.append({"value": v} if self._wrap else v)
        return out

    def _records_to_batch(self, records: List[dict]) -> RecordBatch:
        cols = []
        for f in self.schema.fields:
            b = make_builder(f.type)
            for rec in records:
                v = rec.get(f.name)
                if v is None:
                    b.append_null()
                else:
                    b.append(v)
            cols.append(b.finish())
        return RecordBatch(self.schema, cols, len(records))

    def read_next_batch(self) -> Optional[RecordBatch]:
        """Next chunk of rows as a RecordBatch (None at end of file)."""
        want = self.chunk_size
        while not self._exhausted and (want <= 0 or
                                       len(self._pending) < want):
            block = self._read_block()
            if block is None:
                self._exhausted = True
                break
            self._pending.extend(block)
            if want <= 0 and self._pending:
                break  # one batch per OCF block
        if not self._pending:
            return None
        take = len(self._pending) if want <= 0 else min(want,
                                                        len(self._pending))
        records, self._pending = self._pending[:take], self._pending[take:]
        return self._records_to_batch(records)

    def __iter__(self):
        while True:
            rb = self.read_next_batch()
            if rb is None:
                return
            yield rb

    def read_all(self) -> Table:
        records: List[dict] = []
        records.extend(self._pending)
        self._pending = []
        while not self._exhausted:
            block = self._read_block()
            if block is None:
                self._exhausted = True
                break
            records.extend(block)
        return Table.from_batches([self._records_to_batch(records)])


def read_avro(source) -> Table:
    return OCFReader(source).read_all()
