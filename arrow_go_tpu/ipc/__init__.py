"""Arrow IPC streaming + random-access file format.

Reference: arrow/ipc (reader.go:97 stream reader, writer.go:125 stream
writer, file_reader.go:248 / file_writer.go:267 random-access file with
footer, internal/dictutils dictionary-id mapping, body compression).

new_stream / open_stream: the streaming format.
new_file / open_file:     the file format ("ARROW1" magic + footer).
"""
from __future__ import annotations

import io
import struct
from typing import BinaryIO, Dict, List, Optional, Union

import flatbuffers
import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid
from . import core, metadata as md
from .fb import Reader as FbReader

MAGIC = b"ARROW1"


class DictMapper:
    """Dictionary-id assignment / lookup (reference internal/dictutils
    Mapper, dict.go:59): every dictionary-typed field gets a stable id."""

    def __init__(self):
        self.field_to_id: Dict[int, int] = {}
        self.id_to_field: Dict[int, dt.Field] = {}

    def assign(self, schema: dt.Schema) -> None:
        next_id = [0]

        def walk(f: dt.Field):
            if f.type.id == dt.TypeId.DICTIONARY:
                self.field_to_id[id(f)] = next_id[0]
                self.id_to_field[next_id[0]] = f
                next_id[0] += 1
                for cf in f.type.value_type.fields():
                    walk(cf)
            else:
                for cf in f.type.fields():
                    walk(cf)
        for f in schema.fields:
            walk(f)

    def id_of_field(self, f: dt.Field) -> Optional[int]:
        return self.field_to_id.get(id(f))


def _collect_dictionaries(schema: dt.Schema, columns: List[ArrayData],
                          mapper: DictMapper, out: Dict[int, ArrayData]):
    def walk(f: dt.Field, data: ArrayData):
        if f.type.id == dt.TypeId.DICTIONARY:
            did = mapper.field_to_id[id(f)]
            out[did] = data.dictionary
        for cf, cd in zip(f.type.fields(), data.children):
            walk(cf, cd)
    for f, c in zip(schema.fields, columns):
        walk(f, c)


class StreamWriter:
    """IPC stream writer (reference ipc/writer.go:125)."""

    def __init__(self, sink: BinaryIO, schema: dt.Schema,
                 compression: Optional[str] = None,
                 endianness: str = "little",
                 compression_concurrency: int = 0):
        self.sink = sink
        self.schema = schema
        self.compression = compression
        # reference WithCompressConcurrency (ipc/ipc.go:160-170)
        self.compression_concurrency = compression_concurrency
        # endianness="big" emits a big-endian file (schema flag + swapped
        # buffers) — the write-side analog of the reference's byte-swapping
        # reader (ipc/endian_swap.go); a BE host would write "native" this way
        self._endianness = 1 if endianness == "big" else 0
        self.mapper = DictMapper()
        self.mapper.assign(schema)
        self._wrote_schema = False
        self._sent_dicts: Dict[int, ArrayData] = {}
        self._closed = False

    def _write_schema(self):
        msg = core.build_schema_message(self.schema, self.mapper.field_to_id,
                                        self._endianness)
        self.sink.write(core.frame_message(msg))
        self._wrote_schema = True

    def _maybe_swap(self, data: ArrayData) -> ArrayData:
        if not self._endianness:
            return data
        # compact FIRST: swapped offsets are not interpretable, so the
        # zero-offset normalization must happen while buffers are native
        return core.swap_endian_data(core.compact(data))

    def _write_dictionaries(self, batch: RecordBatch):
        dicts: Dict[int, ArrayData] = {}
        _collect_dictionaries(self.schema, [c.data for c in batch.columns],
                              self.mapper, dicts)
        for did, ddata in dicts.items():
            prev = self._sent_dicts.get(did)
            if prev is ddata:
                continue
            if prev is not None and _same_dict(prev, ddata):
                continue
            meta, body = core.build_record_batch_message(
                [self._maybe_swap(ddata)], ddata.length, self.compression,
                dictionary_id=did,
                compress_concurrency=self.compression_concurrency)
            self.sink.write(core.frame_message(meta))
            self.sink.write(body)
            self._sent_dicts[did] = ddata

    def write(self, batch: RecordBatch) -> None:
        if self._closed:
            raise ArrowInvalid("writer closed")
        if not self._wrote_schema:
            self._write_schema()
        self._write_dictionaries(batch)
        meta, body = core.build_record_batch_message(
            [self._maybe_swap(c.data) for c in batch.columns],
            batch.num_rows, self.compression,
            compress_concurrency=self.compression_concurrency)
        self.sink.write(core.frame_message(meta))
        self.sink.write(body)

    def write_table(self, table: Table) -> None:
        for b in table.to_batches():
            self.write(b)

    def close(self) -> None:
        if not self._closed:
            if not self._wrote_schema:
                self._write_schema()
            self.sink.write(core.EOS)
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _same_dict(a: ArrayData, b: ArrayData) -> bool:
    return make_array(a).to_pylist() == make_array(b).to_pylist()


class StreamReader:
    """IPC stream reader (reference ipc/reader.go:97)."""

    def __init__(self, source: Union[BinaryIO, bytes],
                 decompress_concurrency: int = 0):
        if isinstance(source, (bytes, bytearray, memoryview)):
            source = io.BytesIO(bytes(source))
        self.src = source
        self.decompress_concurrency = decompress_concurrency
        self.mapper_fields: Dict[int, dt.Field] = {}
        self.dictionaries: Dict[int, ArrayData] = {}
        self.schema = self._read_schema()

    def _read_message(self):
        head = self.src.read(4)
        if len(head) < 4:
            return None, None
        (w,) = struct.unpack("<I", head)
        if w == core.CONTINUATION:
            (size,) = struct.unpack("<i", self.src.read(4))
        else:
            (size,) = struct.unpack("<i", head)
        if size == 0:
            return None, None
        meta = self.src.read(size)
        r = FbReader.root(meta)
        body_len = r.i64(3)
        body = self.src.read(body_len) if body_len else b""
        return r, body

    def _read_schema(self) -> dt.Schema:
        r, _ = self._read_message()
        if r is None or r.u8(1) != md.MSG_SCHEMA:
            raise ArrowInvalid("expected schema message")
        memo: Dict[int, dt.Field] = {}
        sr = r.union(2)
        # big-endian files: byte-swap buffers on load (reference
        # ipc/endian_swap.go swapEndianArrayData)
        self._swap = sr.i16(0) == 1
        schema = md.read_schema(sr, memo)
        self.mapper_fields = memo
        self._field_ids = {id(f): did for did, f in memo.items()}
        return schema

    def _dict_id_of(self, f: dt.Field) -> Optional[int]:
        return self._field_ids.get(id(f))

    def _load_dictionary(self, r: FbReader, body: bytes):
        db = r.union(2)
        did = db.i64(0)
        rb = FbReader(db.tab.Bytes, db.table(1).tab.Pos)
        f = self.mapper_fields.get(did)
        vt = f.type.value_type if f is not None else dt.string
        br = core.BodyReader(rb, body)
        data = core.load_array(br, vt)
        if self._swap:
            data = core.swap_endian_data(data)
        if db.bool_(2) and did in self.dictionaries:  # delta: append
            from ..array.concat import concat_arrays
            prev = make_array(self.dictionaries[did])
            self.dictionaries[did] = concat_arrays(
                [prev, make_array(data)], vt).data
        else:
            self.dictionaries[did] = data

    def read_next_batch(self) -> Optional[RecordBatch]:
        while True:
            r, body = self._read_message()
            if r is None:
                return None
            ht = r.u8(1)
            if ht == md.MSG_DICTIONARY_BATCH:
                self._load_dictionary(r, body)
                continue
            if ht == md.MSG_RECORD_BATCH:
                rb = r.union(2)
                br = core.BodyReader(rb, body,
                                     self.decompress_concurrency)
                cols = []
                for f in self.schema.fields:
                    data = core.load_array(br, f.type, self.dictionaries,
                                           self._dict_id_of, f)
                    if self._swap:
                        data = core.swap_endian_data(data)
                    cols.append(make_array(data))
                return RecordBatch(self.schema, cols, br.num_rows)
            raise ArrowInvalid(f"unexpected message header {ht}")

    def __iter__(self):
        while True:
            b = self.read_next_batch()
            if b is None:
                return
            yield b

    def read_all(self) -> Table:
        batches = list(self)
        if not batches:
            return Table(self.schema, [dt_chunked_empty(f.type)
                                       for f in self.schema.fields], 0)
        return Table.from_batches(batches, self.schema)


def dt_chunked_empty(t: dt.DataType):
    from ..array.record import ChunkedArray
    return ChunkedArray([], t)


class FileWriter(StreamWriter):
    """Random-access file writer: magic + stream + footer
    (reference ipc/file_writer.go:267)."""

    def __init__(self, sink: BinaryIO, schema: dt.Schema,
                 compression: Optional[str] = None,
                 endianness: str = "little",
                 compression_concurrency: int = 0):
        super().__init__(sink, schema, compression, endianness,
                         compression_concurrency)
        self._blocks: List[tuple] = []
        self._dict_blocks: List[tuple] = []
        self.sink.write(MAGIC + b"\0\0")

    def _write_framed(self, meta: bytes, body: bytes, blocks: List[tuple]):
        offset = self.sink.tell()
        framed = core.frame_message(meta)
        self.sink.write(framed)
        self.sink.write(body)
        blocks.append((offset, len(framed), len(body)))

    def _write_dictionaries(self, batch: RecordBatch):
        dicts: Dict[int, ArrayData] = {}
        _collect_dictionaries(self.schema, [c.data for c in batch.columns],
                              self.mapper, dicts)
        for did, ddata in dicts.items():
            prev = self._sent_dicts.get(did)
            if prev is not None and _same_dict(prev, ddata):
                continue
            meta, body = core.build_record_batch_message(
                [self._maybe_swap(ddata)], ddata.length, self.compression,
                dictionary_id=did,
                compress_concurrency=self.compression_concurrency)
            self._write_framed(meta, body, self._dict_blocks)
            self._sent_dicts[did] = ddata

    def write(self, batch: RecordBatch) -> None:
        if not self._wrote_schema:
            self._write_schema()
        self._write_dictionaries(batch)
        meta, body = core.build_record_batch_message(
            [self._maybe_swap(c.data) for c in batch.columns],
            batch.num_rows, self.compression,
            compress_concurrency=self.compression_concurrency)
        self._write_framed(meta, body, self._blocks)

    def close(self) -> None:
        if self._closed:
            return
        if not self._wrote_schema:
            self._write_schema()
        self.sink.write(core.EOS)
        # footer
        b = flatbuffers.Builder(1024)
        schema_off = md.write_schema(b, self.schema, self.mapper.field_to_id,
                                     self._endianness)

        def blocks_vec(blocks):
            b.StartVector(24, len(blocks), 8)
            for off, mlen, blen in reversed(blocks):
                b.Prep(8, 24)
                b.PrependInt64(blen)
                b.Pad(4)
                b.PrependInt32(mlen)
                b.PrependInt64(off)
            return b.EndVector()

        rb_vec = blocks_vec(self._blocks)
        dict_vec = blocks_vec(self._dict_blocks)
        b.StartObject(5)
        b.PrependInt16Slot(0, md.METADATA_V5, 0)
        b.PrependUOffsetTRelativeSlot(1, schema_off, 0)
        b.PrependUOffsetTRelativeSlot(2, dict_vec, 0)
        b.PrependUOffsetTRelativeSlot(3, rb_vec, 0)
        b.Finish(b.EndObject())
        footer = bytes(b.Output())
        self.sink.write(footer)
        self.sink.write(struct.pack("<i", len(footer)))
        self.sink.write(MAGIC)
        self._closed = True


class FileReader:
    """Random-access file reader (reference ipc/file_reader.go:248;
    mmap variant :228 via use_mmap)."""

    def __init__(self, source: Union[BinaryIO, bytes, str],
                 use_mmap: bool = False,
                 decompress_concurrency: int = 0):
        self.decompress_concurrency = decompress_concurrency
        if isinstance(source, str):
            if use_mmap:
                import mmap as _mmap
                f = open(source, "rb")
                m = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
                source = m  # mmap supports the stream protocol: zero-copy
                self._mmap = m
                self._file = f
            else:
                source = open(source, "rb")
        if isinstance(source, (bytes, bytearray, memoryview)):
            source = io.BytesIO(bytes(source))
        self.src = source
        self.src.seek(0, 2)
        size = self.src.tell()
        if size < 20:
            raise ArrowInvalid("file too small for arrow file format")
        self.src.seek(0)
        if self.src.read(6) != MAGIC:
            raise ArrowInvalid("bad arrow file magic")
        self.src.seek(size - 6)
        if self.src.read(6) != MAGIC:
            raise ArrowInvalid("bad arrow file trailing magic")
        self.src.seek(size - 10)
        (flen,) = struct.unpack("<i", self.src.read(4))
        self.src.seek(size - 10 - flen)
        footer = self.src.read(flen)
        r = FbReader.root(footer)
        memo: Dict[int, dt.Field] = {}
        self._swap = r.table(1).i16(0) == 1
        self.schema = md.read_schema(r.table(1), memo)
        self.mapper_fields = memo
        self._field_ids = {id(f): did for did, f in memo.items()}
        self._blocks = [self._block(r, 3, i) for i in range(r.vector_len(3))]
        self._dict_blocks = [self._block(r, 2, i) for i in range(r.vector_len(2))]
        self.dictionaries: Dict[int, ArrayData] = {}
        self._dicts_loaded = False

    @staticmethod
    def _block(r: FbReader, slot: int, i: int):
        import flatbuffers.number_types as N
        pos = r.vector_struct_pos(slot, i, 24)
        off = r.tab.Get(N.Int64Flags, pos)
        mlen = r.tab.Get(N.Int32Flags, pos + 8)
        blen = r.tab.Get(N.Int64Flags, pos + 16)
        return (off, mlen, blen)

    @property
    def num_record_batches(self) -> int:
        return len(self._blocks)

    def _read_at(self, off: int, mlen: int, blen: int):
        if getattr(self, "_mmap", None) is not None:
            # mapped file: message + body are VIEWS of the map — column
            # buffers alias the page cache, nothing is materialized
            # until touched (reference file_reader.go:222-228 mmap path)
            mv = memoryview(self._mmap)
            raw = mv[off: off + mlen]
            body = mv[off + mlen: off + mlen + blen]
        else:
            self.src.seek(off)
            raw = self.src.read(mlen)
            body = self.src.read(blen)
        (w,) = struct.unpack_from("<I", raw, 0)
        if w == core.CONTINUATION:
            (size,) = struct.unpack_from("<i", raw, 4)
            meta = bytes(raw[8: 8 + size])
        else:
            (size,) = struct.unpack_from("<i", raw, 0)
            meta = bytes(raw[4: 4 + size])
        return FbReader.root(meta), body

    def _ensure_dictionaries(self):
        if self._dicts_loaded:
            return
        for off, mlen, blen in self._dict_blocks:
            r, body = self._read_at(off, mlen, blen)
            db = r.union(2)
            did = db.i64(0)
            f = self.mapper_fields.get(did)
            vt = f.type.value_type if f is not None else dt.string
            rb = FbReader(db.tab.Bytes, db.table(1).tab.Pos)
            br = core.BodyReader(rb, body)
            data = core.load_array(br, vt)
            if self._swap:
                data = core.swap_endian_data(data)
            self.dictionaries[did] = data
        self._dicts_loaded = True

    def get_batch(self, i: int) -> RecordBatch:
        self._ensure_dictionaries()
        off, mlen, blen = self._blocks[i]
        r, body = self._read_at(off, mlen, blen)
        rb = r.union(2)
        br = core.BodyReader(rb, body, self.decompress_concurrency)
        cols = []
        for f in self.schema.fields:
            data = core.load_array(br, f.type, self.dictionaries,
                                   lambda fld: self._field_ids.get(id(fld)), f)
            if self._swap:
                data = core.swap_endian_data(data)
            cols.append(make_array(data))
        return RecordBatch(self.schema, cols, br.num_rows)

    def read_all(self) -> Table:
        batches = [self.get_batch(i) for i in range(self.num_record_batches)]
        if not batches:
            return Table(self.schema,
                         [dt_chunked_empty(f.type) for f in self.schema.fields], 0)
        return Table.from_batches(batches, self.schema)

    def __iter__(self):
        for i in range(self.num_record_batches):
            yield self.get_batch(i)


# -- public constructors (pyarrow-style naming for familiarity) -------------

def new_stream(sink, schema: dt.Schema, compression: Optional[str] = None
               ) -> StreamWriter:
    return StreamWriter(sink, schema, compression)


def open_stream(source, decompress_concurrency: int = 0) -> StreamReader:
    """decompress_concurrency > 1 decompresses compressed body buffers on
    a thread pool — the read-side mirror of new_file/new_stream's write
    concurrency (reference only parallelizes the write side)."""
    return StreamReader(source, decompress_concurrency)


def new_file(sink, schema: dt.Schema, compression: Optional[str] = None
             ) -> FileWriter:
    return FileWriter(sink, schema, compression)


def open_file(source, use_mmap: bool = False,
              decompress_concurrency: int = 0) -> FileReader:
    return FileReader(source, use_mmap=use_mmap,
                      decompress_concurrency=decompress_concurrency)
