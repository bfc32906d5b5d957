"""IPC record-batch body assembly/reconstruction + message framing.

Reference: arrow/ipc/writer.go:566-870 (recursive per-column visit),
arrow/ipc/reader.go record load, format/Message.fbs encapsulated-message
framing (continuation 0xFFFFFFFF + int32 len + flatbuffer + 8-aligned
body), BodyCompression (ZSTD per-buffer with int64 uncompressed-length
prefix; -1 = stored raw).
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import flatbuffers
import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array
from ..memory import bitutil
from ..memory.buffer import Buffer
from . import metadata as md
from .fb import Reader

CONTINUATION = 0xFFFFFFFF
ALIGN = 8


def _pad_to(n: int, align: int = ALIGN) -> int:
    return (n + align - 1) // align * align


# ---------------------------------------------------------------------------
# compaction: IPC writes offset-0 arrays (reference truncates buffer windows)
# ---------------------------------------------------------------------------

def compact(data: ArrayData) -> ArrayData:
    """Rewrite ArrayData so offset == 0 and buffers are exactly sized."""
    if data.offset == 0 and not _has_offset_children(data):
        return data
    arr = make_array(data)
    t = data.type
    if t.id == dt.TypeId.DICTIONARY:
        # rebase the indices window only — the dictionary itself must stay
        # identical to the one announced in the DictionaryBatch message
        idx = np.ascontiguousarray(arr.indices.to_numpy())
        vb = None
        if data.null_count:
            vb = Buffer(bitutil.pack_bits(arr.validity_bools()))
        return ArrayData(t, data.length, [vb, Buffer.wrap(idx)],
                         dictionary=data.dictionary,
                         null_count=data.null_count)
    if t.np_dtype is not None and not t.is_decimal:
        vals = np.ascontiguousarray(arr.values)
        vb = None
        if data.null_count:
            vb = Buffer(bitutil.pack_bits(arr.validity_bools()))
        return ArrayData(t, data.length, [vb, Buffer.wrap(vals)],
                         null_count=data.null_count)
    # generic: rebuild through a builder
    from ..array.builders import make_builder
    b = make_builder(t)
    b.append_values(arr.to_pylist())
    return b.finish().data


def _has_offset_children(data: ArrayData) -> bool:
    return any(c.offset != 0 or _has_offset_children(c) for c in data.children)


# ---------------------------------------------------------------------------
# body assembly
# ---------------------------------------------------------------------------

class FieldNode:
    __slots__ = ("length", "null_count")

    def __init__(self, length: int, null_count: int):
        self.length = length
        self.null_count = null_count


def _validity_bytes(data: ArrayData) -> bytes:
    if data.null_count == 0:
        return b""
    v = data.buffers[0]
    need = bitutil.bytes_for_bits(data.length)
    if data.offset == 0:
        return v.data[:need].tobytes()
    return bitutil.pack_bits(make_array(data).validity_bools()).tobytes()


def collect_body(data: ArrayData, nodes: List[FieldNode],
                 buffers: List[bytes],
                 variadic: Optional[List[int]] = None) -> None:
    """Recursive visit: append FieldNodes + raw buffer bytes
    (reference writer.go visit). `variadic` collects the per-view-field
    variadic data-buffer counts (spec RecordBatch.variadicBufferCounts)."""
    if data.offset or _has_offset_children(data):
        data = compact(data)
    t = data.type
    tid = t.id
    if tid == dt.TypeId.EXTENSION:
        # extension arrays serialize as their storage array
        # (reference writer.go visits storage; name rides field metadata)
        sd = ArrayData(t.storage_type, data.length, data.buffers,
                       data.children, data.dictionary, data._null_count,
                       data.offset)
        collect_body(sd, nodes, buffers, variadic)
        return
    nodes.append(FieldNode(data.length, data.null_count))

    if tid == dt.TypeId.NULL:
        return
    if tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        buffers.append(data.buffers[0].data[:data.length])
        if tid == dt.TypeId.DENSE_UNION:
            buffers.append(data.buffers[1].data[: data.length * 4])
        for c in data.children:
            collect_body(c, nodes, buffers, variadic)
        return
    if tid == dt.TypeId.RUN_END_ENCODED:
        for c in data.children:
            collect_body(c, nodes, buffers, variadic)
        return

    buffers.append(_validity_bytes(data))

    if tid == dt.TypeId.BOOL:
        buffers.append(
            data.buffers[1].data[: bitutil.bytes_for_bits(data.length)])
        return
    if t.np_dtype is not None and tid != dt.TypeId.DICTIONARY:
        w = t.np_dtype.itemsize
        buffers.append(data.buffers[1].data[: data.length * w])
        return
    if t.is_decimal or tid == dt.TypeId.FIXED_SIZE_BINARY:
        w = t.byte_width
        buffers.append(data.buffers[1].data[: data.length * w])
        return
    if tid == dt.TypeId.DICTIONARY:
        w = t.index_type.np_dtype.itemsize
        buffers.append(data.buffers[1].data[: data.length * w])
        return
    if tid in (dt.TypeId.BINARY_VIEW, dt.TypeId.STRING_VIEW):
        buffers.append(data.buffers[1].data[: data.length * 16])
        data_bufs = data.buffers[2:]
        for db in data_bufs:
            buffers.append(db.data)
        if variadic is not None:
            variadic.append(len(data_bufs))
        return
    if tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        ow = t.offset_dtype.itemsize
        buffers.append(data.buffers[1].data[: data.length * ow])
        buffers.append(data.buffers[2].data[: data.length * ow])
        collect_body(data.children[0], nodes, buffers, variadic)
        return
    if t.is_binary_like:
        ow = t.offset_dtype.itemsize
        offsets = data.buffers[1].data[: (data.length + 1) * ow]
        buffers.append(offsets)
        off_vals = offsets.view(t.offset_dtype)
        end = int(off_vals[-1]) if data.length >= 0 and len(off_vals) else 0
        buffers.append(data.buffers[2].data[:end])
        return
    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        ow = t.offset_dtype.itemsize
        buffers.append(data.buffers[1].data[: (data.length + 1) * ow])
        collect_body(data.children[0], nodes, buffers, variadic)
        return
    if tid in (dt.TypeId.FIXED_SIZE_LIST, dt.TypeId.STRUCT):
        for c in data.children:
            collect_body(c, nodes, buffers, variadic)
        return
    raise NotImplementedError(f"IPC body for {t}")


def _compress_one(compression: str, buf: bytes) -> bytes:
    """One body buffer -> int64-length-prefixed frame (raw when compression
    does not shrink it, per the IPC BodyCompression contract)."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)        # collect_body now yields zero-copy views
    if compression == "zstd":
        import zstandard
        comp = zstandard.ZstdCompressor().compress(buf)
    else:
        from .. import native
        comp = native.lz4_frame_compress(buf)
    if len(comp) < len(buf):
        return struct.pack("<q", len(buf)) + comp
    return struct.pack("<q", -1) + buf


def build_record_batch_message(
        columns: List[ArrayData], num_rows: int,
        compression: Optional[str] = None,
        dictionary_id: Optional[int] = None, is_delta: bool = False,
        compress_concurrency: int = 0,
) -> Tuple[bytes, bytes]:
    """Returns (metadata_flatbuffer, body_bytes)."""
    msg, parts, _ = build_record_batch_parts(
        columns, num_rows, compression, dictionary_id, is_delta,
        compress_concurrency)
    return msg, b"".join(parts)


def build_record_batch_parts(
        columns: List[ArrayData], num_rows: int,
        compression: Optional[str] = None,
        dictionary_id: Optional[int] = None, is_delta: bool = False,
        compress_concurrency: int = 0,
) -> Tuple[bytes, List[bytes], int]:
    """Returns (metadata_flatbuffer, body buffer parts, body length) —
    the unjoined form the Flight wire codec writes directly into its
    frame. When dictionary_id is set, wraps the RecordBatch in a
    DictionaryBatch header.

    compress_concurrency > 1 compresses body buffers on a thread pool (the
    zstd/lz4 C codecs release the GIL) — reference WithCompressConcurrency,
    arrow/ipc/ipc.go:160-170."""
    nodes: List[FieldNode] = []
    raw: List[bytes] = []
    variadic: List[int] = []
    for col in columns:
        collect_body(col, nodes, raw, variadic)

    # optionally compress each buffer (int64 uncompressed-length prefix)
    if compression in ("zstd", "lz4"):
        if compress_concurrency > 1 and len(raw) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(compress_concurrency) as pool:
                raw = list(pool.map(
                    lambda b: _compress_one(compression, b), raw))
        else:
            raw = [_compress_one(compression, b) for b in raw]
    elif compression is not None:
        raise NotImplementedError(f"compression {compression}")

    # lay out buffers with alignment. `parts` keeps the buffers as
    # separate views so the Flight wire codec can write them straight
    # into the outgoing gRPC frame without an intermediate join
    # (flight/wire.py; reference record_batch_writer.go:97)
    buf_meta = []
    parts: List[bytes] = []
    off = 0
    for bufb in raw:
        parts.append(bufb)
        pad = _pad_to(len(bufb)) - len(bufb)
        if pad:
            parts.append(b"\0" * pad)
        buf_meta.append((off, len(bufb)))
        off += len(bufb) + pad
    body_len = off

    b = flatbuffers.Builder(1024)
    # Buffer structs vector (reverse order)
    b.StartVector(16, len(buf_meta), 8)
    for off, ln in reversed(buf_meta):
        b.Prep(8, 16)
        b.PrependInt64(ln)
        b.PrependInt64(off)
    buf_vec = b.EndVector()
    # FieldNode structs vector
    b.StartVector(16, len(nodes), 8)
    for node in reversed(nodes):
        b.Prep(8, 16)
        b.PrependInt64(node.null_count)
        b.PrependInt64(node.length)
    node_vec = b.EndVector()

    var_vec = None
    if variadic:
        b.StartVector(8, len(variadic), 8)
        for v in reversed(variadic):
            b.PrependInt64(v)
        var_vec = b.EndVector()

    comp_off = None
    if compression in ("zstd", "lz4"):
        b.StartObject(2)
        b.PrependInt8Slot(0, md.COMPRESS_ZSTD if compression == "zstd"
                          else md.COMPRESS_LZ4, 0)
        b.PrependInt8Slot(1, 0, 0)
        comp_off = b.EndObject()

    b.StartObject(5)
    b.PrependInt64Slot(0, num_rows, 0)
    b.PrependUOffsetTRelativeSlot(1, node_vec, 0)
    b.PrependUOffsetTRelativeSlot(2, buf_vec, 0)
    if comp_off is not None:
        b.PrependUOffsetTRelativeSlot(3, comp_off, 0)
    if var_vec is not None:
        b.PrependUOffsetTRelativeSlot(4, var_vec, 0)
    rb_off = b.EndObject()

    header_type = md.MSG_RECORD_BATCH
    if dictionary_id is not None:
        b.StartObject(3)
        b.PrependInt64Slot(0, dictionary_id, 0)
        b.PrependUOffsetTRelativeSlot(1, rb_off, 0)
        b.PrependBoolSlot(2, is_delta, False)
        rb_off = b.EndObject()
        header_type = md.MSG_DICTIONARY_BATCH

    msg = _finish_message(b, header_type, rb_off, body_len)
    return msg, parts, body_len


def _finish_message(b: flatbuffers.Builder, header_type: int,
                    header_off: int, body_len: int) -> bytes:
    b.StartObject(5)
    b.PrependInt16Slot(0, md.METADATA_V5, 0)
    b.PrependUint8Slot(1, header_type, 0)
    b.PrependUOffsetTRelativeSlot(2, header_off, 0)
    b.PrependInt64Slot(3, body_len, 0)
    b.Finish(b.EndObject())
    return bytes(b.Output())


def build_schema_message(schema: dt.Schema, dict_ids: dict,
                         endianness: int = 0) -> bytes:
    b = flatbuffers.Builder(1024)
    off = md.write_schema(b, schema, dict_ids, endianness)
    return _finish_message(b, md.MSG_SCHEMA, off, 0)


def frame_message(meta: bytes) -> bytes:
    """Encapsulate: continuation + int32 size + flatbuffer + padding."""
    size = _pad_to(len(meta) + 8) - 8
    out = struct.pack("<Ii", CONTINUATION, size)
    return out + meta + b"\0" * (size - len(meta))


EOS = struct.pack("<Ii", CONTINUATION, 0)


# ---------------------------------------------------------------------------
# reconstruction (reader side)
# ---------------------------------------------------------------------------

class BodyReader:
    """Sequential consumer of nodes + buffers from a record-batch message."""

    def __init__(self, rb: Reader, body: bytes,
                 decompress_concurrency: int = 0):
        self.rb = rb
        self.body = body
        self.node_i = 0
        self.buf_i = 0
        self.var_i = 0
        comp = rb.table(3)
        self.codec = None
        self._prefetched = None
        if comp is not None:
            c = comp.i8(0)
            if c == md.COMPRESS_ZSTD:
                self.codec = "zstd"
            elif c == md.COMPRESS_LZ4:
                self.codec = "lz4"
            else:
                raise NotImplementedError(f"compression codec {c}")
        if self.codec is not None and decompress_concurrency > 1:
            # concurrent per-buffer body decompression — the read-side
            # mirror of WithCompressConcurrency (reference ipc/ipc.go:160-170
            # only parallelizes the WRITE side; the zstd/lz4 C codecs
            # release the GIL so the same trick pays off on read)
            nbuf = rb.vector_len(2)
            if nbuf > 1:
                from concurrent.futures import ThreadPoolExecutor
                raws = [self._raw_buffer(i) for i in range(nbuf)]
                with ThreadPoolExecutor(decompress_concurrency) as pool:
                    self._prefetched = list(
                        pool.map(self._decompress_one, raws))

    def _raw_buffer(self, i: int) -> bytes:
        pos = self.rb.vector_struct_pos(2, i, 16)
        import flatbuffers.number_types as N
        off = self.rb.tab.Get(N.Int64Flags, pos)
        ln = self.rb.tab.Get(N.Int64Flags, pos + 8)
        return self.body[off: off + ln]

    def _decompress_one(self, raw: bytes) -> bytes:
        if self.codec is None or not raw:
            return raw
        (ulen,) = struct.unpack_from("<q", raw, 0)
        payload = raw[8:]
        if ulen == -1:
            return payload
        if self.codec == "zstd":
            import zstandard
            return zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=ulen)
        if self.codec == "lz4":
            from .. import native
            return native.lz4_frame_decompress(payload, ulen)
        raise NotImplementedError(f"{self.codec} body compression")

    @property
    def num_rows(self) -> int:
        return self.rb.i64(0)

    def next_node(self) -> FieldNode:
        pos = self.rb.vector_struct_pos(1, self.node_i, 16)
        self.node_i += 1
        import flatbuffers.number_types as N
        length = self.rb.tab.Get(N.Int64Flags, pos)
        nulls = self.rb.tab.Get(N.Int64Flags, pos + 8)
        return FieldNode(length, nulls)

    def next_variadic(self) -> int:
        """Next per-view-field variadic buffer count (slot 4 of
        RecordBatch: variadicBufferCounts)."""
        v = self.rb.vector_i64(4, self.var_i)
        self.var_i += 1
        return v

    def next_buffer(self) -> bytes:
        i = self.buf_i
        self.buf_i += 1
        if self._prefetched is not None:
            return self._prefetched[i]
        return self._decompress_one(self._raw_buffer(i))


def load_array(br: BodyReader, t: dt.DataType,
               dictionaries: Optional[dict] = None,
               dict_id_of=None, field: Optional[dt.Field] = None) -> ArrayData:
    if t.id == dt.TypeId.EXTENSION:
        sd = load_array(br, t.storage_type, dictionaries, dict_id_of, field)
        return ArrayData(t, sd.length, sd.buffers, sd.children,
                         sd.dictionary, sd._null_count, sd.offset)
    node = br.next_node()
    n, nc = node.length, node.null_count
    tid = t.id

    def buf() -> Optional[Buffer]:
        raw = br.next_buffer()
        # zero-copy view over the (immutable) message body — the copy
        # here was ~35% of the Flight DoGet wall time; arrays never
        # mutate buffers in place, so aliasing the body is safe
        return Buffer(np.frombuffer(raw, dtype=np.uint8)) if raw else \
            Buffer(np.zeros(0, np.uint8))

    if tid == dt.TypeId.NULL:
        return ArrayData(t, n, [], null_count=n)
    if tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        bufs = [buf()]
        if tid == dt.TypeId.DENSE_UNION:
            bufs.append(buf())
        children = [load_array(br, f.type, dictionaries, dict_id_of, f)
                    for f in t.fields()]
        return ArrayData(t, n, bufs, children, null_count=0)
    if tid == dt.TypeId.RUN_END_ENCODED:
        children = [load_array(br, f.type, dictionaries, dict_id_of, f)
                    for f in t.fields()]
        return ArrayData(t, n, [], children, null_count=0)

    validity = buf()
    vb = validity if nc else None

    if tid == dt.TypeId.BOOL or (t.np_dtype is not None
                                 and tid != dt.TypeId.DICTIONARY):
        return ArrayData(t, n, [vb, buf()], null_count=nc)
    if t.is_decimal or tid == dt.TypeId.FIXED_SIZE_BINARY:
        return ArrayData(t, n, [vb, buf()], null_count=nc)
    if tid == dt.TypeId.DICTIONARY:
        data = ArrayData(t, n, [vb, buf()], null_count=nc)
        if dictionaries is not None and dict_id_of is not None and field is not None:
            did = dict_id_of(field)
            dict_arr = dictionaries.get(did)
            if dict_arr is not None:
                data.dictionary = dict_arr
        return data
    if tid in (dt.TypeId.BINARY_VIEW, dt.TypeId.STRING_VIEW):
        views = buf()
        nvar = br.next_variadic()
        bufs = [vb, views] + [buf() for _ in range(nvar)]
        return ArrayData(t, n, bufs, null_count=nc)
    if tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        bufs = [vb, buf(), buf()]
        child = load_array(br, t.fields()[0].type, dictionaries, dict_id_of,
                           t.fields()[0])
        return ArrayData(t, n, bufs, [child], null_count=nc)
    if t.is_binary_like:
        return ArrayData(t, n, [vb, buf(), buf()], null_count=nc)
    if tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        bufs = [vb, buf()]
        child = load_array(br, t.fields()[0].type, dictionaries, dict_id_of,
                           t.fields()[0])
        return ArrayData(t, n, bufs, [child], null_count=nc)
    if tid in (dt.TypeId.FIXED_SIZE_LIST, dt.TypeId.STRUCT):
        children = [load_array(br, f.type, dictionaries, dict_id_of, f)
                    for f in t.fields()]
        return ArrayData(t, n, [vb], children, null_count=nc)
    raise NotImplementedError(f"IPC load of {t}")


# ---------------------------------------------------------------------------
# endianness (reference arrow/ipc/endian_swap.go swapEndianArrayData)
# ---------------------------------------------------------------------------

def _swap_buf(b, width: int):
    """Byteswap a buffer as width-byte elements (full element reversal —
    equivalent to word swap for 2/4/8, and the decimal whole-value swap
    for 16/32-byte elements)."""
    if b is None or width <= 1 or len(b.data) == 0:
        return b
    from ..memory.buffer import Buffer
    a = b.data
    usable = (len(a) // width) * width
    out = a[:usable].reshape(-1, width)[:, ::-1].ravel().copy()
    if usable < len(a):
        out = np.concatenate([out, a[usable:]])
    return Buffer(out)


def swap_endian_data(data: ArrayData) -> ArrayData:
    """Return a copy of `data` with every numeric buffer byte-swapped
    (validity bitmaps and raw byte payloads untouched). Used to read
    big-endian IPC files on little-endian hosts and to emit them
    (reference ipc/endian_swap.go)."""
    t = data.type
    tid = t.id
    bufs = list(data.buffers)
    children = list(data.children)

    def swap_children():
        return [swap_endian_data(c) for c in children]

    if tid == dt.TypeId.EXTENSION:
        inner = swap_endian_data(ArrayData(
            t.storage_type, data.length, bufs, children, data.dictionary,
            data._null_count, data.offset))
        return ArrayData(t, data.length, inner.buffers, inner.children,
                         inner.dictionary, data._null_count, data.offset)
    if tid in (dt.TypeId.NULL, dt.TypeId.BOOL, dt.TypeId.INT8,
               dt.TypeId.UINT8, dt.TypeId.FIXED_SIZE_BINARY):
        pass
    elif tid in (dt.TypeId.STRING_VIEW, dt.TypeId.BINARY_VIEW):
        raise NotImplementedError("endian swap of view buffers")
    elif tid in (dt.TypeId.SPARSE_UNION, dt.TypeId.DENSE_UNION):
        if tid == dt.TypeId.DENSE_UNION and len(bufs) > 1:
            bufs[1] = _swap_buf(bufs[1], 4)  # value offsets int32
        children = swap_children()
    elif tid == dt.TypeId.RUN_END_ENCODED:
        children = swap_children()
    elif tid == dt.TypeId.DICTIONARY:
        # indices only: the dictionary values ride their own DictionaryBatch
        # message and are swapped when that message is read/written
        bufs[1] = _swap_buf(bufs[1], t.index_type.np_dtype.itemsize)
    elif tid == dt.TypeId.INTERVAL_MONTH_DAY_NANO:
        # heterogeneous 16-byte struct: (i32 months, i32 days, i64 nanos)
        b = bufs[1]
        if b is not None and len(b.data):
            from ..memory.buffer import Buffer
            a = b.data
            usable = (len(a) // 16) * 16
            m = a[:usable].reshape(-1, 16).copy()
            m[:, 0:4] = m[:, 0:4][:, ::-1]
            m[:, 4:8] = m[:, 4:8][:, ::-1]
            m[:, 8:16] = m[:, 8:16][:, ::-1]
            out = m.ravel()
            if usable < len(a):
                out = np.concatenate([out, a[usable:]])
            bufs[1] = Buffer(out)
    elif tid in (dt.TypeId.INTERVAL_DAY_TIME, dt.TypeId.INTERVAL_MONTHS):
        bufs[1] = _swap_buf(bufs[1], 4)  # i32 / (i32,i32) per value
    elif t.is_decimal or tid == dt.TypeId.FLOAT16:
        bufs[1] = _swap_buf(bufs[1], t.bit_width // 8)
    elif t.np_dtype is not None:
        bufs[1] = _swap_buf(bufs[1], t.np_dtype.itemsize)
    elif t.is_binary_like:  # offsets + raw bytes
        bufs[1] = _swap_buf(bufs[1], t.offset_dtype.itemsize)
    elif tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        bufs[1] = _swap_buf(bufs[1], t.offset_dtype.itemsize)
        children = swap_children()
    elif tid in (dt.TypeId.LIST_VIEW, dt.TypeId.LARGE_LIST_VIEW):
        w = t.offset_dtype.itemsize
        bufs[1] = _swap_buf(bufs[1], w)
        bufs[2] = _swap_buf(bufs[2], w)
        children = swap_children()
    elif tid in (dt.TypeId.FIXED_SIZE_LIST, dt.TypeId.STRUCT):
        children = swap_children()
    else:
        raise NotImplementedError(f"endian swap of {t}")
    return ArrayData(t, data.length, bufs, children, data.dictionary,
                     data._null_count, data.offset)
