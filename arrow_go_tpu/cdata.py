"""Arrow C Data Interface (reference arrow/cdata — cdata.go, abi.h,
trampoline.c): zero-copy array exchange across the C ABI.

Implemented with cffi over the stable ArrowSchema/ArrowArray struct
layout from the Arrow C data interface specification. Export keeps the
python buffers alive until the consumer calls `release`; import copies
out of the producer's memory then releases.
"""
from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import dtypes as dt
from .array.arrays import Array, ArrayData, make_array
from .compute.errors import ArrowInvalid, ArrowNotImplemented
from .memory.buffer import Buffer

import cffi

ffi = cffi.FFI()
ffi.cdef("""
struct ArrowSchema {
  const char* format;
  const char* name;
  const char* metadata;
  int64_t flags;
  int64_t n_children;
  struct ArrowSchema** children;
  struct ArrowSchema* dictionary;
  void (*release)(struct ArrowSchema*);
  void* private_data;
};
struct ArrowArray {
  int64_t length;
  int64_t null_count;
  int64_t offset;
  int64_t n_buffers;
  int64_t n_children;
  const void** buffers;
  struct ArrowArray** children;
  struct ArrowArray* dictionary;
  void (*release)(struct ArrowArray*);
  void* private_data;
};
struct ArrowArrayStream {
  int (*get_schema)(struct ArrowArrayStream*, struct ArrowSchema* out);
  int (*get_next)(struct ArrowArrayStream*, struct ArrowArray* out);
  const char* (*get_last_error)(struct ArrowArrayStream*);
  void (*release)(struct ArrowArrayStream*);
  void* private_data;
};
typedef int32_t ArrowDeviceType;
struct ArrowDeviceArray {
  struct ArrowArray array;
  int64_t device_id;
  ArrowDeviceType device_type;
  void* sync_event;
  int64_t reserved[3];
};
struct ArrowDeviceArrayStream {
  ArrowDeviceType device_type;
  int (*get_schema)(struct ArrowDeviceArrayStream*, struct ArrowSchema* out);
  int (*get_next)(struct ArrowDeviceArrayStream*, struct ArrowDeviceArray* out);
  const char* (*get_last_error)(struct ArrowDeviceArrayStream*);
  void (*release)(struct ArrowDeviceArrayStream*);
  void* private_data;
};
struct ArrowAsyncTask {
  int (*extract_data)(struct ArrowAsyncTask* self, struct ArrowDeviceArray* out);
  void* private_data;
};
struct ArrowAsyncProducer {
  ArrowDeviceType device_type;
  void (*request)(struct ArrowAsyncProducer* self, int64_t n);
  void (*cancel)(struct ArrowAsyncProducer* self);
  void (*release)(struct ArrowAsyncProducer* self);
  const char* additional_metadata;
  void* private_data;
};
struct ArrowAsyncDeviceStreamHandler {
  int (*on_schema)(struct ArrowAsyncDeviceStreamHandler* self,
                   struct ArrowSchema* stream_schema);
  int (*on_next_task)(struct ArrowAsyncDeviceStreamHandler* self,
                      struct ArrowAsyncTask* task, const char* metadata);
  void (*on_error)(struct ArrowAsyncDeviceStreamHandler* self, int code,
                   const char* message, const char* metadata);
  void (*release)(struct ArrowAsyncDeviceStreamHandler* self);
  struct ArrowAsyncProducer* producer;
  void* private_data;
};
""")

ARROW_DEVICE_CPU = 1  # ArrowDeviceType kDLCPU

ARROW_FLAG_NULLABLE = 2

# format strings per the C data interface spec
_FMT = {
    dt.TypeId.NULL: "n", dt.TypeId.BOOL: "b",
    dt.TypeId.INT8: "c", dt.TypeId.UINT8: "C",
    dt.TypeId.INT16: "s", dt.TypeId.UINT16: "S",
    dt.TypeId.INT32: "i", dt.TypeId.UINT32: "I",
    dt.TypeId.INT64: "l", dt.TypeId.UINT64: "L",
    dt.TypeId.FLOAT16: "e", dt.TypeId.FLOAT32: "f", dt.TypeId.FLOAT64: "g",
    dt.TypeId.STRING: "u", dt.TypeId.BINARY: "z",
    dt.TypeId.LARGE_STRING: "U", dt.TypeId.LARGE_BINARY: "Z",
    dt.TypeId.DATE32: "tdD", dt.TypeId.DATE64: "tdm",
}

_FMT_REV = {v: k for k, v in _FMT.items()}


def _format_for(t: dt.DataType) -> str:
    if t.id in _FMT:
        return _FMT[t.id]
    if t.id == dt.TypeId.TIMESTAMP:
        u = {0: "s", 1: "m", 2: "u", 3: "n"}[int(t.unit)]
        return f"ts{u}:{t.tz or ''}"
    if t.id == dt.TypeId.TIME32:
        return "tts" if t.unit == dt.TimeUnit.SECOND else "ttm"
    if t.id == dt.TypeId.TIME64:
        return "ttu" if t.unit == dt.TimeUnit.MICROSECOND else "ttn"
    if t.id == dt.TypeId.DURATION:
        u = {0: "s", 1: "m", 2: "u", 3: "n"}[int(t.unit)]
        return f"tD{u}"
    if t.is_decimal:
        if t.bit_width == 128:
            return f"d:{t.precision},{t.scale}"
        return f"d:{t.precision},{t.scale},{t.bit_width}"
    if t.id == dt.TypeId.FIXED_SIZE_BINARY:
        return f"w:{t.byte_width}"
    if t.id == dt.TypeId.LIST:
        return "+l"
    if t.id == dt.TypeId.LARGE_LIST:
        return "+L"
    if t.id == dt.TypeId.FIXED_SIZE_LIST:
        return f"+w:{t.list_size}"
    if t.id == dt.TypeId.STRUCT:
        return "+s"
    if t.id == dt.TypeId.MAP:
        return "+m"
    if t.id == dt.TypeId.DICTIONARY:
        return _format_for(t.index_type)
    raise ArrowNotImplemented(f"cdata export of {t}")


def _type_for(fmt: str, children: List[dt.Field],
              dictionary: Optional[dt.DataType]) -> dt.DataType:
    if dictionary is not None:
        idx = _type_for(fmt, [], None)
        return dt.dictionary(idx, dictionary)
    if fmt in _FMT_REV:
        tid = _FMT_REV[fmt]
        for name in dir(dt):
            obj = getattr(dt, name)
            if isinstance(obj, dt.DataType) and obj.id == tid:
                return obj
        return {dt.TypeId.NULL: dt.null}[tid]
    if fmt.startswith("ts"):
        unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
        tz = fmt.split(":", 1)[1] if ":" in fmt else ""
        return dt.timestamp(unit, tz or None)
    if fmt.startswith("tt"):
        return {"s": dt.time32("s"), "m": dt.time32("ms"),
                "u": dt.time64("us"), "n": dt.time64("ns")}[fmt[2]]
    if fmt.startswith("tD"):
        return dt.duration({"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]])
    if fmt.startswith("d:"):
        parts = fmt[2:].split(",")
        p, s = int(parts[0]), int(parts[1])
        bw = int(parts[2]) if len(parts) > 2 else 128
        return {32: dt.decimal32, 64: dt.decimal64, 128: dt.decimal128,
                256: dt.decimal256}[bw](p, s)
    if fmt.startswith("w:"):
        return dt.fixed_size_binary(int(fmt[2:]))
    if fmt == "+l":
        return dt.list_(children[0])
    if fmt == "+L":
        return dt.large_list(children[0])
    if fmt.startswith("+w:"):
        return dt.fixed_size_list(children[0], int(fmt[3:]))
    if fmt == "+s":
        return dt.struct(children)
    if fmt == "+m":
        entries = children[0].type
        return dt.map_(entries.field(0).type, entries.field(1).type)
    raise ArrowNotImplemented(f"cdata import of format {fmt!r}")


class _Keepalive:
    """Registry pinning exported python objects until release() is called."""

    def __init__(self):
        self._lock = threading.Lock()
        self._live: Dict[int, list] = {}
        self._next = 1

    def add(self, objs: list) -> int:
        with self._lock:
            h = self._next
            self._next += 1
            self._live[h] = objs
            return h

    def drop(self, h: int) -> None:
        with self._lock:
            self._live.pop(h, None)


_keep = _Keepalive()

_released_schemas = []


@ffi.callback("void(struct ArrowSchema*)")
def _release_schema(ptr):
    h = int(ffi.cast("intptr_t", ptr.private_data))
    _keep.drop(h)
    ptr.release = ffi.NULL


@ffi.callback("void(struct ArrowArray*)")
def _release_array(ptr):
    h = int(ffi.cast("intptr_t", ptr.private_data))
    _keep.drop(h)
    ptr.release = ffi.NULL


def export_schema(field: dt.Field, out_ptr) -> None:
    """Fill an ArrowSchema* (as integer address or cffi pointer)."""
    c = _as_ptr(out_ptr, "struct ArrowSchema *")
    keep: list = []
    _fill_schema(c, field, keep)
    h = _keep.add(keep)
    c.private_data = ffi.cast("void*", h)
    c.release = _release_schema


def _fill_schema(c, field: dt.Field, keep: list) -> None:
    t = field.type
    fmt_b = ffi.new("char[]", _format_for(t).encode())
    name_b = ffi.new("char[]", field.name.encode())
    keep += [fmt_b, name_b]
    c.format = fmt_b
    c.name = name_b
    c.metadata = ffi.NULL
    c.flags = ARROW_FLAG_NULLABLE if field.nullable else 0
    storage = t.value_type if t.id == dt.TypeId.DICTIONARY else t
    fields = storage.fields() if t.id != dt.TypeId.DICTIONARY else []
    c.n_children = len(fields)
    if fields:
        arr = ffi.new("struct ArrowSchema*[]", len(fields))
        keep.append(arr)
        for i, f in enumerate(fields):
            child = ffi.new("struct ArrowSchema *")
            keep.append(child)
            _fill_schema(child, f, keep)
            child.release = _release_schema
            child.private_data = ffi.NULL
            arr[i] = child
        c.children = arr
    else:
        c.children = ffi.NULL
    if t.id == dt.TypeId.DICTIONARY:
        dptr = ffi.new("struct ArrowSchema *")
        keep.append(dptr)
        _fill_schema(dptr, dt.Field("", t.value_type, True), keep)
        dptr.release = _release_schema
        dptr.private_data = ffi.NULL
        c.dictionary = dptr
    else:
        c.dictionary = ffi.NULL
    c.release = _release_schema
    c.private_data = ffi.NULL


def export_array(arr: Array, out_array_ptr, out_schema_ptr=None) -> None:
    """Fill ArrowArray* (and optionally ArrowSchema*) from our array."""
    if out_schema_ptr is not None:
        export_schema(dt.Field("", arr.type, True), out_schema_ptr)
    c = _as_ptr(out_array_ptr, "struct ArrowArray *")
    keep: list = []
    _fill_array(c, arr.data, keep)
    h = _keep.add(keep)
    c.private_data = ffi.cast("void*", h)
    c.release = _release_array


def _buffer_ptr(buf: Optional[Buffer], keep: list):
    if buf is None or buf.length == 0 and buf.capacity == 0:
        return ffi.NULL
    a = np.ascontiguousarray(buf.raw)
    keep.append(a)
    return ffi.cast("const void*", a.ctypes.data)


def _fill_array(c, data: ArrayData, keep: list) -> None:
    t = data.type
    c.length = data.length
    c.null_count = data.null_count
    c.offset = data.offset
    bufs = list(data.buffers)
    if t.id == dt.TypeId.NULL:
        bufs = []
        c.null_count = data.length
    c.n_buffers = len(bufs)
    if bufs:
        barr = ffi.new("const void*[]", len(bufs))
        keep.append(barr)
        for i, b in enumerate(bufs):
            barr[i] = _buffer_ptr(b, keep)
        c.buffers = barr
    else:
        c.buffers = ffi.NULL
    c.n_children = len(data.children)
    if data.children:
        carr = ffi.new("struct ArrowArray*[]", len(data.children))
        keep.append(carr)
        for i, ch in enumerate(data.children):
            cp = ffi.new("struct ArrowArray *")
            keep.append(cp)
            _fill_array(cp, ch, keep)
            cp.release = _release_array
            cp.private_data = ffi.NULL
            carr[i] = cp
        c.children = carr
    else:
        c.children = ffi.NULL
    if data.dictionary is not None:
        dp = ffi.new("struct ArrowArray *")
        keep.append(dp)
        _fill_array(dp, data.dictionary, keep)
        dp.release = _release_array
        dp.private_data = ffi.NULL
        c.dictionary = dp
    else:
        c.dictionary = ffi.NULL
    c.release = _release_array
    c.private_data = ffi.NULL


def _as_ptr(p, ctype: str):
    if isinstance(p, int):
        return ffi.cast(ctype, p)
    return p


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

def import_field(schema_ptr) -> dt.Field:
    c = _as_ptr(schema_ptr, "struct ArrowSchema *")
    fmt = ffi.string(c.format).decode()
    name = ffi.string(c.name).decode() if c.name != ffi.NULL else ""
    children = [import_field(c.children[i]) for i in range(c.n_children)]
    dict_t = None
    if c.dictionary != ffi.NULL:
        dict_t = import_field(c.dictionary).type
    t = _type_for(fmt, children, dict_t)
    nullable = bool(c.flags & ARROW_FLAG_NULLABLE)
    return dt.Field(name, t, nullable)


def _copy_buffer(ptr, nbytes: int) -> Optional[Buffer]:
    if ptr == ffi.NULL or nbytes == 0:
        return None
    raw = bytes(ffi.buffer(ptr, nbytes))
    return Buffer(np.frombuffer(raw, dtype=np.uint8).copy())


def import_array(array_ptr, schema_or_type) -> Array:
    """ArrowArray* + (ArrowSchema* | DataType) -> our Array (copies)."""
    if isinstance(schema_or_type, dt.DataType):
        t = schema_or_type
    elif isinstance(schema_or_type, dt.Field):
        t = schema_or_type.type
    else:
        t = import_field(schema_or_type).type
    c = _as_ptr(array_ptr, "struct ArrowArray *")
    data = _import_data(c, t)
    if c.release != ffi.NULL:
        c.release(c)
    return make_array(data)


def _import_data(c, t: dt.DataType) -> ArrayData:
    from .memory import bitutil
    length = int(c.length)
    offset = int(c.offset)
    null_count = int(c.null_count)
    total = length + offset

    def validity() -> Optional[Buffer]:
        if c.n_buffers == 0 or c.buffers == ffi.NULL or \
                c.buffers[0] == ffi.NULL:
            return None
        return _copy_buffer(c.buffers[0], bitutil.bytes_for_bits(total))

    if t.id == dt.TypeId.NULL:
        return ArrayData(t, length, [], null_count=length, offset=0)

    tid = t.id
    if tid == dt.TypeId.BOOL:
        bufs = [validity(), _copy_buffer(c.buffers[1],
                                         bitutil.bytes_for_bits(total))]
    elif tid == dt.TypeId.DICTIONARY:
        w = t.index_type.np_dtype.itemsize
        bufs = [validity(), _copy_buffer(c.buffers[1], total * w)]
    elif t.np_dtype is not None and not t.is_decimal:
        w = t.np_dtype.itemsize
        bufs = [validity(), _copy_buffer(c.buffers[1], total * w)]
    elif t.is_decimal or tid == dt.TypeId.FIXED_SIZE_BINARY:
        w = t.byte_width
        bufs = [validity(), _copy_buffer(c.buffers[1], total * w)]
    elif t.is_binary_like:
        ow = t.offset_dtype.itemsize
        offsets = _copy_buffer(c.buffers[1], (total + 1) * ow)
        end = int(offsets.view(t.offset_dtype)[total]) if offsets else 0
        bufs = [validity(), offsets, _copy_buffer(c.buffers[2], end)
                or Buffer()]
    elif tid in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.MAP):
        ow = t.offset_dtype.itemsize
        bufs = [validity(), _copy_buffer(c.buffers[1], (total + 1) * ow)]
    elif tid in (dt.TypeId.STRUCT, dt.TypeId.FIXED_SIZE_LIST):
        bufs = [validity()]
    else:
        raise ArrowNotImplemented(f"cdata import of {t}")

    children = []
    fields = (t.value_type.fields() if tid == dt.TypeId.DICTIONARY
              else t.fields())
    for i in range(int(c.n_children)):
        ft = fields[i].type
        children.append(_import_data(c.children[i], ft))
    dictionary = None
    if c.dictionary != ffi.NULL and tid == dt.TypeId.DICTIONARY:
        dictionary = _import_data(c.dictionary, t.value_type)
    return ArrayData(t, length, bufs, children, dictionary,
                     null_count if null_count >= 0 else None, offset)


def schema_handles() -> Tuple[int, int]:
    """Allocate (schema_ptr, array_ptr) C structs; returns their addresses."""
    s = ffi.new("struct ArrowSchema *")
    a = ffi.new("struct ArrowArray *")
    _keep.add([s, a])
    return int(ffi.cast("intptr_t", s)), int(ffi.cast("intptr_t", a))


# ---------------------------------------------------------------------------
# ArrowArrayStream (reference arrow/cdata ArrowArrayStream in abi.h +
# cdata.go ImportCRecordBatchStream / ExportRecordBatchReader)
# ---------------------------------------------------------------------------

def _batch_to_struct_data(rb) -> ArrayData:
    """RecordBatch -> top-level struct ArrayData (the C stream convention)."""
    t = dt.struct([dt.Field(f.name, f.type, f.nullable)
                   for f in rb.schema.fields])
    return ArrayData(t, rb.num_rows, [None],
                     children=[c.data for c in rb.columns], null_count=0)


def _struct_data_to_batch(data: ArrayData, schema: dt.Schema):
    from .array.record import RecordBatch
    cols = [make_array(c) for c in data.children]
    return RecordBatch(schema, cols, data.length)


class _StreamState:
    __slots__ = ("schema", "it", "error")

    def __init__(self, schema: dt.Schema, it):
        self.schema = schema
        self.it = it
        self.error = b""


_streams: Dict[int, _StreamState] = {}


def _stream_state(ptr) -> Optional[_StreamState]:
    return _streams.get(int(ffi.cast("intptr_t", ptr.private_data)))


@ffi.callback("int(struct ArrowArrayStream*, struct ArrowSchema*)")
def _stream_get_schema(ptr, out):
    st = _stream_state(ptr)
    if st is None:
        return 22  # EINVAL
    try:
        t = dt.struct([dt.Field(f.name, f.type, f.nullable)
                       for f in st.schema.fields])
        export_schema(dt.Field("", t, False), out)
        return 0
    except Exception as e:  # noqa: BLE001 - must not unwind into C
        st.error = str(e).encode() + b"\0"
        return 5  # EIO


@ffi.callback("int(struct ArrowArrayStream*, struct ArrowArray*)")
def _stream_get_next(ptr, out):
    st = _stream_state(ptr)
    if st is None:
        return 22
    try:
        rb = next(st.it, None)
        if rb is None:
            out.release = ffi.NULL  # end of stream
            return 0
        data = _batch_to_struct_data(rb)
        keep: list = []
        _fill_array(out, data, keep)
        h = _keep.add(keep)
        out.private_data = ffi.cast("void*", h)
        out.release = _release_array
        return 0
    except Exception as e:  # noqa: BLE001
        st.error = str(e).encode() + b"\0"
        return 5


@ffi.callback("const char*(struct ArrowArrayStream*)")
def _stream_get_last_error(ptr):
    st = _stream_state(ptr)
    if st is None or not st.error:
        return ffi.NULL
    buf = ffi.new("char[]", st.error)
    _keep.add([buf])
    return buf


@ffi.callback("void(struct ArrowArrayStream*)")
def _stream_release(ptr):
    _streams.pop(int(ffi.cast("intptr_t", ptr.private_data)), None)
    ptr.release = ffi.NULL


_stream_next_handle = [1]


def export_stream(source, out_stream_ptr) -> None:
    """Export a Table / iterable of RecordBatches as an ArrowArrayStream.

    `source` is a Table, or a (schema, iterator-of-RecordBatch) pair, or
    anything with `.schema` and `__iter__` yielding RecordBatches.
    """
    from .array.record import Table
    if isinstance(source, Table):
        schema, it = source.schema, iter(source.to_batches())
    elif isinstance(source, tuple):
        schema, it = source[0], iter(source[1])
    else:
        schema, it = source.schema, iter(source)
    c = _as_ptr(out_stream_ptr, "struct ArrowArrayStream *")
    h = _stream_next_handle[0]
    _stream_next_handle[0] += 1
    _streams[h] = _StreamState(schema, it)
    c.private_data = ffi.cast("void*", h)
    c.get_schema = _stream_get_schema
    c.get_next = _stream_get_next
    c.get_last_error = _stream_get_last_error
    c.release = _stream_release


class RecordBatchStreamReader:
    """Pull-based consumer of a foreign ArrowArrayStream (copies out)."""

    def __init__(self, stream_ptr):
        self._c = _as_ptr(stream_ptr, "struct ArrowArrayStream *")
        s = ffi.new("struct ArrowSchema *")
        rc = self._c.get_schema(self._c, s)
        if rc != 0:
            raise ArrowInvalid(f"get_schema failed: {self._last_error(rc)}")
        f = import_field(s)
        if s.release != ffi.NULL:
            s.release(s)
        self.schema = dt.Schema([dt.Field(cf.name, cf.type, cf.nullable)
                                 for cf in f.type.fields()])
        self._struct_type = f.type
        self._done = False

    def _last_error(self, rc: int) -> str:
        if self._c.get_last_error != ffi.NULL:
            e = self._c.get_last_error(self._c)
            if e != ffi.NULL:
                return ffi.string(e).decode(errors="replace")
        return f"errno {rc}"

    def read_next_batch(self):
        if self._done:
            return None
        a = ffi.new("struct ArrowArray *")
        rc = self._c.get_next(self._c, a)
        if rc != 0:
            raise ArrowInvalid(f"get_next failed: {self._last_error(rc)}")
        if a.release == ffi.NULL:  # end of stream
            self._done = True
            self._release_stream()
            return None
        data = _import_data(a, self._struct_type)
        if a.release != ffi.NULL:
            a.release(a)
        return _struct_data_to_batch(data, self.schema)

    def _release_stream(self):
        if self._c.release != ffi.NULL:
            self._c.release(self._c)

    def __iter__(self):
        while True:
            rb = self.read_next_batch()
            if rb is None:
                return
            yield rb

    def read_all(self):
        from .array.record import Table
        return Table.from_batches(list(self), self.schema)


def import_stream(stream_ptr) -> RecordBatchStreamReader:
    """ArrowArrayStream* (address or cffi ptr) -> stream reader."""
    return RecordBatchStreamReader(stream_ptr)


def stream_handle() -> int:
    """Allocate an ArrowArrayStream struct; returns its address."""
    s = ffi.new("struct ArrowArrayStream *")
    _keep.add([s])
    return int(ffi.cast("intptr_t", s))


# ---------------------------------------------------------------------------
# Device Data Interface: ArrowDeviceArray / ArrowDeviceArrayStream
# (reference arrow/cdata abi.h + cdata.go ExportArrowDeviceArray /
# ImportCDeviceRecordBatch). Host buffers are CPU-device; a TPU engine
# exchanges device data via jax.dlpack, so the C device interface carries
# device_type=CPU with host-resident buffers.
# ---------------------------------------------------------------------------

def export_device_array(arr, out_device_ptr, out_schema_ptr=None) -> None:
    c = _as_ptr(out_device_ptr, "struct ArrowDeviceArray *")
    export_array(arr, ffi.addressof(c.array), out_schema_ptr)
    c.device_id = -1
    c.device_type = ARROW_DEVICE_CPU
    c.sync_event = ffi.NULL


def import_device_array(device_ptr, schema_or_type):
    c = _as_ptr(device_ptr, "struct ArrowDeviceArray *")
    if c.device_type not in (0, ARROW_DEVICE_CPU):
        raise ArrowInvalid(
            f"cannot import non-CPU device array (device_type "
            f"{c.device_type}) without a sync bridge")
    return import_array(ffi.addressof(c.array), schema_or_type)


def device_array_handle() -> int:
    d = ffi.new("struct ArrowDeviceArray *")
    _keep.add([d])
    return int(ffi.cast("intptr_t", d))


_device_streams: Dict[int, _StreamState] = {}


def _device_stream_state(ptr) -> Optional[_StreamState]:
    return _device_streams.get(int(ffi.cast("intptr_t", ptr.private_data)))


@ffi.callback("int(struct ArrowDeviceArrayStream*, struct ArrowSchema*)")
def _dstream_get_schema(ptr, out):
    st = _device_stream_state(ptr)
    if st is None:
        return 22
    try:
        t = dt.struct([dt.Field(f.name, f.type, f.nullable)
                       for f in st.schema.fields])
        export_schema(dt.Field("", t, False), out)
        return 0
    except Exception as e:  # noqa: BLE001
        st.error = str(e).encode() + b"\0"
        return 5


@ffi.callback("int(struct ArrowDeviceArrayStream*, struct ArrowDeviceArray*)")
def _dstream_get_next(ptr, out):
    st = _device_stream_state(ptr)
    if st is None:
        return 22
    try:
        rb = next(st.it, None)
        if rb is None:
            out.array.release = ffi.NULL
            return 0
        data = _batch_to_struct_data(rb)
        keep: list = []
        _fill_array(ffi.addressof(out.array), data, keep)
        h = _keep.add(keep)
        out.array.private_data = ffi.cast("void*", h)
        out.array.release = _release_array
        out.device_id = -1
        out.device_type = ARROW_DEVICE_CPU
        out.sync_event = ffi.NULL
        return 0
    except Exception as e:  # noqa: BLE001
        st.error = str(e).encode() + b"\0"
        return 5


@ffi.callback("const char*(struct ArrowDeviceArrayStream*)")
def _dstream_get_last_error(ptr):
    st = _device_stream_state(ptr)
    if st is None or not st.error:
        return ffi.NULL
    buf = ffi.new("char[]", st.error)
    _keep.add([buf])
    return buf


@ffi.callback("void(struct ArrowDeviceArrayStream*)")
def _dstream_release(ptr):
    _device_streams.pop(int(ffi.cast("intptr_t", ptr.private_data)), None)
    ptr.release = ffi.NULL


def export_device_stream(source, out_stream_ptr) -> None:
    """Export a Table / (schema, iter) / reader as an ArrowDeviceArrayStream."""
    from .array.record import Table
    if isinstance(source, Table):
        schema, it = source.schema, iter(source.to_batches())
    elif isinstance(source, tuple):
        schema, it = source[0], iter(source[1])
    else:
        schema, it = source.schema, iter(source)
    c = _as_ptr(out_stream_ptr, "struct ArrowDeviceArrayStream *")
    h = _stream_next_handle[0]
    _stream_next_handle[0] += 1
    _device_streams[h] = _StreamState(schema, it)
    c.private_data = ffi.cast("void*", h)
    c.device_type = ARROW_DEVICE_CPU
    c.get_schema = _dstream_get_schema
    c.get_next = _dstream_get_next
    c.get_last_error = _dstream_get_last_error
    c.release = _dstream_release


class DeviceRecordBatchStreamReader:
    """Pull-based consumer of a foreign ArrowDeviceArrayStream."""

    def __init__(self, stream_ptr):
        self._c = _as_ptr(stream_ptr, "struct ArrowDeviceArrayStream *")
        if self._c.device_type not in (0, ARROW_DEVICE_CPU):
            raise ArrowInvalid("cannot import non-CPU device stream")
        s = ffi.new("struct ArrowSchema *")
        rc = self._c.get_schema(self._c, s)
        if rc != 0:
            raise ArrowInvalid("get_schema failed")
        f = import_field(s)
        if s.release != ffi.NULL:
            s.release(s)
        self.schema = dt.Schema([dt.Field(cf.name, cf.type, cf.nullable)
                                 for cf in f.type.fields()])
        self._struct_type = f.type
        self._done = False

    def read_next_batch(self):
        if self._done:
            return None
        d = ffi.new("struct ArrowDeviceArray *")
        rc = self._c.get_next(self._c, d)
        if rc != 0:
            raise ArrowInvalid("get_next failed")
        a = ffi.addressof(d.array)
        if a.release == ffi.NULL:
            self._done = True
            if self._c.release != ffi.NULL:
                self._c.release(self._c)
            return None
        data = _import_data(a, self._struct_type)
        if a.release != ffi.NULL:
            a.release(a)
        return _struct_data_to_batch(data, self.schema)

    def __iter__(self):
        while True:
            rb = self.read_next_batch()
            if rb is None:
                return
            yield rb

    def read_all(self):
        from .array.record import Table
        return Table.from_batches(list(self), self.schema)


def import_device_stream(stream_ptr) -> DeviceRecordBatchStreamReader:
    return DeviceRecordBatchStreamReader(stream_ptr)


def device_stream_handle() -> int:
    s = ffi.new("struct ArrowDeviceArrayStream *")
    _keep.add([s])
    return int(ffi.cast("intptr_t", s))


# ---------------------------------------------------------------------------
# Async C Device Data Interface (reference arrow/cdata/interface.go:300-360
# ExportAsyncRecordBatchStream / CreateAsyncDeviceStreamHandler): a push
# producer drives a consumer-provided ArrowAsyncDeviceStreamHandler with
# pull-based backpressure via ArrowAsyncProducer.request(n).
# ---------------------------------------------------------------------------

class _AsyncProducerState:
    __slots__ = ("schema", "it", "permits", "cancelled", "lock", "cv")

    def __init__(self, schema, it):
        import threading
        self.schema = schema
        self.it = it
        self.permits = 0
        self.cancelled = False
        self.lock = threading.Lock()
        self.cv = threading.Condition(self.lock)


_async_producers: Dict[int, _AsyncProducerState] = {}
_async_tasks: Dict[int, object] = {}  # task handle -> RecordBatch


@ffi.callback("void(struct ArrowAsyncProducer*, int64_t)")
def _aprod_request(ptr, n):
    st = _async_producers.get(int(ffi.cast("intptr_t", ptr.private_data)))
    if st is None:
        return
    with st.cv:
        st.permits += int(n)
        st.cv.notify_all()


@ffi.callback("void(struct ArrowAsyncProducer*)")
def _aprod_cancel(ptr):
    st = _async_producers.get(int(ffi.cast("intptr_t", ptr.private_data)))
    if st is None:
        return
    with st.cv:
        st.cancelled = True
        st.cv.notify_all()


@ffi.callback("void(struct ArrowAsyncProducer*)")
def _aprod_release(ptr):
    _async_producers.pop(int(ffi.cast("intptr_t", ptr.private_data)), None)


@ffi.callback("int(struct ArrowAsyncTask*, struct ArrowDeviceArray*)")
def _atask_extract(task, out):
    h = int(ffi.cast("intptr_t", task.private_data))
    rb = _async_tasks.pop(h, None)
    if rb is None:
        return 22
    data = _batch_to_struct_data(rb)
    keep: list = []
    _fill_array(ffi.addressof(out.array), data, keep)
    kh = _keep.add(keep)
    out.array.private_data = ffi.cast("void*", kh)
    out.array.release = _release_array
    out.device_id = -1
    out.device_type = ARROW_DEVICE_CPU
    out.sync_event = ffi.NULL
    return 0


def export_async_stream(source, handler_ptr) -> None:
    """Drive a consumer's ArrowAsyncDeviceStreamHandler with `source`
    (Table / (schema, iter) / reader). Runs the push loop on a daemon
    thread; honors request(n) backpressure and cancel()."""
    import threading
    from .array.record import Table
    if isinstance(source, Table):
        schema, it = source.schema, iter(source.to_batches())
    elif isinstance(source, tuple):
        schema, it = source[0], iter(source[1])
    else:
        schema, it = source.schema, iter(source)
    handler = _as_ptr(handler_ptr, "struct ArrowAsyncDeviceStreamHandler *")

    st = _AsyncProducerState(schema, it)
    h = _stream_next_handle[0]
    _stream_next_handle[0] += 1
    _async_producers[h] = st

    producer = ffi.new("struct ArrowAsyncProducer *")
    _keep.add([producer])
    producer.device_type = ARROW_DEVICE_CPU
    producer.request = _aprod_request
    producer.cancel = _aprod_cancel
    producer.release = _aprod_release
    producer.additional_metadata = ffi.NULL
    producer.private_data = ffi.cast("void*", h)
    handler.producer = producer

    def pump():
        try:
            t = dt.struct([dt.Field(f.name, f.type, f.nullable)
                           for f in st.schema.fields])
            s = ffi.new("struct ArrowSchema *")
            export_schema(dt.Field("", t, False), s)
            rc = handler.on_schema(handler, s)
            if rc != 0:
                return
            while True:
                with st.cv:
                    while st.permits <= 0 and not st.cancelled:
                        st.cv.wait(timeout=30)
                    if st.cancelled:
                        break
                    st.permits -= 1
                rb = next(st.it, None)
                if rb is None:
                    # end of stream: on_next_task with NULL task
                    handler.on_next_task(handler, ffi.NULL, ffi.NULL)
                    break
                th = _stream_next_handle[0]
                _stream_next_handle[0] += 1
                _async_tasks[th] = rb
                task = ffi.new("struct ArrowAsyncTask *")
                _keep.add([task])
                task.extract_data = _atask_extract
                task.private_data = ffi.cast("void*", th)
                rc = handler.on_next_task(handler, task, ffi.NULL)
                if rc != 0:
                    break
        except Exception as e:  # noqa: BLE001 - must not unwind into C
            msg = ffi.new("char[]", str(e).encode())
            _keep.add([msg])
            handler.on_error(handler, 5, msg, ffi.NULL)
        finally:
            if handler.release != ffi.NULL:
                handler.release(handler)

    threading.Thread(target=pump, daemon=True).start()


class AsyncRecordBatchStream:
    """Consumer side: allocates an ArrowAsyncDeviceStreamHandler whose
    callbacks feed this object (reference cdata
    CreateAsyncDeviceStreamHandler + AsyncRecordBatchStream). Iterate to
    receive batches; producer backpressure = `queue_size` outstanding
    requests."""

    def __init__(self, queue_size: int = 4):
        import queue as _q
        import threading
        self._q: "_q.Queue" = _q.Queue()
        self.schema: Optional[dt.Schema] = None
        self._struct_type = None
        self._schema_ready = threading.Event()
        self.error: Optional[str] = None
        self._queue_size = queue_size
        self._handler = ffi.new("struct ArrowAsyncDeviceStreamHandler *")
        h = _stream_next_handle[0]
        _stream_next_handle[0] += 1
        _async_handlers[h] = self
        self._handler.private_data = ffi.cast("void*", h)
        self._handler.on_schema = _ahandler_on_schema
        self._handler.on_next_task = _ahandler_on_next_task
        self._handler.on_error = _ahandler_on_error
        self._handler.release = _ahandler_release
        self._handler.producer = ffi.NULL

    @property
    def handler_ptr(self) -> int:
        return int(ffi.cast("intptr_t", self._handler))

    def __iter__(self):
        self._schema_ready.wait(timeout=30)
        if self.error:
            raise ArrowInvalid(self.error)
        while True:
            item = self._q.get()
            if item is None:
                if self.error:
                    raise ArrowInvalid(self.error)
                return
            # pull one more as we consume (steady-state backpressure)
            if self._handler.producer != ffi.NULL:
                self._handler.producer.request(self._handler.producer, 1)
            yield item

    def read_all(self):
        from .array.record import Table
        batches = list(self)
        return Table.from_batches(batches, self.schema)


_async_handlers: Dict[int, AsyncRecordBatchStream] = {}


def _ahandler(ptr) -> Optional[AsyncRecordBatchStream]:
    return _async_handlers.get(int(ffi.cast("intptr_t", ptr.private_data)))


@ffi.callback("int(struct ArrowAsyncDeviceStreamHandler*, struct ArrowSchema*)")
def _ahandler_on_schema(ptr, s):
    self = _ahandler(ptr)
    if self is None:
        return 22
    try:
        f = import_field(s)
        if s.release != ffi.NULL:
            s.release(s)
        self._struct_type = f.type
        self.schema = dt.Schema([dt.Field(cf.name, cf.type, cf.nullable)
                                 for cf in f.type.fields()])
        self._schema_ready.set()
        # initial request window
        if ptr.producer != ffi.NULL:
            ptr.producer.request(ptr.producer, self._queue_size)
        return 0
    except Exception as e:  # noqa: BLE001
        self.error = str(e)
        self._schema_ready.set()
        return 5


@ffi.callback("int(struct ArrowAsyncDeviceStreamHandler*, "
              "struct ArrowAsyncTask*, const char*)")
def _ahandler_on_next_task(ptr, task, metadata):
    self = _ahandler(ptr)
    if self is None:
        return 22
    try:
        if task == ffi.NULL:  # end of stream
            self._q.put(None)
            return 0
        d = ffi.new("struct ArrowDeviceArray *")
        rc = task.extract_data(task, d)
        if rc != 0:
            self.error = f"extract_data failed ({rc})"
            self._q.put(None)
            return rc
        a = ffi.addressof(d.array)
        data = _import_data(a, self._struct_type)
        if a.release != ffi.NULL:
            a.release(a)
        self._q.put(_struct_data_to_batch(data, self.schema))
        return 0
    except Exception as e:  # noqa: BLE001
        self.error = str(e)
        self._q.put(None)
        return 5


@ffi.callback("void(struct ArrowAsyncDeviceStreamHandler*, int, "
              "const char*, const char*)")
def _ahandler_on_error(ptr, code, message, metadata):
    self = _ahandler(ptr)
    if self is None:
        return
    msg = ffi.string(message).decode(errors="replace") \
        if message != ffi.NULL else f"errno {code}"
    self.error = msg
    self._schema_ready.set()
    self._q.put(None)


@ffi.callback("void(struct ArrowAsyncDeviceStreamHandler*)")
def _ahandler_release(ptr):
    _async_handlers.pop(int(ffi.cast("intptr_t", ptr.private_data)), None)
