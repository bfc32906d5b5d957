"""arrow_go_tpu — a TPU-native columnar data framework.

A from-scratch, TPU-first re-design of the capability surface of
apache/arrow-go (the Go Arrow implementation): Arrow-semantics columnar
data, a vectorized compute kernel library running as XLA/Pallas programs
on device, Arrow IPC / Parquet / CSV / JSON formats, a Flight RPC layer,
and a distributed (mesh-sharded) execution tier.

Layering (mirrors reference SURVEY.md §1, mechanisms re-invented for TPU):
  memory/   host buffers + bitmaps                 (ref: arrow/memory, bitutil)
  dtypes    logical type system                    (ref: arrow/datatype.go)
  array/    host arrays, builders, record batches  (ref: arrow/array)
  device/   padded device blocks in HBM            (new: TPU-native)
  ops/      Pallas/XLA kernels                     (ref: _lib/*.c SIMD kernels)
  compute/  function registry, executor, exprs     (ref: arrow/compute)
  ipc/      Arrow IPC stream/file                  (ref: arrow/ipc)
  parquet/  Parquet read/write                     (ref: parquet/*)
  formats/  CSV, JSON, Avro                        (ref: arrow/csv, avro)
  flight/   gRPC record-batch transport            (ref: arrow/flight)
  parallel/ mesh sharding, shuffle, dist. ops      (new: ICI/DCN collectives)
"""

from . import dtypes
from .dtypes import (  # noqa: F401
    DataType, Field, Metadata, Schema, TimeUnit, TypeId,
    binary, bool_, date32, date64, decimal32, decimal64, decimal128,
    decimal256, dense_union, dictionary, duration, field, fixed_size_binary,
    fixed_size_list, float16, float32, float64, from_numpy_dtype, int8,
    int16, int32, int64, large_binary, large_list, large_string, list_,
    map_, month_interval, null, run_end_encoded, schema, sparse_union,
    string, struct, time32, time64, timestamp, uint8, uint16, uint32,
    uint64,
)
from .array.arrays import Array, ArrayData, array, from_numpy, make_array, nulls  # noqa: F401
from .array.builders import make_builder  # noqa: F401
from .array.concat import concat_arrays  # noqa: F401
from .array.record import (  # noqa: F401
    ChunkedArray, Column, RecordBatch, Table, record_batch, table,
)
from .memory.buffer import Allocator, Buffer, TrackedAllocator  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy heavy submodules (these import jax).
    if name in ("compute", "device", "ops", "parallel"):
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    if name in ("ipc", "parquet", "formats", "flight", "interop", "csv",
                "cdata", "tensor", "native", "extensions", "cli", "dataset"):
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(name)
