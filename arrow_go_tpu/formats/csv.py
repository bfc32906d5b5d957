"""CSV reader/writer (reference arrow/csv/reader.go:108, writer.go).

Options mirror the reference's functional options: delimiter, header
handling, explicit schema or type inference, null value spellings,
chunked reading.
"""
from __future__ import annotations

import csv as _csv
import io
from dataclasses import dataclass, field as dc_field
from typing import Dict, Iterator, List, Optional, Sequence, Union

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, array as from_py
from ..array.builders import make_builder
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid

DEFAULT_NULLS = ("", "NULL", "null", "N/A", "n/a", "NA", "nan", "NaN")


@dataclass
class ReadOptions:
    delimiter: str = ","                    # reference WithComma
    has_header: bool = True                 # WithHeader
    column_names: Optional[List[str]] = None
    schema: Optional[dt.Schema] = None
    column_types: Optional[dict] = None     # WithColumnTypes (name -> type)
    include_columns: Optional[List[str]] = None  # WithIncludeColumns
    null_values: Sequence[str] = DEFAULT_NULLS   # WithNullReader
    chunk_size: int = 1 << 20               # WithChunk (rows per batch)
    comment: Optional[str] = None           # WithComment
    skip_rows: int = 0
    strings_can_be_null: bool = False
    true_values: Sequence[str] = ("true", "True", "TRUE", "1")
    false_values: Sequence[str] = ("false", "False", "FALSE", "0")

    def type_for(self, name: str) -> Optional[dt.DataType]:
        if self.column_types and name in self.column_types:
            return self.column_types[name]
        if self.schema is not None and self.schema.has_field(name):
            return self.schema.field_by_name(name).type
        return None


def _infer_column_type(values: List[Optional[str]], opts: ReadOptions
                       ) -> dt.DataType:
    non_null = [v for v in values if v is not None]
    if not non_null:
        return dt.null
    def all_match(pred):
        return all(pred(v) for v in non_null)
    bools = set(opts.true_values) | set(opts.false_values)
    if all_match(lambda v: v in bools):
        return dt.bool_
    try:
        for v in non_null:
            int(v)
        return dt.int64
    except ValueError:
        pass
    try:
        for v in non_null:
            float(v)
        return dt.float64
    except ValueError:
        pass
    try:
        import datetime
        for v in non_null:
            datetime.date.fromisoformat(v)
        return dt.date32
    except ValueError:
        pass
    try:
        import datetime
        for v in non_null:
            datetime.datetime.fromisoformat(v)
        return dt.timestamp("us")
    except ValueError:
        pass
    return dt.string


def _convert_column(values: List[Optional[str]], t: dt.DataType,
                    opts: ReadOptions) -> Array:
    import datetime
    b = make_builder(t)
    for v in values:
        if v is None:
            b.append_null()
            continue
        if t.id == dt.TypeId.BOOL:
            b.append(v in opts.true_values)
        elif t.is_integer:
            b.append(int(v))
        elif t.is_floating:
            b.append(float(v))
        elif t.id == dt.TypeId.DATE32:
            b.append(datetime.date.fromisoformat(v))
        elif t.id == dt.TypeId.TIMESTAMP:
            b.append(datetime.datetime.fromisoformat(v))
        elif t.is_decimal:
            import decimal
            b.append(decimal.Decimal(v))
        else:
            b.append(v)
    return b.finish()


def read_csv(source: Union[str, bytes, io.IOBase],
             options: Optional[ReadOptions] = None) -> Table:
    opts = options or ReadOptions()
    if isinstance(source, (bytes, bytearray)):
        f = io.StringIO(source.decode("utf-8"))
    elif isinstance(source, str):
        f = open(source, "r", newline="")
    elif isinstance(source, io.TextIOBase):
        f = source
    else:
        f = io.TextIOWrapper(source, "utf-8")

    rows = _csv.reader(f, delimiter=opts.delimiter)
    for _ in range(opts.skip_rows):
        next(rows, None)
    it = iter(rows)
    if opts.comment:
        it = (r for r in it if not (r and r[0].startswith(opts.comment)))

    if opts.has_header:
        header = next(it, None)
        if header is None:
            raise ArrowInvalid("empty csv input")
        names = opts.column_names or header
    else:
        first = next(it, None)
        if first is None and opts.schema is None:
            raise ArrowInvalid("empty csv input and no schema")
        names = opts.column_names or (
            opts.schema.names if opts.schema else
            [f"f{i}" for i in range(len(first))])
        if first is not None:
            it = iter([first] + list(it))

    batch = _rows_to_batch(list(it), names, opts, None)
    return Table.from_batches([batch])


def _rows_to_batch(rows, names, opts: ReadOptions,
                   fixed_schema: Optional[dt.Schema]) -> RecordBatch:
    """Convert raw csv rows to a RecordBatch. `fixed_schema` pins the output
    schema (streaming: inferred from the first chunk)."""
    nulls = set(opts.null_values)
    keep = (set(opts.include_columns)
            if opts.include_columns is not None else None)
    columns: List[List[Optional[str]]] = [[] for _ in names]
    raw_columns: List[List[Optional[str]]] = [[] for _ in names]
    for row in rows:
        if not row:
            continue
        for i in range(len(names)):
            v = row[i] if i < len(row) else None
            raw_columns[i].append(v)
            columns[i].append(None if v is None or v in nulls else v)

    out_cols, fields = [], []
    for i, name in enumerate(names):
        if keep is not None and name not in keep:
            continue
        if fixed_schema is not None:
            t = fixed_schema.field_by_name(name).type
        else:
            t = opts.type_for(name)
            if t is None:
                t = _infer_column_type(columns[i], opts)
                if t.id == dt.TypeId.NULL:
                    t = dt.string
        vals = columns[i]
        if t.id in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING,
                    dt.TypeId.BINARY) and not opts.strings_can_be_null:
            # pyarrow semantics: null spellings only null out non-string
            # columns unless strings_can_be_null
            vals = [r if r is not None else o
                    for r, o in zip(vals, raw_columns[i])]
        arr = _convert_column(vals, t, opts)
        out_cols.append(arr)
        fields.append(dt.Field(name, t))
    n = len(out_cols[0]) if out_cols else 0
    return RecordBatch(dt.Schema(fields), out_cols, n)


class CSVReader:
    """Streaming csv reader yielding RecordBatches of `chunk_size` rows
    (reference csv.Reader with WithChunk, arrow/csv/reader.go:108). The
    output schema is inferred from (or provided for) the first chunk and
    pinned for the rest of the stream."""

    def __init__(self, source, options: Optional[ReadOptions] = None):
        self.opts = options or ReadOptions()
        opts = self.opts
        if isinstance(source, (bytes, bytearray)):
            f = io.StringIO(bytes(source).decode("utf-8"))
        elif isinstance(source, str):
            f = open(source, "r", newline="")
        elif isinstance(source, io.TextIOBase):
            f = source
        else:
            f = io.TextIOWrapper(source, "utf-8")
        self._f = f
        rows = _csv.reader(f, delimiter=opts.delimiter)
        for _ in range(opts.skip_rows):
            next(rows, None)
        it = iter(rows)
        if opts.comment:
            it = (r for r in it if not (r and r[0].startswith(opts.comment)))
        if opts.has_header:
            header = next(it, None)
            if header is None:
                raise ArrowInvalid("empty csv input")
            self._names = opts.column_names or header
        else:
            first = next(it, None)
            if first is None and opts.schema is None:
                raise ArrowInvalid("empty csv input and no schema")
            self._names = opts.column_names or (
                opts.schema.names if opts.schema else
                [f"f{i}" for i in range(len(first))])
            if first is not None:
                it = _chain_one(first, it)
        self._it = it
        self._schema: Optional[dt.Schema] = None

    @property
    def schema(self) -> Optional[dt.Schema]:
        return self._schema

    def read_next_batch(self) -> Optional[RecordBatch]:
        rows = []
        for row in self._it:
            rows.append(row)
            if len(rows) >= self.opts.chunk_size:
                break
        if not rows:
            return None
        batch = _rows_to_batch(rows, self._names, self.opts, self._schema)
        if self._schema is None:
            self._schema = batch.schema
        return batch

    def __iter__(self):
        while True:
            b = self.read_next_batch()
            if b is None:
                return
            yield b

    def read_all(self) -> Table:
        batches = list(self)
        if not batches:
            raise ArrowInvalid("empty csv input")
        return Table.from_batches(batches)

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _chain_one(first, it):
    yield first
    yield from it


def open_csv(source, options: Optional[ReadOptions] = None) -> CSVReader:
    return CSVReader(source, options)


@dataclass
class WriteOptions:
    delimiter: str = ","
    include_header: bool = True
    null_string: str = ""                   # reference WithNullWriter
    crlf: bool = False                      # WithCRLF
    bool_formatter: Optional[object] = None  # WithBoolWriter


def write_csv(data: Union[Table, RecordBatch], sink,
              options: Optional[WriteOptions] = None) -> None:
    opts = options or WriteOptions()
    if isinstance(data, Table):
        batches = data.to_batches()
        schema = data.schema
    else:
        batches, schema = [data], data.schema

    own = False
    if isinstance(sink, str):
        f = open(sink, "w", newline="")
        own = True
    elif isinstance(sink, io.TextIOBase):
        f = sink
    else:
        f = io.TextIOWrapper(sink, "utf-8")
    w = _csv.writer(f, delimiter=opts.delimiter,
                    lineterminator="\r\n" if opts.crlf else "\n")
    if opts.include_header:
        w.writerow(schema.names)
    bool_fmt = opts.bool_formatter or (lambda b: "true" if b else "false")
    for rb in batches:
        cols = [c.to_pylist() for c in rb.columns]
        for row in zip(*cols):
            w.writerow([opts.null_string if v is None
                        else (bool_fmt(v) if isinstance(v, bool)
                              else _fmt(v))
                        for v in row])
    f.flush()
    if own:
        f.close()
    elif isinstance(f, io.TextIOWrapper) and not isinstance(sink, io.TextIOBase):
        f.detach()


def _fmt(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, float):
        return repr(v)
    return v
