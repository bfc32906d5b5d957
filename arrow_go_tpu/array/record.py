"""RecordBatch / ChunkedArray / Column / Table
(reference arrow/record.go:26, arrow/table.go:30,65,135)."""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Union

import numpy as np

from .. import dtypes as dt
from .arrays import Array, array as make_from_py


class RecordBatch:
    """Schema + equal-length columns."""

    def __init__(self, schema: dt.Schema, columns: Sequence[Array],
                 num_rows: Optional[int] = None):
        if len(schema) != len(columns):
            raise ValueError("schema/column count mismatch")
        if num_rows is None:
            num_rows = len(columns[0]) if columns else 0
        for f, c in zip(schema.fields, columns):
            if len(c) != num_rows:
                raise ValueError(f"column {f.name} length {len(c)} != {num_rows}")
            if c.type != f.type:
                raise ValueError(f"column {f.name} type {c.type} != schema {f.type}")
        self._schema = schema
        self._columns = list(columns)
        self._num_rows = num_rows

    @staticmethod
    def from_arrays(columns: Sequence[Array], names: Sequence[str],
                    metadata: dt.Metadata = dt.EMPTY_METADATA) -> "RecordBatch":
        fields = [dt.Field(n, c.type, True) for n, c in zip(names, columns)]
        return RecordBatch(dt.Schema(fields, metadata), columns)

    @staticmethod
    def from_pydict(data: Dict[str, object],
                    schema: Optional[dt.Schema] = None) -> "RecordBatch":
        if schema is not None:
            cols = [make_from_py(v, t) for v, t in zip(data.values(), schema.types)]
            return RecordBatch(schema, cols)
        cols = [make_from_py(v) for v in data.values()]
        return RecordBatch.from_arrays(cols, list(data.keys()))

    @property
    def schema(self) -> dt.Schema:
        return self._schema

    @property
    def num_rows(self) -> int:
        return self._num_rows

    @property
    def num_columns(self) -> int:
        return len(self._columns)

    @property
    def columns(self) -> List[Array]:
        return list(self._columns)

    def column(self, i: Union[int, str]) -> Array:
        if isinstance(i, str):
            idx = self._schema.field_index(i)
            if idx < 0:
                raise KeyError(i)
            i = idx
        return self._columns[i]

    def __getitem__(self, key) -> Array:
        return self.column(key)

    def column_name(self, i: int) -> str:
        return self._schema.field(i).name

    def slice(self, offset: int, length: Optional[int] = None) -> "RecordBatch":
        if length is None:
            length = self._num_rows - offset
        return RecordBatch(self._schema,
                           [c.slice(offset, length) for c in self._columns], length)

    def select(self, names: Sequence[str]) -> "RecordBatch":
        idxs = [self._schema.field_index(n) for n in names]
        fields = [self._schema.field(i) for i in idxs]
        return RecordBatch(dt.Schema(fields, self._schema.metadata),
                           [self._columns[i] for i in idxs], self._num_rows)

    def set_column(self, i: int, field: dt.Field, col: Array) -> "RecordBatch":
        cols = list(self._columns)
        cols[i] = col
        return RecordBatch(self._schema.set_field(i, field), cols, self._num_rows)

    def add_column(self, i: int, field: dt.Field, col: Array) -> "RecordBatch":
        cols = list(self._columns)
        cols.insert(i, col)
        return RecordBatch(self._schema.add_field(i, field), cols, self._num_rows)

    def to_pydict(self) -> Dict[str, list]:
        return {self.column_name(i): c.to_pylist()
                for i, c in enumerate(self._columns)}

    def to_pylist(self) -> List[dict]:
        d = self.to_pydict()
        return [dict(zip(d.keys(), row)) for row in zip(*d.values())] if d else []

    def equals(self, other: "RecordBatch", check_metadata: bool = False) -> bool:
        if not self._schema.equals(other._schema, check_metadata):
            return False
        return all(a.equals(b) for a, b in zip(self._columns, other._columns))

    def __eq__(self, other):
        if isinstance(other, RecordBatch):
            return self.equals(other)
        return NotImplemented

    def __repr__(self):
        return f"RecordBatch({self._schema}, num_rows={self._num_rows})"


class ChunkedArray:
    """List of same-type chunks viewed as one logical array
    (reference arrow.Chunked, arrow/table.go:135)."""

    def __init__(self, chunks: Sequence[Array], type: Optional[dt.DataType] = None):
        chunks = [c for c in chunks]
        if type is None:
            if not chunks:
                raise ValueError("need type for empty chunked array")
            type = chunks[0].type
        for c in chunks:
            if c.type != type:
                raise ValueError("chunk type mismatch")
        self._chunks = chunks
        self._type = type

    @property
    def type(self) -> dt.DataType:
        return self._type

    @property
    def chunks(self) -> List[Array]:
        return list(self._chunks)

    @property
    def num_chunks(self) -> int:
        return len(self._chunks)

    def chunk(self, i: int) -> Array:
        return self._chunks[i]

    def __len__(self) -> int:
        return sum(len(c) for c in self._chunks)

    @property
    def length(self) -> int:
        return len(self)

    @property
    def null_count(self) -> int:
        return sum(c.null_count for c in self._chunks)

    def combine(self) -> Array:
        from .concat import concat_arrays
        if len(self._chunks) == 1:
            return self._chunks[0]
        return concat_arrays(self._chunks, self._type)

    def slice(self, offset: int, length: Optional[int] = None) -> "ChunkedArray":
        if length is None:
            length = len(self) - offset
        out = []
        for c in self._chunks:
            if length <= 0:
                break
            n = len(c)
            if offset >= n:
                offset -= n
                continue
            take = min(n - offset, length)
            out.append(c.slice(offset, take))
            length -= take
            offset = 0
        return ChunkedArray(out, self._type)

    def __getitem__(self, i: int):
        if i < 0:
            i += len(self)
        for c in self._chunks:
            if i < len(c):
                return c[i]
            i -= len(c)
        raise IndexError(i)

    def to_pylist(self) -> list:
        out = []
        for c in self._chunks:
            out.extend(c.to_pylist())
        return out

    def equals(self, other: "ChunkedArray") -> bool:
        return self._type == other._type and self.to_pylist() == other.to_pylist()

    def __repr__(self):
        return f"ChunkedArray({self._type}, chunks={self.num_chunks}, len={len(self)})"


class Column:
    """Field + chunked data (reference arrow.Column, table.go:65)."""

    def __init__(self, field: dt.Field, data: ChunkedArray):
        if field.type != data.type:
            raise ValueError("field/data type mismatch")
        self.field = field
        self.data = data

    @property
    def name(self) -> str:
        return self.field.name

    @property
    def type(self) -> dt.DataType:
        return self.field.type

    def __len__(self):
        return len(self.data)


class Table:
    """Schema + chunked columns (reference arrow.Table, table.go:30)."""

    def __init__(self, schema: dt.Schema, columns: Sequence[ChunkedArray],
                 num_rows: Optional[int] = None):
        if len(schema) != len(columns):
            raise ValueError("schema/column count mismatch")
        if num_rows is None:
            num_rows = len(columns[0]) if columns else 0
        self._schema = schema
        self._columns = list(columns)
        self._num_rows = num_rows

    @staticmethod
    def from_batches(batches: Sequence[RecordBatch],
                     schema: Optional[dt.Schema] = None) -> "Table":
        if schema is None:
            if not batches:
                raise ValueError("need schema for empty table")
            schema = batches[0].schema
        cols = []
        for i in range(len(schema)):
            cols.append(ChunkedArray([b.column(i) for b in batches],
                                     schema.field(i).type))
        return Table(schema, cols, sum(b.num_rows for b in batches))

    @staticmethod
    def from_arrays(columns: Sequence[Array], names: Sequence[str]) -> "Table":
        fields = [dt.Field(n, c.type) for n, c in zip(names, columns)]
        return Table(dt.Schema(fields),
                     [ChunkedArray([c]) for c in columns])

    @staticmethod
    def from_pydict(data: Dict[str, object], schema: Optional[dt.Schema] = None) -> "Table":
        rb = RecordBatch.from_pydict(data, schema)
        return Table.from_batches([rb])

    @property
    def schema(self) -> dt.Schema:
        return self._schema

    @property
    def num_rows(self) -> int:
        return self._num_rows

    @property
    def num_columns(self) -> int:
        return len(self._columns)

    def column(self, i: Union[int, str]) -> ChunkedArray:
        if isinstance(i, str):
            i = self._schema.field_index(i)
        return self._columns[i]

    def __getitem__(self, key) -> ChunkedArray:
        return self.column(key)

    def slice(self, offset: int, length: Optional[int] = None) -> "Table":
        if length is None:
            length = self._num_rows - offset
        return Table(self._schema, [c.slice(offset, length) for c in self._columns],
                     length)

    def select(self, names: Sequence[str]) -> "Table":
        idxs = [self._schema.field_index(n) for n in names]
        return Table(dt.Schema([self._schema.field(i) for i in idxs]),
                     [self._columns[i] for i in idxs], self._num_rows)

    def combine_chunks(self) -> "Table":
        return Table(self._schema,
                     [ChunkedArray([c.combine()], c.type) for c in self._columns],
                     self._num_rows)

    def to_batches(self, max_chunksize: Optional[int] = None) -> List[RecordBatch]:
        t = self.combine_chunks()
        cols = [c.chunk(0) for c in t._columns]
        if max_chunksize is None or self._num_rows <= max_chunksize:
            return [RecordBatch(self._schema, cols, self._num_rows)]
        out = []
        for start in range(0, self._num_rows, max_chunksize):
            n = min(max_chunksize, self._num_rows - start)
            out.append(RecordBatch(self._schema,
                                   [c.slice(start, n) for c in cols], n))
        return out

    def to_pydict(self) -> Dict[str, list]:
        return {f.name: c.to_pylist() for f, c in zip(self._schema.fields, self._columns)}

    def equals(self, other: "Table") -> bool:
        return (self._schema.equals(other._schema)
                and self.to_pydict() == other.to_pydict())

    def __repr__(self):
        return f"Table({self._schema}, num_rows={self._num_rows})"


def record_batch(data, names=None, schema=None) -> RecordBatch:
    if isinstance(data, dict):
        return RecordBatch.from_pydict(data, schema)
    return RecordBatch.from_arrays(data, names)


def table(data, names=None, schema=None) -> Table:
    if isinstance(data, dict):
        return Table.from_pydict(data, schema)
    return Table.from_arrays(data, names)
