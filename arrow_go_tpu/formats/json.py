"""Line-delimited JSON reader/writer (reference arrow/array/json_reader.go
and the arrjson integration format's record-level semantics)."""
from __future__ import annotations

import io
import json as _json
from dataclasses import dataclass
from typing import List, Optional, Union

from .. import dtypes as dt
from ..array.arrays import Array, array as from_py
from ..array.builders import infer_type, make_builder
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid


@dataclass
class ReadOptions:
    schema: Optional[dt.Schema] = None


def read_json(source: Union[str, bytes, io.IOBase],
              options: Optional[ReadOptions] = None) -> Table:
    """Read newline-delimited JSON objects into a Table."""
    opts = options or ReadOptions()
    if isinstance(source, (bytes, bytearray)):
        text = source.decode("utf-8")
    elif isinstance(source, str):
        with open(source) as f:
            text = f.read()
    else:
        raw = source.read()
        text = raw.decode("utf-8") if isinstance(raw, bytes) else raw

    records = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        records.append(_json.loads(line))

    if opts.schema is not None:
        schema = opts.schema
    else:
        keys: List[str] = []
        for r in records:
            for k in r:
                if k not in keys:
                    keys.append(k)
        fields = []
        for k in keys:
            vals = [r.get(k) for r in records]
            fields.append(dt.Field(k, infer_type(vals)))
        schema = dt.Schema(fields)

    cols = []
    for f in schema.fields:
        b = make_builder(f.type)
        for r in records:
            v = r.get(f.name)
            if v is None:
                b.append_null()
            else:
                b.append(v)
        cols.append(b.finish())
    return Table.from_batches(
        [RecordBatch(schema, cols, len(records))])


def write_json(data: Union[Table, RecordBatch], sink) -> None:
    """Write newline-delimited JSON objects."""
    rows = data.to_pydict()
    names = list(rows.keys())
    out = io.StringIO()
    n = len(rows[names[0]]) if names else 0
    for i in range(n):
        obj = {k: _jsonable(rows[k][i]) for k in names}
        out.write(_json.dumps(obj) + "\n")
    text = out.getvalue()
    if isinstance(sink, str):
        with open(sink, "w") as f:
            f.write(text)
    elif isinstance(sink, io.TextIOBase):
        sink.write(text)
    else:
        sink.write(text.encode("utf-8"))


def _jsonable(v):
    import decimal
    import numpy as np
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, tuple):
        return [_jsonable(x) for x in v]
    return v
