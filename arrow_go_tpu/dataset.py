"""Dataset scan layer: multi-file tables with projection + predicate
pushdown feeding the device compute engine.

The reference's user-pipeline layer is ad-hoc (pqarrow.ReadTable + manual
compute calls); the TPU build ties it together: a Dataset scans parquet /
ipc / csv fragments, prunes parquet row groups via stats+bloom, then
evaluates the residual filter as ONE fused device expression per batch
(compute/expression.py) before materializing.
"""
from __future__ import annotations

import glob as _glob
import os
from typing import List, Optional, Sequence, Tuple, Union

from . import dtypes as dt
from .array.record import RecordBatch, Table
from .compute.errors import ArrowInvalid
from .compute import expression as ex


def _simple_guards(expr) -> List[Tuple[str, str, object]]:
    """Extract (col, op, literal) conjuncts usable for row-group pruning."""
    out: List[Tuple[str, str, object]] = []

    def walk(e):
        if isinstance(e, ex.Call):
            if e.function in ("and", "and_kleene"):
                walk(e.args[0])
                walk(e.args[1])
                return
            ops = {"equal": "==", "less": "<", "less_equal": "<=",
                   "greater": ">", "greater_equal": ">="}
            if e.function in ops and len(e.args) == 2:
                a, b = e.args
                if isinstance(a, ex.FieldRef) and isinstance(b, ex.Literal) \
                        and len(a.path) == 1:
                    out.append((a.path[0], ops[e.function], b.value))
                elif isinstance(b, ex.FieldRef) and isinstance(a, ex.Literal) \
                        and len(b.path) == 1:
                    flip = {"==": "==", "<": ">", "<=": ">=", ">": "<",
                            ">=": "<="}
                    out.append((b.path[0], flip[ops[e.function]], a.value))
    walk(expr)
    return out


class Fragment:
    """One scannable file."""

    def __init__(self, path: str):
        self.path = path

    def schema(self) -> dt.Schema:
        raise NotImplementedError

    def scan(self, columns, guards,
             use_threads: bool = True) -> List[RecordBatch]:
        raise NotImplementedError


class ParquetFragment(Fragment):
    def schema(self) -> dt.Schema:
        from . import parquet
        return parquet.ParquetFile(self.path).schema

    def scan(self, columns, guards,
             use_threads: bool = True) -> List[RecordBatch]:
        from . import parquet
        t = parquet.ParquetFile(self.path).read_table(
            columns, guards or None, use_threads=use_threads)
        return t.to_batches() if t.num_rows else []


class IpcFragment(Fragment):
    def schema(self) -> dt.Schema:
        from . import ipc
        with open(self.path, "rb") as f:
            return ipc.open_file(f).schema

    def scan(self, columns, guards,
             use_threads: bool = True) -> List[RecordBatch]:
        from . import ipc
        with open(self.path, "rb") as f:
            t = ipc.open_file(f).read_all()
        if columns:
            t = t.select(columns)
        return t.to_batches() if t.num_rows else []


class CsvFragment(Fragment):
    def schema(self) -> dt.Schema:
        from .formats import read_csv
        return read_csv(self.path).schema

    def scan(self, columns, guards,
             use_threads: bool = True) -> List[RecordBatch]:
        from .formats import read_csv
        t = read_csv(self.path)
        if columns:
            t = t.select(columns)
        return t.to_batches() if t.num_rows else []


_FRAGMENTS = {".parquet": ParquetFragment, ".pq": ParquetFragment,
              ".arrow": IpcFragment, ".feather": IpcFragment,
              ".csv": CsvFragment}


class Dataset:
    """A collection of same-schema file fragments."""

    def __init__(self, paths: Union[str, Sequence[str]],
                 format: Optional[str] = None):
        if isinstance(paths, str):
            if os.path.isdir(paths):
                paths = sorted(
                    p for p in _glob.glob(os.path.join(paths, "**", "*"),
                                          recursive=True)
                    if os.path.splitext(p)[1] in _FRAGMENTS)
            else:
                paths = sorted(_glob.glob(paths)) or [paths]
        self.fragments: List[Fragment] = []
        for p in paths:
            ext = os.path.splitext(p)[1]
            if format:
                cls = _FRAGMENTS["." + format.lstrip(".")]
            else:
                cls = _FRAGMENTS.get(ext)
            if cls is None:
                raise ArrowInvalid(f"unknown fragment format: {p}")
            self.fragments.append(cls(p))
        if not self.fragments:
            raise ArrowInvalid("empty dataset")
        self._schema = self.fragments[0].schema()

    @property
    def schema(self) -> dt.Schema:
        return self._schema

    def scanner(self, columns: Optional[List[str]] = None,
                filter: Optional[ex.Expression] = None,
                use_threads: bool = True) -> "Scanner":
        return Scanner(self, columns, filter, use_threads)

    def to_table(self, columns: Optional[List[str]] = None,
                 filter: Optional[ex.Expression] = None,
                 use_threads: bool = True) -> Table:
        return self.scanner(columns, filter, use_threads).to_table()

    def count_rows(self, filter: Optional[ex.Expression] = None) -> int:
        return self.scanner(None, filter).to_table().num_rows


class Scanner:
    def __init__(self, dataset: Dataset, columns, filter,
                 use_threads: bool = True):
        self.dataset = dataset
        self.columns = columns
        self.filter = filter
        self.use_threads = use_threads
        self._guards = _simple_guards(filter) if filter is not None else []

    def _needed_columns(self) -> Optional[List[str]]:
        if self.columns is None:
            return None
        need = set(self.columns)
        if self.filter is not None:
            def refs(e):
                if isinstance(e, ex.FieldRef):
                    need.add(e.path[0])
                elif isinstance(e, ex.Call):
                    for a in e.args:
                        refs(a)
            refs(self.filter)
        return [f.name for f in self.dataset.schema.fields if f.name in need]

    def _fragment_batches(self, cols):
        """Per-fragment record batches, in fragment order. With
        use_threads, fragments are scanned by a worker pool with a
        bounded prefetch window (the fragment-level analog of the
        parquet reader's column fan-out); the residual device filter
        stays on the calling thread."""
        frags = self.dataset.fragments
        if not self.use_threads or len(frags) < 2:
            for frag in frags:
                yield from frag.scan(cols, self._guards)
            return
        # fragment-level fan-out: disable the nested per-column pool so a
        # many-file scan doesn't oversubscribe the host
        from concurrent.futures import ThreadPoolExecutor
        nworkers = min(len(frags), os.cpu_count() or 4)
        with ThreadPoolExecutor(max_workers=nworkers) as pool:
            window = []
            it = iter(frags)
            for frag in it:
                window.append(pool.submit(frag.scan, cols, self._guards,
                                          False))
                if len(window) >= nworkers * 2:   # bounded prefetch
                    yield from window.pop(0).result()
            for fut in window:
                yield from fut.result()

    def batches(self):
        from . import compute as pc
        cols = self._needed_columns()
        for rb in self._fragment_batches(cols):
            if self.filter is not None:
                mask = pc.execute_scalar_expression(self.filter, rb)
                rb = pc.filter(rb, mask)
            if self.columns is not None:
                rb = rb.select(self.columns)
            if rb.num_rows:
                yield rb

    def device_batches(self):
        """Yield DeviceBatch per row group / fragment batch — the device
        pipeline entry point. Parquet fragments take the in-HBM page
        decode fast path (parquet/device_read.py) when the column set
        supports it; everything else decodes on host and ships via
        to_device. The residual filter/projection stay with the caller's
        device program (they fuse there; this is ingest only)."""
        from .device.block import batch_to_device
        from .parquet.device_read import read_batch_device
        cols = self._needed_columns()
        for frag in self.dataset.fragments:
            if isinstance(frag, ParquetFragment):
                from . import parquet as _pq
                pf = _pq.ParquetFile(frag.path)
                keep = range(pf.num_row_groups)
                if self._guards:
                    keep = [i for i in keep
                            if pf._row_group_may_match(i, self._guards)]
                from .compute.errors import ArrowInvalid, ArrowNotImplemented
                for rg in keep:
                    try:
                        yield read_batch_device(pf, rg, columns=cols)
                    except (ArrowNotImplemented, ArrowInvalid):
                        # nested/encrypted/plain-string columns: host decode
                        # (nested columns have no flat leaf -> ArrowInvalid)
                        yield batch_to_device(pf.read_row_group(rg, cols))
            else:
                for rb in frag.scan(cols, self._guards):
                    yield batch_to_device(rb)

    def to_table(self) -> Table:
        batches = list(self.batches())
        if not batches:
            sch = self.dataset.schema
            if self.columns is not None:
                sch = dt.Schema([f for f in sch.fields
                                 if f.name in self.columns])
            from .array.record import ChunkedArray
            return Table(sch, [ChunkedArray([], f.type) for f in sch.fields], 0)
        return Table.from_batches(batches)


def dataset(paths, format: Optional[str] = None) -> Dataset:
    return Dataset(paths, format)
