"""Parquet file reader (reference parquet/file/file_reader.go:51 footer
parse, page_reader.go serializedPageReader, column_reader.go typed
ReadBatch, pqarrow/file_reader.go arrow assembly)."""
from __future__ import annotations

import io
import os
import struct
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import BinaryIO, List, Optional, Tuple, Union

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, from_numpy, make_array, take_host
from ..array.record import ChunkedArray, RecordBatch, Table
from ..compute.errors import ArrowInvalid, ArrowNotImplemented
from ..memory import bitutil
from ..memory.buffer import Buffer
from . import compress as comp
from . import encodings as enc
from . import encryption as encm
from . import format as fmt
from . import levels as lv
from . import schema as psch
from .thrift import CompactReader

MAGIC = b"PAR1"
MAGIC_ENCRYPTED = b"PARE"

DEFAULT_BUF_SIZE = 4096  # reference parquet.DefaultBufSize

# threaded reads only when each work cell has at least this much
# compressed input — below it pool startup + GIL contention dominate
_MIN_TASK_BYTES = 512 * 1024


class ReaderProperties:
    """Reference parquet.ReaderProperties (reader_properties.go:37).

    buffer_size / buffered_stream control how column-chunk sections are
    staged: buffered_stream=False slurps each chunk's byte range into
    memory in one read; True streams pages from the file in buffer_size
    reads (reference GetStream, reader_properties.go:123)."""

    def __init__(self, buffer_size: int = DEFAULT_BUF_SIZE,
                 buffered_stream: bool = False,
                 decryption: Optional[encm.FileDecryptionProperties] = None):
        self.buffer_size = buffer_size
        self.buffered_stream = buffered_stream
        self.decryption = decryption


class ParquetFile:
    """Random-access parquet reader."""

    def __init__(self, source: Union[str, BinaryIO, bytes],
                 decryption: Optional[encm.FileDecryptionProperties] = None,
                 properties: Optional[ReaderProperties] = None):
        self.properties = properties or ReaderProperties()
        if decryption is None:
            decryption = self.properties.decryption
        if isinstance(source, str):
            source = open(source, "rb")
        elif isinstance(source, (bytes, bytearray, memoryview)):
            source = io.BytesIO(bytes(source))
        self.src = source
        # one file handle shared by all column readers: seek+read pairs are
        # serialized (the reference instead re-sections the reader per chunk,
        # parquet/reader_properties.go:115-131; decompress+decode — the hot
        # part — still runs in parallel outside the lock)
        self._src_lock = threading.Lock()
        self.src.seek(0, 2)
        size = self.src.tell()
        if size < 12:
            raise ArrowInvalid("file too small for parquet")
        self.src.seek(0)
        if self.src.read(4) not in (MAGIC, MAGIC_ENCRYPTED):
            raise ArrowInvalid("bad parquet magic")
        self.src.seek(size - 8)
        tail = self.src.read(8)
        if tail[4:] not in (MAGIC, MAGIC_ENCRYPTED):
            raise ArrowInvalid("bad parquet trailing magic")
        (flen,) = struct.unpack("<I", tail[:4])
        self.src.seek(size - 8 - flen)
        footer = self.src.read(flen)
        self._decryption = decryption
        self._file_aad = b""
        self._gcm_pages = True
        self._footer_key: Optional[bytes] = None
        if tail[4:] == MAGIC_ENCRYPTED:
            self.metadata = self._decrypt_footer(footer)
        else:
            self.metadata: fmt.FileMetaData = CompactReader(
                footer).read_struct(fmt.FileMetaData)
            if self.metadata.encryption_algorithm is not None:
                self._setup_plaintext_footer_crypto(footer)
        self._col_crypto = {}
        if self._file_aad:
            self._resolve_column_crypto()
        self.schema, self.leaves = psch.elements_to_schema(self.metadata.schema)
        kv = self.metadata.key_value_metadata or []
        if kv:
            md = dt.Metadata(keys=[e.key for e in kv],
                             values=[e.value or "" for e in kv])
            self.schema = self.schema.with_metadata(md)

    # -- modular encryption (reference parquet/file/file_reader.go +
    #    internal/encryption/decryptor.go) --------------------------------

    def _algo_setup(self, algo: fmt.EncryptionAlgorithm) -> None:
        a = algo.AES_GCM_V1 or algo.AES_GCM_CTR_V1
        self._gcm_pages = algo.AES_GCM_V1 is not None
        prefix = a.aad_prefix or b""
        if a.supply_aad_prefix:
            if self._decryption is None or not self._decryption.aad_prefix:
                raise ArrowInvalid("file requires the caller to supply the "
                                   "AAD prefix")
            prefix = self._decryption.aad_prefix
        self._file_aad = bytes(prefix) + bytes(a.aad_file_unique or b"")

    def _decrypt_footer(self, blob: bytes) -> fmt.FileMetaData:
        if self._decryption is None:
            raise ArrowInvalid("encrypted-footer parquet file: pass "
                               "decryption=FileDecryptionProperties(...)")
        rd = CompactReader(blob)
        fcmd = rd.read_struct(fmt.FileCryptoMetaData)
        self._algo_setup(fcmd.encryption_algorithm)
        self._footer_key = self._decryption.footer_key_for(
            fcmd.key_metadata or b"")
        pt, _ = encm.decrypt_module(
            self._footer_key, encm.footer_aad(self._file_aad), blob, rd.pos)
        return CompactReader(pt).read_struct(fmt.FileMetaData)

    def _setup_plaintext_footer_crypto(self, footer: bytes) -> None:
        """Plaintext footer of an encrypted file: columns may be encrypted;
        footer is signed (nonce+tag appended before the length)."""
        self._algo_setup(self.metadata.encryption_algorithm)
        if self._decryption is None:
            return  # metadata-only / plaintext-column access still allowed
        try:
            self._footer_key = self._decryption.footer_key_for(
                self.metadata.footer_signing_key_metadata or b"")
        except ArrowInvalid:
            self._footer_key = None
        if (self._footer_key is not None
                and self._decryption.check_plaintext_footer_integrity):
            sig_len = encm.NONCE_LEN + encm.TAG_LEN
            plain, sig = footer[:-sig_len], footer[-sig_len:]
            if not encm.verify_footer_signature(
                    self._footer_key, encm.footer_aad(self._file_aad),
                    plain, sig):
                raise ArrowInvalid("plaintext footer signature verification "
                                   "failed")

    def _resolve_column_crypto(self) -> None:
        """Build {(rg, col) -> ctx} and splice decrypted column metadata
        back into the chunks (reference metadata/column_chunk.go:95)."""
        for rg_i, rg in enumerate(self.metadata.row_groups or []):
            rg_ord = rg.ordinal if rg.ordinal is not None else rg_i
            for li, chunk in enumerate(rg.columns or []):
                cm = chunk.crypto_metadata
                if cm is None:
                    continue
                # missing keys surface on column ACCESS, not file open —
                # plaintext columns of a partially-encrypted file stay
                # readable without any keys
                try:
                    if cm.ENCRYPTION_WITH_COLUMN_KEY is not None:
                        ck = cm.ENCRYPTION_WITH_COLUMN_KEY
                        if self._decryption is None:
                            raise ArrowInvalid(
                                "encrypted column without decryption "
                                "properties")
                        path = ".".join(ck.path_in_schema or [])
                        key = self._decryption.column_key_for(
                            path, ck.key_metadata or b"")
                    else:
                        if self._footer_key is None:
                            raise ArrowInvalid(
                                "column encrypted with footer key but no "
                                "footer key available")
                        key = self._footer_key
                except ArrowInvalid as e:
                    self._col_crypto[(rg_i, li)] = e
                    continue
                ctx = encm._ColumnCryptoContext(key, self._file_aad, rg_ord,
                                                li, self._gcm_pages)
                self._col_crypto[(rg_i, li)] = ctx
                if chunk.encrypted_column_metadata:
                    pt, _ = encm.decrypt_module(
                        key, ctx.aad(encm.COLUMN_META_MODULE),
                        chunk.encrypted_column_metadata)
                    chunk.meta_data = CompactReader(pt).read_struct(
                        fmt.ColumnMetaData)

    @property
    def num_rows(self) -> int:
        return self.metadata.num_rows or 0

    @property
    def num_row_groups(self) -> int:
        return len(self.metadata.row_groups or [])

    def read_rows(self, offset: int, num_rows: int,
                  columns: Optional[List[str]] = None) -> Table:
        """Read a contiguous row range [offset, offset+num_rows) — the
        SeekToRow analog (reference parquet/file/row_group_reader.go
        SeekToRow + column_reader record skipping). Row groups outside the
        range are never touched; inside a group, flat-column pages wholly
        outside the range are skipped without decompression when their row
        counts place them out of range."""
        batches: List[RecordBatch] = []
        row0 = 0
        for i, rg in enumerate(self.metadata.row_groups or []):
            n = rg.num_rows or 0
            lo = max(offset, row0)
            hi = min(offset + num_rows, row0 + n)
            if lo < hi:
                batches.append(self.read_row_group(
                    i, columns, row_range=(lo - row0, hi - lo)))
            row0 += n
        if not batches:
            sch = self.schema if columns is None else dt.Schema(
                [f for f in self.schema.fields if f.name in columns],
                self.schema.metadata)
            return Table(sch, [ChunkedArray([], f.type) for f in sch.fields], 0)
        return Table.from_batches(batches)

    def _read_field(self, rg_i: int, orig_f: dt.Field, li0: int,
                    row_range: Optional[Tuple[int, int]]) -> Array:
        """Read one top-level field of one row group (all its leaf column
        chunks, starting at leaf index ``li0``) and assemble the arrow
        column — the unit of parallelism (reference pqarrow GetFieldReaders
        spawns one goroutine per field, pqarrow/file_reader.go:255-283)."""
        rg = self.metadata.row_groups[rg_i]
        f = orig_f
        if f.type.id == dt.TypeId.EXTENSION:
            f = dt.Field(f.name, f.type.storage_type, f.nullable)
        if f.type.id == dt.TypeId.MAP:
            f = lv.map_storage_field(f)
        leaf_datas = []
        for off, path in enumerate(lv.leaf_paths(f.type)):
            li = li0 + off
            desc = self.leaves[li]
            chunk = rg.columns[li]
            ctx = self._col_crypto.get((rg_i, li))
            if isinstance(ctx, Exception):
                raise ctx
            defs, reps, values, base = self._read_column_chunk(
                chunk, desc, row_range, ctx)
            pruned_f = lv.prune_field(f, path)
            if desc.max_rep_level == 0 and pruned_f.type.id not in (
                    dt.TypeId.STRUCT,):
                data = self._flat_assemble(pruned_f, desc, defs, values)
            else:
                data = lv.rebuild_nested(pruned_f, defs, reps, values)
            if row_range is not None:
                from ..array.concat import concat_arrays
                s, cnt = row_range
                # materialize at offset 0: leaves of one field may have
                # skipped different pages, merge needs aligned rows
                data = concat_arrays(
                    [make_array(data).slice(s - base, cnt)]).data
            leaf_datas.append(data)
        data = lv.merge_leaf_datas(f, leaf_datas)
        if orig_f.type.id in (dt.TypeId.MAP, dt.TypeId.EXTENSION):
            data = ArrayData(orig_f.type, data.length, data.buffers,
                             data.children, null_count=data._null_count,
                             offset=data.offset)
        return make_array(data)

    def _selected_fields(self, columns: Optional[List[str]]
                         ) -> List[Tuple[dt.Field, int]]:
        """(field, first-leaf-index) for every selected top-level field."""
        out, li = [], 0
        for f in self.schema.fields:
            g = f
            if g.type.id == dt.TypeId.EXTENSION:
                g = dt.Field(g.name, g.type.storage_type, g.nullable)
            if g.type.id == dt.TypeId.MAP:
                g = lv.map_storage_field(g)
            n_leaves = len(lv.leaf_paths(g.type))
            if columns is None or f.name in columns:
                out.append((f, li))
            li += n_leaves
        return out

    def read_row_group(self, i: int, columns: Optional[List[str]] = None,
                       row_range: Optional[Tuple[int, int]] = None,
                       use_threads: bool = True) -> RecordBatch:
        rg = self.metadata.row_groups[i]
        sel = self._selected_fields(columns)
        if use_threads and len(sel) > 1:
            total = rg.total_compressed_size or 0
            use_threads = total / len(sel) >= _MIN_TASK_BYTES
        if use_threads and len(sel) > 1:
            with ThreadPoolExecutor(
                    max_workers=min(len(sel), os.cpu_count() or 4)) as pool:
                cols = list(pool.map(
                    lambda fl: self._read_field(i, fl[0], fl[1], row_range),
                    sel))
        else:
            cols = [self._read_field(i, f, li, row_range) for f, li in sel]
        fields = [f for f, _ in sel]
        schema = dt.Schema(fields, self.schema.metadata)
        nrows = row_range[1] if row_range is not None else (rg.num_rows or 0)
        return RecordBatch(schema, cols, nrows)

    def read_table(self, columns: Optional[List[str]] = None,
                   filters: Optional[List[tuple]] = None,
                   use_threads: bool = True) -> Table:
        keep = range(self.num_row_groups)
        if filters:
            keep = [i for i in keep if self._row_group_may_match(i, filters)]
        keep = list(keep)
        sel = self._selected_fields(columns)
        fields = [f for f, _ in sel]
        schema = dt.Schema(fields, self.schema.metadata)
        if use_threads:
            # fan out only when each (row group x field) cell carries
            # enough decompress/decode work to beat pool + GIL overhead
            total = sum(self.metadata.row_groups[i].total_compressed_size
                        or 0 for i in keep)
            ntasks = max(len(keep) * len(sel), 1)
            use_threads = ntasks > 1 and total / ntasks >= _MIN_TASK_BYTES
        if use_threads:
            # one pool over ALL (row group x field) cells — the reference's
            # two-level fan-out (per-field errgroup + row-group
            # producer/consumer, pqarrow/file_reader.go:255-283,362-404)
            # flattened into a single work queue
            with ThreadPoolExecutor(
                    max_workers=min(len(keep) * len(sel),
                                    os.cpu_count() or 4)) as pool:
                cells = list(pool.map(
                    lambda t: self._read_field(t[0], t[1][0], t[1][1], None),
                    [(i, fl) for i in keep for fl in sel]))
            batches = []
            for gi, i in enumerate(keep):
                cols = cells[gi * len(sel): (gi + 1) * len(sel)]
                nrows = self.metadata.row_groups[i].num_rows or 0
                batches.append(RecordBatch(schema, cols, nrows))
        else:
            batches = [self.read_row_group(i, columns, use_threads=False)
                       for i in keep]
        if not batches:
            sch = self.schema if columns is None else dt.Schema(
                [f for f in self.schema.fields if f.name in columns],
                self.schema.metadata)
            return Table(sch, [ChunkedArray([], f.type) for f in sch.fields], 0)
        return Table.from_batches(batches)

    # -- column chunk machinery ---------------------------------------------

    def _read_column_chunk(self, chunk: fmt.ColumnChunk,
                           desc: psch.ColumnDescriptor,
                           row_range: Optional[Tuple[int, int]] = None,
                           ctx=None):
        meta = chunk.meta_data
        start = meta.dictionary_page_offset or meta.data_page_offset
        total = meta.total_compressed_size
        if self.properties.buffered_stream:
            # stream the chunk section in buffer_size reads as the page
            # loop advances (reference GetStream buffered branch,
            # reader_properties.go:123-129)
            raw = bytearray()

            def _ensure(end: int) -> None:
                need = min(end, total)
                while len(raw) < need:
                    with self._src_lock:
                        self.src.seek(start + len(raw))
                        got = self.src.read(max(self.properties.buffer_size,
                                                need - len(raw)))
                    if not got:
                        break
                    raw.extend(got)
        else:
            with self._src_lock:
                self.src.seek(start)
                raw = self.src.read(total)

            def _ensure(end: int) -> None:
                pass
        codec = meta.codec or 0

        # page skipping only when a page's row count equals its value count
        # (flat columns); nested chunks decode fully and slice records later
        skip = row_range if (row_range is not None
                             and desc.max_rep_level == 0) else None
        rows_seen = 0      # rows before the current page
        base_row = None    # first row present in the decoded parts

        pos = 0
        dictionary = None
        defs_parts, reps_parts = [], []
        values_parts: List = []
        remaining = meta.num_values
        first_page = True
        page_ord = 0  # data-page ordinal for module AADs (dict not counted)
        while remaining > 0 and pos < total:
            if ctx is not None:
                _ensure(pos + 4)
                if pos + 4 <= len(raw):
                    (_blen,) = struct.unpack_from("<I", raw, pos)
                    _ensure(pos + 4 + _blen)
            else:
                _ensure(pos + 65536)  # thrift page headers are small
            if ctx is not None:
                # header module AAD depends on page kind; only the first
                # frame can be the dictionary page
                hdr_is_dict = first_page and meta.dictionary_page_offset \
                    is not None
                h_aad = ctx.aad(encm.DICT_PAGE_HEADER_MODULE) if hdr_is_dict \
                    else ctx.aad(encm.DATA_PAGE_HEADER_MODULE, page_ord)
                hb, used = encm.decrypt_module(ctx.key, h_aad, raw, pos)
                hdr = CompactReader(hb).read_struct(fmt.PageHeader)
                pos += used
            else:
                try:
                    rd = CompactReader(raw, pos)
                    hdr = rd.read_struct(fmt.PageHeader)
                except (IndexError, struct.error):
                    _ensure(total)  # oversized header: load the rest
                    rd = CompactReader(raw, pos)
                    hdr = rd.read_struct(fmt.PageHeader)
                pos = rd.pos
            first_page = False
            comp_size = hdr.compressed_page_size
            _ensure(pos + comp_size)
            # zero-copy page window when the chunk was slurped in one
            # read (bytes); the buffered-stream bytearray must COPY —
            # a live memoryview export blocks the next _ensure resize
            # ("BufferError: Existing exports of data")
            if self.properties.buffered_stream:
                page_raw = bytes(raw[pos: pos + comp_size])
            else:
                page_raw = memoryview(raw)[pos: pos + comp_size]
            pos += comp_size
            ptype = fmt.PageType(hdr.type)
            if ctx is not None:
                if ptype == fmt.PageType.DICTIONARY_PAGE:
                    p_aad = ctx.aad(encm.DICT_PAGE_MODULE)
                else:
                    p_aad = ctx.aad(encm.DATA_PAGE_MODULE, page_ord)
                    page_ord += 1
                page_raw, _ = encm.decrypt_module(ctx.key, p_aad,
                                                  bytes(page_raw),
                                                  gcm=ctx.gcm_pages)
            if skip is not None and ptype in (fmt.PageType.DATA_PAGE,
                                              fmt.PageType.DATA_PAGE_V2):
                dph = (hdr.data_page_header if ptype == fmt.PageType.DATA_PAGE
                       else hdr.data_page_header_v2)
                nv = dph.num_values or 0
                s, cnt = skip
                if rows_seen + nv <= s or rows_seen >= s + cnt:
                    rows_seen += nv
                    remaining -= nv
                    continue
                if base_row is None:
                    base_row = rows_seen
                rows_seen += nv
            if ptype == fmt.PageType.DICTIONARY_PAGE:
                payload = comp.decompress(codec, page_raw,
                                          hdr.uncompressed_page_size)
                nv = hdr.dictionary_page_header.num_values or 0
                dictionary = enc.plain_decode(desc.physical_type, payload, nv,
                                              desc.type_length)
                continue
            if ptype == fmt.PageType.DATA_PAGE:
                payload = comp.decompress(codec, page_raw,
                                          hdr.uncompressed_page_size)
                dph = hdr.data_page_header
                nv = dph.num_values or 0
                off = 0
                reps = np.zeros(nv, np.uint32)
                defs = np.zeros(nv, np.uint32)
                if desc.max_rep_level > 0:
                    reps, used = enc.levels_decode_v1(
                        payload, nv, enc.bit_width_for(desc.max_rep_level))
                    off += used
                if desc.max_def_level > 0:
                    defs, used = enc.levels_decode_v1(
                        payload[off:], nv,
                        enc.bit_width_for(desc.max_def_level))
                    off += used
                else:
                    defs = np.zeros(nv, np.uint32)
                n_present = int((defs == desc.max_def_level).sum())
                vals = self._decode_values(
                    fmt.Encoding(dph.encoding or 0), payload[off:], n_present,
                    desc, dictionary)
                defs_parts.append(defs)
                reps_parts.append(reps)
                values_parts.append(vals)
                remaining -= nv
                continue
            if ptype == fmt.PageType.DATA_PAGE_V2:
                dph2 = hdr.data_page_header_v2
                nv = dph2.num_values or 0
                rl = dph2.repetition_levels_byte_length or 0
                dl = dph2.definition_levels_byte_length or 0
                level_raw = page_raw[: rl + dl]
                vals_raw = page_raw[rl + dl:]
                if dph2.is_compressed is not False and codec:
                    vals_raw = comp.decompress(
                        codec, vals_raw,
                        (hdr.uncompressed_page_size or 0) - rl - dl)
                reps = (enc.rle_decode(level_raw[:rl], nv,
                                       enc.bit_width_for(desc.max_rep_level))
                        if desc.max_rep_level else np.zeros(nv, np.uint32))
                defs = (enc.rle_decode(level_raw[rl:rl + dl], nv,
                                       enc.bit_width_for(desc.max_def_level))
                        if desc.max_def_level else np.zeros(nv, np.uint32))
                n_present = int((defs == desc.max_def_level).sum())
                vals = self._decode_values(
                    fmt.Encoding(dph2.encoding or 0), vals_raw, n_present,
                    desc, dictionary)
                defs_parts.append(defs)
                reps_parts.append(reps)
                values_parts.append(vals)
                remaining -= nv
                continue
            raise ArrowNotImplemented(f"page type {ptype}")

        defs = np.concatenate(defs_parts) if defs_parts else np.zeros(0, np.uint32)
        reps = np.concatenate(reps_parts) if reps_parts else np.zeros(0, np.uint32)
        values = _concat_phys(values_parts)
        arr = _physical_to_arrow(values, desc)
        return defs, reps, arr, (base_row or 0)

    def _decode_values(self, encoding: fmt.Encoding, data: bytes, n: int,
                       desc: psch.ColumnDescriptor, dictionary):
        if encoding == fmt.Encoding.PLAIN:
            return enc.plain_decode(desc.physical_type, data, n,
                                    desc.type_length)
        if encoding in (fmt.Encoding.RLE_DICTIONARY,
                        fmt.Encoding.PLAIN_DICTIONARY):
            if dictionary is None:
                raise ArrowInvalid("dictionary-encoded page without dictionary")
            if n == 0:
                return _empty_like(dictionary)
            width = data[0]
            codes = enc.rle_decode(data[1:], n, width)
            if isinstance(dictionary, np.ndarray):
                return dictionary[codes]
            return [dictionary[int(c)] for c in codes]
        if encoding == fmt.Encoding.RLE and desc.physical_type == fmt.Type.BOOLEAN:
            (ln,) = struct.unpack_from("<I", data, 0)
            return enc.rle_decode(data[4:4 + ln], n, 1).astype(np.bool_)
        if encoding == fmt.Encoding.DELTA_BINARY_PACKED:
            vals, _ = enc.delta_binary_packed_decode(data, n)
            npdt = np.int32 if desc.physical_type == fmt.Type.INT32 else np.int64
            return vals.astype(npdt)
        if encoding == fmt.Encoding.DELTA_LENGTH_BYTE_ARRAY:
            return enc.delta_length_byte_array_decode(data, n)
        if encoding == fmt.Encoding.DELTA_BYTE_ARRAY:
            return enc.delta_byte_array_decode(data, n)
        if encoding == fmt.Encoding.BYTE_STREAM_SPLIT:
            w = {fmt.Type.FLOAT: 4, fmt.Type.DOUBLE: 8, fmt.Type.INT32: 4,
                 fmt.Type.INT64: 8}.get(desc.physical_type, desc.type_length)
            raw = enc.byte_stream_split_decode(data, n, w)
            if desc.physical_type == fmt.Type.FLOAT:
                return raw.view(np.float32).ravel()
            if desc.physical_type == fmt.Type.DOUBLE:
                return raw.view(np.float64).ravel()
            if desc.physical_type == fmt.Type.INT32:
                return raw.view(np.int32).ravel()
            if desc.physical_type == fmt.Type.INT64:
                return raw.view(np.int64).ravel()
            return [raw[i].tobytes() for i in range(n)]
        raise ArrowNotImplemented(f"value encoding {encoding.name}")


def _empty_like(dictionary):
    if isinstance(dictionary, np.ndarray):
        return dictionary[:0]
    return []


def _concat_phys(parts: List):
    if not parts:
        return np.zeros(0, np.int64)
    if isinstance(parts[0], np.ndarray):
        return np.concatenate(parts) if len(parts) > 1 else parts[0]
    out = []
    for p in parts:
        out.extend(p)
    return out


def _physical_to_arrow(values, desc: psch.ColumnDescriptor) -> Array:
    """Physical decoded values -> arrow leaf array of the target type
    (present values only; validity applied during level assembly)."""
    t = desc.arrow_type
    tid = t.id
    if tid == dt.TypeId.DICTIONARY:
        inner = psch.ColumnDescriptor(desc.path, desc.physical_type,
                                      desc.type_length, desc.max_def_level,
                                      desc.max_rep_level, t.value_type,
                                      desc.schema_elements)
        decoded = _physical_to_arrow(values, inner)
        from ..array.builders import DictionaryBuilder
        b = DictionaryBuilder(t)
        b.append_values(decoded.to_pylist())
        return b.finish()
    if tid == dt.TypeId.BOOL:
        return from_numpy(np.asarray(values, dtype=np.bool_), None, t)
    if tid == dt.TypeId.TIMESTAMP and isinstance(values, np.ndarray) and \
            values.ndim == 2:  # INT96: (julian day, nanos)
        days = values[:, 8:12].copy().view(np.int32).ravel().astype(np.int64)
        nanos = values[:, 0:8].copy().view(np.int64).ravel()
        ts = (days - 2440588) * 86400_000_000_000 + nanos
        return from_numpy(ts, None, dt.timestamp("ns"))
    if t.np_dtype is not None and not t.is_decimal and isinstance(
            values, np.ndarray):
        if t.np_dtype.kind == "u":  # stored two's-complement in INT32/INT64
            u = values.view(np.uint32 if values.dtype.itemsize == 4
                            else np.uint64)
            return from_numpy(u.astype(t.np_dtype), None, t)
        return from_numpy(values.astype(t.np_dtype, copy=False),
                          None, t)
    if tid == dt.TypeId.FLOAT16:
        arr = np.frombuffer(b"".join(values), dtype=np.float16) if values else \
            np.zeros(0, np.float16)
        return from_numpy(arr, None, t)
    if t.is_decimal:
        bw = t.bit_width // 8
        if isinstance(values, np.ndarray):
            ints = [int(v) for v in values]
        else:
            ints = [int.from_bytes(v, "big", signed=True) for v in values]
        raw = b"".join(v.to_bytes(bw, "little", signed=True) for v in ints)
        return make_array(ArrayData(t, len(ints),
                                    [None, Buffer.from_bytes(raw)],
                                    null_count=0))
    if tid in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING, dt.TypeId.BINARY,
               dt.TypeId.LARGE_BINARY):
        offs = np.zeros(len(values) + 1, dtype=np.int64)
        lens = np.array([len(v) for v in values], dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        data = b"".join(values)
        return make_array(ArrayData(
            t, len(values),
            [None, Buffer.wrap(offs.astype(t.offset_dtype)),
             Buffer.from_bytes(data)], null_count=0))
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        return make_array(ArrayData(t, len(values),
                                    [None, Buffer.from_bytes(b"".join(values))],
                                    null_count=0))
    raise ArrowNotImplemented(f"physical->arrow for {t}")


class _FlatMixin:
    pass


def _flat_assemble(field: dt.Field, desc, defs: np.ndarray,
                   values: Array) -> ArrayData:
    """max_rep==0, non-struct: def==max_def marks present rows."""
    n = len(defs)
    if desc.max_def_level == 0:
        return values.data
    mask = defs == desc.max_def_level
    if len(values) == n and mask.all():
        # no nulls in this chunk: the decoded values ARE the column —
        # zero-copy (the gather+rebuild below cost ~3 memcpys per chunk
        # and dominated the flat scan profile)
        return values.data
    value_rank = np.cumsum(mask) - 1
    idx = np.where(mask, value_rank, -1)
    out = take_host(values, idx)
    return out.data


ParquetFile._flat_assemble = staticmethod(_flat_assemble)



# -- page index / bloom filters / predicate pushdown ------------------------

def _leaf_index_of(self, column: str) -> Optional[int]:
    for i, leaf in enumerate(self.leaves):
        if leaf.path and leaf.path[0] == column and len(leaf.path) == 1:
            return i
    return None


def read_column_index(self, rg: int, col: int):
    chunk = self.metadata.row_groups[rg].columns[col]
    if chunk.column_index_offset is None:
        return None
    self.src.seek(chunk.column_index_offset)
    raw = self.src.read(chunk.column_index_length)
    ctx = self._col_crypto.get((rg, col))
    if isinstance(ctx, Exception):
        raise ctx
    if ctx is not None:
        raw, _ = encm.decrypt_module(
            ctx.key, ctx.aad(encm.COLUMN_INDEX_MODULE), raw)
    return CompactReader(raw).read_struct(fmt.ColumnIndex)


def read_offset_index(self, rg: int, col: int):
    chunk = self.metadata.row_groups[rg].columns[col]
    if chunk.offset_index_offset is None:
        return None
    self.src.seek(chunk.offset_index_offset)
    raw = self.src.read(chunk.offset_index_length)
    ctx = self._col_crypto.get((rg, col))
    if isinstance(ctx, Exception):
        raise ctx
    if ctx is not None:
        raw, _ = encm.decrypt_module(
            ctx.key, ctx.aad(encm.OFFSET_INDEX_MODULE), raw)
    return CompactReader(raw).read_struct(fmt.OffsetIndex)


def read_bloom_filter(self, rg: int, col: int):
    from .bloom import BloomFilter
    chunk = self.metadata.row_groups[rg].columns[col]
    meta = chunk.meta_data
    if meta.bloom_filter_offset is None:
        return None
    self.src.seek(meta.bloom_filter_offset)
    ln = meta.bloom_filter_length or (1 << 20)
    raw = self.src.read(ln)
    ctx = self._col_crypto.get((rg, col))
    if isinstance(ctx, Exception):
        raise ctx
    if ctx is not None:
        hdr_b, used = encm.decrypt_module(
            ctx.key, ctx.aad(encm.BLOOM_HEADER_MODULE), raw)
        bits, _ = encm.decrypt_module(
            ctx.key, ctx.aad(encm.BLOOM_BITSET_MODULE), raw, used)
        raw = hdr_b + bits
    return BloomFilter.deserialize(raw)


def _row_group_may_match(self, rg_i: int, filters: List[tuple]) -> bool:
    """Stats + bloom based row-group pruning (reference metadata statistics
    + bloom usage). filters: [(column, op, value), ...] ANDed."""
    rg = self.metadata.row_groups[rg_i]
    for col_name, op, value in filters:
        li = self._leaf_index_of(col_name)
        if li is None:
            continue
        desc = self.leaves[li]
        meta = rg.columns[li].meta_data
        st = meta.statistics
        lohi = _decode_stats(st, desc) if st is not None else None
        if lohi is not None:
            lo, hi = lohi
            if op == "==" and (value < lo or value > hi):
                return False
            if op == "<" and lo >= value:
                return False
            if op == "<=" and lo > value:
                return False
            if op == ">" and hi <= value:
                return False
            if op == ">=" and hi < value:
                return False
        if op == "==":
            bf = self.read_bloom_filter(rg_i, li)
            if bf is not None and not bf.check(value, desc.physical_type):
                return False
    return True


ParquetFile._leaf_index_of = _leaf_index_of
ParquetFile.read_column_index = read_column_index
ParquetFile.read_offset_index = read_offset_index
ParquetFile.read_bloom_filter = read_bloom_filter
ParquetFile._row_group_may_match = _row_group_may_match


def _decode_stats(st, desc):
    if st.min_value is None or st.max_value is None:
        return None
    phys = desc.physical_type
    if phys in (fmt.Type.INT32, fmt.Type.INT64, fmt.Type.FLOAT,
                fmt.Type.DOUBLE):
        code = {fmt.Type.INT32: "<i", fmt.Type.INT64: "<q",
                fmt.Type.FLOAT: "<f", fmt.Type.DOUBLE: "<d"}[phys]
        return (struct.unpack(code, st.min_value)[0],
                struct.unpack(code, st.max_value)[0])
    if phys == fmt.Type.BYTE_ARRAY:
        t = desc.arrow_type
        if t.id in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING):
            return (st.min_value.decode("utf-8", "replace"),
                    st.max_value.decode("utf-8", "replace"))
        return (st.min_value, st.max_value)
    return None


def read_table(source, columns: Optional[List[str]] = None,
               filters: Optional[List[tuple]] = None,
               decryption: Optional[encm.FileDecryptionProperties] = None,
               properties: Optional[ReaderProperties] = None,
               use_threads: bool = True) -> Table:
    return ParquetFile(source, decryption, properties).read_table(
        columns, filters, use_threads=use_threads)
