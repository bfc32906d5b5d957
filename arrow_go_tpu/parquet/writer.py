"""Parquet file writer (reference parquet/file/file_writer.go +
pqarrow/encode_arrow.go). Round-1 scope: one data page per column chunk,
PLAIN + dictionary encodings, snappy/gzip/zstd/lz4_raw codecs, min/max/null
statistics, nested list/struct columns via level generation."""
from __future__ import annotations

import struct
from typing import BinaryIO, List, Optional, Tuple

import numpy as np

from .. import dtypes as dt
from ..array.arrays import Array, make_array
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid, ArrowNotImplemented
from . import compress as comp
from . import encodings as enc
from . import encryption as encm
from . import format as fmt
from . import levels as lv
from . import schema as psch
from .thrift import CompactWriter

MAGIC = b"PAR1"
MAGIC_ENCRYPTED = b"PARE"
CREATED_BY = "arrow_go_tpu v0.1.0"


def _thrift_bytes(obj) -> bytes:
    w = CompactWriter()
    w.write_struct(obj)
    return bytes(w.out)


def _present_leaf_values(leaf: Array, def_levels: np.ndarray,
                         max_def: int) -> Array:
    """Values written to the page: one per def==max_def entry."""
    if max_def == 0 or leaf.null_count == 0 and len(leaf) == int(
            (def_levels == max_def).sum()):
        return leaf
    mask = leaf.validity_bools()
    idx = np.nonzero(mask)[0]
    from ..array.arrays import take_host
    return take_host(leaf, idx)


def _physical_values(leaf: Array, phys: fmt.Type, tlen: int):
    """Arrow leaf array (no nulls) -> python/numpy physical values."""
    t = leaf.type
    if t.id == dt.TypeId.DICTIONARY:
        leaf = leaf.decode()
        t = leaf.type
    if phys == fmt.Type.BOOLEAN:
        return leaf.to_numpy()
    if phys in (fmt.Type.INT32, fmt.Type.INT64):
        npdt = np.int32 if phys == fmt.Type.INT32 else np.int64
        if t.is_decimal:
            vals = np.array([leaf.unscaled(i) for i in range(len(leaf))],
                            dtype=np.int64)
            return vals.astype(npdt)
        vals = leaf.values
        if vals.dtype.kind == "u":  # reinterpret unsigned in two's complement
            return vals.astype(np.uint64).astype(npdt, casting="unsafe") if \
                phys == fmt.Type.INT64 else vals.astype(np.uint32).view(np.int32)
        return vals.astype(npdt)
    if phys in (fmt.Type.FLOAT, fmt.Type.DOUBLE):
        return leaf.values.astype(np.float32 if phys == fmt.Type.FLOAT
                                  else np.float64)
    if phys == fmt.Type.BYTE_ARRAY:
        if t.id in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING):
            return [leaf.value_bytes(i) for i in range(len(leaf))]
        return [leaf.value_bytes(i) for i in range(len(leaf))]
    if phys == fmt.Type.FIXED_LEN_BYTE_ARRAY:
        if t.is_decimal:
            return [leaf.unscaled(i).to_bytes(tlen, "big", signed=True)
                    for i in range(len(leaf))]
        if t.id == dt.TypeId.FLOAT16:
            return [leaf.values[i].tobytes() for i in range(len(leaf))]
        return [leaf.value(i) for i in range(len(leaf))]
    raise ArrowNotImplemented(f"write {t} as {phys}")


def _slice_phys(phys_vals, a: int, b: int):
    if isinstance(phys_vals, np.ndarray):
        return phys_vals[a:b]
    return phys_vals[a:b]


def _stats_for(phys: fmt.Type, values, null_count: int) -> Optional[fmt.Statistics]:
    st = fmt.Statistics(null_count=null_count)
    try:
        if isinstance(values, np.ndarray) and len(values):
            if values.dtype == np.bool_:
                mn, mx = bool(values.min()), bool(values.max())
                st.min_value = b"\x01" if mn else b"\x00"
                st.max_value = b"\x01" if mx else b"\x00"
            else:
                fmtc = {fmt.Type.INT32: "<i", fmt.Type.INT64: "<q",
                        fmt.Type.FLOAT: "<f", fmt.Type.DOUBLE: "<d"}[phys]
                st.min_value = struct.pack(fmtc, values.min())
                st.max_value = struct.pack(fmtc, values.max())
        elif isinstance(values, list) and values and len(values[0] if values else b"") < 64:
            vs = [bytes(v) for v in values]
            st.min_value = min(vs)
            st.max_value = max(vs)
    except (ValueError, KeyError):
        pass
    return st


_ENCODING_NAMES = {
    "plain": fmt.Encoding.PLAIN,
    "delta_binary_packed": fmt.Encoding.DELTA_BINARY_PACKED,
    "delta_length_byte_array": fmt.Encoding.DELTA_LENGTH_BYTE_ARRAY,
    "delta_byte_array": fmt.Encoding.DELTA_BYTE_ARRAY,
    "byte_stream_split": fmt.Encoding.BYTE_STREAM_SPLIT,
}

_BSS_WIDTHS = {fmt.Type.FLOAT: 4, fmt.Type.DOUBLE: 8,
               fmt.Type.INT32: 4, fmt.Type.INT64: 8}


def _encode_values(encoding: fmt.Encoding, phys_type: fmt.Type, phys,
                   type_length: int) -> bytes:
    """Encode physical values with a non-dictionary value encoding
    (reference parquet/internal/encoding TypedEncoder dispatch,
    typed_encoder.gen.go)."""
    if encoding == fmt.Encoding.PLAIN:
        return enc.plain_encode(phys_type, phys, type_length)
    if encoding == fmt.Encoding.DELTA_BINARY_PACKED:
        if phys_type not in (fmt.Type.INT32, fmt.Type.INT64):
            raise ArrowInvalid("DELTA_BINARY_PACKED requires INT32/INT64")
        return enc.delta_binary_packed_encode(phys)
    if encoding == fmt.Encoding.DELTA_LENGTH_BYTE_ARRAY:
        if phys_type != fmt.Type.BYTE_ARRAY:
            raise ArrowInvalid("DELTA_LENGTH_BYTE_ARRAY requires BYTE_ARRAY")
        return enc.delta_length_byte_array_encode(phys)
    if encoding == fmt.Encoding.DELTA_BYTE_ARRAY:
        if phys_type not in (fmt.Type.BYTE_ARRAY,
                             fmt.Type.FIXED_LEN_BYTE_ARRAY):
            raise ArrowInvalid("DELTA_BYTE_ARRAY requires BYTE_ARRAY/FLBA")
        return enc.delta_byte_array_encode(phys)
    if encoding == fmt.Encoding.BYTE_STREAM_SPLIT:
        w = _BSS_WIDTHS.get(phys_type, type_length)
        if phys_type in _BSS_WIDTHS:
            raw = np.ascontiguousarray(phys).view(np.uint8).reshape(-1, w)
        elif phys_type == fmt.Type.FIXED_LEN_BYTE_ARRAY:
            raw = np.frombuffer(b"".join(phys), dtype=np.uint8).reshape(-1, w)
        else:
            raise ArrowInvalid("BYTE_STREAM_SPLIT requires FLOAT/DOUBLE/"
                               "INT32/INT64/FLBA")
        return enc.byte_stream_split_encode(raw)
    raise ArrowNotImplemented(f"value encoding {encoding}")


def _encode_column_chunk(
        sink: BinaryIO, leaf_arr: Array, field: dt.Field,
        desc: psch.ColumnDescriptor, props: "WriterProperties",
        colname: str, crypto=None):
    """Write pages for one column chunk; return its metadata."""
    codec = props.codec_for(colname)
    codec_level = props.level_for(colname)
    use_dictionary = props.dict_for(colname)
    make_bloom = props.bloom_for(colname)
    data_page_size = props.data_page_size
    encoding = props.encoding_for(colname)
    v2_pages = props.data_page_version == "2.0"
    t = field.type
    nested = t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST, dt.TypeId.STRUCT)
    if nested:
        def_levels, rep_levels, leaf = lv.generate_levels_nested(leaf_arr, field)
        values_arr = leaf  # already present-only
    else:
        def_levels, rep_levels, leaf = lv.generate_levels(leaf_arr, field.nullable)
        values_arr = _present_leaf_values(leaf, def_levels, desc.max_def_level)

    num_values = len(def_levels)
    null_count = num_values - len(values_arr)

    # level streams (v1 layout: rep then def, each i32-length-prefixed RLE)
    level_bytes = b""
    if desc.max_rep_level > 0:
        level_bytes += enc.levels_encode_v1(
            rep_levels, enc.bit_width_for(desc.max_rep_level))
    if desc.max_def_level > 0:
        level_bytes += enc.levels_encode_v1(
            def_levels, enc.bit_width_for(desc.max_def_level))

    explicit_enc = _ENCODING_NAMES[encoding.lower()] if encoding else None
    encodings_used = [int(fmt.Encoding.RLE)]
    dict_page_bytes = None
    is_dict = False
    dict_fell_back = False
    vt = values_arr.type
    if explicit_enc is not None and explicit_enc != fmt.Encoding.PLAIN:
        use_dictionary = False
    if use_dictionary and (vt.id in (dt.TypeId.DICTIONARY,)
                           or vt.is_binary_like):
        is_dict = True
        if vt.id != dt.TypeId.DICTIONARY:
            from ..array.builders import DictionaryBuilder
            b = DictionaryBuilder(dt.dictionary(dt.int32, vt))
            b.append_values(values_arr.to_pylist())
            values_arr = b.finish()
        dict_vals = _physical_values(values_arr.dictionary, desc.physical_type,
                                     desc.type_length)
        dict_page_bytes = enc.plain_encode(desc.physical_type, dict_vals,
                                           desc.type_length)
        if len(dict_page_bytes) > props.dictionary_pagesize_limit:
            # dictionary grew past the page-size limit: fall back to plain
            # (reference column_writer.go FallbackToPlainEncoding)
            is_dict = False
            dict_fell_back = True
            dict_page_bytes = None
            values_arr = make_array(values_arr.data).decode() \
                if values_arr.type.id == dt.TypeId.DICTIONARY else values_arr
            vt = values_arr.type
    if is_dict:
        codes = np.asarray(values_arr.indices.to_numpy(), dtype=np.uint32)
        width = max(enc.bit_width_for(int(codes.max()) if len(codes) else 0), 1)
        data_bytes = bytes([width]) + enc.rle_encode(codes, width)
        value_encoding = int(fmt.Encoding.PLAIN_DICTIONARY
                             if not v2_pages else fmt.Encoding.RLE_DICTIONARY)
        encodings_used += [int(fmt.Encoding.PLAIN), value_encoding]
        phys_for_stats = _physical_values(
            make_array(values_arr.data).decode(), desc.physical_type,
            desc.type_length)
    else:
        phys = _physical_values(values_arr, desc.physical_type,
                                desc.type_length)
        venc = explicit_enc if explicit_enc is not None else fmt.Encoding.PLAIN
        data_bytes = _encode_values(venc, desc.physical_type, phys,
                                    desc.type_length)
        value_encoding = int(venc)
        encodings_used.append(int(venc))
        phys_for_stats = phys

    stats = (_stats_for(desc.physical_type, phys_for_stats, null_count)
             if props.stats_for(colname) else None)
    bloom = None
    if make_bloom and desc.physical_type != fmt.Type.BOOLEAN:
        try:
            from .bloom import build_bloom_filter, build_bloom_filter_adaptive
            src = phys_for_stats if not isinstance(phys_for_stats, np.ndarray) \
                else phys_for_stats.tolist()
            if dict_fell_back:
                # dictionary fallback = the dict page's exact NDV is
                # gone; size the filter adaptively from the stream
                # (reference adaptive_bloom_filter.go:65)
                bloom = build_bloom_filter_adaptive(
                    src, desc.physical_type, fpp=props.bloom_filter_fpp)
            else:
                bloom = build_bloom_filter(src, desc.physical_type,
                                           fpp=props.bloom_filter_fpp)
        except NotImplementedError:
            bloom = None

    start_offset = sink.tell()
    dict_page_offset = None
    total_unc = 0
    total_comp = 0

    if is_dict and dict_page_bytes is not None:
        dict_page_offset = sink.tell()
        compressed = comp.compress(codec, dict_page_bytes, codec_level)
        if crypto is not None:
            compressed = encm.encrypt_module(
                crypto.key, crypto.aad(encm.DICT_PAGE_MODULE), compressed,
                crypto.gcm_pages)
        hdr = fmt.PageHeader(
            type=int(fmt.PageType.DICTIONARY_PAGE),
            uncompressed_page_size=len(dict_page_bytes),
            compressed_page_size=len(compressed),
            dictionary_page_header=fmt.DictionaryPageHeader(
                num_values=len(values_arr.dictionary),
                encoding=int(fmt.Encoding.PLAIN)))
        hb = _thrift_bytes(hdr)
        if crypto is not None:
            hb = encm.encrypt_module(
                crypto.key, crypto.aad(encm.DICT_PAGE_HEADER_MODULE), hb)
        sink.write(hb)
        sink.write(compressed)
        total_unc += len(hb) + len(dict_page_bytes)
        total_comp += len(hb) + len(compressed)

    # page splitting: flat columns honor data_page_size; nested columns
    # stay single-page (record boundaries, reference column_writer.go:265)
    page_ranges = [(0, num_values, level_bytes, data_bytes)]
    if data_page_size and desc.max_rep_level == 0 and num_values > 1:
        total_sz = len(level_bytes) + len(data_bytes)
        rows_per_page = max(1, int(num_values * data_page_size
                                   / max(total_sz, 1)))
        if rows_per_page < num_values:
            page_ranges = []
            present_prefix = np.cumsum(def_levels == desc.max_def_level)
            for start in range(0, num_values, rows_per_page):
                end = min(start + rows_per_page, num_values)
                lvl = b""
                if desc.max_def_level > 0:
                    lvl = enc.levels_encode_v1(
                        def_levels[start:end],
                        enc.bit_width_for(desc.max_def_level))
                p0 = int(present_prefix[start - 1]) if start else 0
                p1 = int(present_prefix[end - 1]) if end else 0
                if is_dict:
                    pc = codes[p0:p1]
                    pdata = bytes([width]) + enc.rle_encode(pc, width)
                else:
                    pv = _slice_phys(phys, p0, p1)
                    pdata = _encode_values(
                        fmt.Encoding(value_encoding), desc.physical_type, pv,
                        desc.type_length)
                page_ranges.append((start, end, lvl, pdata))

    data_page_offset = None
    page_locs = []
    for p_ord, (start, end, lvl_b, data_b) in enumerate(page_ranges):
        pstats = stats if len(page_ranges) == 1 else None
        if v2_pages:
            # V2 layout: uncompressed rep+def level runs (no length prefix,
            # byte lengths in the header) then compressed values
            # (reference file/page_writer.go DataPageV2 path)
            rep_raw = def_raw = b""
            if desc.max_rep_level > 0:
                rep_raw = enc.rle_encode(
                    rep_levels[start:end],
                    enc.bit_width_for(desc.max_rep_level))
            if desc.max_def_level > 0:
                def_raw = enc.rle_encode(
                    def_levels[start:end],
                    enc.bit_width_for(desc.max_def_level))
            page_nulls = int((def_levels[start:end]
                              != desc.max_def_level).sum()) \
                if desc.max_def_level else 0
            page_rows = int((rep_levels[start:end] == 0).sum()) \
                if desc.max_rep_level else end - start
            comp_vals = comp.compress(codec, data_b, codec_level)
            body = rep_raw + def_raw + comp_vals
            unc_size = len(rep_raw) + len(def_raw) + len(data_b)
            hdr = fmt.PageHeader(
                type=int(fmt.PageType.DATA_PAGE_V2),
                uncompressed_page_size=unc_size,
                compressed_page_size=len(body),
                data_page_header_v2=fmt.DataPageHeaderV2(
                    num_values=end - start, num_nulls=page_nulls,
                    num_rows=page_rows, encoding=value_encoding,
                    definition_levels_byte_length=len(def_raw),
                    repetition_levels_byte_length=len(rep_raw),
                    is_compressed=bool(codec),
                    statistics=pstats))
        else:
            page_payload = lvl_b + data_b
            body = comp.compress(codec, page_payload, codec_level)
            unc_size = len(page_payload)
            hdr = fmt.PageHeader(
                type=int(fmt.PageType.DATA_PAGE),
                uncompressed_page_size=unc_size,
                compressed_page_size=len(body),
                data_page_header=fmt.DataPageHeader(
                    num_values=end - start, encoding=value_encoding,
                    definition_level_encoding=int(fmt.Encoding.RLE),
                    repetition_level_encoding=int(fmt.Encoding.RLE),
                    statistics=pstats))
        if crypto is not None:
            body = encm.encrypt_module(
                crypto.key, crypto.aad(encm.DATA_PAGE_MODULE, p_ord),
                body, crypto.gcm_pages)
            hdr.compressed_page_size = len(body)
        off = sink.tell()
        if data_page_offset is None:
            data_page_offset = off
        hb = _thrift_bytes(hdr)
        if crypto is not None:
            hb = encm.encrypt_module(
                crypto.key, crypto.aad(encm.DATA_PAGE_HEADER_MODULE, p_ord),
                hb)
        sink.write(hb)
        sink.write(body)
        total_unc += len(hb) + unc_size
        total_comp += len(hb) + len(body)
        page_locs.append(fmt.PageLocation(
            offset=off, compressed_page_size=len(hb) + len(body),
            first_row_index=start))

    extras = {"page_location": page_locs[0], "page_locations": page_locs,
              "stats": stats, "bloom": bloom}
    meta = fmt.ColumnMetaData(
        type=int(desc.physical_type),
        encodings=sorted(set(encodings_used)),
        path_in_schema=list(desc.path),
        codec=int(codec),
        num_values=num_values,
        total_uncompressed_size=total_unc,
        total_compressed_size=total_comp,
        data_page_offset=data_page_offset,
        dictionary_page_offset=dict_page_offset,
        statistics=stats)
    return fmt.ColumnChunk(file_offset=start_offset, meta_data=meta), extras


class SortingColumn:
    """Declared sort order of a row group's rows (reference
    parquet.SortingColumn, WithSortingColumns writer_properties.go:374).
    column_idx indexes the leaf columns."""

    def __init__(self, column_idx: int, descending: bool = False,
                 nulls_first: bool = False):
        self.column_idx = column_idx
        self.descending = descending
        self.nulls_first = nulls_first


class WriterProperties:
    """The reference's WriterProperties option set
    (parquet/writer_properties.go:143-527), as a keyword dataclass.

    Per-column overrides live in ``column_properties``:
    ``{"col": {"compression": "zstd", "use_dictionary": False,
    "encoding": "delta_binary_packed", "write_statistics": False,
    "compression_level": 9, "bloom": True}}`` — the analog of the
    reference's With*For(path, ...) options.
    """

    def __init__(self, *,
                 version: str = "2.6",              # WithVersion
                 data_page_version: str = "1.0",    # WithDataPageVersion
                 created_by: str = CREATED_BY,      # WithCreatedBy
                 compression: str = "snappy",       # WithCompression
                 compression_level: Optional[int] = None,
                 use_dictionary: bool = True,       # WithDictionaryDefault
                 dictionary_pagesize_limit: int = 1 << 20,
                 data_page_size: Optional[int] = None,
                 max_row_group_length: Optional[int] = None,
                 write_statistics: bool = True,     # WithStats
                 write_page_index: bool = True,     # WithPageIndexEnabled
                 write_bloom_filters: bool = False,  # WithBloomFilterEnabled
                 bloom_filter_fpp: float = 0.01,    # WithBloomFilterFPP
                 sorting_columns: Optional[List[SortingColumn]] = None,
                 store_decimal_as_integer: bool = False,
                 column_properties: Optional[dict] = None,
                 encryption: Optional[encm.FileEncryptionProperties] = None):
        if version not in ("1.0", "2.4", "2.6"):
            raise ArrowInvalid(f"parquet format version {version!r}")
        if data_page_version not in ("1.0", "2.0"):
            raise ArrowInvalid(f"data page version {data_page_version!r}")
        self.version = version
        self.data_page_version = data_page_version
        self.created_by = created_by
        self.compression = compression
        self.compression_level = compression_level
        self.use_dictionary = use_dictionary
        self.dictionary_pagesize_limit = dictionary_pagesize_limit
        self.data_page_size = data_page_size
        self.max_row_group_length = max_row_group_length
        self.write_statistics = write_statistics
        self.page_index = write_page_index
        self.bloom = write_bloom_filters
        self.bloom_filter_fpp = bloom_filter_fpp
        self.sorting_columns = sorting_columns
        self.store_decimal_as_integer = store_decimal_as_integer
        self.per_column = column_properties or {}
        self.encryption = encryption

    def _col(self, name: str, key: str, default):
        return self.per_column.get(name, {}).get(key, default)

    def codec_for(self, name: str) -> int:
        c = self._col(name, "compression", self.compression)
        return int(comp.CODEC_NAMES[c.lower()])

    def level_for(self, name: str) -> Optional[int]:
        return self._col(name, "compression_level", self.compression_level)

    def dict_for(self, name: str) -> bool:
        return self._col(name, "use_dictionary", self.use_dictionary)

    def encoding_for(self, name: str) -> Optional[str]:
        return self._col(name, "encoding", None)

    def stats_for(self, name: str) -> bool:
        return self._col(name, "write_statistics", self.write_statistics)

    def bloom_for(self, name: str) -> bool:
        return self._col(name, "bloom", self.bloom)


def write_table(table, sink, row_group_size: Optional[int] = None,
                compression: str = "snappy", use_dictionary: bool = True,
                write_page_index: bool = True,
                write_bloom_filters: bool = False,
                data_page_size: Optional[int] = None,
                column_properties: Optional[dict] = None,
                encryption: Optional[encm.FileEncryptionProperties] = None,
                properties: Optional[WriterProperties] = None,
                ) -> None:
    """Write a Table/RecordBatch to a parquet file.

    Either pass individual keyword options (the common ones) or a full
    ``WriterProperties`` via ``properties`` (which then wins; the analog of
    the reference's option-function list, writer_properties.go).
    """
    if isinstance(table, RecordBatch):
        table = Table.from_batches([table])
    props = properties or WriterProperties(
        compression=compression, use_dictionary=use_dictionary,
        write_page_index=write_page_index,
        write_bloom_filters=write_bloom_filters,
        data_page_size=data_page_size,
        column_properties=column_properties,
        encryption=encryption)
    encryption = props.encryption
    row_group_size = row_group_size or props.max_row_group_length
    if hasattr(sink, "write"):
        _write(table, sink, row_group_size, props, encryption)
    else:
        with open(sink, "wb") as f:
            _write(table, f, row_group_size, props, encryption)


def _column_crypto_ctx(encryption, leaves, rg: int, li: int):
    """Resolve the per-chunk crypto context (None = plaintext column)."""
    if encryption is None:
        return None, None, None
    path = ".".join(leaves[li].path)
    key, key_meta, uses_footer = encryption.column_setup(path)
    if key is None:
        return None, None, None
    ctx = encm._ColumnCryptoContext(
        key, encryption.file_aad, rg, li,
        gcm_pages=(encryption.algorithm == encm.AES_GCM_V1))
    return ctx, key_meta, uses_footer


def _populate_crypto_metadata(chunk: fmt.ColumnChunk, desc, ctx,
                              col_key_meta: bytes, uses_footer: bool,
                              encryption) -> None:
    """Set crypto_metadata / encrypted_column_metadata on one chunk
    (reference metadata/column_chunk.go PopulateCryptoData:433)."""
    if uses_footer:
        chunk.crypto_metadata = fmt.ColumnCryptoMetaData(
            ENCRYPTION_WITH_FOOTER_KEY=fmt.EncryptionWithFooterKey())
    else:
        chunk.crypto_metadata = fmt.ColumnCryptoMetaData(
            ENCRYPTION_WITH_COLUMN_KEY=fmt.EncryptionWithColumnKey(
                path_in_schema=list(desc.path), key_metadata=col_key_meta))
    encrypted_footer = not encryption.plaintext_footer
    if not encrypted_footer or not uses_footer:
        meta_blob = _thrift_bytes(chunk.meta_data)
        chunk.encrypted_column_metadata = encm.encrypt_module(
            ctx.key, ctx.aad(encm.COLUMN_META_MODULE), meta_blob)
        if encrypted_footer:
            chunk.meta_data = None
        else:
            # plaintext footer keeps a redacted copy for old readers
            chunk.meta_data.statistics = None
            chunk.meta_data.encoding_stats = None


def _write(table: Table, sink: BinaryIO, row_group_size: Optional[int],
           props: "_Props",
           encryption: Optional[encm.FileEncryptionProperties] = None
           ) -> None:
    write_page_index = props.page_index
    write_bloom_filters = props.bloom
    elements, leaves = psch.schema_to_elements(
        table.schema, props.store_decimal_as_integer)
    fmt_sorting = [fmt.SortingColumn(column_idx=sc.column_idx,
                                     descending=sc.descending,
                                     nulls_first=sc.nulls_first)
                   for sc in props.sorting_columns] \
        if props.sorting_columns else None
    encrypted_footer = encryption is not None and not encryption.plaintext_footer
    sink.write(MAGIC_ENCRYPTED if encrypted_footer else MAGIC)

    row_group_size = row_group_size or max(table.num_rows, 1)
    row_groups: List[fmt.RowGroup] = []
    batches = table.to_batches(max_chunksize=row_group_size) \
        if table.num_rows else []

    all_extras: List[List[dict]] = []
    for rb in batches:
        rg_start = sink.tell()
        chunks: List[fmt.ColumnChunk] = []
        rg_extras: List[dict] = []
        li = 0
        for f, col in zip(rb.schema.fields, rb.columns):
            if f.type.id == dt.TypeId.EXTENSION:
                from ..array.arrays import ArrayData
                st = f.type.storage_type
                f = dt.Field(f.name, st, f.nullable)
                d = col.data
                col = make_array(ArrayData(
                    st, d.length, d.buffers, d.children, d.dictionary,
                    d._null_count, d.offset))
            if f.type.id == dt.TypeId.MAP:
                f = lv.map_storage_field(f)
                col = make_array(lv.map_storage_data(col.data))
            elif f.type.id == dt.TypeId.FIXED_SIZE_LIST:
                f = lv.fsl_storage_field(f)
                col = make_array(lv.fsl_storage_data(col.data))
            paths = lv.leaf_paths(f.type)
            for path in paths:
                pruned_arr, pruned_f = lv.prune_to_leaf(col, f, path)
                desc = leaves[li]
                ctx, col_key_meta, uses_footer = _column_crypto_ctx(
                    encryption, leaves, len(row_groups), li)
                chunk, extras = _encode_column_chunk(
                    sink, pruned_arr, pruned_f, desc, props, f.name, ctx)
                extras["crypto"] = (ctx, col_key_meta, uses_footer, desc)
                chunks.append(chunk)
                rg_extras.append(extras)
                li += 1
        total = sum(c.meta_data.total_compressed_size for c in chunks)
        # ordinal is REQUIRED for encrypted files: module AADs embed it and
        # readers take it from this field, not the list position
        row_groups.append(fmt.RowGroup(
            columns=chunks, total_byte_size=total, num_rows=rb.num_rows,
            sorting_columns=fmt_sorting,
            file_offset=rg_start, total_compressed_size=total,
            ordinal=len(row_groups)))
        all_extras.append(rg_extras)

    # bloom filters (before indexes, reference layout)
    if write_bloom_filters:
        for rg, rg_extras in zip(row_groups, all_extras):
            for chunk, extras in zip(rg.columns, rg_extras):
                if extras["bloom"] is None:
                    continue
                off = sink.tell()
                ctx = extras["crypto"][0]
                if ctx is not None:
                    hdr_b, bits_b = extras["bloom"].serialize_parts()
                    blob = (encm.encrypt_module(
                                ctx.key, ctx.aad(encm.BLOOM_HEADER_MODULE),
                                hdr_b)
                            + encm.encrypt_module(
                                ctx.key, ctx.aad(encm.BLOOM_BITSET_MODULE),
                                bits_b))
                else:
                    blob = extras["bloom"].serialize()
                sink.write(blob)
                chunk.meta_data.bloom_filter_offset = off
                chunk.meta_data.bloom_filter_length = len(blob)

    # page indexes (ColumnIndex + OffsetIndex after row group data,
    # reference parquet/metadata/page_index.go)
    if write_page_index:
        for rg, rg_extras in zip(row_groups, all_extras):
            for chunk, extras in zip(rg.columns, rg_extras):
                st = extras["stats"]
                ci = fmt.ColumnIndex(
                    null_pages=[st is None or st.min_value is None],
                    min_values=[st.min_value if st and st.min_value else b""],
                    max_values=[st.max_value if st and st.max_value else b""],
                    boundary_order=0,
                    null_counts=[st.null_count if st and st.null_count
                                 is not None else 0])
                off = sink.tell()
                blob = _thrift_bytes(ci)
                ctx = extras["crypto"][0]
                if ctx is not None:
                    blob = encm.encrypt_module(
                        ctx.key, ctx.aad(encm.COLUMN_INDEX_MODULE), blob)
                sink.write(blob)
                chunk.column_index_offset = off
                chunk.column_index_length = len(blob)
            for chunk, extras in zip(rg.columns, rg_extras):
                oi = fmt.OffsetIndex(
                    page_locations=extras.get("page_locations",
                                              [extras["page_location"]]))
                off = sink.tell()
                blob = _thrift_bytes(oi)
                ctx = extras["crypto"][0]
                if ctx is not None:
                    blob = encm.encrypt_module(
                        ctx.key, ctx.aad(encm.OFFSET_INDEX_MODULE), blob)
                sink.write(blob)
                chunk.offset_index_offset = off
                chunk.offset_index_length = len(blob)

    if encryption is not None:
        for rg, rg_extras in zip(row_groups, all_extras):
            for chunk, extras in zip(rg.columns, rg_extras):
                ctx, col_key_meta, uses_footer, desc = extras["crypto"]
                if ctx is not None:
                    _populate_crypto_metadata(chunk, desc, ctx, col_key_meta,
                                              uses_footer, encryption)

    meta = fmt.FileMetaData(
        version=1 if props.version == "1.0" else 2,
        schema=elements, num_rows=table.num_rows,
        row_groups=row_groups, created_by=props.created_by,
        column_orders=[fmt.ColumnOrder(TYPE_ORDER=fmt.TypeDefinedOrder())
                       for _ in leaves],
        key_value_metadata=[fmt.KeyValue(key=k, value=v)
                            for k, v in zip(table.schema.metadata.keys,
                                            table.schema.metadata.values)]
        or None)
    if encryption is not None and not encryption.plaintext_footer:
        # encrypted footer: [FileCryptoMetaData][encrypted FileMetaData]
        # [u32 combined len]["PARE"] (reference file/file_writer.go
        # closeEncryptedFile)
        fcmd = fmt.FileCryptoMetaData(
            encryption_algorithm=encryption.algorithm_struct(),
            key_metadata=encryption.footer_key_metadata or None)
        fb = _thrift_bytes(fcmd)
        ef = encm.encrypt_module(
            encryption.footer_key, encm.footer_aad(encryption.file_aad),
            _thrift_bytes(meta))
        sink.write(fb)
        sink.write(ef)
        sink.write(struct.pack("<I", len(fb) + len(ef)))
        sink.write(MAGIC_ENCRYPTED)
        return
    if encryption is not None:
        # plaintext footer mode: footer readable, signed with the footer key
        meta.encryption_algorithm = encryption.algorithm_struct()
        meta.footer_signing_key_metadata = \
            encryption.footer_key_metadata or None
        mb = _thrift_bytes(meta)
        sig = encm.sign_footer(
            encryption.footer_key, encm.footer_aad(encryption.file_aad), mb)
        sink.write(mb)
        sink.write(sig)
        sink.write(struct.pack("<I", len(mb) + len(sig)))
        sink.write(MAGIC)
        return
    mb = _thrift_bytes(meta)
    sink.write(mb)
    sink.write(struct.pack("<I", len(mb)))
    sink.write(MAGIC)
