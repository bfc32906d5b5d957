"""Parquet -> HBM fast path: device-side page decode for flat primitive
columns (the TPU inversion of the reference's decode hot loop —
parquet/file/column_reader.go TypedDecoder.Decode + the SIMD bit-unpack /
BYTE_STREAM_SPLIT asm tier, SURVEY.md §3.2).

The host touches only control data (thrift page headers, RLE run headers,
codec decompression); every decoded VALUE is produced on device by
ops/decode.py gather/shift programs:

    page bytes --host decompress--> HBM --device--> values + validity words

Columns ship straight into a DeviceColumn — no host-side numpy
materialization of the decoded data at all (`read_column_device`), so a
scan feeding device compute skips the host round trip the normal
read path pays.

Supported: max_rep_level == 0, max_def_level <= 1 (flat, optionally
nullable), physical INT32/INT64/FLOAT/DOUBLE/BOOLEAN, encodings PLAIN /
RLE_DICTIONARY / PLAIN_DICTIONARY / BYTE_STREAM_SPLIT, v1 + v2 data
pages, any codec. Anything else raises ArrowNotImplemented — callers
fall back to the host path.
"""
from __future__ import annotations

import struct

import numpy as np

from .. import dtypes as dt
from ..compute.errors import ArrowInvalid, ArrowNotImplemented
from ..device.block import DeviceColumn, pad_length
from ..jaxenv import jnp
from ..ops import bitmap
from ..ops import decode as dd
from . import compress as comp
from . import encodings as enc
from . import format as fmt
from .thrift import CompactReader

def _leaf_of(pf, column: str):
    for li, desc in enumerate(pf.leaves):
        if desc.path and desc.path[0] == column and len(desc.path) == 1:
            return li, desc
    raise ArrowInvalid(f"no flat leaf column {column!r}")


def _iter_pages(pf, chunk):
    """(PageHeader, raw_page_bytes) for every page of a column chunk.
    Control-plane only: thrift parse + byte slicing."""
    meta = chunk.meta_data
    start = meta.dictionary_page_offset or meta.data_page_offset
    with pf._src_lock:
        pf.src.seek(start)
        raw = pf.src.read(meta.total_compressed_size)
    pos = 0
    remaining = meta.num_values
    while remaining > 0 and pos < len(raw):
        rd = CompactReader(raw, pos)
        hdr = rd.read_struct(fmt.PageHeader)
        pos = rd.pos
        body = raw[pos: pos + hdr.compressed_page_size]
        pos += hdr.compressed_page_size
        ptype = fmt.PageType(hdr.type)
        if ptype in (fmt.PageType.DATA_PAGE, fmt.PageType.DATA_PAGE_V2):
            dph = (hdr.data_page_header if ptype == fmt.PageType.DATA_PAGE
                   else hdr.data_page_header_v2)
            remaining -= dph.num_values or 0
        yield hdr, body


def _split_page(hdr, body, desc, codec):
    """Header control-plane split of one data page ->
    (nv, def_stream, vals_raw, encoding)."""
    ptype = fmt.PageType(hdr.type)
    if ptype == fmt.PageType.DATA_PAGE:
        dph = hdr.data_page_header
        nv = dph.num_values or 0
        payload = comp.decompress(codec, body, hdr.uncompressed_page_size)
        off = 0
        def_stream = None
        if desc.max_def_level > 0:
            (ln,) = struct.unpack_from("<I", payload, 0)
            def_stream = payload[4:4 + ln]
            off = 4 + ln
        return nv, def_stream, payload[off:], fmt.Encoding(dph.encoding or 0)
    dph = hdr.data_page_header_v2
    nv = dph.num_values or 0
    rl = dph.repetition_levels_byte_length or 0
    dl = dph.definition_levels_byte_length or 0
    def_stream = body[rl:rl + dl] if desc.max_def_level > 0 else None
    vals_raw = body[rl + dl:]
    if dph.is_compressed is not False and codec:
        vals_raw = comp.decompress(
            codec, vals_raw, (hdr.uncompressed_page_size or 0) - rl - dl)
    return nv, def_stream, vals_raw, fmt.Encoding(dph.encoding or 0)


def _cat_rle_tables(tables, nvs):
    """Concatenate per-page parse_rle_segments tables into ONE table over
    the whole column chunk: output indices shift by the running value
    count, packed-group bit offsets by the running word count (each
    page's word stream is word-aligned, so offsets stay exact)."""
    sts, irs, pays, words = [], [], [], []
    out_off = 0
    word_off = 0
    for (s, i, p, w), nv in zip(tables, nvs):
        sts.append(s.astype(np.int64) + out_off)
        irs.append(i)
        pays.append(np.where(i == 1, p.astype(np.int64),
                             p.astype(np.int64) + word_off * 32))
        words.append(w)
        out_off += nv
        word_off += len(w)
    return (np.concatenate(sts).astype(np.int32),
            np.concatenate(irs),
            np.concatenate(pays),
            np.concatenate(words))


def _count_ones_rle(table, nv: int) -> int:
    """Host count of 1-bits in a parsed bit-width-1 RLE/packed stream
    (per-page present count — control-plane only)."""
    st, ir, pay, words = table
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    total = 0
    for s in range(len(st)):
        start = int(st[s])
        end = int(st[s + 1]) if s + 1 < len(st) else nv
        end = min(end, nv)
        cnt = max(end - start, 0)
        if ir[s] == 1:
            total += cnt * int(pay[s] & 1)
        else:
            b0 = int(pay[s])
            total += int(bits[b0:b0 + cnt].sum())
    return total


def _fused_chunk_read(data_pages, desc, codec, dict_dev, np_dtype,
                      codes_only):
    """ALL data pages of a column chunk as ONE device transfer + ONE
    decode program (VERDICT r4 #3 — the per-page dispatch path pays a
    tunnel round trip per page per column; reference
    parquet/pqarrow/file_reader.go:362-404 reads a chunk at a time).
    Returns (values, present) or None when a page needs the per-page
    tier (mixed encodings, BSS/DELTA/BOOLEAN, varying dict widths)."""
    if codec and len(data_pages) > 1:
        # page decompression on a thread pool (codecs release the GIL) —
        # overlaps with device transfers already in flight
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(4, len(data_pages))) as pool:
            splits = list(pool.map(
                lambda pb: _split_page(pb[0], pb[1], desc, codec),
                data_pages))
    else:
        splits = [_split_page(h, b, desc, codec) for h, b in data_pages]
    if not splits:
        return None
    encs = {s[3] for s in splits}
    dict_encs = {fmt.Encoding.RLE_DICTIONARY, fmt.Encoding.PLAIN_DICTIONARY}
    phys = desc.physical_type
    if encs == {fmt.Encoding.PLAIN} and phys != fmt.Type.BOOLEAN \
            and not codes_only:
        kind = "plain"
    elif encs <= dict_encs:
        widths = {s[2][0] for s in splits}
        if len(widths) != 1:
            return None
        kind = "dict"
        width = splits[0][2][0]
    else:
        return None

    nvs = [s[0] for s in splits]
    total_nv = sum(nvs)

    present = None
    def_tables = None
    if desc.max_def_level > 0:
        def_tables = [dd.parse_rle_segments(s[1], nv, 1)
                      for s, nv in zip(splits, nvs)]
        st, ir, pay, words = _cat_rle_tables(def_tables, nvs)
        defs = dd.rle_hybrid_decode_jit(st, ir, pay, words, 1, total_nv)
        present = defs == 1

    if kind == "plain":
        k = np.dtype(np_dtype).itemsize
        parts = []
        n_present_total = 0
        for nv, _ds, vals_raw, _e in splits:
            npre = min(len(vals_raw) // k, nv)
            parts.append(vals_raw[: npre * k])
            n_present_total += npre
        big = parts[0] if len(parts) == 1 else b"".join(parts)
        raw_dev = jnp.asarray(np.frombuffer(big, np.uint8))
        dense = dd.plain_decode_device(raw_dev, np_dtype, n_present_total)
        dense = jnp.pad(dense, (0, total_nv - n_present_total))
    else:
        # the code stream holds only PRESENT values: pages concatenate
        # at their present counts (host-counted from the def tables),
        # not at nv strides
        if def_tables is None:
            npres = nvs
        else:
            npres = [_count_ones_rle(tb, nv)
                     for tb, nv in zip(def_tables, nvs)]
        code_tables = [dd.parse_rle_segments(vals_raw[1:], np_, width)
                       for (nv, _ds, vals_raw, _e), np_ in
                       zip(splits, npres)]
        total_present = sum(npres)
        st, ir, pay, words = _cat_rle_tables(code_tables, npres)
        codes = dd.rle_hybrid_decode_jit(st, ir, pay, words, width,
                                         total_present)
        codes = jnp.pad(codes, (0, total_nv - total_present))
        if codes_only:
            dense = codes.astype(jnp.int32)
        else:
            if dict_dev is None:
                raise ArrowInvalid("dictionary page missing")
            dense = dd.dict_decode_device(codes, dict_dev)

    if present is None:
        return dense, jnp.ones(total_nv, jnp.bool_)
    pos = jnp.clip(jnp.cumsum(present.astype(jnp.int32)) - 1, 0)
    return dense[pos], present


def _decode_data_page(hdr, body, desc, codec, dict_dev, np_dtype,
                      codes_only: bool = False):
    """One data page -> (row_values[nv] on device, present_mask[nv] bool).
    Values in non-present rows are unspecified garbage behind the mask.
    codes_only: return int32 dictionary CODES instead of gathered values
    (the string-on-device model — strings live as codes + a host
    dictionary, exactly like device.block.to_device's ingest)."""
    ptype = fmt.PageType(hdr.type)
    if ptype == fmt.PageType.DATA_PAGE:
        dph = hdr.data_page_header
        nv = dph.num_values or 0
        payload = comp.decompress(codec, body, hdr.uncompressed_page_size)
        off = 0
        def_stream = None
        if desc.max_def_level > 0:
            (ln,) = struct.unpack_from("<I", payload, 0)
            def_stream = payload[4:4 + ln]
            off = 4 + ln
        vals_raw = payload[off:]
        encoding = fmt.Encoding(dph.encoding or 0)
    else:
        dph = hdr.data_page_header_v2
        nv = dph.num_values or 0
        rl = dph.repetition_levels_byte_length or 0
        dl = dph.definition_levels_byte_length or 0
        def_stream = body[rl:rl + dl] if desc.max_def_level > 0 else None
        vals_raw = body[rl + dl:]
        if dph.is_compressed is not False and codec:
            vals_raw = comp.decompress(
                codec, vals_raw, (hdr.uncompressed_page_size or 0) - rl - dl)
        encoding = fmt.Encoding(dph.encoding or 0)

    # definition levels (bit width 1 for flat nullable) decoded on device
    if def_stream is not None:
        st, ir, pay, words = dd.parse_rle_segments(def_stream, nv, 1)
        defs = dd.rle_hybrid_decode_jit(st, ir, pay, words, 1, nv)
        present = defs == 1
    else:
        present = jnp.ones(nv, jnp.bool_)
    # dense index of each row's value among the present values
    pos = jnp.cumsum(present.astype(jnp.int32)) - 1
    pos = jnp.clip(pos, 0)

    phys = desc.physical_type
    if codes_only:
        if encoding not in (fmt.Encoding.RLE_DICTIONARY,
                            fmt.Encoding.PLAIN_DICTIONARY):
            raise ArrowNotImplemented(
                "device string read needs all-dictionary pages "
                f"(page encoding {encoding.name})")
        width = vals_raw[0]
        st, ir, pay, words = dd.parse_rle_segments(vals_raw[1:], nv, width)
        codes = dd.rle_hybrid_decode_jit(st, ir, pay, words, width,
                                         nv).astype(jnp.int32)
        return codes[pos], present
    if encoding == fmt.Encoding.PLAIN:
        if phys == fmt.Type.BOOLEAN:
            # PLAIN boolean is 1-bit packed over present values
            dense = dd.bitunpack_device(
                jnp.asarray(dd.words_from_bytes(vals_raw)), 1, nv
            ).astype(jnp.bool_)
        else:
            k = np.dtype(np_dtype).itemsize
            # clamp: trailing padding bytes must not push n_present past nv
            n_present = min(len(vals_raw) // k, nv)
            raw_dev = jnp.asarray(
                np.frombuffer(vals_raw[:n_present * k], np.uint8))
            dense = dd.plain_decode_device(raw_dev, np_dtype, n_present)
            dense = jnp.pad(dense, (0, nv - n_present))
    elif encoding in (fmt.Encoding.RLE_DICTIONARY,
                      fmt.Encoding.PLAIN_DICTIONARY):
        if dict_dev is None:
            raise ArrowInvalid("dictionary page missing")
        width = vals_raw[0]
        st, ir, pay, words = dd.parse_rle_segments(vals_raw[1:], nv, width)
        codes = dd.rle_hybrid_decode_jit(st, ir, pay, words, width, nv)
        dense = dd.dict_decode_device(codes, dict_dev)
    elif encoding == fmt.Encoding.DELTA_BINARY_PACKED and phys in (
            fmt.Type.INT32, fmt.Type.INT64):
        parsed = dd.parse_delta_segments(bytes(vals_raw))
        if parsed is None:
            raise ArrowNotImplemented(
                "device DELTA decode with >32-bit miniblock widths")
        n_present = min(parsed[6], nv)
        dense = dd.delta_decode_jit(parsed, n_present)
        if phys == fmt.Type.INT32:
            dense = dense.astype(jnp.int32)
        dense = jnp.pad(dense, (0, nv - n_present))
    elif encoding == fmt.Encoding.BYTE_STREAM_SPLIT:
        k = np.dtype(np_dtype).itemsize
        n_present = min(len(vals_raw) // k, nv)
        raw_dev = jnp.asarray(
            np.frombuffer(vals_raw[:n_present * k], np.uint8))
        dense = dd.byte_stream_split_decode_device(raw_dev, np_dtype,
                                                   n_present)
        dense = jnp.pad(dense, (0, nv - n_present))
    else:
        raise ArrowNotImplemented(
            f"device decode for encoding {encoding.name}")

    return dense[pos], present


def read_column_device(pf, rg_i: int, column: str,
                       pad=None) -> DeviceColumn:
    """Read one flat primitive column of one row group STRAIGHT into a
    DeviceColumn (values + packed validity words in HBM)."""
    li, desc = _leaf_of(pf, column)
    if desc.max_rep_level != 0 or desc.max_def_level > 1:
        raise ArrowNotImplemented("device read supports flat columns only")
    if pf._col_crypto.get((rg_i, li)) is not None:
        raise ArrowNotImplemented("device read of encrypted columns")
    field = next(f for f in pf.schema.fields if f.name == column)
    t = field.type
    codes_only = t.is_binary_like and desc.physical_type == fmt.Type.BYTE_ARRAY
    if not codes_only and t.id not in (
            dt.TypeId.INT32, dt.TypeId.INT64, dt.TypeId.FLOAT32,
            dt.TypeId.FLOAT64, dt.TypeId.BOOL):
        raise ArrowNotImplemented(f"device read of {t} columns")
    np_dtype = np.int32 if codes_only else (
        np.bool_ if t.id == dt.TypeId.BOOL else t.np_dtype)

    chunk = pf.metadata.row_groups[rg_i].columns[li]
    codec = chunk.meta_data.codec or 0
    dict_dev = None
    dict_host_vals = None
    data_pages = []
    for hdr, body in _iter_pages(pf, chunk):
        ptype = fmt.PageType(hdr.type)
        if ptype == fmt.PageType.DICTIONARY_PAGE:
            payload = comp.decompress(codec, body, hdr.uncompressed_page_size)
            nvd = hdr.dictionary_page_header.num_values or 0
            dict_host_vals = enc.plain_decode(
                desc.physical_type, payload, nvd, desc.type_length)
            if not codes_only:
                dict_dev = jnp.asarray(np.ascontiguousarray(dict_host_vals))
            else:
                dict_dev = True   # marker: codes are decodable
            continue
        if ptype not in (fmt.PageType.DATA_PAGE, fmt.PageType.DATA_PAGE_V2):
            raise ArrowNotImplemented(f"page type {ptype}")
        data_pages.append((hdr, body))

    fused = _fused_chunk_read(data_pages, desc, codec, dict_dev, np_dtype,
                              codes_only)
    if fused is not None:
        values, mask = fused
    else:
        parts, masks = [], []
        for hdr, body in data_pages:
            vals, present = _decode_data_page(hdr, body, desc, codec,
                                              dict_dev, np_dtype, codes_only)
            parts.append(vals)
            masks.append(present)
        values = jnp.concatenate(parts) if parts else jnp.zeros(0, np_dtype)
        mask = jnp.concatenate(masks) if masks else jnp.zeros(0, jnp.bool_)
    n = int(values.shape[0])
    P = pad if pad is not None else pad_length(n)
    values = jnp.pad(values, (0, P - n))
    validity = None
    if desc.max_def_level > 0:
        mask = jnp.pad(mask, (0, P - n))
        validity = bitmap.pack_mask(mask)
    if codes_only:
        from ..array.builders import make_builder
        bb = make_builder(t)
        for u in (dict_host_vals or []):
            bb.append(u)
        return DeviceColumn(values, validity, n, dt.dictionary(dt.int32, t),
                            dictionary=bb.finish())
    return DeviceColumn(values, validity, n, t)


def read_batch_device(pf, rg_i: int, columns=None, pad=None):
    """All (device-readable) columns of a row group as a DeviceBatch —
    the scan entry point for device pipelines: parquet -> HBM -> compute
    with no host value materialization."""
    from ..device.block import DeviceBatch
    if columns is None:
        columns = [f.name for f in pf.schema.fields]
    nrows = pf.metadata.row_groups[rg_i].num_rows or 0
    if pad is None:
        pad = pad_length(nrows)
    if len(set(columns)) != len(columns):
        raise ArrowInvalid(f"duplicate column names in {columns!r}")
    by_name = {f.name: f for f in pf.schema.fields}
    missing = [c for c in columns if c not in by_name]
    if missing:
        raise ArrowInvalid(f"unknown columns {missing!r}")
    cols = [read_column_device(pf, rg_i, c, pad=pad) for c in columns]
    # fields in REQUESTED order so schema stays positionally aligned with cols
    schema = dt.Schema([by_name[c] for c in columns])
    return DeviceBatch(schema, cols, nrows)
