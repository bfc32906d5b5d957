"""Parquet encodings: PLAIN, RLE/bit-packed hybrid, dictionary.

Reference: parquet/internal/encoding (plain_encoding_types.go, the
RLE/bit-packed hybrid decoder internal/utils/rle.go:102, dictionary
encoding memo tables). Decode paths are numpy-vectorized per run with the
native bit-unpack kernel (arrow_go_tpu/native) on the hot path.
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from .. import native
from . import format as fmt

# ---------------------------------------------------------------------------
# PLAIN
# ---------------------------------------------------------------------------

_PHYS_NP = {
    fmt.Type.INT32: np.dtype("<i4"),
    fmt.Type.INT64: np.dtype("<i8"),
    fmt.Type.FLOAT: np.dtype("<f4"),
    fmt.Type.DOUBLE: np.dtype("<f8"),
}


def plain_encode(phys: fmt.Type, values, type_length: int = 0) -> bytes:
    if phys in _PHYS_NP:
        return np.ascontiguousarray(values, dtype=_PHYS_NP[phys]).tobytes()
    if phys == fmt.Type.BOOLEAN:
        return np.packbits(np.asarray(values, dtype=np.bool_),
                           bitorder="little").tobytes()
    if phys == fmt.Type.BYTE_ARRAY:
        out = bytearray()
        for v in values:
            out += struct.pack("<I", len(v))
            out += v
        return bytes(out)
    if phys == fmt.Type.FIXED_LEN_BYTE_ARRAY:
        return b"".join(values)
    if phys == fmt.Type.INT96:
        return np.ascontiguousarray(values, dtype=np.uint8).tobytes()
    raise NotImplementedError(phys)


def plain_decode(phys: fmt.Type, data: bytes, n: int, type_length: int = 0):
    if phys in _PHYS_NP:
        dt = _PHYS_NP[phys]
        return np.frombuffer(data, dtype=dt, count=n)
    if phys == fmt.Type.BOOLEAN:
        return np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                             bitorder="little")[:n].astype(np.bool_)
    if phys == fmt.Type.BYTE_ARRAY:
        offsets, packed = native.byte_array_unpack(data, n)
        mv = memoryview(packed.tobytes())
        return [bytes(mv[offsets[i]:offsets[i + 1]]) for i in range(n)]
    if phys == fmt.Type.FIXED_LEN_BYTE_ARRAY:
        w = type_length
        return [data[i * w:(i + 1) * w] for i in range(n)]
    if phys == fmt.Type.INT96:
        return np.frombuffer(data, dtype=np.uint8, count=n * 12).reshape(n, 12)
    raise NotImplementedError(phys)


def byte_array_decode_vectorized(data: bytes, n: int
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """BYTE_ARRAY plain decode -> (offsets[n+1] int32, data bytes np.uint8)
    without per-value python objects (hot path for string columns)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    lengths = np.empty(n, dtype=np.int64)
    pos = 0
    mv = memoryview(data)
    # first pass: lengths (python loop over n, but no object creation)
    for i in range(n):
        (ln,) = struct.unpack_from("<I", mv, pos)
        lengths[i] = ln
        pos += 4 + ln
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    pos = 0
    for i in range(n):
        ln = int(lengths[i])
        pos += 4
        out[int(offsets[i]):int(offsets[i + 1])] = buf[pos:pos + ln]
        pos += ln
    return offsets, out


# ---------------------------------------------------------------------------
# RLE / bit-packed hybrid (levels + dictionary indices)
# ---------------------------------------------------------------------------

def _uvarint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def rle_decode(data: bytes, n: int, bit_width: int) -> np.ndarray:
    """Decode n values from an RLE/bit-packed hybrid stream -> uint32."""
    if bit_width == 0:
        return np.zeros(n, dtype=np.uint32)
    out = np.empty(n, dtype=np.uint32)
    got = 0
    pos = 0
    nbytes = (bit_width + 7) // 8
    L = len(data)
    while got < n and pos < L:
        header = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        if header & 1:  # bit-packed: (header>>1) groups of 8
            count = (header >> 1) * 8
            take = min(count, n - got)
            need_bytes = (count * bit_width + 7) // 8
            vals = native.bitunpack32(data[pos:pos + need_bytes], take,
                                      bit_width)
            out[got:got + take] = vals
            got += take
            pos += need_bytes
        else:  # RLE run
            count = header >> 1
            v = int.from_bytes(data[pos:pos + nbytes], "little")
            pos += nbytes
            take = min(count, n - got)
            out[got:got + take] = v
            got += take
    if got < n:
        out[got:] = 0
    return out


def rle_encode(values: np.ndarray, bit_width: int) -> bytes:
    """Encode uint32 values as an RLE/bit-packed hybrid stream. Long constant
    runs become RLE; the rest bit-packs in groups of 8 (reference
    internal/utils/rle.go encoder strategy)."""
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    out = bytearray()
    nbytes = (bit_width + 7) // 8
    change = np.nonzero(np.diff(values))[0] + 1
    starts = np.concatenate(([0], change)).tolist()
    ends = np.concatenate((change, [n])).tolist()

    MIN_RLE = 8
    lit: list = []   # pending literal values (mid-stream groups must be 8s)

    def emit_packed(vals: list, pad: bool):
        groups = (len(vals) + 7) // 8 if pad else len(vals) // 8
        if not groups:
            return vals
        take = len(vals) if pad else groups * 8
        padded = np.zeros(groups * 8, dtype=np.uint32)
        padded[:take] = vals[:take]
        _uvarint(out, (groups << 1) | 1)
        out.extend(native.bitpack32(padded, bit_width))
        return vals[take:]

    def emit_rle(count: int, val: int):
        _uvarint(out, count << 1)
        out.extend(int(val).to_bytes(nbytes, "little"))

    for s, e in zip(starts, ends):
        run = e - s
        val = int(values[s])
        if not lit and run >= MIN_RLE:
            emit_rle(run, val)
            continue
        if lit and run >= MIN_RLE + 8:
            # top up the literal buffer to a group boundary from this run,
            # then RLE the rest
            need = (-len(lit)) % 8
            lit.extend([val] * need)
            lit = emit_packed(lit, pad=False)
            emit_rle(run - need, val)
            continue
        lit.extend([val] * run)
        lit = emit_packed(lit, pad=False)
    emit_packed(lit, pad=True)
    return bytes(out)


def bit_width_for(max_value: int) -> int:
    """ceil(log2(max+1)): 0 -> 0 bits (all-zero stream)."""
    return int(max_value).bit_length()


def levels_decode_v1(data: bytes, n: int, bit_width: int
                     ) -> Tuple[np.ndarray, int]:
    """V1 data page levels: int32 byte length prefix + hybrid stream.
    Returns (levels, bytes consumed)."""
    (ln,) = struct.unpack_from("<I", data, 0)
    levels = rle_decode(data[4:4 + ln], n, bit_width)
    return levels, 4 + ln


def levels_encode_v1(levels: np.ndarray, bit_width: int) -> bytes:
    enc = rle_encode(levels, bit_width)
    return struct.pack("<I", len(enc)) + enc


# ---------------------------------------------------------------------------
# DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY /
# BYTE_STREAM_SPLIT decoders
# (reference parquet/internal/encoding/delta_bit_packing.go,
#  delta_byte_array.go, byte_stream_split_decode_*.s)
# ---------------------------------------------------------------------------

def _pack_bits(values: np.ndarray, w: int) -> bytes:
    """LSB-first bit-pack at any width w <= 64 (native kernel for w <= 32,
    numpy bit-matrix fallback above)."""
    if w == 0 or len(values) == 0:
        return b""
    if w <= 32:
        return bytes(native.bitpack32(np.ascontiguousarray(
            values, dtype=np.uint32), w))
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    bits = ((vals[:, None] >> np.arange(w, dtype=np.uint64)) & 1
            ).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack_bits(data: bytes, n: int, w: int) -> np.ndarray:
    """Inverse of _pack_bits -> uint64 values."""
    if w == 0:
        return np.zeros(n, dtype=np.uint64)
    if w <= 32:
        return native.bitunpack32(data, n, w).astype(np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")[:n * w]
    return (bits.reshape(n, w).astype(np.uint64)
            << np.arange(w, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


class _VarReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def uvarint(self) -> int:
        out = shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.uvarint()
        return (v >> 1) ^ -(v & 1)


def delta_binary_packed_decode(data: bytes, n: Optional[int] = None
                               ) -> Tuple[np.ndarray, int]:
    """Returns (values int64, bytes consumed)."""
    r = _VarReader(data)
    block_size = r.uvarint()
    miniblocks = r.uvarint()
    total = r.uvarint()
    first = r.zigzag()
    count = n if n is not None else total
    vpm = block_size // miniblocks  # values per miniblock
    out = np.empty(max(total, 1), dtype=np.int64)
    out[0] = first
    got = 1
    while got < total:
        min_delta = r.zigzag()
        widths = data[r.pos:r.pos + miniblocks]
        r.pos += miniblocks
        for m in range(miniblocks):
            if got >= total:
                # trailing miniblocks may still occupy space per spec;
                # they are only present if written -- stop reading
                break
            w = widths[m]
            nbytes = (vpm * w + 7) // 8
            take = min(vpm, total - got)
            if w == 0:
                deltas = np.zeros(take, dtype=np.int64)
            else:
                deltas = _unpack_bits(data[r.pos:r.pos + nbytes], take,
                                      w).astype(np.int64)
            r.pos += nbytes
            out[got:got + take] = deltas + min_delta
            got += take
    values = np.cumsum(out[:total])
    return values[:count if n is not None else total], r.pos


def delta_length_byte_array_decode(data: bytes, n: int) -> list:
    lengths, used = delta_binary_packed_decode(data)
    out = []
    pos = used
    for ln in lengths[:n]:
        out.append(data[pos:pos + int(ln)])
        pos += int(ln)
    return out


def delta_byte_array_decode(data: bytes, n: int) -> list:
    prefix_lens, used = delta_binary_packed_decode(data)
    suffixes = delta_length_byte_array_decode(data[used:], n)
    out = []
    prev = b""
    for p, s in zip(prefix_lens[:n], suffixes):
        v = prev[:int(p)] + s
        out.append(v)
        prev = v
    return out


def byte_stream_split_decode(data: bytes, n: int, byte_width: int
                             ) -> np.ndarray:
    """k byte-streams -> interleaved values (returns raw uint8 [n, width])."""
    streams = np.frombuffer(data, dtype=np.uint8,
                            count=n * byte_width).reshape(byte_width, n)
    return np.ascontiguousarray(streams.T)


# ---------------------------------------------------------------------------
# DELTA_* / BYTE_STREAM_SPLIT encoders
# (reference parquet/internal/encoding/delta_bit_packing.go DeltaBitPack
#  encoder, delta_length_byte_array.go, delta_byte_array.go,
#  byte_stream_split.go — same formats, numpy block math instead of
#  per-value Put loops)
# ---------------------------------------------------------------------------

def _zigzag64(x: int) -> int:
    return (x << 1) ^ (x >> 63)


def delta_binary_packed_encode(values, block_size: int = 128,
                               miniblocks: int = 4) -> bytes:
    """DELTA_BINARY_PACKED encoder (parquet-format Delta Encoding).
    Default geometry 128/4 matches the reference writer."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    total = len(v)
    out = bytearray()
    _uvarint(out, block_size)
    _uvarint(out, miniblocks)
    _uvarint(out, total)
    _uvarint(out, _zigzag64(int(v[0]) if total else 0))
    if total <= 1:
        return bytes(out)
    with np.errstate(over="ignore"):
        deltas = np.subtract(v[1:], v[:-1])
    vpm = block_size // miniblocks
    for bstart in range(0, len(deltas), block_size):
        block = deltas[bstart:bstart + block_size]
        min_delta = int(block.min())
        _uvarint(out, _zigzag64(min_delta))
        adjusted = (block.astype(np.uint64)
                    - np.uint64(min_delta & 0xFFFFFFFFFFFFFFFF))
        widths = bytearray()
        payloads = []
        for m in range(miniblocks):
            sub = adjusted[m * vpm:(m + 1) * vpm]
            if len(sub) == 0:
                # trailing miniblocks with no values: width byte present,
                # payload omitted (spec: readers must not read them)
                widths.append(0)
                continue
            w = int(sub.max()).bit_length()
            widths.append(w)
            if len(sub) < vpm:
                sub = np.concatenate(
                    [sub, np.zeros(vpm - len(sub), dtype=np.uint64)])
            payloads.append(_pack_bits(sub, w))
        out.extend(widths)
        for p in payloads:
            out.extend(p)
    return bytes(out)


def delta_length_byte_array_encode(values: List[bytes]) -> bytes:
    lengths = np.fromiter((len(x) for x in values), dtype=np.int64,
                          count=len(values))
    return delta_binary_packed_encode(lengths) + b"".join(values)


def delta_byte_array_encode(values: List[bytes]) -> bytes:
    prefix_lens = np.zeros(len(values), dtype=np.int64)
    suffixes: List[bytes] = []
    prev = b""
    for i, cur in enumerate(values):
        cur = bytes(cur)
        p = 0
        lim = min(len(prev), len(cur))
        while p < lim and prev[p] == cur[p]:
            p += 1
        prefix_lens[i] = p
        suffixes.append(cur[p:])
        prev = cur
    return (delta_binary_packed_encode(prefix_lens)
            + delta_length_byte_array_encode(suffixes))


def byte_stream_split_encode(raw: np.ndarray) -> bytes:
    """Interleaved values -> k byte-streams. raw is uint8 [n, byte_width]
    (the transpose of byte_stream_split_decode's output)."""
    return np.ascontiguousarray(raw.T).tobytes()
