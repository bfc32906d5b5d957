"""Native kernel library: build-on-first-use C++ with pure-python fallback.

Mirrors the reference's asm/noasm dual-path discipline (SURVEY.md §4: CI
runs every suite twice): every native entry point has a numpy fallback
selected automatically when the toolchain is unavailable, and tests
exercise both via AGT_DISABLE_NATIVE=1.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "libagtcodecs.so"
_SRC = _HERE / "codecs.cc"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AGT_DISABLE_NATIVE"):
            return None
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", str(_SO), str(_SRC)],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_SO))
        except Exception:
            return None
        lib.snappy_max_compressed_length.restype = ctypes.c_size_t
        lib.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.snappy_compress.restype = ctypes.c_int64
        lib.snappy_compress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                        ctypes.c_void_p, ctypes.c_size_t]
        lib.snappy_uncompressed_length.restype = ctypes.c_int64
        lib.snappy_uncompressed_length.argtypes = [ctypes.c_char_p,
                                                   ctypes.c_size_t]
        lib.snappy_decompress.restype = ctypes.c_int64
        lib.snappy_decompress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                          ctypes.c_void_p, ctypes.c_size_t]
        lib.lz4_decompress.restype = ctypes.c_int64
        lib.lz4_decompress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                       ctypes.c_void_p, ctypes.c_size_t]
        lib.lz4_compress.restype = ctypes.c_int64
        lib.lz4_compress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                     ctypes.c_void_p, ctypes.c_size_t]
        lib.lz4_max_compressed_length.restype = ctypes.c_size_t
        lib.lz4_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.bitunpack32.restype = None
        lib.bitunpack32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_uint32, ctypes.c_void_p]
        lib.bitpack32.restype = None
        lib.bitpack32.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                  ctypes.c_uint32, ctypes.c_void_p]
        lib.byte_array_unpack.restype = ctypes.c_int64
        lib.byte_array_unpack.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                          ctypes.c_size_t, ctypes.c_void_p,
                                          ctypes.c_void_p]
        lib.factorize_offsets.restype = ctypes.c_int64
        lib.factorize_offsets.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int32, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_void_p,
                                          ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _build() is not None


# ---------------------------------------------------------------------------
# snappy
# ---------------------------------------------------------------------------

def snappy_compress(data: bytes) -> bytes:
    lib = _build()
    if lib is not None:
        cap = lib.snappy_max_compressed_length(len(data))
        out = ctypes.create_string_buffer(cap)
        n = lib.snappy_compress(data, len(data), out, cap)
        if n < 0:
            raise ValueError("snappy compression failed")
        return out.raw[:n]
    return _py_snappy_compress(data)


def snappy_decompress(data: bytes) -> bytes:
    lib = _build()
    if lib is not None:
        ulen = lib.snappy_uncompressed_length(data, len(data))
        if ulen < 0:
            raise ValueError("bad snappy data")
        out = ctypes.create_string_buffer(max(int(ulen), 1))
        n = lib.snappy_decompress(data, len(data), out, ulen)
        if n < 0:
            raise ValueError("snappy decompression failed")
        return out.raw[:n]
    return _py_snappy_decompress(data)


def _py_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _py_snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy stream (valid per spec; fallback path)."""
    out = bytearray(_py_varint(len(data)))
    i = 0
    while i < len(data):
        c = min(len(data) - i, 65536)
        if c < 60:
            out.append((c - 1) << 2)
        elif c - 1 < 256:
            out.append(60 << 2)
            out.append(c - 1)
        else:
            out.append(61 << 2)
            out += (c - 1).to_bytes(2, "little")
        out += data[i:i + c]
        i += c
    return bytes(out)


def _py_snappy_decompress(data: bytes) -> bytes:
    # varint preamble
    ulen = shift = 0
    s = 0
    while True:
        b = data[s]
        s += 1
        ulen |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    out = bytearray()
    n = len(data)
    while s < n:
        tag = data[s]
        s += 1
        lo = tag & 3
        if lo == 0:
            ln = (tag >> 2) + 1
            if ln > 60:
                extra = ln - 60
                ln = int.from_bytes(data[s:s + extra], "little") + 1
                s += extra
            out += data[s:s + ln]
            s += ln
        else:
            if lo == 1:
                ln = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | data[s]
                s += 1
            elif lo == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[s:s + 2], "little")
                s += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[s:s + 4], "little")
                s += 4
            if off == 0 or off > len(out):
                raise ValueError("bad snappy copy")
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != ulen:
        raise ValueError("snappy length mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# lz4 raw block
# ---------------------------------------------------------------------------

def lz4_compress(data: bytes) -> bytes:
    lib = _build()
    if lib is None:
        return _py_lz4_compress_literal(data)
    cap = lib.lz4_max_compressed_length(len(data))
    out = ctypes.create_string_buffer(cap)
    n = lib.lz4_compress(data, len(data), out, cap)
    if n < 0:
        raise ValueError("lz4 compression failed")
    return out.raw[:n]


def lz4_decompress(data: bytes, uncompressed_size: int) -> bytes:
    lib = _build()
    if lib is None:
        return _py_lz4_decompress(data, uncompressed_size)
    out = ctypes.create_string_buffer(max(uncompressed_size, 1))
    n = lib.lz4_decompress(data, len(data), out, uncompressed_size)
    if n < 0:
        raise ValueError("lz4 decompression failed")
    return out.raw[:n]


def _py_lz4_compress_literal(data: bytes) -> bytes:
    """Literal-only LZ4 block (valid per spec; fallback path)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"
    lit = n
    token = (15 if lit >= 15 else lit) << 4
    out.append(token)
    if lit >= 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)


def _py_lz4_decompress(data: bytes, usize: int) -> bytes:
    out = bytearray()
    s, n = 0, len(data)
    while s < n:
        token = data[s]
        s += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[s]
                s += 1
                lit += b
                if b != 255:
                    break
        out += data[s:s + lit]
        s += lit
        if s >= n:
            break
        off = int.from_bytes(data[s:s + 2], "little")
        s += 2
        ml = token & 0x0F
        if ml == 15:
            while True:
                b = data[s]
                s += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        for _ in range(ml):
            out.append(out[-off])
    return bytes(out)


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------

def bitunpack32(data: bytes, n: int, width: int) -> np.ndarray:
    """Unpack n `width`-bit LSB-first values -> uint32 array."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint32)
    lib = _build()
    if lib is not None:
        padded = bytes(data) + b"\0" * 8   # kernel reads 8B past last value
        out = np.empty(n, dtype=np.uint32)
        lib.bitunpack32(padded, n,
                        width, out.ctypes.data_as(ctypes.c_void_p))
        return out
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    need = n * width
    if bits.size < need:
        bits = np.pad(bits, (0, need - bits.size))
    bits = bits[:need].reshape(n, width).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(width, dtype=np.uint32))
    return (bits * weights).sum(axis=1, dtype=np.uint32)


def bitpack32(values: np.ndarray, width: int) -> bytes:
    """Pack uint32 values into `width`-bit LSB-first bytes."""
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0 or width == 0:
        return b""
    nbytes = (n * width + 7) // 8
    lib = _build()
    if lib is not None:
        out = np.zeros(nbytes + 8, dtype=np.uint8)   # kernel writes 8B slack
        lib.bitpack32(values.ctypes.data_as(ctypes.c_void_p), n, width,
                      out.ctypes.data_as(ctypes.c_void_p))
        return out[:nbytes].tobytes()
    bits = (values[:, None] >> np.arange(width, dtype=np.uint32)) & 1
    return np.packbits(bits.astype(np.uint8).ravel(),
                       bitorder="little")[:nbytes].tobytes()


def byte_array_unpack(data: bytes, n: int):
    """Parquet BYTE_ARRAY plain stream -> (offsets[n+1] int64, packed bytes
    np.uint8). Native C walk; python fallback."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)      # ctypes needs a real byte buffer
    lib = _build()
    if lib is not None and n:
        offsets = np.empty(n + 1, dtype=np.int64)
        compact = np.empty(max(len(data), 1), dtype=np.uint8)
        got = lib.byte_array_unpack(data, len(data), n,
                                    offsets.ctypes.data_as(ctypes.c_void_p),
                                    compact.ctypes.data_as(ctypes.c_void_p))
        if got < 0:
            raise ValueError("malformed BYTE_ARRAY stream")
        return offsets, compact[:got]
    # python fallback
    import struct as _struct
    offsets = np.zeros(n + 1, dtype=np.int64)
    parts = []
    pos = 0
    for i in range(n):
        (ln,) = _struct.unpack_from("<I", data, pos)
        pos += 4
        parts.append(data[pos:pos + ln])
        offsets[i + 1] = offsets[i] + ln
        pos += ln
    return offsets, np.frombuffer(b"".join(parts) if parts else b"",
                                  dtype=np.uint8)


# ---------------------------------------------------------------------------
# LZ4 frame format (IPC body compression; wraps the raw block codec)
# ---------------------------------------------------------------------------

_LZ4F_MAGIC = 0x184D2204


def lz4_frame_compress(data: bytes, block_size: int = 1 << 20) -> bytes:
    """Minimal LZ4 frame: FLG(no checksums, no content size), BD(4MB max),
    independent blocks."""
    import struct as _s
    out = bytearray(_s.pack("<I", _LZ4F_MAGIC))
    flg = 0x40          # version 01, everything else off
    bd = 0x70           # 4MB max block size
    out.append(flg)
    out.append(bd)
    # header checksum: (xxh32(descriptor) >> 8) & 0xFF
    import xxhash
    out.append((xxhash.xxh32_intdigest(bytes([flg, bd]), seed=0) >> 8) & 0xFF)
    for i in range(0, max(len(data), 1), block_size):
        chunk = data[i:i + block_size]
        if not chunk:
            break
        comp = lz4_compress(chunk)
        if len(comp) < len(chunk):
            out += _s.pack("<I", len(comp))
            out += comp
        else:
            out += _s.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += _s.pack("<I", 0)  # end mark
    return bytes(out)


def lz4_frame_decompress(data: bytes, uncompressed_size: int) -> bytes:
    import struct as _s
    (magic,) = _s.unpack_from("<I", data, 0)
    if magic != _LZ4F_MAGIC:
        raise ValueError("bad lz4 frame magic")
    flg = data[4]
    pos = 6  # magic + FLG + BD
    pos += 1  # header checksum byte
    if flg & 0x08:  # content size present
        pos += 8
    if flg & 0x01:  # dict id
        pos += 4
    block_checksum = bool(flg & 0x10)
    content_checksum = bool(flg & 0x04)
    out = bytearray()
    while pos + 4 <= len(data):
        (size,) = _s.unpack_from("<I", data, pos)
        pos += 4
        if size == 0:
            break
        uncompressed = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        block = data[pos:pos + size]
        pos += size
        if block_checksum:
            pos += 4
        if uncompressed:
            out += block
        elif flg & 0x20:  # independent blocks: fresh window per block
            out += lz4_decompress(block, uncompressed_size - len(out))
        else:             # linked blocks: matches may reach into prior output
            _py_lz4_decompress_into(block, out)
    return bytes(out)


def _py_lz4_decompress_into(data: bytes, out: bytearray) -> None:
    s, n = 0, len(data)
    while s < n:
        token = data[s]
        s += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[s]
                s += 1
                lit += b
                if b != 255:
                    break
        out += data[s:s + lit]
        s += lit
        if s >= n:
            break
        off = int.from_bytes(data[s:s + 2], "little")
        s += 2
        ml = token & 0x0F
        if ml == 15:
            while True:
                b = data[s]
                s += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        for _ in range(ml):
            out.append(out[-off])


def factorize_offsets(data: np.ndarray, offsets: np.ndarray,
                      valid: Optional[np.ndarray] = None):
    """First-occurrence dictionary-encode of offsets+data byte rows (the
    reference's internal/hashing memo-table GetOrInsert, as native code).
    offsets: int32 or int64, length n+1, zero-copy from the array buffer.
    valid: optional bool array; null rows encode as the empty string.
    Returns (codes int32[n], uniq_first int64[n_uniq]) or None when the
    native library is unavailable (callers fall back to numpy)."""
    lib = _build()
    if lib is None:
        return None
    n = len(offsets) - 1
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets)
    offw = offsets.dtype.itemsize
    if offw not in (4, 8):
        return None
    vptr = None
    if valid is not None:
        valid = np.ascontiguousarray(valid, dtype=np.uint8)
        vptr = valid.ctypes.data_as(ctypes.c_void_p)
    codes = np.empty(max(n, 1), dtype=np.int32)
    uniq_first = np.empty(max(n, 1), dtype=np.int64)
    got = lib.factorize_offsets(
        data.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p), offw, vptr, n,
        codes.ctypes.data_as(ctypes.c_void_p),
        uniq_first.ctypes.data_as(ctypes.c_void_p))
    if got < 0:
        return None
    return codes[:n], uniq_first[:got]
