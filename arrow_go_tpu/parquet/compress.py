"""Parquet compression codec registry (reference parquet/compress).

snappy + lz4_raw use our native C++ kernels (arrow_go_tpu/native);
gzip/zstd use the stdlib/zstandard; brotli uses whichever brotli
library is importable (``brotli``/``brotlicffi``, else pyarrow's
bundled codec — a compression library only, none of our arrow logic
rides on it) and is gated off with a clear error when none exists.
LZO has no pure-spec implementation available and is unsupported,
matching the reference (parquet/compress/compress.go registers no LZO
codec either).
"""
from __future__ import annotations

import zlib

from .. import native
from ..compute.errors import ArrowNotImplemented
from . import format as fmt


def _brotli_backend():
    """Best-available brotli implementation, or None."""
    try:
        import brotli            # noqa: F401  (not in the base image)
        return ("brotli", brotli)
    except ImportError:
        pass
    try:
        import brotlicffi        # noqa: F401
        return ("brotli", brotlicffi)
    except ImportError:
        pass
    try:
        import pyarrow
        pyarrow.Codec("brotli")  # raises if built without brotli
        return ("pyarrow", pyarrow)
    except Exception:
        return None


def _brotli_compress(data: bytes, level) -> bytes:
    be = _brotli_backend()
    if be is None:
        raise ArrowNotImplemented(
            "parquet codec BROTLI: no brotli library available "
            "(install 'brotli' or a pyarrow built with brotli)")
    kind, mod = be
    if kind == "brotli":
        return mod.compress(data, quality=11 if level is None else level)
    codec = (mod.Codec("brotli") if level is None
             else mod.Codec("brotli", compression_level=level))
    return codec.compress(data).to_pybytes()


def _brotli_decompress(data: bytes, uncompressed_size: int) -> bytes:
    be = _brotli_backend()
    if be is None:
        raise ArrowNotImplemented(
            "parquet codec BROTLI: no brotli library available "
            "(install 'brotli' or a pyarrow built with brotli)")
    kind, mod = be
    if kind == "brotli":
        return mod.decompress(data)
    return mod.Codec("brotli").decompress(
        data, uncompressed_size).to_pybytes()


def compress(codec: int, data: bytes, level: int = None) -> bytes:
    """level: codec-specific compression level (reference
    WithCompressionLevel, parquet/writer_properties.go:319); None = codec
    default. Honored by gzip (1-9) and zstd; snappy/lz4_raw have none."""
    c = fmt.Codec(codec)
    if c == fmt.Codec.UNCOMPRESSED:
        return data
    if c == fmt.Codec.SNAPPY:
        return native.snappy_compress(data)
    if c == fmt.Codec.GZIP:
        co = zlib.compressobj(
            level if level is not None else -1, wbits=31)  # gzip container
        return co.compress(data) + co.flush()
    if c == fmt.Codec.ZSTD:
        import zstandard
        return zstandard.ZstdCompressor(
            level=level if level is not None else 3).compress(data)
    if c == fmt.Codec.LZ4_RAW:
        return native.lz4_compress(data)
    if c == fmt.Codec.BROTLI:
        return _brotli_compress(data, level)
    raise ArrowNotImplemented(f"parquet codec {c.name}")


_zstd_local = None


def _zstd_dctx():
    # one decompressor per thread (construction per page showed up in
    # the scan profile; the object is not thread-safe, hence the TLS)
    global _zstd_local
    import threading
    import zstandard
    if _zstd_local is None:
        _zstd_local = threading.local()
    d = getattr(_zstd_local, "d", None)
    if d is None:
        d = zstandard.ZstdDecompressor()
        _zstd_local.d = d
    return d


def decompress(codec: int, data: bytes, uncompressed_size: int) -> bytes:
    c = fmt.Codec(codec)
    if c == fmt.Codec.UNCOMPRESSED:
        return data
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)      # ctypes codecs need a real byte buffer
    if c == fmt.Codec.SNAPPY:
        return native.snappy_decompress(data)
    if c == fmt.Codec.GZIP:
        return zlib.decompress(data, wbits=47)
    if c == fmt.Codec.ZSTD:
        return _zstd_dctx().decompress(data,
                                       max_output_size=uncompressed_size)
    if c == fmt.Codec.LZ4_RAW:
        return native.lz4_decompress(data, uncompressed_size)
    if c == fmt.Codec.BROTLI:
        return _brotli_decompress(data, uncompressed_size)
    raise ArrowNotImplemented(f"parquet codec {c.name}")


CODEC_NAMES = {"none": fmt.Codec.UNCOMPRESSED,
               "uncompressed": fmt.Codec.UNCOMPRESSED,
               "snappy": fmt.Codec.SNAPPY,
               "gzip": fmt.Codec.GZIP,
               "zstd": fmt.Codec.ZSTD,
               "lz4": fmt.Codec.LZ4_RAW,
               "lz4_raw": fmt.Codec.LZ4_RAW,
               "brotli": fmt.Codec.BROTLI}
