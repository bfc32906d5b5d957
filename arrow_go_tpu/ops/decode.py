"""Device-side parquet page decoding (the TPU inversion of the reference's
SIMD decode tier: parquet/internal/utils/_lib/bit_packing_avx2.c bit-unpack,
internal/utils/rle.go RLE/bit-packed hybrid, and the BYTE_STREAM_SPLIT asm
parquet/internal/encoding/byte_stream_split_decode_avx2_amd64.s).

Split of labor: the host parses the *control stream* (page headers, RLE
run headers — a few bytes per thousand values) into flat segment tables;
the *bulk bytes* ship to HBM once and every value is decoded by a gather +
shift/mask XLA program with no data-dependent control flow:

  out[i]:  seg   = searchsorted(seg_starts, i)          (one gather)
           RLE   -> seg_value[seg]                      (one gather)
           packed-> window of the two u32 words holding
                    bits [bit0, bit0+bw) of the stream   (two gathers)

All shapes are static per (n, bit_width) pair — XLA compiles one kernel
per bucket exactly like the rest of the engine.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..jaxenv import jax, jnp


# ---------------------------------------------------------------------------
# bit-unpack: LSB-first packed integers of width 1..32 -> uint32
# ---------------------------------------------------------------------------

def bitunpack_device(words: jax.Array, bit_width: int, n: int,
                     bit_offsets=None) -> jax.Array:
    """Unpack n LSB-first bit-packed values from uint32 words.

    bit_offsets: optional int32[n] absolute starting bit of each output
    value (defaults to i*bit_width — the contiguous case). `words` must
    carry one trailing guard word so the wi+1 gather stays in bounds.
    """
    if bit_width == 0:
        return jnp.zeros(n, jnp.uint32)
    if bit_offsets is None:
        bit_offsets = jnp.arange(n, dtype=jnp.int32) * bit_width
    bit_offsets = bit_offsets.astype(jnp.int32)
    wi = bit_offsets // 32
    off = (bit_offsets & 31).astype(jnp.uint32)
    lo = jax.lax.shift_right_logical(words[wi], off)
    # off==0 would shift by 32 (undefined): guard to a zero contribution
    hi_shift = jnp.where(off > 0, 32 - off, 1).astype(jnp.uint32)
    hi = jnp.where(off > 0, jax.lax.shift_left(words[wi + 1], hi_shift), 0)
    mask = jnp.uint32(0xFFFFFFFF) if bit_width >= 32 else \
        jnp.uint32((1 << bit_width) - 1)
    return (lo | hi) & mask


def words_from_bytes(data: bytes) -> np.ndarray:
    """Host helper: little-endian byte stream -> uint32 words with one
    trailing guard word (the form bitunpack_device consumes)."""
    pad = (-len(data)) % 4
    buf = data + b"\0" * (pad + 4)
    return np.frombuffer(buf, dtype="<u4")


# ---------------------------------------------------------------------------
# RLE/bit-packed hybrid (parquet levels + dictionary indices)
# ---------------------------------------------------------------------------

def parse_rle_segments(data: bytes, n: int, bit_width: int
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """Host control-stream parse of an RLE/bit-packed hybrid stream.

    Returns (seg_starts, seg_is_run, seg_payload, words):
      seg_starts[s]  first output index of segment s (int32, ascending)
      seg_is_run[s]  1 if segment s is an RLE run else bit-packed (uint32)
      seg_payload[s] run: the repeated value; packed: the absolute bit
                     offset of the segment's first value in `words`
      words          uint32 bit stream of ALL packed groups, concatenated
                     byte-aligned per group (+ guard word)
    Only headers are touched here; packed group bytes are sliced wholesale.
    """
    starts, is_run, payload = [], [], []
    packed = bytearray()
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
        if header & 1:                      # bit-packed group of 8s
            count = (header >> 1) * 8
            need = (count * bit_width + 7) // 8
            starts.append(got)
            is_run.append(0)
            payload.append(len(packed) * 8)  # bit offset into `packed`
            packed.extend(data[pos:pos + need])
            pos += need
            got += min(count, n - got)
        else:                               # RLE run
            count = header >> 1
            v = int.from_bytes(data[pos:pos + nbytes], "little")
            pos += nbytes
            starts.append(got)
            is_run.append(1)
            payload.append(v)
            got += min(count, n - got)
    if not starts:
        starts, is_run, payload = [0], [1], [0]
    return (np.asarray(starts, np.int32), np.asarray(is_run, np.uint32),
            np.asarray(payload, np.int64), words_from_bytes(bytes(packed)))


def rle_hybrid_decode_device(seg_starts: jax.Array, seg_is_run: jax.Array,
                             seg_payload: jax.Array, words: jax.Array,
                             bit_width: int, n: int) -> jax.Array:
    """Decode the segment-table form of parse_rle_segments on device."""
    if bit_width == 0:
        return jnp.zeros(n, jnp.uint32)
    i = jnp.arange(n, dtype=jnp.int32)
    seg = jnp.searchsorted(seg_starts, i, side="right") - 1
    run = seg_is_run[seg]                       # 1 = RLE
    pay = seg_payload[seg]
    rel = i - seg_starts[seg]                   # index within the segment
    bit0 = (pay + rel.astype(jnp.int64) * bit_width).astype(jnp.int32)
    # run segments carry a VALUE in pay, not a bit offset — clamp their
    # lanes to bit 0 so the (discarded) gather stays in bounds
    bit0 = jnp.where(run == 1, 0, bit0)
    packed_vals = bitunpack_device(words, bit_width, n, bit_offsets=bit0)
    return jnp.where(run == 1, pay.astype(jnp.uint32), packed_vals)


def _bucket(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length()


def pad_segments(st: np.ndarray, ir: np.ndarray, pay: np.ndarray,
                 words: np.ndarray):
    """Pad segment tables and the word stream to power-of-2 buckets so the
    jitted decode compiles once per bucket, not once per page. Padding
    starts use INT32_MAX: sorted order holds and searchsorted(side=right)-1
    never lands on them for real indices."""
    S = _bucket(len(st))
    stp = np.full(S, np.iinfo(np.int32).max, np.int32)
    stp[:len(st)] = st
    irp = np.zeros(S, np.uint32); irp[:len(ir)] = ir
    payp = np.zeros(S, np.int64); payp[:len(pay)] = pay
    W = _bucket(len(words))
    wp = np.zeros(W, np.uint32); wp[:len(words)] = words
    return stp, irp, payp, wp


_rle_hybrid_jit = None


def rle_hybrid_decode_jit(st, ir, pay, words, bit_width: int, n: int):
    """One fused XLA program per (segment-bucket, word-bucket, bw, n)."""
    global _rle_hybrid_jit
    if _rle_hybrid_jit is None:
        _rle_hybrid_jit = jax.jit(rle_hybrid_decode_device,
                                  static_argnums=(4, 5))
    stp, irp, payp, wp = pad_segments(st, ir, pay, words)
    return _rle_hybrid_jit(jnp.asarray(stp), jnp.asarray(irp),
                           jnp.asarray(payp), jnp.asarray(wp), bit_width, n)


def rle_decode_device(data: bytes, n: int, bit_width: int) -> jax.Array:
    """Convenience: host control parse + device decode in one call
    (device analog of parquet/encodings.rle_decode)."""
    st, ir, pay, words = parse_rle_segments(data, n, bit_width)
    return rle_hybrid_decode_jit(st, ir, pay, words, bit_width, n)


# ---------------------------------------------------------------------------
# PLAIN + BYTE_STREAM_SPLIT
# ---------------------------------------------------------------------------

def plain_decode_device(raw: jax.Array, np_dtype, n: int) -> jax.Array:
    """PLAIN little-endian fixed-width values from a uint8 byte stream."""
    dt_ = np.dtype(np_dtype)
    k = dt_.itemsize
    b = raw[: n * k].reshape(n, k).astype(jnp.uint32)
    if k == 1:
        word = b[:, 0]
        out_int = jnp.uint8
    elif k == 2:
        word = b[:, 0] | (b[:, 1] << 8)
        out_int = jnp.uint16
    elif k == 4:
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        out_int = jnp.uint32
    else:  # 8-byte: combine as two u32 lanes then widen
        lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
        word = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << 32)
        out_int = jnp.uint64
    word = word.astype(out_int)
    if dt_.kind == "f":
        return jax.lax.bitcast_convert_type(
            word, {2: jnp.float16, 4: jnp.float32, 8: jnp.float64}[k])
    if dt_.kind == "i":
        return word.astype({1: jnp.int8, 2: jnp.int16, 4: jnp.int32,
                            8: jnp.int64}[k])
    return word


def byte_stream_split_decode_device(raw: jax.Array, np_dtype,
                                    n: int) -> jax.Array:
    """BYTE_STREAM_SPLIT: k planes of n bytes -> n k-byte values (device
    analog of byte_stream_split_decode_avx2 asm: a transpose the TPU's
    layout engine does for free)."""
    k = np.dtype(np_dtype).itemsize
    interleaved = raw[: n * k].reshape(k, n).T.reshape(-1)
    return plain_decode_device(interleaved, np_dtype, n)


def dict_decode_device(indices: jax.Array, dictionary: jax.Array
                       ) -> jax.Array:
    """RLE_DICTIONARY: gather decoded dictionary values by code."""
    return dictionary[indices.astype(jnp.int32)]


# ---------------------------------------------------------------------------
# DELTA_BINARY_PACKED (parquet delta encoding): host parses the
# block/miniblock control stream; the device does a VARIABLE-WIDTH
# bit-unpack (per-miniblock widths ride a segment gather — only the
# shift/mask are data-dependent, which XLA handles natively) and a
# chunked prefix sum reconstructs the values.
# ---------------------------------------------------------------------------

def parse_delta_segments(data: bytes, n=None):
    """Host control parse. Returns (mb_starts, mb_bit0, mb_width,
    mb_min_delta, packed_words, first_value, total, bytes_consumed) or
    None when a miniblock width exceeds 32 (host fallback; >32-bit
    deltas need a 3-word window)."""
    from ..parquet.encodings import _VarReader
    r = _VarReader(data)
    block_size = r.uvarint()
    miniblocks = r.uvarint()
    total = r.uvarint()
    first = r.zigzag()
    vpm = block_size // miniblocks
    starts, bit0s, widths, mins = [], [], [], []
    packed = bytearray()
    got = 1                                   # first value is literal
    while got < total:
        min_delta = r.zigzag()
        wbytes = data[r.pos:r.pos + miniblocks]
        r.pos += miniblocks
        for m in range(miniblocks):
            if got >= total:
                break
            w = wbytes[m]
            if w > 32:
                return None
            nbytes = (vpm * w + 7) // 8
            take = min(vpm, total - got)
            starts.append(got - 1)            # delta index domain
            bit0s.append(len(packed) * 8)
            widths.append(w)
            mins.append(min_delta)
            packed.extend(data[r.pos:r.pos + nbytes])
            r.pos += nbytes
            got += take
    if not starts:
        starts, bit0s, widths, mins = [0], [0], [0], [0]
    return (np.asarray(starts, np.int32), np.asarray(bit0s, np.int64),
            np.asarray(widths, np.uint32), np.asarray(mins, np.int64),
            words_from_bytes(bytes(packed)), first, total, r.pos)


def delta_decode_device(mb_starts, mb_bit0, mb_width, mb_min, words,
                        first, n: int) -> jax.Array:
    """Decode n int64 values from the segment-table form on device."""
    if n <= 1:
        return jnp.full(max(n, 1), first, jnp.int64)[:n]
    nd = n - 1
    i = jnp.arange(nd, dtype=jnp.int32)
    seg = jnp.searchsorted(mb_starts, i, side="right") - 1
    w = mb_width[seg]
    bit0 = (mb_bit0[seg]
            + (i - mb_starts[seg]).astype(jnp.int64) * w.astype(jnp.int64)
            ).astype(jnp.int32)
    wi = bit0 // 32
    off = (bit0 & 31).astype(jnp.uint32)
    lo = jax.lax.shift_right_logical(words[wi], off)
    hi_shift = jnp.where(off > 0, 32 - off, 1).astype(jnp.uint32)
    hi = jnp.where(off > 0, jax.lax.shift_left(words[wi + 1], hi_shift), 0)
    mask = jnp.where(w >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << w) - jnp.uint32(1))
    raw = (lo | hi) & mask
    deltas = raw.astype(jnp.int64) + mb_min[seg]
    # chunked prefix sum (a plain 64-bit cumsum >4M fails to compile on
    # v5e — see ops/groupagg.chunked_cumsum)
    from .groupagg import chunked_cumsum
    prefix = chunked_cumsum(deltas)
    out = jnp.concatenate([jnp.zeros(1, jnp.int64),
                           prefix]) + jnp.int64(first)
    return out[:n]


_delta_jit = None


def delta_decode_jit(parsed, n: int):
    """Bucket-padded jit wrapper: one executable per (segment-bucket,
    word-bucket, n)."""
    global _delta_jit
    if _delta_jit is None:
        _delta_jit = jax.jit(delta_decode_device, static_argnums=(6,))
    st, b0, wd, mn, words, first, total, _used = parsed
    S = _bucket(len(st))
    stp = np.full(S, np.iinfo(np.int32).max, np.int32); stp[:len(st)] = st
    b0p = np.zeros(S, np.int64); b0p[:len(b0)] = b0
    wdp = np.zeros(S, np.uint32); wdp[:len(wd)] = wd
    mnp = np.zeros(S, np.int64); mnp[:len(mn)] = mn
    W = _bucket(len(words))
    wp = np.zeros(W, np.uint32); wp[:len(words)] = words
    return _delta_jit(jnp.asarray(stp), jnp.asarray(b0p), jnp.asarray(wdp),
                      jnp.asarray(mnp), jnp.asarray(wp),
                      jnp.int64(first), n)
