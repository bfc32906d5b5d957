"""Split-block bloom filters (reference parquet/metadata/bloom_filter.go:238
+ bloom_filter_block.go:31 salted 8x32-bit blocks + _lib/bloom_filter_block.c
AVX2 kernel). numpy-vectorized block math; xxhash64 per the parquet spec.
"""
from __future__ import annotations

import struct
from typing import Iterable, List, Optional

import numpy as np
import xxhash

from .thrift import CompactReader, CompactWriter, ThriftStruct
from . import format as fmt

SALT = np.array([0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
                 0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31],
                dtype=np.uint32)

BYTES_PER_BLOCK = 32  # 8 words x 32 bits


class SplitBlockAlgorithm(ThriftStruct):
    FIELDS = {}


class BloomFilterAlgorithm(ThriftStruct):
    FIELDS = {1: ("BLOCK", SplitBlockAlgorithm)}


class XxHash(ThriftStruct):
    FIELDS = {}


class BloomFilterHash(ThriftStruct):
    FIELDS = {1: ("XXHASH", XxHash)}


class Uncompressed(ThriftStruct):
    FIELDS = {}


class BloomFilterCompression(ThriftStruct):
    FIELDS = {1: ("UNCOMPRESSED", Uncompressed)}


class BloomFilterHeader(ThriftStruct):
    FIELDS = {1: ("numBytes", "i32"),
              2: ("algorithm", BloomFilterAlgorithm),
              3: ("hash", BloomFilterHash),
              4: ("compression", BloomFilterCompression)}


def optimal_num_blocks(ndv: int, fpp: float = 0.01) -> int:
    """Block count for target false-positive rate (reference
    bloom_filter.go sizing)."""
    if ndv <= 0:
        return 1
    import math
    bits = -8 * ndv / math.log(1 - fpp ** 0.125)
    blocks = max(int(bits) // 256 + 1, 1)
    # round up to a power of two (spec recommendation)
    return 1 << (blocks - 1).bit_length()


def _hash_value(v, phys: fmt.Type) -> int:
    """xxhash64(plain-encoded value) per the parquet bloom spec."""
    if phys == fmt.Type.INT32:
        b = struct.pack("<i", int(v))
    elif phys == fmt.Type.INT64:
        b = struct.pack("<q", int(v))
    elif phys == fmt.Type.FLOAT:
        b = struct.pack("<f", float(v))
    elif phys == fmt.Type.DOUBLE:
        b = struct.pack("<d", float(v))
    elif phys in (fmt.Type.BYTE_ARRAY, fmt.Type.FIXED_LEN_BYTE_ARRAY):
        b = bytes(v) if not isinstance(v, str) else v.encode()
    elif phys == fmt.Type.BOOLEAN:
        b = b"\x01" if v else b"\x00"
    else:
        raise NotImplementedError(f"bloom hash for {phys}")
    return xxhash.xxh64_intdigest(b, seed=0)


class BloomFilter:
    """Split-block bloom filter over uint32 words [nblocks, 8]."""

    def __init__(self, nblocks: int):
        self.blocks = np.zeros((nblocks, 8), dtype=np.uint32)

    @property
    def num_blocks(self) -> int:
        return self.blocks.shape[0]

    def _mask(self, h: int) -> np.ndarray:
        x = np.uint32(h & 0xFFFFFFFF)
        bits = ((x * SALT) >> np.uint32(27)).astype(np.uint32)
        return (np.uint32(1) << bits).astype(np.uint32)

    def _block_of(self, h: int) -> int:
        return ((h >> 32) * self.num_blocks) >> 32

    def insert_hash(self, h: int) -> None:
        i = self._block_of(h)
        self.blocks[i] |= self._mask(h)

    def check_hash(self, h: int) -> bool:
        i = self._block_of(h)
        m = self._mask(h)
        return bool(np.all((self.blocks[i] & m) == m))

    def insert(self, v, phys: fmt.Type) -> None:
        self.insert_hash(_hash_value(v, phys))

    def check(self, v, phys: fmt.Type) -> bool:
        return self.check_hash(_hash_value(v, phys))

    # -- serialization -----------------------------------------------------

    def serialize_parts(self) -> tuple:
        """(header thrift bytes, bitset bytes) — separate so encryption can
        frame them as distinct modules (reference aes.go BloomFilterHeader /
        BloomFilterBitset modules)."""
        hdr = BloomFilterHeader(
            numBytes=self.num_blocks * BYTES_PER_BLOCK,
            algorithm=BloomFilterAlgorithm(BLOCK=SplitBlockAlgorithm()),
            hash=BloomFilterHash(XXHASH=XxHash()),
            compression=BloomFilterCompression(UNCOMPRESSED=Uncompressed()))
        w = CompactWriter()
        w.write_struct(hdr)
        return bytes(w.out), self.blocks.astype("<u4").tobytes()

    def serialize(self) -> bytes:
        hdr_b, bits = self.serialize_parts()
        return hdr_b + bits

    @staticmethod
    def deserialize(data: bytes) -> "BloomFilter":
        r = CompactReader(data)
        hdr = r.read_struct(BloomFilterHeader)
        nbytes = hdr.numBytes
        bitset = data[r.pos:r.pos + nbytes]
        bf = BloomFilter(nbytes // BYTES_PER_BLOCK)
        bf.blocks = np.frombuffer(bitset, dtype="<u4").reshape(-1, 8).copy()
        return bf


MIN_BLOOM_BYTES = 32
MAX_BLOOM_BYTES = 128 * 1024 * 1024


def optimal_num_bytes(ndv: int, fpp: float = 0.01) -> int:
    return optimal_num_blocks(ndv, fpp) * BYTES_PER_BLOCK


def _bounded_pow2(num_bytes: int, max_bytes: int) -> int:
    num_bytes = max(num_bytes, MIN_BLOOM_BYTES)
    if num_bytes & (num_bytes - 1):
        num_bytes = 1 << num_bytes.bit_length()
    return max(min(num_bytes, max_bytes), MIN_BLOOM_BYTES)


class AdaptiveBloomFilter:
    """Candidate-set bloom builder for streams with unknown NDV
    (reference parquet/metadata/adaptive_bloom_filter.go:65
    NewAdaptiveBlockSplitBloomFilter): maintain filters at halving
    sizes, count distinct hashes against the largest, drop candidates
    whose expected NDV is exceeded, and finalize to the smallest
    survivor — the filter ends up sized for the NDV actually seen."""

    _NDV_STEP = 500

    def __init__(self, max_bytes: int = 1 << 20, num_candidates: int = 12,
                 fpp: float = 0.01):
        if not (0 < fpp < 1):
            raise ValueError("fpp must be in (0, 1)")
        max_bytes = max(MIN_BLOOM_BYTES, min(MAX_BLOOM_BYTES, max_bytes))
        self.max_bytes = max_bytes
        self.fpp = fpp
        self.num_distinct = 0
        self.finalized = False
        self._candidates: List[tuple] = []      # (expected_ndv, BloomFilter)
        size = _bounded_pow2(max_bytes, max_bytes)
        for _ in range(num_candidates):
            ndv = self._expected_ndv(size)
            if ndv <= 0:
                break
            nb = _bounded_pow2(size, max_bytes)
            self._candidates.append((ndv, BloomFilter(nb // BYTES_PER_BLOCK)))
            size = _bounded_pow2(size // 2, max_bytes)
        if not self._candidates:
            self._candidates.append(
                (16, BloomFilter(MIN_BLOOM_BYTES // BYTES_PER_BLOCK)))
        self._largest = max(self._candidates,
                            key=lambda c: c[1].num_blocks)[1]

    def _expected_ndv(self, num_bytes: int) -> int:
        ndv, optimal = 0, 0
        while optimal < num_bytes:
            ndv += self._NDV_STEP
            optimal = optimal_num_bytes(ndv, self.fpp)
        return max(0, ndv - self._NDV_STEP)

    def _prune(self) -> None:
        self._candidates = [
            (ndv, bf) for ndv, bf in self._candidates
            if bf is self._largest or ndv >= self.num_distinct]

    def insert_hash(self, h: int) -> None:
        if self.finalized:
            raise ValueError("adaptive bloom filter already finalized")
        if not self._largest.check_hash(h):
            self.num_distinct += 1
        self._prune()
        for _, bf in self._candidates:
            bf.insert_hash(h)

    def insert_bulk(self, hashes: Iterable[int]) -> None:
        if self.finalized:
            raise ValueError("adaptive bloom filter already finalized")
        hashes = list(hashes)
        new = {h for h in hashes if not self._largest.check_hash(h)}
        self.num_distinct += len(new)
        self._prune()
        for _, bf in self._candidates:
            for h in hashes:
                bf.insert_hash(h)

    def insert(self, v, phys: fmt.Type) -> None:
        self.insert_hash(_hash_value(v, phys))

    def check_hash(self, h: int) -> bool:
        return self._largest.check_hash(h)

    def size(self) -> int:
        return self._optimal().num_blocks * BYTES_PER_BLOCK

    def _optimal(self) -> BloomFilter:
        return min(self._candidates, key=lambda c: c[1].num_blocks)[1]

    def finalize(self) -> BloomFilter:
        """Smallest surviving candidate — what gets written to the file."""
        self.finalized = True
        return self._optimal()


def build_bloom_filter_adaptive(values: Iterable, phys: fmt.Type,
                                fpp: float = 0.01,
                                max_bytes: int = 1 << 20) -> BloomFilter:
    """Adaptive build for streams with unknown NDV (the writer's
    dictionary-fallback path: fallback means the NDV estimate from the
    dict page is gone)."""
    ab = AdaptiveBloomFilter(max_bytes=max_bytes, fpp=fpp)
    ab.insert_bulk([_hash_value(v, phys) for v in values])
    return ab.finalize()


def build_bloom_filter(values: Iterable, phys: fmt.Type,
                       fpp: float = 0.01) -> BloomFilter:
    vals = list(values)
    bf = BloomFilter(optimal_num_blocks(len(set(map(_key, vals))), fpp))
    for v in vals:
        bf.insert(v, phys)
    return bf


def _key(v):
    return bytes(v) if isinstance(v, (bytearray, memoryview)) else v
