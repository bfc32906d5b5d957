"""Vectorized factorization of variable-length byte rows (host side).

The role of the reference's BinaryMemoTable
(internal/hashing/xxh3_memo_table.go:131 — GetOrInsert over raw bytes)
for the paths the native C++ memo table does not cover: very long
strings whose (rows x maxlen) padding matrix would blow memory, and
BinaryView columns. The sequential memo loop becomes three vectorized
passes over the FLAT byte stream (cost O(total_bytes + n log n), no
per-row Python):

  1. two independent 64-bit polynomial rolling hashes per row, computed
     with one cumsum over (byte * weight^pos) and differenced at segment
     boundaries (u64 arithmetic wraps mod 2^64 — the hash modulus)
  2. np.unique over (length, h1, h2) rows -> candidate codes
  3. EXACT verification: every row's bytes compare against its group
     representative's bytes, again over the flat stream. A (2^-128-ish)
     hash collision returns None and the caller falls back — this module
     never silently mislabels.

Every per-byte pass runs in ROW CHUNKS bounded to ~64 MB of byte
positions: the int64 index/term temporaries are 8-24x the payload, so
an unchunked pass over a 1 GB column would allocate >30 GB and swap.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_P1 = np.uint64(1099511628211)          # FNV prime
_P2 = np.uint64(0x9E3779B97F4A7C16 | 1)  # odd golden-ratio multiplier
_OFF1 = np.uint64(0xCBF29CE484222325)
_OFF2 = np.uint64(0x2545F4914F6CDD1D)


_CHUNK_BYTES = 1 << 26      # per-pass byte-position budget (~64 MB)


def _powers(p: np.uint64, k: int) -> np.ndarray:
    if k == 0:
        return np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        return np.multiply.accumulate(
            np.concatenate([np.ones(1, np.uint64),
                            np.full(k - 1, p, np.uint64)]))


def _row_chunks(lens: np.ndarray, budget: int):
    """Yield (a, b) row ranges with sum(lens[a:b]) <= budget (a single
    longer row gets its own range). O(#chunks) python iterations."""
    n = len(lens)
    if n == 0:
        return
    cum = np.cumsum(lens.astype(np.int64, copy=False))
    a = 0
    while a < n:
        limit = (int(cum[a - 1]) if a else 0) + budget
        b = int(np.searchsorted(cum, limit, side="right"))
        b = max(b, a + 1)
        yield a, min(b, n)
        a = min(b, n)


def _hash_rows(data: np.ndarray, starts: np.ndarray, lens: np.ndarray,
               p: np.uint64, off0: np.uint64) -> np.ndarray:
    """Per-row polynomial hash, row-chunked: each chunk runs one
    wrapping cumsum over (byte+1)*p^pos and differences at segment
    boundaries (empty rows fall out naturally)."""
    n = len(starts)
    out = np.empty(n, np.uint64)
    pw = np.zeros(0, np.uint64)
    for a, b in _row_chunks(lens, _CHUNK_BYTES):
        clens = lens[a:b]
        tot = int(clens.sum())
        maxlen = int(clens.max()) if b > a else 0
        if maxlen > len(pw):
            pw = _powers(p, maxlen)
        cends = np.cumsum(clens)
        cbase = cends - clens
        rowrep = np.repeat(np.arange(b - a, dtype=np.int64), clens)
        off = np.arange(tot, dtype=np.int64) - cbase[rowrep]
        flat = data[starts[a:b][rowrep] + off]
        with np.errstate(over="ignore"):
            terms = (flat.astype(np.uint64) + np.uint64(1)) * pw[off]
            c = np.zeros(tot + 1, np.uint64)
            np.cumsum(terms, out=c[1:])
            h = c[cends] - c[cbase]
            h = (h + off0) * p
            h ^= h >> np.uint64(29)
            h = h * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
        out[a:b] = h
    return out


def gather_segments(data: np.ndarray, starts: np.ndarray,
                    lens: np.ndarray) -> np.ndarray:
    """Concatenate byte segments of `data` into one contiguous buffer
    (row-chunked: the int64 per-byte index temporaries are 8-16x the
    payload). The shared primitive under hashing, verification, view
    flattening and dictionary building."""
    lens = lens.astype(np.int64, copy=False)
    total = int(lens.sum())
    out = np.empty(total, np.uint8)
    base = np.cumsum(lens) - lens
    for a, b in _row_chunks(lens, _CHUNK_BYTES):
        clens = lens[a:b]
        tot = int(clens.sum())
        if not tot:
            continue
        cbase = np.cumsum(clens) - clens
        rowrep = np.repeat(np.arange(b - a, dtype=np.int64), clens)
        off = np.arange(tot, dtype=np.int64) - cbase[rowrep]
        lo = int(base[a])
        out[lo:lo + tot] = data[starts[a:b][rowrep] + off]
    return out


def _rows_equal(data: np.ndarray, starts_a: np.ndarray,
                starts_b: np.ndarray, lens: np.ndarray) -> bool:
    """Chunked exact compare of same-length row pairs."""
    return np.array_equal(gather_segments(data, starts_a, lens),
                          gather_segments(data, starts_b, lens))


def factorize_segments(data: np.ndarray, starts: np.ndarray,
                       lens: np.ndarray
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Factorize n byte rows given as segments of `data`.

    Returns (codes int32[n], rep_rows int64[k]) where rows i, j share a
    code iff their bytes are identical, and rep_rows[c] is one row
    holding code c's value. Returns None on a verified hash collision
    (callers fall back to an exact slow path).
    """
    n = len(starts)
    if n == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int64)
    starts = starts.astype(np.int64, copy=False)
    lens = lens.astype(np.int64, copy=False)

    h1 = _hash_rows(data, starts, lens, _P1, _OFF1)
    h2 = _hash_rows(data, starts, lens, _P2, _OFF2)
    key = np.empty((n, 3), np.uint64)
    key[:, 0] = lens.astype(np.uint64)
    key[:, 1] = h1
    key[:, 2] = h2
    rows = np.ascontiguousarray(key).view(
        np.dtype((np.void, 24))).reshape(-1)
    _, rep_rows, codes = np.unique(rows, return_index=True,
                                   return_inverse=True)
    codes = codes.astype(np.int32).reshape(-1)

    # exact verification against each row's representative
    rep_of_row = rep_rows[codes]
    need = rep_of_row != np.arange(n)
    if need.any():
        nz = np.flatnonzero(need)
        if not _rows_equal(data, starts[nz], starts[rep_of_row[nz]],
                           lens[nz]):
            return None                         # true collision: bail
    return codes, rep_rows.astype(np.int64)


def flatten_view_bytes(arr) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BinaryView/StringView array -> (flat data, starts, lens), fully
    vectorized (inline rows copy from the 16-byte view structs; long
    rows gather from their variadic buffers, grouped per buffer)."""
    d = arr.data
    n = d.length
    if n == 0:
        return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    raw = np.asarray(d.buffers[1].data[d.offset * 16:(d.offset + n) * 16])
    views = raw.reshape(n, 16)
    iv = views.view(np.int32).reshape(max(n, 1), 4)[:n]
    lens = iv[:, 0].astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    total = int(ends[-1]) if n else 0
    out = np.zeros(total, np.uint8)
    inline = lens <= 12

    def _within(sub_lens):
        """Per-byte within-row offsets for a row SUBSET."""
        tot = int(sub_lens.sum())
        sub_base = np.cumsum(sub_lens) - sub_lens
        return tot, (np.arange(tot, dtype=np.int64)
                     - np.repeat(sub_base, sub_lens))

    # inline rows: scatter up to 12 bytes each from the struct
    if inline.any():
        il_all = np.flatnonzero(inline)
        for a, b in _row_chunks(lens[il_all], _CHUNK_BYTES):
            il = il_all[a:b]
            ilens = lens[il]
            itotal, ioff = _within(ilens)
            if itotal:
                irep = np.repeat(il, ilens)
                out[np.repeat(starts[il], ilens) + ioff] = \
                    views[irep, 4 + ioff]
    # long rows: per variadic buffer, one gather
    if (~inline).any():
        bufidx = iv[:, 2].astype(np.int64)
        boff = iv[:, 3].astype(np.int64)
        for bu in np.unique(bufidx[~inline]):
            sel_all = np.flatnonzero(~inline & (bufidx == bu))
            src = np.asarray(d.buffers[2 + int(bu)].data)
            for a, b in _row_chunks(lens[sel_all], _CHUNK_BYTES):
                sel = sel_all[a:b]
                slens = lens[sel]
                stotal, soff = _within(slens)
                if not stotal:
                    continue
                out[np.repeat(starts[sel], slens) + soff] = \
                    src[np.repeat(boff[sel], slens) + soff]
    return out, starts, lens


def build_view_buffers(data_cat: np.ndarray,
                       offs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenated values -> BinaryView physical buffers, vectorized:
    returns (views bytes [k*16], long-value data buffer). Inline rows
    (len <= 12) embed their bytes in the struct; longer rows carry a
    4-byte prefix + (buffer 0, offset) into the long-value buffer."""
    k = len(offs) - 1
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    views = np.zeros((max(k, 1), 16), np.uint8)[:k]
    views[:, :4] = lens.astype(np.int32)[:, None].view(np.uint8) \
        if k else views[:, :4]
    starts = offs[:-1].astype(np.int64)
    # first min(len,12) bytes of every row land at +4 (prefix or inline)
    head = np.minimum(lens, 12)
    htotal = int(head.sum())
    if htotal:
        hrep = np.repeat(np.arange(k, dtype=np.int64), head)
        hoff = np.arange(htotal, dtype=np.int64) - \
            np.repeat(np.cumsum(head) - head, head)
        views[hrep, 4 + hoff] = data_cat[starts[hrep] + hoff]
    long = lens > 12
    if long.any():
        # prefix already at +4 (first 4 bytes written above, rest of the
        # head bytes are ignored by readers for long rows — zero them)
        ll = np.flatnonzero(long)
        views[np.repeat(ll, 8),
              8 + np.tile(np.arange(8), len(ll))] = 0
        llens = lens[ll]
        ltotal = int(llens.sum())
        lends = np.cumsum(llens)
        lstarts = lends - llens
        lrep = np.repeat(ll, llens)
        loff = np.arange(ltotal, dtype=np.int64) - lstarts[
            np.repeat(np.arange(len(ll), dtype=np.int64), llens)]
        long_data = np.zeros(ltotal, np.uint8)
        long_data[np.repeat(lstarts, llens) + loff] = \
            data_cat[starts[lrep] + loff]
        iv = views.view(np.int32).reshape(max(k, 1), 4)[:k]
        iv[ll, 2] = 0
        iv[ll, 3] = lstarts.astype(np.int32)
    else:
        long_data = np.zeros(0, np.uint8)
    return views.reshape(-1), long_data


def binary_segments(arr) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host binary-like Array -> (flat data, starts, lens) with zero
    copies for the offsets layout."""
    from ..array.arrays import BinaryArray, BinaryViewArray
    if isinstance(arr, BinaryViewArray):
        return flatten_view_bytes(arr)
    if isinstance(arr, BinaryArray):
        off = np.asarray(arr.offsets).astype(np.int64)
        data = np.asarray(arr.data.buffers[2].data)
        return data, off[:-1], off[1:] - off[:-1]
    raise NotImplementedError(type(arr).__name__)
