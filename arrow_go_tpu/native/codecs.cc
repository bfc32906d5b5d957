// Native codec kernels for the Parquet path.
//
// Role of the reference's C-to-assembly tier (SURVEY.md §2f): where
// arrow-go links golang/snappy and SIMD bit-unpack assembly
// (parquet/internal/utils/_lib/bit_packing_avx2.c), we implement the
// Snappy block format, the LZ4 raw block format, and vectorizable
// bit-unpacking in portable C++ (compiled -O3, auto-vectorized), exposed
// through a C ABI consumed via ctypes. Formats implemented from their
// public specifications (snappy format_description.txt; lz4_Block_format.md).
#include <cstdint>
#include <cstring>
#include <cstddef>
#include <cstdlib>

extern "C" {

// --------------------------------------------------------------------------
// varint helpers (snappy preamble)
// --------------------------------------------------------------------------
static inline size_t put_varint(uint8_t* dst, uint64_t v) {
    size_t n = 0;
    while (v >= 0x80) { dst[n++] = (uint8_t)(v | 0x80); v >>= 7; }
    dst[n++] = (uint8_t)v;
    return n;
}

static inline size_t get_varint(const uint8_t* src, size_t len, uint64_t* v) {
    uint64_t out = 0; int shift = 0; size_t n = 0;
    while (n < len && n < 10) {
        uint8_t b = src[n++];
        out |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) { *v = out; return n; }
        shift += 7;
    }
    return 0;
}

// --------------------------------------------------------------------------
// Snappy
// --------------------------------------------------------------------------

size_t snappy_max_compressed_length(size_t n) {
    return 32 + n + n / 6;
}

// Greedy hash-table compressor over 64KB-window blocks.
int64_t snappy_compress(const uint8_t* src, size_t n, uint8_t* dst,
                        size_t dst_cap) {
    size_t d = 0;
    if (dst_cap < 16) return -1;
    d += put_varint(dst, n);

    const size_t kBlock = 1 << 16;
    static thread_local uint16_t table[1 << 14];

    for (size_t block = 0; block < n || (n == 0 && block == 0);
         block += kBlock) {
        size_t blen = n - block < kBlock ? n - block : kBlock;
        const uint8_t* b = src + block;
        memset(table, 0, sizeof(table));
        size_t i = 0, lit_start = 0;

        auto emit_literal = [&](size_t from, size_t count) -> bool {
            while (count > 0) {
                size_t c = count > 65536 ? 65536 : count;
                if (c < 60) {
                    if (d + 1 + c > dst_cap) return false;
                    dst[d++] = (uint8_t)((c - 1) << 2);
                } else if (c - 1 < 256) {
                    if (d + 2 + c > dst_cap) return false;
                    dst[d++] = (60 << 2);
                    dst[d++] = (uint8_t)(c - 1);
                } else {
                    if (d + 3 + c > dst_cap) return false;
                    dst[d++] = (61 << 2);
                    dst[d++] = (uint8_t)((c - 1) & 0xFF);
                    dst[d++] = (uint8_t)(((c - 1) >> 8) & 0xFF);
                }
                memcpy(dst + d, b + from, c);
                d += c; from += c; count -= c;
            }
            return true;
        };

        if (blen >= 8) {
            while (i + 4 <= blen) {
                uint32_t h;
                memcpy(&h, b + i, 4);
                uint32_t slot = (h * 0x1e35a7bdU) >> 18;
                size_t cand = table[slot];
                table[slot] = (uint16_t)i;
                uint32_t ch;
                if (cand < i) { memcpy(&ch, b + cand, 4); } else { ch = ~h; }
                if (ch == h && i - cand <= 65535) {
                    // extend match
                    size_t mlen = 4;
                    while (i + mlen < blen && b[cand + mlen] == b[i + mlen] &&
                           mlen < 64)
                        mlen++;
                    if (!emit_literal(lit_start, i - lit_start)) return -1;
                    size_t off = i - cand;
                    if (mlen <= 11 && off < 2048) {
                        if (d + 2 > dst_cap) return -1;
                        dst[d++] = (uint8_t)(1 | ((mlen - 4) << 2) |
                                             ((off >> 8) << 5));
                        dst[d++] = (uint8_t)(off & 0xFF);
                    } else {
                        if (d + 3 > dst_cap) return -1;
                        dst[d++] = (uint8_t)(2 | ((mlen - 1) << 2));
                        dst[d++] = (uint8_t)(off & 0xFF);
                        dst[d++] = (uint8_t)(off >> 8);
                    }
                    i += mlen;
                    lit_start = i;
                } else {
                    i++;
                }
            }
        }
        if (!emit_literal(lit_start, blen - lit_start)) return -1;
    }
    return (int64_t)d;
}

int64_t snappy_uncompressed_length(const uint8_t* src, size_t n) {
    uint64_t v;
    size_t used = get_varint(src, n, &v);
    if (!used) return -1;
    return (int64_t)v;
}

int64_t snappy_decompress(const uint8_t* src, size_t n, uint8_t* dst,
                          size_t dst_cap) {
    uint64_t ulen;
    size_t s = get_varint(src, n, &ulen);
    if (!s || ulen > dst_cap) return -1;
    size_t d = 0;
    while (s < n) {
        uint8_t tag = src[s++];
        uint32_t lo = tag & 3;
        if (lo == 0) {  // literal
            size_t len = (tag >> 2) + 1;
            if (len > 60) {
                size_t extra = len - 60;  // 1..4 bytes
                if (s + extra > n) return -1;
                len = 0;
                for (size_t k = 0; k < extra; k++)
                    len |= (size_t)src[s + k] << (8 * k);
                len += 1;
                s += extra;
            }
            if (s + len > n || d + len > dst_cap) return -1;
            memcpy(dst + d, src + s, len);
            s += len; d += len;
        } else {
            size_t len, off;
            if (lo == 1) {
                if (s >= n) return -1;
                len = ((tag >> 2) & 7) + 4;
                off = ((size_t)(tag >> 5) << 8) | src[s++];
            } else if (lo == 2) {
                if (s + 2 > n) return -1;
                len = (tag >> 2) + 1;
                off = (size_t)src[s] | ((size_t)src[s + 1] << 8);
                s += 2;
            } else {
                if (s + 4 > n) return -1;
                len = (tag >> 2) + 1;
                off = (size_t)src[s] | ((size_t)src[s + 1] << 8) |
                      ((size_t)src[s + 2] << 16) | ((size_t)src[s + 3] << 24);
                s += 4;
            }
            if (off == 0 || off > d || d + len > dst_cap) return -1;
            // overlapping copy must proceed byte-wise when off < len
            const uint8_t* from = dst + d - off;
            for (size_t k = 0; k < len; k++) dst[d + k] = from[k];
            d += len;
        }
    }
    return (size_t)d == ulen ? (int64_t)d : -1;
}

// --------------------------------------------------------------------------
// LZ4 raw block
// --------------------------------------------------------------------------

int64_t lz4_decompress(const uint8_t* src, size_t n, uint8_t* dst,
                       size_t dst_cap) {
    size_t s = 0, d = 0;
    while (s < n) {
        uint8_t token = src[s++];
        size_t lit = token >> 4;
        if (lit == 15) {
            while (s < n) {
                uint8_t b = src[s++];
                lit += b;
                if (b != 255) break;
            }
        }
        if (s + lit > n || d + lit > dst_cap) return -1;
        memcpy(dst + d, src + s, lit);
        s += lit; d += lit;
        if (s >= n) break;  // last sequence has no match
        if (s + 2 > n) return -1;
        size_t off = (size_t)src[s] | ((size_t)src[s + 1] << 8);
        s += 2;
        size_t mlen = (token & 0x0F);
        if (mlen == 15) {
            while (s < n) {
                uint8_t b = src[s++];
                mlen += b;
                if (b != 255) break;
            }
        }
        mlen += 4;
        if (off == 0 || off > d || d + mlen > dst_cap) return -1;
        const uint8_t* from = dst + d - off;
        for (size_t k = 0; k < mlen; k++) dst[d + k] = from[k];
        d += mlen;
    }
    return (int64_t)d;
}

size_t lz4_max_compressed_length(size_t n) {
    return n + n / 255 + 32;
}

int64_t lz4_compress(const uint8_t* src, size_t n, uint8_t* dst,
                     size_t dst_cap) {
    // greedy matcher; emits spec-conformant sequences (last 5 bytes literal,
    // matches end 12 bytes before block end per spec restrictions)
    static thread_local int32_t table[1 << 14];
    memset(table, -1, sizeof(table));
    size_t s = 0, d = 0, anchor = 0;

    auto emit = [&](size_t lit_from, size_t lit_n, size_t off,
                    size_t mlen) -> bool {
        size_t ln = lit_n, ml = mlen ? mlen - 4 : 0;
        uint8_t token = (uint8_t)(((ln >= 15 ? 15 : ln) << 4) |
                                  (mlen ? (ml >= 15 ? 15 : ml) : 0));
        if (d + 1 > dst_cap) return false;
        dst[d++] = token;
        if (ln >= 15) {
            size_t rest = ln - 15;
            while (true) {
                if (d >= dst_cap) return false;
                if (rest >= 255) { dst[d++] = 255; rest -= 255; }
                else { dst[d++] = (uint8_t)rest; break; }
            }
        }
        if (d + ln > dst_cap) return false;
        memcpy(dst + d, src + lit_from, ln);
        d += ln;
        if (mlen) {
            if (d + 2 > dst_cap) return false;
            dst[d++] = (uint8_t)(off & 0xFF);
            dst[d++] = (uint8_t)(off >> 8);
            if (ml >= 15) {
                size_t rest = ml - 15;
                while (true) {
                    if (d >= dst_cap) return false;
                    if (rest >= 255) { dst[d++] = 255; rest -= 255; }
                    else { dst[d++] = (uint8_t)rest; break; }
                }
            }
        }
        return true;
    };

    if (n >= 13) {
        size_t limit = n - 12;
        while (s < limit) {
            uint32_t h;
            memcpy(&h, src + s, 4);
            uint32_t slot = (h * 0x9E3779B1U) >> 18;
            int64_t cand = table[slot];
            table[slot] = (int32_t)s;
            uint32_t ch = 0;
            bool ok = cand >= 0 && s - (size_t)cand <= 65535;
            if (ok) memcpy(&ch, src + cand, 4);
            if (ok && ch == h) {
                size_t mlen = 4;
                while (s + mlen < limit && src[cand + mlen] == src[s + mlen])
                    mlen++;
                if (!emit(anchor, s - anchor, s - (size_t)cand, mlen))
                    return -1;
                s += mlen;
                anchor = s;
            } else {
                s++;
            }
        }
    }
    if (!emit(anchor, n - anchor, 0, 0)) return -1;
    return (int64_t)d;
}

// --------------------------------------------------------------------------
// Parquet bit-unpacking: n values of `width` bits (LSB-first) -> uint32
// (reference parquet/internal/utils/_lib/bit_packing_avx2.c)
// --------------------------------------------------------------------------

void bitunpack32(const uint8_t* src, size_t n, uint32_t width,
                 uint32_t* dst) {
    if (width == 0) { memset(dst, 0, n * 4); return; }
    uint64_t mask = width == 32 ? 0xFFFFFFFFull : ((1ull << width) - 1);
    size_t bit = 0;
    for (size_t i = 0; i < n; i++) {
        size_t byte = bit >> 3;
        uint32_t shift = (uint32_t)(bit & 7);
        uint64_t w = 0;
        // read up to 8 bytes (width <= 32 + shift <= 7 fits in 5 bytes)
        memcpy(&w, src + byte, 8);
        dst[i] = (uint32_t)((w >> shift) & mask);
        bit += width;
    }
}

// pack n uint32 values of `width` bits (LSB-first)
void bitpack32(const uint32_t* src, size_t n, uint32_t width, uint8_t* dst) {
    if (width == 0) return;
    size_t bit = 0;
    for (size_t i = 0; i < n; i++) {
        size_t byte = bit >> 3;
        uint32_t shift = (uint32_t)(bit & 7);
        uint64_t w;
        memcpy(&w, dst + byte, 8);
        w |= ((uint64_t)src[i] & ((width == 32) ? 0xFFFFFFFFull
                                                : ((1ull << width) - 1)))
             << shift;
        memcpy(dst + byte, &w, 8);
        bit += width;
    }
}

}  // extern "C"

extern "C" {
// --------------------------------------------------------------------------
// Parquet BYTE_ARRAY plain decode: walk <u32 len><bytes> records, emitting
// value offsets (into the packed data) so python can slice vectorized.
// Returns number of values parsed, or -1 on overrun.
// out_offsets has n+1 slots: out_offsets[i] = start of value i in `compact`,
// compact receives the concatenated value bytes (caller sizes = src_len).
// --------------------------------------------------------------------------
int64_t byte_array_unpack(const uint8_t* src, size_t src_len, size_t n,
                          int64_t* out_offsets, uint8_t* compact) {
    size_t pos = 0, out = 0;
    for (size_t i = 0; i < n; i++) {
        if (pos + 4 > src_len) return -1;
        uint32_t len;
        memcpy(&len, src + pos, 4);
        pos += 4;
        if (pos + len > src_len) return -1;
        out_offsets[i] = (int64_t)out;
        memcpy(compact + out, src + pos, len);
        out += len;
        pos += len;
    }
    out_offsets[n] = (int64_t)out;
    return (int64_t)out;
}

// --------------------------------------------------------------------------
// byte-string factorize: first-occurrence memo table (the role of the
// reference's internal/hashing/xxh3_memo_table.go GetOrInsert — dense
// memo codes in insertion order). Open addressing, 64-bit mix hash,
// full bytes compare only on hash hit. Used for dictionary-encoding
// string columns at device ingest.
// codes[i] gets the dense code of row i; uniq_first[] gets the row index
// of each code's first occurrence (caller gathers dictionary bytes).
// Returns number of uniques, or -1 on alloc failure.
// --------------------------------------------------------------------------
static inline uint64_t hash_bytes(const uint8_t* p, int64_t len) {
    uint64_t h = 0x9E3779B97F4A7C15ULL ^ (uint64_t)len;
    int64_t k = 0;
    for (; k + 8 <= len; k += 8) {
        uint64_t w;
        memcpy(&w, p + k, 8);
        h = (h ^ w) * 0x100000001B3ULL;
        h ^= h >> 29;
    }
    if (k < len) {
        uint64_t tail = 0;
        memcpy(&tail, p + k, (size_t)(len - k));
        h = (h ^ tail) * 0x100000001B3ULL;
        h ^= h >> 29;
    }
    h *= 0xFF51AFD7ED558CCDULL;
    return h ^ (h >> 32);
}

int64_t factorize_offsets(const uint8_t* data, const void* offsets,
                          int32_t offwidth, const uint8_t* valid,
                          int64_t n, int32_t* codes, int64_t* uniq_first) {
    if (n == 0) return 0;
    const int32_t* off32 = (const int32_t*)offsets;
    const int64_t* off64 = (const int64_t*)offsets;
    // growing table (reference xxh3_memo_table load-factor upsize,
    // xxh3_memo_table_types.go:143-155): stays cache-resident while the
    // dictionary is small instead of paying a DRAM miss per row.
    // Dictionary BYTES are appended to a compact scratch (dict_*) so the
    // verify-compare hits cache too, not a random row in the source
    // column (the reference's BinaryMemoTable builder plays this role).
    uint64_t cap = 4096;
    int32_t* slots = (int32_t*)malloc(cap * sizeof(int32_t));
    uint64_t* uhash = (uint64_t*)malloc(cap * sizeof(uint64_t));
    uint64_t doff_cap = 4096;
    int64_t* doffs = (int64_t*)malloc((doff_cap + 1) * sizeof(int64_t));
    uint64_t dbytes_cap = 1 << 16;
    uint8_t* dbytes = (uint8_t*)malloc(dbytes_cap);
    if (!slots || !uhash || !doffs || !dbytes) {
        free(slots); free(uhash); free(doffs); free(dbytes);
        return -1;
    }
    memset(slots, 0xFF, cap * sizeof(int32_t));
    doffs[0] = 0;
    uint64_t mask = cap - 1;
    int32_t nuniq = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t s0, s1;
        if (offwidth == 4) { s0 = off32[i]; s1 = off32[i + 1]; }
        else               { s0 = off64[i]; s1 = off64[i + 1]; }
        int64_t len = s1 - s0;
        if (valid && !valid[i]) { len = 0; s0 = 0; }
        const uint8_t* p = data + s0;
        const uint64_t h = hash_bytes(p, len);
        uint64_t s = h & mask;
        int32_t code;
        for (;;) {
            int32_t j = slots[s];
            if (j < 0) {
                // new unique: append bytes to the compact dictionary
                if ((uint64_t)nuniq >= doff_cap) {
                    doff_cap <<= 1;
                    int64_t* nd = (int64_t*)realloc(
                        doffs, (doff_cap + 1) * sizeof(int64_t));
                    if (!nd) goto fail;
                    doffs = nd;
                }
                while ((uint64_t)(doffs[nuniq] + len) > dbytes_cap) {
                    dbytes_cap <<= 1;
                    uint8_t* nb = (uint8_t*)realloc(dbytes, dbytes_cap);
                    if (!nb) goto fail;
                    dbytes = nb;
                }
                memcpy(dbytes + doffs[nuniq], p, (size_t)len);
                doffs[nuniq + 1] = doffs[nuniq] + len;
                slots[s] = nuniq;
                uniq_first[nuniq] = i;
                uhash[nuniq] = h;
                code = nuniq++;
                break;
            }
            if (uhash[j] == h) {
                if (doffs[j + 1] - doffs[j] == len &&
                    memcmp(dbytes + doffs[j], p, (size_t)len) == 0) {
                    code = j;
                    break;
                }
            }
            s = (s + 1) & mask;
        }
        codes[i] = code;
        if ((uint64_t)nuniq * 10 >= cap * 7) {   // load factor 0.7: grow
            uint64_t ncap = cap << 1;
            int32_t* ns = (int32_t*)malloc(ncap * sizeof(int32_t));
            uint64_t* nh = (uint64_t*)malloc(ncap * sizeof(uint64_t));
            if (!ns || !nh) { free(ns); free(nh); goto fail; }
            memset(ns, 0xFF, ncap * sizeof(int32_t));
            const uint64_t nmask = ncap - 1;
            for (uint64_t t = 0; t < cap; t++) {
                int32_t j = slots[t];
                if (j < 0) continue;
                uint64_t q = uhash[j] & nmask;
                while (ns[q] >= 0) q = (q + 1) & nmask;
                ns[q] = j;
            }
            // uhash is indexed by code, just move it over
            memcpy(nh, uhash, (size_t)nuniq * sizeof(uint64_t));
            free(slots); free(uhash);
            slots = ns; uhash = nh; cap = ncap; mask = nmask;
        }
    }
    free(slots); free(uhash); free(doffs); free(dbytes);
    return nuniq;
fail:
    free(slots); free(uhash); free(doffs); free(dbytes);
    return -1;
}
}  // extern "C"
