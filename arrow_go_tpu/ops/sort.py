"""Device sort kernels: order-preserving key transforms + stable multi-key
argsort.

TPU-native counterpart of the reference's vector sort
(arrow/compute/internal/kernels/vector_sort.go — pdqsort + stable chunk
merge; vector_sort_internal.go:37-151 null/NaN partitioning, :170 radix
multi-key record sort). The TPU design maps every key column to an
order-isomorphic unsigned integer ("radix key"): floats via the sign-flip
bitcast trick with NaN canonicalized above +inf (matching Arrow's ordering
numbers < NaN < null-at-end), ints via sign-bit flip, dictionary-encoded
strings via host-computed dictionary ranks. Null placement and
out-of-range padding ride a separate small flag key (no bit-stealing from
the value key), and multi-key sorts run as ONE `lax.sort` with interleaved
(flag, key) operand pairs — bitonic on TPU, VPU-parallel, stable.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..device.block import DeviceColumn, row_mask
from ..ops import bitmap


class SortOperand(NamedTuple):
    flag: jax.Array   # int32: 0 null-first, 1 valid, 2 null-last, 3 padding
    words: tuple      # uint32 key words, most significant first (64-bit
                      # keys = 2 words, decimal128 = 4, decimal256 = 8:
                      # TPU has no native u64 compare, so wide keys sort
                      # as stacked u32 lanes in one lax.sort)


def _orderable_bits(values: jax.Array, t: dt.DataType) -> jax.Array:
    """Map values to uint keys whose unsigned order == logical order."""
    d = values.dtype
    if d == jnp.bool_:
        return values.astype(jnp.uint32)
    if jnp.issubdtype(d, jnp.unsignedinteger):
        return values
    if jnp.issubdtype(d, jnp.signedinteger):
        ud = jnp.dtype(f"uint{d.itemsize * 8}")
        sign = jnp.array(1 << (d.itemsize * 8 - 1), ud)
        return jax.lax.bitcast_convert_type(values, ud) ^ sign
    # floating: total-order trick. canonicalize NaN to +NaN so it lands at top
    canon = jnp.where(jnp.isnan(values), jnp.array(jnp.nan, d), values)
    if d.itemsize == 8:
        bits = f64_bits(canon)
        fbits = jnp.uint64
    else:
        fbits = {2: jnp.uint16, 4: jnp.uint32}[d.itemsize]
        bits = jax.lax.bitcast_convert_type(canon, fbits)
    width = d.itemsize * 8
    sign = jnp.array(1 << (width - 1), fbits)
    neg = (bits & sign) != 0
    return jnp.where(neg, ~bits, bits | sign)


def f64_bits(x: jax.Array) -> jax.Array:
    """IEEE-754 bit pattern of float64 values as uint64.

    On CPU this is one bitcast. NO f64 bitcast lowers on the v5e AOT
    path ("While rewriting computation to not contain X64 element
    types ... not implemented" — and frexp/signbit lower through the
    same bitcast), so on TPU the bits reconstruct ARITHMETICALLY:
    exponent by binary-search power-of-two scaling (every step is an
    exact f64 multiply), mantissa by one exact f64->i64 convert.
    Bit-identical to the bitcast for every non-denormal value
    (verified against numpy incl. boundaries, +-0, +-inf, NaN); XLA
    flushes f64 DENORMALS to zero in arithmetic, so on the arithmetic
    path they collapse to sign-correct ZERO bits — a monotone-
    consistent degradation (they tie with +-0 instead of ordering
    within (0, 2^-1022))."""
    from ..jaxenv import on_tpu
    if not on_tpu():
        return jax.lax.bitcast_convert_type(x, jnp.uint64)
    return _f64_bits_arith(x)


def _f64_bits_arith(x: jax.Array) -> jax.Array:
    t = jnp.abs(x)
    e = jnp.zeros(x.shape, jnp.int32)
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        hi = t >= jnp.float64(2.0 ** k)
        t = jnp.where(hi, t * jnp.float64(2.0 ** -k), t)
        e = e + jnp.where(hi, k, 0)
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        lo = t < jnp.float64(2.0 ** (1 - k))
        t = jnp.where(lo, t * jnp.float64(2.0 ** k), t)
        e = e - jnp.where(lo, k, 0)
    # finite nonzero: t in [1, 2), |x| = t * 2^e exactly
    mant = (t * jnp.float64(2.0 ** 52)).astype(jnp.int64)  # [2^52, 2^53)
    be = e + 1023
    denorm = be < 1
    shift = jnp.clip(1 - be, 0, 63).astype(jnp.int64)
    # denormal fraction: mant >> (1 - be) is exact (a real denormal's
    # normalized mantissa has zeros below the shift)
    frac = jnp.where(denorm, mant >> shift,
                     mant & jnp.int64((1 << 52) - 1))
    bits = (jnp.where(denorm, jnp.int64(0),
                      jnp.clip(be, 0, 2046).astype(jnp.int64))
            << jnp.int64(52)) | frac
    bits = jnp.where(jnp.isinf(x), jnp.int64(0x7FF0000000000000), bits)
    bits = jnp.where(jnp.isnan(x), jnp.int64(0x7FF8000000000000), bits)
    bits = jnp.where(t == 0, jnp.int64(0), bits)
    # sign, incl. -0.0 (x < 0 misses it; 1/-0.0 = -inf recovers it)
    negzero = (x == 0) & (jnp.float64(1.0) / x < 0)
    neg = (x < 0) | negzero
    bits = bits | jnp.where(neg, jnp.int64(-0x8000000000000000),
                            jnp.int64(0))
    return jax.lax.bitcast_convert_type(bits, jnp.uint64)


def f64_from_bits(bits: jax.Array) -> jax.Array:
    """Inverse of f64_bits: uint64 IEEE-754 patterns -> float64 values.

    CPU: one bitcast. TPU (no f64 bitcast on v5e): arithmetic
    reconstruction — mantissa via one exact i64->f64 convert, exponent
    via binary power-of-two scaling applied largest-step-first (partial
    exponent sums never overshoot the final exponent, so every
    intermediate stays in range and every step is an exact multiply).
    Denormal patterns reconstruct to sign-correct zero — the same
    documented flush as f64_bits (PARITY.md known deviations)."""
    from ..jaxenv import on_tpu
    if not on_tpu():
        return jax.lax.bitcast_convert_type(bits, jnp.float64)
    be = ((bits >> jnp.uint64(52)) & jnp.uint64(0x7FF)).astype(jnp.int32)
    frac = (bits & jnp.uint64((1 << 52) - 1)).astype(jnp.int64)
    neg = (bits >> jnp.uint64(63)) != 0
    mant = (frac | jnp.int64(1 << 52)).astype(jnp.float64)  # [2^52, 2^53)
    e2 = be - 1075                                  # value = mant * 2^e2
    mag = jnp.abs(e2)
    t = mant
    # v5e f64 is a float32-pair emulation: scale CONSTANTS outside
    # [2^-126, 2^127] flush to 0 / inf on device, so steps are capped at
    # 2^+-64 — peel 64s first (largest-step-first keeps every
    # intermediate between mant and the final value), then bits.
    # Patterns whose values the device cannot represent at all
    # (|x| >= 2^128 or < ~2^-126) reconstruct to the same inf/0 the
    # device storage itself produces for them.
    r = mag
    for _ in range(16):
        hit = r >= 64
        t = (t * jnp.where(hit & (e2 > 0), jnp.float64(2.0) ** 64, 1.0)
               * jnp.where(hit & (e2 < 0), jnp.float64(2.0) ** -64, 1.0))
        r = r - jnp.where(hit, 64, 0)
    for k in (32, 16, 8, 4, 2, 1):
        hit = (r & k) != 0
        up = jnp.where(hit & (e2 > 0), jnp.float64(2.0) ** k, 1.0)
        dn = jnp.where(hit & (e2 < 0), jnp.float64(2.0) ** -k, 1.0)
        t = t * up * dn
    t = jnp.where(be == 0, jnp.float64(0), t)               # denorm flush
    inf = jnp.float64(jnp.inf)
    t = jnp.where(be == 2047, jnp.where(frac == 0, inf, jnp.float64(jnp.nan)),
                  t)
    return jnp.where(neg, -t, t)


def _u64_words(key: jax.Array) -> List[jax.Array]:
    """u64 -> [hi32, lo32]."""
    return [(key >> jnp.uint64(32)).astype(jnp.uint32),
            key.astype(jnp.uint32)]


def sort_key(col_values: jax.Array, t: dt.DataType,
             validity: Optional[jax.Array], n,
             descending: bool = False, nulls_first: bool = False,
             rank: Optional[jax.Array] = None) -> SortOperand:
    """Build the (flag, key words) operand for one sort column."""
    P = col_values.shape[0]
    if rank is not None:  # dictionary strings: host-computed rank per code
        key = jnp.take(rank, jnp.clip(col_values, 0, rank.shape[0] - 1)
                       ).astype(jnp.uint64)
        words = _u64_words(key)
    elif col_values.ndim == 2:
        # decimal limb matrix (P, k) uint64, little-endian limbs: key words
        # run most-significant limb first, top limb sign-flipped so
        # unsigned word order == signed two's-complement order
        k = col_values.shape[1]
        words = []
        for li in reversed(range(k)):
            limb = col_values[:, li]
            if li == k - 1:
                limb = limb ^ jnp.uint64(1 << 63)
            words.extend(_u64_words(limb))
    else:
        key = _orderable_bits(col_values, t).astype(jnp.uint64)
        words = _u64_words(key)
    if descending:
        words = [~w for w in words]
    flag = jnp.ones(P, jnp.int32)
    if validity is not None:
        isnull = ~bitmap.expand_words(validity, P)
        flag = jnp.where(isnull, 0 if nulls_first else 2, flag)
    flag = jnp.where(row_mask(P, n), flag, 3)
    return SortOperand(flag, tuple(words))


def argsort_single(op: SortOperand) -> jax.Array:
    """Stable ascending argsort -> int32 permutation."""
    return argsort_multi([op])


def argsort_multi(ops: List[SortOperand]) -> jax.Array:
    """Stable multi-key argsort, first operand most significant — a single
    lax.sort with all (flag, word...) keys interleaved."""
    P = ops[0].flag.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    operands = []
    for op in ops:
        operands.append(op.flag)
        operands.extend(op.words)
    nk = len(operands)
    operands.append(iota)
    res = jax.lax.sort(tuple(operands), num_keys=nk, is_stable=True)
    return res[-1]
