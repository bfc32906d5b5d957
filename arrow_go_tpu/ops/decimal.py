"""Decimal128 device arithmetic over (lo: uint64, hi: uint64) limb pairs.

Reference semantics: arrow/decimal128/decimal128.go (two's-complement
128-bit add/sub/mul/cmp/negate). TPU has no int128; XLA emulates u64, and
multiplication splits into 32-bit limbs so every partial product fits
u64 without losing carries (SURVEY.md §7 hard parts).

Columns arrive as jax arrays of shape (P, 2) uint64, [:, 0] = lo,
[:, 1] = hi (little-endian limb order, matching device/block.py).
"""
from __future__ import annotations

from ..jaxenv import jax, jnp

U64 = jnp.uint64
MASK32 = jnp.uint64(0xFFFFFFFF)


def _split(v):
    return v & MASK32, v >> jnp.uint64(32)


def add128(a, b):
    """(P,2) + (P,2) -> (P,2) with carry, wrapping (two's complement)."""
    lo = a[:, 0] + b[:, 0]
    carry = (lo < a[:, 0]).astype(U64)
    hi = a[:, 1] + b[:, 1] + carry
    return jnp.stack([lo, hi], axis=1)


def neg128(a):
    lo = ~a[:, 0] + jnp.uint64(1)
    # ~a.lo + 1 wraps to 0 only when a.lo == 0 -> carry into hi
    carry = (a[:, 0] == 0).astype(U64)
    hi = ~a[:, 1] + carry
    return jnp.stack([lo, hi], axis=1)


def sub128(a, b):
    return add128(a, neg128(b))


def mul128(a, b):
    """Low 128 bits of the product (wrapping), via 32-bit limbs."""
    a0, a1 = _split(a[:, 0])
    a2, a3 = _split(a[:, 1])
    b0, b1 = _split(b[:, 0])
    b2, b3 = _split(b[:, 1])
    # partial products contributing to limbs 0..3 (32-bit limbs)
    p0 = a0 * b0
    p1 = a0 * b1 + a1 * b0
    p2 = a0 * b2 + a1 * b1 + a2 * b0
    p3 = a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0
    l0 = p0 & MASK32
    c = p0 >> jnp.uint64(32)
    t1 = p1 + c
    l1 = t1 & MASK32
    c = t1 >> jnp.uint64(32)
    t2 = p2 + c
    l2 = t2 & MASK32
    c = t2 >> jnp.uint64(32)
    t3 = p3 + c
    l3 = t3 & MASK32
    lo = l0 | (l1 << jnp.uint64(32))
    hi = l2 | (l3 << jnp.uint64(32))
    return jnp.stack([lo, hi], axis=1)


def cmp128(a, b):
    """Signed compare: -1 / 0 / 1 as int32."""
    sa = jax.lax.bitcast_convert_type(a[:, 1], jnp.int64)
    sb = jax.lax.bitcast_convert_type(b[:, 1], jnp.int64)
    hi_lt = sa < sb
    hi_gt = sa > sb
    lo_lt = a[:, 0] < b[:, 0]
    lo_gt = a[:, 0] > b[:, 0]
    out = jnp.where(hi_lt, -1, jnp.where(hi_gt, 1,
                    jnp.where(lo_lt, -1, jnp.where(lo_gt, 1, 0))))
    return out.astype(jnp.int32)


def is_negative(a):
    return jax.lax.bitcast_convert_type(a[:, 1], jnp.int64) < 0


def from_int64(v):
    """int64 column -> (P,2) decimal limbs (sign-extended)."""
    lo = jax.lax.bitcast_convert_type(v, U64)
    hi = jax.lax.bitcast_convert_type(v >> jnp.int64(63), U64)
    return jnp.stack([lo, hi], axis=1)


def scale_by_pow10(a, k: int):
    """a * 10^k (k >= 0 static) — decimal rescale (reference Rescale)."""
    out = a
    ten = None
    for _ in range(k):
        # multiply by 10 = (x << 3) + (x << 1)
        x8 = jnp.stack([out[:, 0] << jnp.uint64(3),
                        (out[:, 1] << jnp.uint64(3))
                        | (out[:, 0] >> jnp.uint64(61))], axis=1)
        x2 = jnp.stack([out[:, 0] << jnp.uint64(1),
                        (out[:, 1] << jnp.uint64(1))
                        | (out[:, 0] >> jnp.uint64(63))], axis=1)
        out = add128(x8, x2)
    return out


# ---------------------------------------------------------------------------
# generic N-limb two's-complement arithmetic: decimal256 runs as (P, 4)
# uint64 little-endian limbs (reference arrow/decimal256/decimal256.go —
# the 4x64 Add/Sub/Mul/Cmp semantics, TPU-vectorized over whole columns)
# ---------------------------------------------------------------------------

def addn(a, b):
    """(P,k) + (P,k) ripple-carry, wrapping."""
    k = a.shape[1]
    limbs = []
    carry = jnp.zeros(a.shape[0], U64)
    for i in range(k):
        s = a[:, i] + b[:, i]
        c1 = (s < a[:, i]).astype(U64)
        s2 = s + carry
        c2 = (s2 < s).astype(U64)
        limbs.append(s2)
        carry = c1 + c2
    return jnp.stack(limbs, axis=1)


def negn(a):
    """two's-complement negate: ~a + 1 with carries."""
    k = a.shape[1]
    limbs = []
    carry = jnp.ones(a.shape[0], U64)
    for i in range(k):
        inv = ~a[:, i]
        s = inv + carry
        carry = (s < inv).astype(U64)
        limbs.append(s)
    return jnp.stack(limbs, axis=1)


def subn(a, b):
    return addn(a, negn(b))


def muln(a, b):
    """Low 64k bits of the product (wrapping), via 32-bit limbs."""
    k = a.shape[1]
    m = 2 * k                               # 32-bit limb count
    a32 = []
    b32 = []
    for i in range(k):
        a32 += [a[:, i] & MASK32, a[:, i] >> jnp.uint64(32)]
        b32 += [b[:, i] & MASK32, b[:, i] >> jnp.uint64(32)]
    out32 = []
    carry = jnp.zeros(a.shape[0], U64)
    for j in range(m):
        # sum of partial products landing on 32-bit limb j, plus carry.
        # each partial fits u64; the running sum can exceed 64 bits for
        # large k, so split the accumulation into (lo32, overflow) parts.
        acc_lo = carry & MASK32
        acc_hi = carry >> jnp.uint64(32)
        for i in range(j + 1):
            p = a32[i] * b32[j - i]
            acc_lo = acc_lo + (p & MASK32)
            acc_hi = acc_hi + (p >> jnp.uint64(32))
        acc_hi = acc_hi + (acc_lo >> jnp.uint64(32))
        out32.append(acc_lo & MASK32)
        carry = acc_hi
    limbs = [out32[2 * i] | (out32[2 * i + 1] << jnp.uint64(32))
             for i in range(k)]
    return jnp.stack(limbs, axis=1)


def cmpn(a, b):
    """Signed compare over k limbs: -1 / 0 / 1 as int32."""
    k = a.shape[1]
    out = jnp.zeros(a.shape[0], jnp.int32)
    # top limb signed, others unsigned; scan most significant first and
    # keep the first nonzero verdict
    for i in reversed(range(k)):
        if i == k - 1:
            av = jax.lax.bitcast_convert_type(a[:, i], jnp.int64)
            bv = jax.lax.bitcast_convert_type(b[:, i], jnp.int64)
        else:
            av, bv = a[:, i], b[:, i]
        here = jnp.where(av < bv, -1, jnp.where(av > bv, 1, 0)
                         ).astype(jnp.int32)
        # less significant limbs only break ties
        out = here if i == k - 1 else jnp.where(out == 0, here, out)
    return out


def is_negative_n(a):
    return jax.lax.bitcast_convert_type(a[:, -1], jnp.int64) < 0


def from_int64_n(v, k: int):
    """int64 column -> (P,k) limbs (sign-extended)."""
    lo = jax.lax.bitcast_convert_type(v, U64)
    ext = jax.lax.bitcast_convert_type(v >> jnp.int64(63), U64)
    return jnp.stack([lo] + [ext] * (k - 1), axis=1)


def shln_1(a, shift: int):
    """a << shift (0 <= shift < 64), whole-column."""
    k = a.shape[1]
    s = jnp.uint64(shift)
    if shift == 0:
        return a
    inv = jnp.uint64(64 - shift)
    limbs = [a[:, 0] << s]
    for i in range(1, k):
        limbs.append((a[:, i] << s) | (a[:, i - 1] >> inv))
    return jnp.stack(limbs, axis=1)


def scale_by_pow10_n(a, p10: int):
    """a * 10^p10 (static, >= 0): (x<<3) + (x<<1) per factor of ten."""
    out = a
    for _ in range(p10):
        out = addn(shln_1(out, 3), shln_1(out, 1))
    return out
